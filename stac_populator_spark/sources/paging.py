"""Paged reading of item/collection tables — the Spark rendering of the
reference's STAC-API client iteration (S7/S8: Client.get_children /
get_items, /root/reference/STACpopulator/export.py:32-76, which walk
pystac-client's paginated link chain).

Semantics preserved: every row is yielded exactly once, in a stable
deterministic order, resumable from the last-seen key — the properties the
reference's exporter relies on when it walks children and items.

Scale design: KEYSET pagination, not OFFSET. Each page is
``key > last_seen ORDER BY key LIMIT page_size`` — a pruned scan plus a
top-k (TakeOrderedAndProject), so page N costs one filtered pass with the
predicate pushed to parquet (min/max row-group skipping on a sorted
layout), never an OFFSET re-scan of N·page_size rows. The resume token is
the last key of the previous page, exactly like a STAC API ``next`` link.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def next_page(df: DataFrame, key_col: str, after=None, page_size: int = 1000) -> DataFrame:
    """One page: rows with key > ``after`` (None = from the start), ordered
    by key, limited to page_size. Deterministic for unique keys."""
    d = df if after is None else df.filter(F.col(key_col) > F.lit(after))
    return d.orderBy(F.col(key_col).asc()).limit(page_size)


def iter_pages(df: DataFrame, key_col: str, page_size: int = 1000) -> Iterator[list]:
    """Generator of collected pages (driver-side lists of Rows) — the
    client-iteration shape of the reference's get_items loop. Stops on the
    first short page."""
    after = None
    while True:
        rows = next_page(df, key_col, after, page_size).collect()
        if not rows:
            return
        yield rows
        if len(rows) < page_size:
            return
        after = rows[-1][key_col]


def get_children(items: DataFrame, collection_col: str = "collection_id",
                 page_size: int = 1000) -> Iterator[list]:
    """Paged distinct collection ids (the get_children analogue)."""
    kids = items.filter(F.col(collection_col).isNotNull()).select(collection_col).distinct()
    return iter_pages(kids, collection_col, page_size)


def get_items(items: DataFrame, id_col: str = "id",
              collection: str | None = None,
              collection_col: str = "collection_id",
              page_size: int = 1000) -> Iterator[list]:
    """Paged items, optionally within one collection (get_items analogue;
    the collection predicate prunes partitions on a collection-partitioned
    layout)."""
    d = items if collection is None else items.filter(F.col(collection_col) == collection)
    return iter_pages(d, id_col, page_size)
