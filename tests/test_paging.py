"""Keyset pagination (S7/S8 get_children/get_items analogue): exactly-once
cover, stable order, resume token, partition-layout invariance, and the
pushed-filter plan property."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_populator_spark.sources.paging import (
    get_children,
    get_items,
    iter_pages,
    next_page,
)


@pytest.fixture(scope="module")
def items(spark):
    pdf = pd.DataFrame(
        {
            "id": [f"item-{i:04d}" for i in range(257)],
            "collection_id": [f"col-{i % 5}" for i in range(257)],
            "value": range(257),
        }
    )
    return spark.createDataFrame(pdf).repartition(7).cache()


def test_pages_cover_exactly_once(items):
    seen = []
    for page in iter_pages(items, "id", page_size=50):
        seen.extend(r["id"] for r in page)
    assert len(seen) == 257
    assert seen == sorted(set(seen))  # stable global order, no dup, no gap


def test_page_sizes_and_short_tail(items):
    sizes = [len(p) for p in iter_pages(items, "id", page_size=50)]
    assert sizes == [50, 50, 50, 50, 50, 7]


def test_resume_from_token(items):
    # a consumer that stops mid-way resumes from the last key (the STAC
    # API 'next' link contract) without replay or loss
    first = next_page(items, "id", None, 100).collect()
    token = first[-1]["id"]
    rest = []
    after = token
    while True:
        rows = next_page(items, "id", after, 100).collect()
        if not rows:
            break
        rest.extend(rows)
        after = rows[-1]["id"]
    assert len(first) + len(rest) == 257
    assert {r["id"] for r in first} | {r["id"] for r in rest} == {
        f"item-{i:04d}" for i in range(257)
    }


def test_partitioning_invariance(spark, items):
    a = [r["id"] for p in iter_pages(items, "id", 60) for r in p]
    b = [r["id"] for p in iter_pages(items.repartition(13), "id", 60) for r in p]
    assert a == b


def test_get_children_and_items(items):
    kids = [r["collection_id"] for p in get_children(items, page_size=2) for r in p]
    assert kids == [f"col-{i}" for i in range(5)]
    one = [r["id"] for p in get_items(items, collection="col-3", page_size=20) for r in p]
    assert one == sorted(f"item-{i:04d}" for i in range(257) if i % 5 == 3)


def test_sorted_layout_prunes_pages(spark, tmp_path, items):
    # the write-side half of keyset paging: a range-sorted layout lets the
    # resume predicate skip files/row-groups via parquet min/max stats —
    # a page deep into the keyspace reads far fewer rows than a full scan
    from stac_populator_spark.sources.layout import write_sorted_layout

    path = str(tmp_path / "sorted_items")
    write_sorted_layout(items, path, "id", n_files=8)
    df = spark.read.parquet(path)
    # correctness unchanged on the sorted layout
    page = next_page(df, "id", "item-0200", 30).collect()
    assert [r["id"] for r in page] == [f"item-{i:04d}" for i in range(201, 231)]
    # files carry disjoint key ranges (each file's ids are contiguous)
    import os

    parts = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))
    assert len(parts) >= 4
    ranges = []
    for p in parts:
        ids = [r["id"] for r in spark.read.parquet(f"{path}/{p}").select("id").collect()]
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint → min/max stats prune whole files


def test_keyset_filter_is_pushed_down(spark, tmp_path, items):
    # on a parquet layout the resume predicate must reach the scan
    path = str(tmp_path / "items_pq")
    items.orderBy("id").write.parquet(path)
    df = spark.read.parquet(path)
    plan = next_page(df, "id", "item-0100", 50)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(id,item-0100)" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort