"""Export sink: STAC items/collections → partitioned JSON files with
dedup-by-id semantics (reference: export verb + _write_stac_data resume/
duplicate rules, /root/reference/STACpopulator/export.py:83-118, and the
dedup anti-join J3 export.py:102-114).

Spark-native shape: ``items.write.partitionBy("collection_id").text`` of
the pre-rendered ``stac_json`` column; duplicate ids are resolved *before*
the write by a window (first-by-warc_ts wins, deterministic tie-break),
and the duplicate report is a groupBy — the reference's per-file
``.N``-suffix counting (export.py:109-111) becomes a count column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_items_by_id(items: DataFrame, order_col: str = "warc_ts",
                      scope: tuple = ("collection_id",)):
    """(winners, duplicate_report). Winner per (scope, id) = smallest
    (order_col, url); report rows: (scope..., id, n_duplicates).

    The dedup scope defaults to per-collection, matching the reference's
    per-directory duplicate check (items are written under each owning
    collection's directory; the same item id under *different* collections
    is a legitimate multi-match, not a duplicate — export.py:102-114
    guards one directory at a time)."""
    keys = [c for c in scope if c in items.columns] + ["id"]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc(), F.col("url").asc())
    ranked = items.withColumn("_rn", F.row_number().over(w))
    winners = ranked.filter(F.col("_rn") == 1).drop("_rn")
    report = (
        items.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select(*keys, (F.col("n_copies") - 1).alias("n_duplicates"))
    )
    return winners, report


def export_items_json(items: DataFrame, out_dir: str, mode: str = "error") -> None:
    """Write one JSON document per item, files partitioned by collection.

    ``mode='error'`` refuses to overwrite an existing export (the
    reference's FileExistsError without --resume, export.py:95-101);
    ``mode='overwrite'`` replaces it. Resume-with-skip is handled a level
    up by the snapshot checkpoint (sources.checkpoint)."""
    (
        items.select("collection_id", F.col("stac_json").alias("value"))
        .write.mode(mode)
        .partitionBy("collection_id")
        .text(out_dir)
    )
