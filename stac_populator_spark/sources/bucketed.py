"""Bucketed (co-located) table layout for repeated large-large equi-joins.

SURVEY.md §4.2/§2.4: the items↔updates MERGE and any recurring join on a
high-cardinality key should not re-shuffle either side every run. Writing
both sides bucketed + sorted by the key lets Spark plan a SortMergeJoin
with **zero Exchange** — each bucket pair joins locally. This is the
Parquet-table stand-in for Iceberg's bucket(url) partition transform.

Verified by tests/test_bucketed.py via the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 8) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
