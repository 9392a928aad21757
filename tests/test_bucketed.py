"""Bucketed co-located join: SortMergeJoin with no Exchange on either side
(the shuffle-free repeated-join layout for 100 TB MERGE workloads)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from stac_populator_spark.sources.bucketed import read_table, write_bucketed


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_no_exchange(spark):
    a = spark.range(0, 5000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    b = spark.range(0, 5000, 3).select(F.col("id"), (F.col("id") + 1).alias("w"))
    write_bucketed(a, "t_bucketed_a", "id", n_buckets=4)
    write_bucketed(b, "t_bucketed_b", "id", n_buckets=4)
    try:
        # merge hint: at real scale neither side broadcasts; here it forces
        # the SortMergeJoin path so the bucketed (exchange-free) layout shows
        j = read_table(spark, "t_bucketed_a").hint("merge").join(
            read_table(spark, "t_bucketed_b"), "id"
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert " Exchange (" not in plan  # both sides pre-bucketed → no shuffle
        # correctness unchanged
        assert j.count() == b.count()
        assert j.filter(F.col("id") == 9).select("v", "w").collect()[0][0:] == (18, 10)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_b")
