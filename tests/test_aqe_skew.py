"""AQE skew-join evidence (J8): a hot-key join is split at runtime —
the final adaptive plan carries SortMergeJoin(skew=true). This is the
built-in half of the skew strategy; the explicit salting half is
tests/test_knn_tiles.py::test_knn_salted_identical_results."""

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(0, 120000).select(
            F.lit(7).cast("long").alias("k"), F.col("id").alias("v")
        ).unionAll(
            spark.range(0, 10000).select(
                (F.col("id") % 100).cast("long").alias("k"), F.col("id").alias("v")
            )
        )
        dim = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        j = fact.join(dim, "k")
        rows = j.collect()  # same QueryExecution → final adaptive plan
        assert len(rows) == 130000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # AQE split the hot partition
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
