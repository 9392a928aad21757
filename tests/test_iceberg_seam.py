"""Iceberg JAR seam (VERDICT r4 ask #8): the upsert/checkpoint contracts
parametrized over both branches — `parquet` (runs everywhere, the
sandbox default) and `iceberg` (skips unless an iceberg-spark-runtime
JAR is on the session classpath; runs the IDENTICAL contract assertions
through real MERGE INTO / snapshots when one is).

Also pins the seam's honesty guarantees: the probe reports absence
truthfully, catalog identifiers are never mistaken for relative paths,
and the MERGE statement shape is unit-tested without a JVM."""

import pandas as pd
import pytest

from stac_populator_spark.sources.iceberg import (
    iceberg_enabled,
    iceberg_runtime_available,
    looks_like_table_ident,
    merge_sql,
)
from stac_populator_spark.sources.merge import merge_upsert


def _updates(spark, ids, tag):
    return spark.createDataFrame(
        pd.DataFrame({"id": [str(i) for i in ids], "v": [f"{tag}{i}" for i in ids]})
    )


@pytest.fixture(params=["parquet", "iceberg"])
def target(request, spark, tmp_path):
    """The upsert target for each branch: a filesystem path (Parquet
    contract) or a catalog identifier (real Iceberg MERGE INTO)."""
    if request.param == "iceberg":
        if not iceberg_enabled(spark):
            pytest.skip("no Iceberg runtime JAR on this session's classpath")
        return f"graft.db.items_{tmp_path.name}"
    return str(tmp_path / "items")


class TestUpsertContract:
    """One contract, two branches — identical assertions."""

    def test_insert_then_upsert_updates_win(self, spark, target):
        out1 = merge_upsert(spark, target, _updates(spark, range(5), "a"))
        assert out1.count() == 5
        out2 = merge_upsert(spark, target, _updates(spark, range(3, 8), "b"))
        rows = {r["id"]: r["v"] for r in out2.collect()}
        assert len(rows) == 8
        assert rows["1"] == "a1" and rows["4"] == "b4" and rows["7"] == "b7"

    def test_idempotent(self, spark, target):
        merge_upsert(spark, target, _updates(spark, range(4), "a"))
        again = merge_upsert(spark, target, _updates(spark, range(4), "a"))
        assert again.count() == 4
        rows = {r["id"]: r["v"] for r in again.collect()}
        assert rows == {str(i): f"a{i}" for i in range(4)}


def test_probe_reports_absence_truthfully(spark):
    # this sandbox ships no Iceberg JAR; if one ever appears the seam
    # activates and this guard flips to asserting availability —
    # both states are legitimate, silence about either is not
    if iceberg_runtime_available(spark):
        assert True  # runtime present: the iceberg-branch tests above ran
    else:
        assert not iceberg_enabled(spark)


def test_ident_is_never_treated_as_relative_path(spark):
    if iceberg_enabled(spark):
        pytest.skip("runtime present — identifiers route to MERGE INTO")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        merge_upsert(spark, "graft.db.items", _updates(spark, range(2), "a"))


def test_checkpoint_catalog_without_runtime_fails_loudly(spark, tmp_path):
    from stac_populator_spark.sources.checkpoint import CheckpointedPipeline

    if iceberg_enabled(spark):
        pytest.skip("runtime present")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        CheckpointedPipeline(spark, str(tmp_path), catalog="graft")


def test_ident_detection():
    assert looks_like_table_ident("graft.db.items")
    assert looks_like_table_ident("cat.ns1.ns2.tbl")
    assert not looks_like_table_ident("/tmp/x/items")
    assert not looks_like_table_ident("items")
    assert not looks_like_table_ident("data.parquet")  # one dot = filename
    assert not looks_like_table_ident("./rel/path")


def test_merge_sql_shape():
    sql = merge_sql("graft.db.items", "src_v", "id", ["id", "v", "w"])
    assert sql == (
        "MERGE INTO graft.db.items t USING src_v u ON t.id = u.id "
        "WHEN MATCHED THEN UPDATE SET t.v = u.v, t.w = u.w "
        "WHEN NOT MATCHED THEN INSERT (id, v, w) VALUES (u.id, u.v, u.w)"
    )
