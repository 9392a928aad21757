"""ADVICE r4: _dedup_keys ordered by every non-key column, so an updates
frame carrying a MapType column (STAC asset / access-url frames do) blew
up with AnalysisException. Maps now sort by canonical JSON (entries
sorted), and frames with no orderable tiebreaker at all fall back to
dropDuplicates."""

import pandas as pd
from pyspark.sql import functions as F

from stac_populator_spark.sources.merge import _dedup_keys, merge_upsert


def _map_df(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": ["a", "a", "b"], "v": ["2", "1", "9"]})
    )
    return df.withColumn("assets", F.create_map(F.lit("k"), F.col("v")))


def test_dedup_keys_accepts_map_column(spark):
    out = _dedup_keys(_map_df(spark), "id")
    rows = {r["id"]: (r["v"], dict(r["assets"])) for r in out.collect()}
    assert set(rows) == {"a", "b"}
    # deterministic winner: sorts first by (v, json(assets)) → v="1"
    assert rows["a"] == ("1", {"k": "1"})


def test_dedup_keys_map_only_falls_back_to_drop_duplicates(spark):
    df = _map_df(spark).select("id", "assets")
    out = _dedup_keys(df, "id")
    assert sorted(r["id"] for r in out.collect()) == ["a", "b"]


def test_merge_upsert_with_map_column_roundtrips(spark, tmp_path):
    t = str(tmp_path / "items")
    out = merge_upsert(spark, t, _map_df(spark))
    rows = {r["id"]: dict(r["assets"]) for r in out.collect()}
    assert rows == {"a": {"k": "1"}, "b": {"k": "9"}}
