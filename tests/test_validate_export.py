"""Dead-letter routing, export dedup-by-id, partitioned JSON export
(reference analogues: populators.py:268-300, export.py:83-118,
tests/test_export.py:110-139)."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_populator_spark.operators.validate import (
    split_valid_invalid,
    unknown_collection_dead_letter,
)
from stac_populator_spark.sources.export import dedup_items_by_id, export_items_json


def _items(spark, rows):
    return spark.createDataFrame(
        rows,
        "id string, lon_min double, lat_min double, lon_max double, lat_max double, "
        "datetime timestamp, collection_id string",
    )


def test_split_valid_invalid(spark):
    rows = [
        ("ok", 0.0, 0.0, 1.0, 1.0, None, "c1"),
        ("", 0.0, 0.0, 1.0, 1.0, None, "c1"),             # missing id
        ("badlon", -200.0, 0.0, 1.0, 1.0, None, "c1"),    # lon range
        ("badlat", 0.0, -95.0, 1.0, 1.0, None, "c1"),     # lat range
        ("nogeo", None, None, None, None, None, "c1"),    # null geom is fine
    ]
    valid, dead = split_valid_invalid(_items(spark, rows))
    assert {r["id"] for r in valid.collect()} == {"ok", "nogeo"}
    reasons = {r["id"]: r["failure_reason"] for r in dead.collect()}
    assert reasons == {"": "missing_id", "badlon": "lon_out_of_range", "badlat": "lat_out_of_range"}


def test_require_datetime(spark):
    rows = [
        ("a", 0.0, 0.0, 1.0, 1.0, None, "c1"),
    ]
    valid, dead = split_valid_invalid(_items(spark, rows), require_datetime=True)
    assert valid.count() == 0
    assert dead.collect()[0]["failure_reason"] == "datetime_missing"


def test_unknown_collection(spark):
    items = _items(spark, [("a", 0.0, 0.0, 1.0, 1.0, None, "c1"), ("b", 0.0, 0.0, 1.0, 1.0, None, "cX")])
    cols = spark.createDataFrame([("c1",)], "collection_id string")
    valid, dead = unknown_collection_dead_letter(items, cols)
    assert [r["id"] for r in valid.collect()] == ["a"]
    d = dead.collect()
    assert d[0]["id"] == "b" and d[0]["failure_reason"] == "unknown_collection"


def _export_items(spark):
    rows = [
        ("i1", "https://a/1", pd.Timestamp("2024-01-02"), "c1", '{"id":"i1","v":1}'),
        ("i1", "https://a/1b", pd.Timestamp("2024-01-01"), "c1", '{"id":"i1","v":2}'),  # earlier → wins
        ("i2", "https://a/2", pd.Timestamp("2024-01-01"), "c2", '{"id":"i2"}'),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "url", "warc_ts", "collection_id", "stac_json"])
    )


def test_dedup_items_by_id(spark):
    winners, report = dedup_items_by_id(_export_items(spark))
    w = {r["id"]: r["url"] for r in winners.collect()}
    assert w == {"i1": "https://a/1b", "i2": "https://a/2"}
    rep = report.collect()
    assert len(rep) == 1 and rep[0]["id"] == "i1" and rep[0]["n_duplicates"] == 1


def test_export_items_json(spark, tmp_path):
    out = str(tmp_path / "export")
    winners, _ = dedup_items_by_id(_export_items(spark))
    export_items_json(winners, out)
    parts = sorted(os.listdir(out))
    assert any(p.startswith("collection_id=c1") for p in parts)
    assert any(p.startswith("collection_id=c2") for p in parts)
    # every written line is valid JSON; refuses overwrite in 'error' mode
    docs = spark.read.text(out).collect()
    for r in docs:
        json.loads(r["value"])
    with pytest.raises(Exception):
        export_items_json(winners, out)  # mode='error' → AnalysisException
