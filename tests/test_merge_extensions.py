"""MERGE-upsert semantics, extension-property helpers, STAC Collection
JSON assembly."""

import json

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_populator_spark.operators.extensions import (
    assets_from_access_urls,
    cf_parameters,
    filter_assets_by_service,
    magpie_source_link,
    only_item,
    prefix_properties,
    split_field,
    valid_version,
    wxs_get_capabilities,
)
from stac_populator_spark.sources.merge import merge_upsert


def test_merge_upsert_semantics(spark, tmp_path):
    path = str(tmp_path / "items")
    b1 = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    t1 = merge_upsert(spark, path, b1)
    assert {(r["id"], r["v"]) for r in t1.collect()} == {("a", 1), ("b", 1)}

    # upsert: existing key replaced, new key appended
    b2 = spark.createDataFrame([("b", 2), ("c", 1)], "id string, v int")
    t2 = merge_upsert(spark, path, b2)
    assert {(r["id"], r["v"]) for r in t2.collect()} == {("a", 1), ("b", 2), ("c", 1)}

    # idempotent: same batch again → identical table (reference 409→PUT)
    t3 = merge_upsert(spark, path, b2)
    assert {(r["id"], r["v"]) for r in t3.collect()} == {("a", 1), ("b", 2), ("c", 1)}


def test_validators(spark):
    df = spark.createDataFrame(
        [(["x"], "ocean land", "v20190306"), (["x", "y"], "ocean", "20190306")],
        "arr array<string>, realm string, version string",
    )
    out = df.select(
        only_item(F.col("arr")).alias("scalar"),
        split_field(F.col("realm")).alias("realms"),
        valid_version(F.col("version")).alias("ok"),
    ).collect()
    assert out[0]["scalar"] == "x" and out[1]["scalar"] is None
    assert list(out[0]["realms"]) == ["ocean", "land"]
    assert out[0]["ok"] is True and out[1]["ok"] is False


def test_prefix_properties(spark):
    df = spark.createDataFrame([(1, "a", "b")], "x int, activity_id string, start_datetime string")
    out = prefix_properties(df, "cmip6", ["activity_id", "start_datetime"])
    assert "cmip6:activity_id" in out.columns
    assert "start_datetime" in out.columns  # datetime-containing names not prefixed


def test_cf_parameters(spark):
    df = spark.createDataFrame(
        [([("air_temperature", "K"), ("", "m"), (None, "s")],)],
        "vars array<struct<standard_name string, units string>>",
    )
    out = df.select(cf_parameters(F.col("vars")).alias("params")).collect()[0]["params"]
    assert [(p["name"], p["unit"]) for p in out] == [("air_temperature", "K")]


def test_assets_and_service_filter(spark):
    df = spark.createDataFrame(
        [({"HTTPServer": "http://x/fileServer/a.nc", "WMS": "http://x/wms", "Mystery": "http://m"},)],
        "access_urls map<string,string>",
    )
    assets = df.select(assets_from_access_urls(F.col("access_urls")).alias("assets"))
    row = assets.collect()[0]["assets"]
    assert row["HTTPServer"]["type"] == "application/x-netcdf"
    assert list(row["WMS"]["roles"]) == ["visual"]
    assert row["Mystery"]["type"] is None and list(row["Mystery"]["roles"]) == ["data"]

    urls = df.select(wxs_get_capabilities(F.col("access_urls")).alias("u")).collect()[0]["u"]
    assert urls["WMS"].endswith("?request=GetCapabilities")
    assert urls["HTTPServer"] == "http://x/fileServer/a.nc"

    filt = df.select(
        filter_assets_by_service(F.col("access_urls"), ["HTTPServer", "wms_service"]).alias("a")
    ).collect()[0]["a"]
    assert set(filt) == {"HTTPServer", "WMS"}


def test_magpie_source_link(spark):
    df = spark.createDataFrame([("https://h/twitcher/fileServer/birdhouse/f.nc",), ("https://h/x.nc",)], "url string")
    out = df.select(magpie_source_link(F.col("url")).alias("l")).collect()
    assert out[0]["l"]["title"] == "birdhouse/f.nc"
    assert out[0]["l"]["rel"] == "source"
    assert out[1]["l"]["title"] is None


def test_stac_collection_json(spark):
    from stac_populator_spark.operators.collection_agg import (
        collection_extent,
        collection_summaries,
    )
    from stac_populator_spark.operators.stac_collection import stac_collection_json

    items = spark.createDataFrame(
        [
            ("c1", -10.0, -20.0, 10.0, 30.0, None, dt.datetime(2020,1,1), dt.datetime(2021,1,1), {"ducks": "Rouen", "n": "3"}),
            ("c1", -11.0, 2.0, 9.0, 50.0, None, dt.datetime(2019,1,1), dt.datetime(2022,1,1), {"ducks": "Alabio", "n": "10"}),
        ],
        "collection_id string, lon_min double, lat_min double, lon_max double, "
        "lat_max double, datetime timestamp, start_datetime timestamp, "
        "end_datetime timestamp, props map<string,string>",
    )
    config = spark.createDataFrame(
        [("c1", "Title 1", "CC-BY-4.0", ["kw"])],
        "collection_id string, title string, license string, keywords array<string>",
    )
    ext = collection_extent(items)
    summ = collection_summaries(items)
    out = stac_collection_json(ext, config, summ).collect()[0]
    doc = json.loads(out["stac_collection_json"])
    assert doc["type"] == "Collection" and doc["id"] == "c1"
    assert doc["extent"]["spatial"]["bbox"] == [[-11.0, -20.0, 10.0, 50.0]]
    assert doc["extent"]["temporal"]["interval"][0][0] == "2019-01-01T00:00:00Z"
    assert doc["license"] == "CC-BY-4.0"
    assert doc["summaries"]["ducks"] == ["Alabio", "Rouen"]
    assert doc["summaries"]["n"] == {"minimum": "3.0", "maximum": "10.0"}


def test_merge_upsert_bucketed_touches_only_affected_buckets(spark, tmp_path):
    import os

    from stac_populator_spark.sources.merge import merge_upsert_bucketed

    tbl = str(tmp_path / "bucketed_tbl")
    base = pd.DataFrame({"id": [f"k{i}" for i in range(2000)], "v": list(range(2000))})
    merge_upsert_bucketed(spark, tbl, spark.createDataFrame(base), key="id", n_buckets=16)

    def files_by_bucket():
        out = {}
        for d in os.listdir(tbl):
            if d.startswith("bucket="):
                out[d] = sorted(f for f in os.listdir(os.path.join(tbl, d)) if f.endswith(".parquet"))
        return out

    before = files_by_bucket()
    assert len(before) > 8  # most buckets populated

    # update 3 keys + insert 2 new ones — touches at most 5 buckets
    upd = pd.DataFrame({"id": ["k1", "k2", "k3", "new1", "new2"], "v": [-1, -2, -3, 9001, 9002]})
    got = merge_upsert_bucketed(spark, tbl, spark.createDataFrame(upd), key="id", n_buckets=16)

    after = files_by_bucket()
    untouched = [d for d in before if before[d] == after.get(d)]
    assert len(before) - len(untouched) <= 5  # only affected buckets rewritten
    assert len(untouched) >= len(before) - 5

    rows = {r["id"]: r["v"] for r in got.collect()}
    assert len(rows) == 2002
    assert rows["k1"] == -1 and rows["new2"] == 9002 and rows["k100"] == 100

    # idempotent: replaying the same batch leaves the table identical
    again = merge_upsert_bucketed(spark, tbl, spark.createDataFrame(upd), key="id", n_buckets=16)
    rows2 = {r["id"]: r["v"] for r in again.collect()}
    assert rows2 == rows


def test_onepass_byte_parity_with_low_codepoint_keys(spark):
    # ADVICE r3: _summaries_json orders by the RENDERED '"name":' pair
    # string; a key containing '!' or ' ' (both < '"' 0x22) sorts
    # differently under plain name order. The one-pass path must match the
    # two-pass path byte-for-byte even for such keys.
    import pandas as pd

    from stac_populator_spark.operators.collection_agg import collection_extent_summaries
    from stac_populator_spark.operators.stac_collection import (
        stac_collection_json,
        stac_collection_json_onepass,
    )

    # 'a!x' vs 'aa': rendered '"a!x":' < '"aa":' but plain 'a!x' > 'aa'
    keys = ["a!x", "aa", "b key", "bz"]
    items = spark.createDataFrame(
        pd.DataFrame(
            {
                "collection_id": ["c1"] * 3,
                "lon_min": [0.0, 1.0, 2.0], "lat_min": [0.0, 1.0, 2.0],
                "lon_max": [3.0, 4.0, 5.0], "lat_max": [3.0, 4.0, 5.0],
                "datetime": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-03"]),
                "props": [
                    {"a!x": "1", "aa": "x", "b key": "2000-01-01T00:00:00Z", "bz": "7"},
                    {"a!x": "2", "aa": "y", "b key": "2001-01-01T00:00:00Z", "bz": "8"},
                    {"a!x": "3", "aa": "x", "b key": "2002-01-01T00:00:00Z", "bz": "9"},
                ],
            }
        )
    )
    one = stac_collection_json_onepass(items, keys).select(
        "collection_id", "stac_collection_json"
    ).collect()[0]
    ext, summ = collection_extent_summaries(items, keys)
    two = stac_collection_json(ext, None, summ).select(
        "collection_id", "stac_collection_json"
    ).collect()[0]
    assert one["stac_collection_json"] == two["stac_collection_json"]
