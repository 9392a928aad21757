"""STAC-Item JSON emission — JVM-side (whole-stage codegen), no Python.

Mirrors the reference's item serialization contract
(/root/reference/STACpopulator/extensions/base.py:159-230 and golden file
tests/data/stac_item_testdata_xclim_cmip6_ncml.json):

- ``properties.datetime`` null ⇔ start/end present (populators.py:169-172).
  Deliberate serialization deviation: Spark's ``to_json`` drops null
  fields, so a null datetime is represented by the KEY'S ABSENCE rather
  than an explicit ``"datetime": null`` (strict STAC spells the null out;
  consumers reading via ``.get("datetime")`` see identical semantics, and
  the DuckDB oracle mirrors the key-absent form byte-exactly)
- extension properties prefixed ``<prefix>:<field>`` except names containing
  'datetime' (extensions/base.py:100-105)
- assets keyed by service type with href/type/roles
  (extensions/thredds.py:135-172)
- geometry Polygon or antimeridian-split MultiPolygon (stac_utils.py:230-251)

The geometry column is already a GeoJSON string (built by the extract
kernel), so the full item JSON is assembled by splicing it into
``to_json(struct(...))`` output — pure string expressions, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAC_VERSION = "1.0.0"
PREFIX = "page"  # extension prefix for web-page-derived properties


def stac_item_json(items: DataFrame, collection_col: str | None = "collection_id") -> DataFrame:
    """Append ``stac_json``: one STAC-valid Feature document per item."""
    props = F.struct(
        F.date_format(F.col("datetime"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("datetime"),
        F.col("title").alias(f"{PREFIX}:title"),
        F.col("lang").alias(f"{PREFIX}:language"),
        F.col("n_chars").alias(f"{PREFIX}:n_chars"),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(f"{PREFIX}:crawl_ts"),
    )
    assets = F.create_map(
        F.lit("source"),
        F.struct(
            F.col("url").alias("href"),
            F.lit("text/html").alias("type"),
            F.array(F.lit("data")).alias("roles"),
        ),
    )
    fields = [
        F.lit("Feature").alias("type"),
        F.lit(STAC_VERSION).alias("stac_version"),
        F.col("id").alias("id"),
        F.col("bbox").alias("bbox"),
        props.alias("properties"),
        assets.alias("assets"),
    ]
    if collection_col and collection_col in items.columns:
        fields.insert(3, F.col(collection_col).alias("collection"))
    base = F.to_json(F.struct(*fields))
    # splice the pre-rendered geometry JSON (string) into the document —
    # to_json cannot emit a union type (Polygon | MultiPolygon) directly
    spliced = F.concat(
        F.expr("substring(base_json, 1, length(base_json) - 1)"),
        F.lit(',"geometry":'),
        F.coalesce(F.col("geometry"), F.lit("null")),
        F.lit("}"),
    )
    return (
        items.withColumn("base_json", base)
        .withColumn("stac_json", spliced)
        .drop("base_json")
    )
