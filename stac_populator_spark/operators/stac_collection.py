"""STAC Collection document assembly: config + aggregated extent +
summaries → one JSON document per collection (the reference's
create_stac_collection + update_collection fold, /root/reference/
STACpopulator/populators.py:156-200 + collection_update.py:142-167).

Input: the ``collection_extent`` aggregate joined with the footprints/
config dimension and (optionally) pivoted ``collection_summaries`` rows.
Output column ``stac_collection_json`` — built with JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAC_VERSION = "1.0.0"


def _summaries_json(summaries: DataFrame) -> DataFrame:
    """summaries rows (collection_id, prop, kind, values, minimum, maximum)
    → (collection_id, summaries_json) with {prop: [..] | {minimum,maximum}}
    per property, properties sorted for determinism."""
    entry = F.when(
        F.col("kind") == "list",
        F.to_json(F.col("values")),
    ).otherwise(
        F.to_json(F.struct(F.col("minimum").alias("minimum"), F.col("maximum").alias("maximum")))
    )
    kv = summaries.select(
        "collection_id",
        F.concat(F.lit('"'), F.col("prop"), F.lit('":'), entry).alias("pair"),
    )
    agg = kv.groupBy("collection_id").agg(
        F.concat(F.lit("{"), F.array_join(F.array_sort(F.collect_list("pair")), ","), F.lit("}")).alias(
            "summaries_json"
        )
    )
    return agg


def stac_collection_json(
    extents: DataFrame,
    config: DataFrame | None = None,
    summaries: DataFrame | None = None,
) -> DataFrame:
    """extents (collection_extent output) [+ config(collection_id, title,
    license, keywords)] [+ summaries rows] → stac_collection_json column.

    Required config keys mirror the reference's validation
    (populators.py:118-123): title/id/description/keywords/license.
    """
    df = extents
    if config is not None:
        df = df.join(F.broadcast(config), "collection_id", "left")
    cols = set(df.columns)
    title = F.col("title") if "title" in cols else F.col("collection_id")
    license_ = F.col("license") if "license" in cols else F.lit("proprietary")
    keywords = F.col("keywords") if "keywords" in cols else F.array().cast("array<string>")

    iso = lambda c: F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    base = F.to_json(
        F.struct(
            F.lit("Collection").alias("type"),
            F.lit(STAC_VERSION).alias("stac_version"),
            F.col("collection_id").alias("id"),
            title.alias("title"),
            F.concat(F.lit("Collection "), F.col("collection_id")).alias("description"),
            license_.alias("license"),
            keywords.alias("keywords"),
            F.struct(
                F.struct(F.array(F.col("bbox")).alias("bbox")).alias("spatial"),
                F.struct(
                    F.array(F.array(iso(F.col("interval_start")), iso(F.col("interval_end")))).alias(
                        "interval"
                    )
                ).alias("temporal"),
            ).alias("extent"),
            F.col("item_count").alias("custom:item_count"),
        )
    )
    out = df.withColumn("_base", base)
    if summaries is not None:
        sj = _summaries_json(summaries)
        out = out.join(sj, "collection_id", "left")
        spliced = F.when(
            F.col("summaries_json").isNotNull(),
            F.concat(
                F.expr("substring(_base, 1, length(_base) - 1)"),
                F.lit(',"summaries":'),
                F.col("summaries_json"),
                F.lit("}"),
            ),
        ).otherwise(F.col("_base"))
        out = out.withColumn("stac_collection_json", spliced).drop("summaries_json")
    else:
        out = out.withColumn("stac_collection_json", F.col("_base"))
    return out.drop("_base")
