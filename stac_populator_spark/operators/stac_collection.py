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


def stac_collection_json_onepass(
    items: DataFrame,
    prop_keys: list[str] | tuple,
    collection_col: str = "collection_id",
    props_col: str = "props",
    exclude: tuple = (),
) -> DataFrame:
    """The whole collection document — extent (A1+A2), typed summaries
    (A3), and JSON assembly — from ONE aggregation pass over the items:
    scan → (broadcast joins upstream) → one HashAggregate pair → one
    projection. No explode, no re-join, no second scan: the per-property
    summary JSON is concatenated inline because the key list is static
    (config-enumerated, like the reference's collection YAML summaries).
    Byte-identical output to ``stac_collection_json(extent, None,
    summaries)`` over ``collection_extent_summaries`` of the same input.
    """
    from .collection_agg import _ISO_RE, _NUM_RE, extent_select, extent_summaries_agg  # noqa: F401

    agg, keys = extent_summaries_agg(items, prop_keys, collection_col, props_col, exclude)
    ext = extent_select(agg, keep_stats=True)  # same single groupBy

    pairs = []
    # _summaries_json array_sorts the RENDERED '"name":' pair strings, so
    # order by that same rendered key — for names containing chars below
    # '"' (0x22, e.g. '!' or space) plain name order diverges (ADVICE r3)
    for k in sorted(keys, key=lambda k: f'"{k}":'):
        i = list(keys).index(k)
        all_num, all_iso = F.col(f"_s{i}_num"), F.col(f"_s{i}_iso")
        entry = F.when(
            (all_num == 1) | (all_iso == 1),
            F.to_json(
                F.struct(
                    F.when(all_num == 1, F.col(f"_s{i}_nmin").cast("string"))
                    .when(all_iso == 1, F.col(f"_s{i}_smin"))
                    .alias("minimum"),
                    F.when(all_num == 1, F.col(f"_s{i}_nmax").cast("string"))
                    .when(all_iso == 1, F.col(f"_s{i}_smax"))
                    .alias("maximum"),
                )
            ),
        ).otherwise(F.to_json(F.col(f"_s{i}_vals")))
        pairs.append(
            F.when(
                F.size(F.col(f"_s{i}_vals")) > 0,
                F.concat(F.lit(f'"{k}":'), entry),
            )
        )
    joined = F.concat_ws(",", F.array(*pairs))  # concat_ws drops null pairs
    summaries_json = F.when(F.length(joined) > 0, F.concat(F.lit("{"), joined, F.lit("}")))

    out = ext.withColumn("_base", _base_json(ext.columns)).withColumn(
        "summaries_json", summaries_json
    )
    spliced = F.when(
        F.col("summaries_json").isNotNull(),
        F.concat(
            F.expr("substring(_base, 1, length(_base) - 1)"),
            F.lit(',"summaries":'),
            F.col("summaries_json"),
            F.lit("}"),
        ),
    ).otherwise(F.col("_base"))
    import re

    stat_cols = [c for c in ext.columns if re.match(r"_s\d+_", c)]
    return (
        out.withColumn("stac_collection_json", spliced)
        .drop("_base", "summaries_json", *stat_cols)
    )


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


def _base_json(columns) -> F.Column:
    """The base collection document as a ``to_json`` expression over the
    extent columns (+ optional title/license/keywords config columns)."""
    cols = set(columns)
    title = F.col("title") if "title" in cols else F.col("collection_id")
    license_ = F.col("license") if "license" in cols else F.lit("proprietary")
    keywords = F.col("keywords") if "keywords" in cols else F.array().cast("array<string>")

    iso = lambda c: F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return F.to_json(
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
    out = df.withColumn("_base", _base_json(df.columns))
    if summaries is not None:
        sj = _summaries_json(summaries)
        # summaries_json is collection-grain (one row per collection) —
        # always broadcastable, keeps the extents side exchange-free
        out = out.join(F.broadcast(sj), "collection_id", "left")
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
