"""Regenerate PLANS.md: formatted physical plans of the engine's key
operators with scale commentary. Run: python tools/dump_plans.py"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main():
    from pyspark.sql import functions as F

    from stac_populator_spark.datagen import footprints_pdf, pages_df
    from stac_populator_spark.operators.cells import encode_cells
    from stac_populator_spark.operators.collection_agg import collection_extent
    from stac_populator_spark.operators.dedup import minhash_signatures
    from stac_populator_spark.operators.extract import extract_items
    from stac_populator_spark.operators.knn import knn_join
    from stac_populator_spark.operators.spatial_join import footprint_cover_df, pip_join
    from stac_populator_spark.plans.pipeline import build_items
    from stac_populator_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[4]", shuffle_partitions=4)
    tmp = "/tmp/plans_pages.parquet"
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        pages_df(spark, 1000, partitions=2).write.mode("overwrite").parquet(tmp)
    pages = spark.read.parquet(tmp)
    cover = footprint_cover_df(spark, footprints_pdf())

    sections = []

    items = encode_cells(extract_items(pages)).filter(F.col("lon").isNotNull())
    sections.append((
        "Broadcast PIP join (J5)",
        "The fact side never exchanges: scan → mapInArrow extract → Arrow "
        "cell UDFs → BroadcastHashJoin against the footprint cover → JVM "
        "between-filter. The only exchange in the plan is the broadcast of "
        "the tiny cover table. At 100 TB this means zero shuffle of page "
        "data for the spatial join.",
        plan_of(pip_join(items, cover)),
    ))

    sections.append((
        "Collection extent aggregation (A1/A2)",
        "Exactly one hash exchange in the whole flagship pipeline — the "
        "groupBy(collection_id) — and it is preceded by a map-side partial "
        "HashAggregate, so the exchange carries one pre-aggregated row per "
        "(task, collection), not per item.",
        plan_of(collection_extent(build_items(pages, cover))),
    ))

    sections.append((
        "kNN candidate join (J6)",
        "Both sides are the (small-after-projection) points relation; the "
        "k-ring explode is narrow; the equi-join on cell shuffles only "
        "(id, lon, lat, cell) tuples — never page payloads. The window "
        "top-k runs on the same partitioning.",
        plan_of(knn_join(items.limit(500), k=3, res=4)),
    ))

    sections.append((
        "MinHash signatures (dedup)",
        "Shingle explode is narrow; all 64 min() aggregations combine "
        "map-side (partial HashAggregate before the exchange), so the "
        "shuffle carries one 64-long row per document regardless of "
        "document length.",
        plan_of(minhash_signatures(pages.select(F.col("url").alias("doc_id"), "text"))),
    ))

    out = ["# PLANS — key physical plans (regenerate: python tools/dump_plans.py)\n"]
    for title, note, plan in sections:
        out.append(f"## {title}\n\n{note}\n\n```\n{plan}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
