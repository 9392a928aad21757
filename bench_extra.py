"""Extra benchmarks for optimization work (bench.py is FROZEN for
measurement — this file carries the per-query isolation runs, guide §1.4).

Usage:
    python bench_extra.py [query ...]            # time listed queries (default: headline)
    python bench_extra.py --explain [query ...]  # also dump explain("formatted") to plans/r06/
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_BENCH_RUNS=3 python bench_extra.py ...

Prints one JSON line {"queries": {...}, "sf": ..., "runs": {...}} using the
same noop-sink methodology as bench.py (min of N, per-run walls kept).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
PLAN_DIR = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r06")
PLAN_SUFFIX = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")

HEADLINE = [
    "q1_pricing_summary", "q3_topk_revenue", "q5_nation_revenue", "events_daily",
    "doc_points_tiles", "pip_points", "collection_extent", "dedup_exact",
    "token_stats", "ann_cosine", "ivf_cosine", "top_terms", "sessionize",
    "lineitem_rollup", "minhash_neardup", "simhash_pairs", "stac_flagship",
    "knn_exact_docs", "stac_valid_split", "stac_schema_split", "pii_redact",
    "decontaminate", "pq_cosine", "ivfpq_cosine", "stac_collections",
    "q9_profit_by_nation", "training_prep",
]


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main():
    from stac_populator_spark.session import get_spark
    import __spark_entry__ as E

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv or "--plans-only" in sys.argv
    plans_only = "--plans-only" in sys.argv
    names = args or HEADLINE

    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS * 2)
    qs = E.queries()
    if not plans_only:
        # warmup (JVM/codegen)
        spark.sparkContext.setJobDescription("warmup")
        materialize(qs["q1_pricing_summary"](spark, SF_DIR))

    timings, all_runs = {}, {}
    for name in names:
        if explain:
            os.makedirs(PLAN_DIR, exist_ok=True)
            with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_SUFFIX}.txt"), "w") as f:
                f.write(plan_of(qs[name](spark, SF_DIR)) + "\n")
        if plans_only:
            print(f"# {name}: plan written", file=sys.stderr)
            continue
        walls = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            materialize(qs[name](spark, SF_DIR))
            walls.append(round(time.time() - t0, 3))
        timings[name] = min(walls)
        all_runs[name] = walls
        print(f"# {name}: {min(walls)} {walls}", file=sys.stderr)

    print(json.dumps({
        "queries": timings,
        "total": round(sum(timings.values()), 3),
        "sf": SF_DIR,
        "runs": all_runs,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
