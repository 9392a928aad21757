"""Scaling-efficiency evidence (north_rule: ≥0.8 from N to 4N executors).

Runs the identical pages-pipeline job at local[8] and local[32] on the same
deterministic input and reports throughput at both plus efficiency
eff = (T_8 / T_32) * (8 / 32)  — 1.0 means perfect 4× speedup.

Each measurement runs in its own subprocess (a JVM can't change master
in-place); results are appended to BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from stac_populator_spark.session import get_spark
from stac_populator_spark.datagen import footprints_pdf, pages_df
from stac_populator_spark.operators.spatial_join import footprint_cover_df
from stac_populator_spark.plans.pipeline import build_items

cpus = {cpus}
n = {n_pages}
spark = get_spark(app_name=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus * 2)
pages_path = f"/tmp/spark_graft_bench_pages_{{n}}.parquet"
if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
    # identical deterministic input for every parallelism level (untimed)
    pages_df(spark, n, partitions=64).write.mode("overwrite").parquet(pages_path)
cover = footprint_cover_df(spark, footprints_pdf())
pages = spark.read.parquet(pages_path)
# warmup (JIT + python-worker spawn + arrow init): one full pass untimed
build_items(pages, cover).write.format("noop").mode("overwrite").save()
walls = []
for _ in range(3):
    t0 = time.time()
    build_items(pages, cover).write.format("noop").mode("overwrite").save()
    walls.append(time.time() - t0)
wall = min(walls)  # min-of-3: scheduling noise is strictly additive
print(json.dumps({{"cpus": cpus, "n_pages": n, "wall_sec": round(wall, 3),
                   "walls": [round(w, 3) for w in walls],
                   "pages_per_sec": round(n / wall, 1)}}))
"""


def run(cpus: int, n_pages: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, n_pages=n_pages)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * lo
    r_lo = run(lo, n_pages)
    r_hi = run(hi, n_pages)
    eff = (r_lo["wall_sec"] / r_hi["wall_sec"]) * (lo / hi)
    result = {
        "n_pages": n_pages,
        f"local[{lo}]": r_lo,
        f"local[{hi}]": r_hi,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=1))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%SZ", time.gmtime())
    with open(path, "a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"Identical pages-pipeline job (extract → cells → broadcast PIP "
            f"join → tiles → STAC JSON) on {n_pages} deterministic synthetic "
            f"pages, measured after a warmup pass.\n\n"
            f"| parallelism | wall (s) | pages/sec |\n|---|---|---|\n"
            f"| local[{lo}] | {r_lo['wall_sec']} | {r_lo['pages_per_sec']} |\n"
            f"| local[{hi}] | {r_hi['wall_sec']} | {r_hi['pages_per_sec']} |\n\n"
            f"Scaling efficiency (T{lo}/T{hi})·({lo}/{hi}) = **{eff:.3f}** "
            f"(north_rule target ≥ 0.8; note local-mode cores share one JVM "
            f"heap + memory bandwidth, so this is a conservative lower "
            f"bound on multi-executor scaling).\n"
        )


if __name__ == "__main__":
    main()
