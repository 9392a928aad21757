"""Polar ring-path probe for the sf1 stress gate (VERDICT r3 item 5):
run knn_join_exact over the doc points with stats and print ONE JSON line
{polar_cap, polar_proven, brute, n_points, rows}. The polar cap
(|lat| >= 80 on the deterministic doc-point grid) must resolve via the
pole-rotated ring pass, not the brute remnant.

    python tools/knn_polar_stats.py <sf_dir> [cores]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cores))
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from stac_populator_spark.operators.knn import knn_join_exact
    from stac_populator_spark.session import get_spark

    spark = get_spark(app_name="knn-polar-stats")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = (
        entry_mod._doc_points(docs)
        .filter(F.col("doc_id") % 7 == 0)
        .withColumnRenamed("doc_id", "id")
    )
    n_points = pts.count()
    # brute_budget=0 forces the at-scale regime (cap x total always over
    # budget) so the gate probes the polar ring MACHINERY; results are
    # exact on every path, so hashes are unchanged either way
    out, stats = knn_join_exact(pts, k=3, res=None, radius=1,
                                return_stats=True, brute_budget=0)
    stats.update({"n_points": n_points, "rows": out.count()})
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
