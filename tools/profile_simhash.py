"""Stage-level profile of the simhash_pairs bench query: where do the
seconds go — signature computation (md5 packing + SWAR majority) or the
banded candidate join? Min-of-N through the noop sink, same methodology
as bench.py.

    python tools/profile_simhash.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def timed(name, df, runs=RUNS):
    df.write.format("noop").mode("overwrite").save()  # warm
    walls = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    print(f"{name:32s} min={min(walls):6.2f}s  runs={[round(w, 2) for w in walls]}",
          flush=True)
    return min(walls)


def main():
    from stac_populator_spark.session import get_spark
    from stac_populator_spark.operators.dedup import (
        simhash_candidates, simhash_signature, simhash_signature_md5,
    )

    spark = get_spark(app_name="profile_simhash", master="local[32]",
                      shuffle_partitions=64)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    sig_md5 = simhash_signature_md5(docs)
    sig_xx = simhash_signature(docs)
    timed("signature_md5 (bench path)", sig_md5)
    timed("signature_xxhash64", sig_xx)
    # pin signatures so the banding timing excludes signature cost
    pinned = sig_md5.localCheckpoint(eager=True)
    timed("banding only (pinned sigs)", simhash_candidates(pinned, max_hamming=3))
    timed("full simhash_pairs", simhash_candidates(sig_md5, max_hamming=3))


if __name__ == "__main__":
    main()
