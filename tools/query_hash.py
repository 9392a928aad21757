"""Run queries() entries in a fresh local[N] session and print one JSON
line per query: {query, rows, sec, hash} with an order-insensitive value
hash (sorted rows, floats rounded to 6dp) — the cross-parallelism
self-consistency probe for queries whose DuckDB oracle is O(n²)-bound at
sf1 (VERDICT r2 ask #6).

    python tools/query_hash.py <sf_dir> <cores> <query> [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def main():
    sf_dir, cores = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]

    import __spark_entry__ as E
    from stac_populator_spark.session import get_spark

    spark = get_spark(
        app_name=f"qhash{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    qs = E.queries()
    for name in names:
        t0 = time.time()
        pdf = qs[name](spark, sf_dir).toPandas()
        sec = time.time() - t0
        print(
            json.dumps(
                {
                    "query": name,
                    "rows": len(pdf),
                    "sec": round(sec, 2),
                    "hash": value_hash(pdf),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
