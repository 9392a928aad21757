"""Generate a FULL sf1-equivalent dataset for optimization measurement:
every bench table at 10x sf0.1 scale.

The driver generates its own sf1.0 for round-end measurement; this local
stand-in replicates /root/testdata/sf0.1 fact tables 10x with key offsets
that preserve referential integrity (orderkeys/custkeys/partkeys/suppkeys
shift together per replica; nation/region stay fixed), and generates
documents/embeddings with tools/gen_sf1.py's exact distribution shape
(50k docs / 20k vectors, same seeds/plants). Values differ from the
driver's sf1.0, but cardinalities, join fan-outs and per-row work match —
which is what timing needs. Deterministic, pure pyarrow, no Spark.

    python tools/gen_sf1_full.py [out_dir]   # default /root/repo/benchdata/sf1.0
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_sf1 import gen_documents, gen_embeddings  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# per-replica key offsets: one per key family, > max key in sf0.1
OFFSETS = {
    "orderkey": 1_000_000,
    "custkey": 100_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "event_id": 1_000_000,
    "user_id": 1_000_000,
}

# table -> {column: key family}; replicated columns get i*offset added
FACTS = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}
DIMS = ("nation", "region")


def replicate(table: pa.Table, keymap: dict[str, str], n: int) -> pa.Table:
    parts = []
    for i in range(n):
        cols = []
        for name in table.column_names:
            col = table.column(name)
            if name in keymap and i > 0:
                col = pc.add(col, pa.scalar(i * OFFSETS[keymap[name]], type=col.type))
            cols.append(col)
        parts.append(pa.table(dict(zip(table.column_names, cols))))
    return pa.concat_tables(parts)


def main(out_dir: str = "/root/repo/benchdata/sf1.0"):
    os.makedirs(out_dir, exist_ok=True)
    for name, keymap in FACTS.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(replicate(t, keymap, REPLICAS), os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {t.num_rows * REPLICAS}")
    for name in DIMS:
        shutil.copy(os.path.join(SRC, f"{name}.parquet"), os.path.join(out_dir, f"{name}.parquet"))
    pq.write_table(gen_documents(50_000), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(gen_embeddings(20_000), os.path.join(out_dir, "embeddings.parquet"))
    open(os.path.join(out_dir, "_DONE"), "w").close()
    print(f"full sf1 stand-in at {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
