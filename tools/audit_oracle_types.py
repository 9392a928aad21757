"""Oracle type-surface audit (VERDICT r3 "what's wrong" #1, made a
permanent regression gate): every oracle_sql() entry is planned in DuckDB
and its OUTPUT column types checked against the allow-list that survives
pandas materialization with stable lexical form. HUGEINT (any uncast
integer SUM), DECIMAL, unsigned and interval types all surface as
different lexical values than Spark's (e.g. ``61699.0`` vs ``61699``) and
break the driver's value hash even when the numbers agree.

Runs in seconds (no Spark — DuckDB plans only):

    python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE"}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception as e:  # noqa: BLE001 - report, don't mask
            bad.append((name, f"plan error: {type(e).__name__}: {e}"))
            continue
        flagged = {
            c: str(t)
            for c, t in zip(rel.columns, rel.types)
            if str(t) not in ALLOWED and not str(t).startswith("TIMESTAMP")
        }
        if flagged:
            bad.append((name, f"disallowed output types {flagged} — CAST in the oracle"))

    for name, msg in bad:
        print(f"FLAG {name}: {msg}")
    print(f"{len(bad)} flagged / {len(entry_mod.oracle_sql())} oracles")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
