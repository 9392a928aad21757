"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column set, and order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...] [--tolerant]

Default comparison is DRIVER-STRICT: every cell is canonicalized to its
lexical string form (repr for floats, str for ints) with NO dtype coercion
and NO rounding, so an int64 Spark column vs a HUGEINT->float64 DuckDB
column ("61699" vs "61699.0") FAILS here exactly as it fails the driver's
value hash (the round-3 `domain_stats` class of bug). Pass --tolerant for
the old coerced comparison when debugging genuine float drift.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon_cell(v):
    """Lexical canonical form mirroring the driver's value hash: floats via
    repr (so 61699.0 != 61699), NaN/None unified, everything else str."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:  # NaN
            return "∅"
        return repr(v)
    if isinstance(v, (np.floating,)):
        fv = float(v)
        return "∅" if fv != fv else repr(fv)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    return str(v)


def norm(df: pd.DataFrame, tolerant: bool = False) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if not tolerant:
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype(str)
            df[c] = df[c].map(_canon_cell)
        return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def main():
    args = [a for a in sys.argv[1:] if a != "--tolerant"]
    tolerant = "--tolerant" in sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(a for a in args if not os.path.isdir(a))

    import __spark_entry__ as entry_mod
    from stac_populator_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        s, o = norm(sdf, tolerant), norm(odf, tolerant)
        status = []
        if len(s) != len(o):
            status.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            status.append(f"columns {list(s.columns)} vs {list(o.columns)}")
        if not status:
            if tolerant:
                try:
                    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
                except AssertionError as e:
                    status.append("values differ: " + str(e).split("\n")[-2][:200])
            else:
                if not s.equals(o):
                    neq = (s != o).any(axis=1)
                    idx = list(s.index[neq])[:3]
                    detail = "; ".join(
                        f"row{i}: " + " | ".join(
                            f"{c}={s.at[i, c]!r}!={o.at[i, c]!r}"
                            for c in s.columns if s.at[i, c] != o.at[i, c]
                        )[:160]
                        for i in idx
                    )
                    status.append(f"strict values differ: {detail}")
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status)} [{time.time()-t0:.1f}s]")
            if len(s) and len(o) and list(s.columns) == list(o.columns):
                merged = s.merge(o, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
        else:
            print(f"OK    {name}: {len(s)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
