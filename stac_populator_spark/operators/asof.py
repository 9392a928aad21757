"""As-of join — for each left row, the latest right row of the same key
at-or-before the left row's time (the driver brief's canonical "operator
Spark lacks": there is no built-in ASOF JOIN in Spark SQL).

Scalable formulation: a naive `l JOIN r ON key AND r.ts <= l.ts` +
row_number is a RANGE join — every left row duplicates against its whole
right history (quadratic per key). Instead both sides are UNIONED with a
side tag, sorted once by (key, ts, tag) inside one shuffle, and the right
payload is carried forward with last(ignoreNulls) over an unbounded-
preceding frame — one exchange, linear work per partition, identical to
how time-series stores implement merge-as-of. Right rows sort BEFORE left
rows at equal timestamps, so the match is inclusive (ts_right == ts_left
matches), mirroring DuckDB's ASOF `>=` semantics which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Every `left` row + the latest `right` payload with
    right_ts <= left_ts for the same key (nulls when no prior right row).

    `right` should be pre-deduplicated to one row per (key, right_ts) —
    pass it through a max-by if not; duplicate timestamps would make "the"
    as-of row ambiguous in ANY engine.

    `right_payload` names must not collide with left columns (the output
    would otherwise silently lose the left column) — rename on the right
    side first; the result carries the payload as `asof_<name>` anyway.
    """
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_payload columns collide with left columns: {sorted(collisions)}; "
            "rename the right side before asof_join"
        )
    l = left.withColumn("_tag", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r_cols = [key, right_ts] + [c for c in right_payload if c not in (key, right_ts)]
    r = (
        # a null right timestamp can never satisfy right_ts <= left_ts,
        # but under asc null-ordering it would sort FIRST and its payload
        # would carry forward to every left row — drop such rows up front
        right.filter(F.col(right_ts).isNotNull())
        .select(*r_cols)
        .withColumn("_tag", F.lit(0))
        .withColumn("_ats", F.col(right_ts))
    )
    payload_struct = F.when(
        F.col("_tag") == 0, F.struct(*[F.col(c) for c in right_payload])
    )
    u = l.unionByName(r, allowMissingColumns=True).withColumn("_p", payload_struct)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_last", F.last("_p", ignorenulls=True).over(w))
    out = carried.filter(F.col("_tag") == 1).drop("_tag", "_ats", "_p")
    if right_ts not in left.columns and right_ts not in right_payload:
        out = out.drop(right_ts)  # right-only column: all-null on left rows
    for c in right_payload:
        out = out.withColumn(f"asof_{c}", F.col("_last")[c]).drop(c)
    return out.drop("_last")
