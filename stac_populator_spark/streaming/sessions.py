"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the Structured-Streaming analogue of the batch
sessionize window in __spark_entry__; driver brief: "applyInPandasWithState
for custom stateful operators").

State per user: (session_start_us, last_ts_us, n_events, sum_value).
A session CLOSES when a later event arrives more than ``gap_s`` after the
previous one — the closed session is emitted and the new event starts the
next session. Open sessions stay in state across micro-batches (exactly
the semantics a kill/resume must preserve — state lives in the streaming
checkpoint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _session_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64")  # ns → we convert below
        ts_us = (ts_us // 1000).to_numpy()
        vals = rows["value"].to_numpy()

        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us, last_us, n, total = None, None, 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals):
            if last_us is not None and t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, total))
                start_us, n, total = t, 0, 0.0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
            total += float(v)

        state.update((int(start_us), int(last_us), int(n), float(total)))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return fn


def sessionize_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1800,
):
    """events stream (event_id, ts, user_id, value) → closed sessions
    parquet sink (append mode, exactly-once via checkpoint)."""
    sessions = events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
