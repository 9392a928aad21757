"""Stateful streaming sessionization: closed sessions emitted across
micro-batch/restart boundaries; state survives in the checkpoint."""

import datetime as dt
import os

import pandas as pd
import pytest

from stac_populator_spark.streaming.sessions import sessionize_stream


def _write_events(spark, d, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d)


def _stream(spark, src):
    return (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_sessions_close_across_batches(spark, tmp_path):
    src, out, cp = (str(tmp_path / p) for p in ("src", "out", "cp"))
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)

    # batch 1: user 1 has a session of 3 events, then a >gap jump → the
    # first session closes inside the same batch; user 2 stays open
    _write_events(
        spark,
        src,
        [
            (1, s(0), 1, 1.0),
            (2, s(60), 1, 2.0),
            (3, s(120), 1, 3.0),
            (4, s(4000), 1, 4.0),   # closes session A (gap 1800s)
            (5, s(0), 2, 5.0),
        ],
    )
    q = sessionize_stream(_stream(spark, src), out, cp, gap_s=1800)
    q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["n_events"] == 3 and r["total_value"] == 6.0
    assert r["session_start"] == s(0) and r["session_end"] == s(120)

    # batch 2 (resume from checkpoint): user 2's next event is past the
    # gap → their batch-1 session closes using STATE from the checkpoint;
    # user 1's open session (event 4) also closes
    _write_events(spark, src, [(6, s(5000), 2, 7.0), (7, s(9000), 1, 8.0)])
    q2 = sessionize_stream(_stream(spark, src), out, cp, gap_s=1800)
    q2.awaitTermination(120)

    got2 = {(r["user_id"], r["n_events"], r["total_value"]) for r in spark.read.parquet(out).collect()}
    assert (1, 3, 6.0) in got2          # from batch 1
    assert (2, 1, 5.0) in got2          # user 2's session closed via state
    assert (1, 1, 4.0) in got2          # user 1's second session closed
    assert len(got2) == 3
