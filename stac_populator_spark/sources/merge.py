"""Idempotent keyed upsert over the Parquet snapshot layer — the engine's
MERGE INTO (reference analogue: POST → 409 → PUT upsert per item/
collection, /root/reference/STACpopulator/api_requests.py:60-149).

Without an Iceberg runtime JAR (SURVEY.md §7.0) the contract is
implemented as read-current → anti-join overwrite → atomic swap:

    merged = updates ∪ (current ⟕̸ updates on key)     -- updates win

Properties tested (tests/test_merge.py):
- idempotent: merging the same batch twice yields the identical table;
- upsert: an existing key's row is replaced, new keys append;
- atomic: the swap is tmp-dir + os.replace, a reader never sees a
  half-written table (same mechanism as sources.checkpoint).

With Iceberg present this entire module collapses to
``MERGE INTO t USING u ON t.key = u.key WHEN MATCHED THEN UPDATE ...`` —
the call sites keep the same signature.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ConcurrentMergeError(RuntimeError):
    """Another writer holds the table's merge lock."""


@contextlib.contextmanager
def merge_lock(table_path: str, timeout_s: float = 0.0, stale_s: float = 3600.0):
    """Writer serialization for the MERGE paths: two interleaved upsert
    batches touching overlapping buckets must serialize or fail cleanly
    (reference analogue: the 409→PUT idempotency handshake,
    api_requests.py:102-149 — one writer wins, the other gets an explicit
    conflict, never a silently mixed table).

    Implementation: O_CREAT|O_EXCL lock file next to the table — atomic on
    POSIX and on object stores with if-none-match semantics. Iceberg's
    optimistic snapshot commit replaces this wholesale when the JAR is
    present. ``timeout_s=0`` fails fast with ConcurrentMergeError; a lock
    older than ``stale_s`` (crashed writer) is broken with a warning.
    """
    os.makedirs(os.path.dirname(table_path) or ".", exist_ok=True)
    lock = table_path + "._merge.lock"
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, json.dumps({"pid": os.getpid(), "ts": time.time()}).encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(lock).st_mtime
            except FileNotFoundError:
                continue  # holder just released — retry acquire
            if age > stale_s:
                # Break the stale lock ATOMICALLY with inode verification:
                # rename to a unique name (exactly one waiter wins; a bare
                # unlink races — the slower of two breakers could delete a
                # FRESH lock the faster one just created), then confirm the
                # renamed file is STILL the stale one we observed. If a
                # breaker stalls between stat and rename, it can move a
                # fresh lock another waiter just created — in that case the
                # renamed file's mtime is recent: restore it via link()
                # (no-op if yet another lock appeared meanwhile) instead of
                # deleting a live writer's mutex.
                try:
                    broken = lock + f".broken.{uuid.uuid4().hex}"
                    os.rename(lock, broken)
                    if time.time() - os.stat(broken).st_mtime <= stale_s:
                        # stole a fresh lock — put it back if the slot is
                        # still empty, then behave as an ordinary waiter
                        try:
                            os.link(broken, lock)
                        except FileExistsError:
                            pass
                        os.unlink(broken)
                        time.sleep(0.05)
                        continue
                    os.unlink(broken)
                except FileNotFoundError:
                    pass  # another waiter broke it first
                continue
            if time.monotonic() >= deadline:
                raise ConcurrentMergeError(
                    f"merge lock held on {table_path} (lock file {lock}, age {age:.0f}s); "
                    "serialize upsert batches or retry after the holder commits"
                ) from None
            time.sleep(0.05)
    try:
        yield
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass


def _dedup_keys(updates: DataFrame, key: str) -> DataFrame:
    """Deterministic within-batch key dedup: the row sorting FIRST by the
    remaining columns wins (dropDuplicates alone keeps an arbitrary
    partition-order row — retries/speculation could flip the winner)."""
    others = [c for c in updates.columns if c != key]
    if not others:
        return updates.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc_nulls_last() for c in others])
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(spark: SparkSession, table_path: str, updates: DataFrame,
                 key: str = "id", lock_timeout_s: float = 0.0) -> DataFrame:
    """Upsert ``updates`` into the parquet table at ``table_path`` keyed on
    ``key``; duplicate keys inside ``updates`` are resolved first — the
    row that sorts FIRST by the remaining columns wins (dropDuplicates
    alone keeps an arbitrary partition-order row, so retries/speculation
    could flip the winner — r4 review)."""
    updates = _dedup_keys(updates, key)
    with merge_lock(table_path, timeout_s=lock_timeout_s):
        if os.path.exists(os.path.join(table_path, "_SUCCESS")):
            current = spark.read.parquet(table_path)
            kept = current.join(updates.select(key), key, "left_anti")
            merged = kept.unionByName(updates, allowMissingColumns=False)
        else:
            merged = updates

        tmp = table_path + f"._tmp.{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(table_path):
            old = table_path + f"._old.{uuid.uuid4().hex}"
            os.replace(table_path, old)
            os.replace(tmp, table_path)
            shutil.rmtree(old)
        else:
            os.replace(tmp, table_path)
    return spark.read.parquet(table_path)


def merge_upsert_bucketed(spark: SparkSession, table_path: str, updates: DataFrame,
                          key: str = "id", n_buckets: int = 64,
                          lock_timeout_s: float = 0.0) -> DataFrame:
    """Hash-bucketed MERGE: upsert cost ∝ TOUCHED buckets, not table size.

    :func:`merge_upsert` re-reads and rewrites the whole table per batch —
    correct, but O(table) per micro-batch, which a 10^12-row items table
    cannot afford. Here the table lives partitioned by
    ``bucket = pmod(xxhash64(key), n_buckets)``; an update batch touches at
    most ``n_buckets`` partitions (usually far fewer), the current rows of
    ONLY those partitions are read back (partition pruning on the bucket
    column), and Spark's dynamic partition-overwrite rewrites ONLY those
    directories. Untouched bucket directories are never read or written.
    With Iceberg this collapses to ``MERGE INTO`` on a
    ``bucket(key, N)``-partitioned table — identical layout, same call
    shape.

    Within-batch duplicate keys are resolved deterministically before the
    merge — the row sorting first by the remaining columns wins (same
    rule as :func:`merge_upsert`); callers needing last-write-wins should
    pre-reduce, as streaming.ingest.stream_items_upsert does.
    """
    updates = _dedup_keys(updates, key).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    touched = sorted(r["bucket"] for r in updates.select("bucket").distinct().collect())
    with merge_lock(table_path, timeout_s=lock_timeout_s):
        # layout detection goes by bucket= partition directories ONLY — a
        # _SUCCESS marker also exists on flat (non-bucketed) merge_upsert
        # tables, whose schema has no bucket column; merging the two
        # layouts silently would leave stale flat files next to bucket dirs
        entries = os.listdir(table_path) if os.path.exists(table_path) else []
        is_bucketed = any(e.startswith("bucket=") for e in entries)
        has_data = any(e.endswith(".parquet") or e.startswith("bucket=") for e in entries)
        if has_data and not is_bucketed:
            raise ValueError(
                f"{table_path} holds a non-bucket-partitioned table; "
                "merge_upsert_bucketed cannot upsert into a flat layout — "
                "use merge_upsert, or rewrite the table bucketed first"
            )
        if is_bucketed:
            current = spark.read.parquet(table_path).filter(F.col("bucket").isin(touched))
            kept = current.join(updates.select(key), key, "left_anti")
            merged = kept.unionByName(updates, allowMissingColumns=False)
        else:
            merged = updates
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(table_path)
        )
    return spark.read.parquet(table_path)
