"""Watermarked event-time windowed aggregation over the streaming ingest
(driver brief: "watermarks + windowed aggs for late data").

The batch reference has no streaming analogue — this is the Spark-native
during-ingest rollup: STAC items arriving out of event-time order are
aggregated into tumbling ``warc_ts`` windows per collection; the watermark
bounds state (windows older than the watermark are finalized and evicted)
and DROPS data later than ``late_s`` — the exactly-once alternative to the
reference's mutate-collection-per-item loop (populators.py:253-255) that
still works when the crawl feed replays hours-old pages.

Scale note: state size = (#collections × #open windows) rows — independent
of input volume; the aggregation is map-side partial before the window
shuffle like any groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_collection_counts(
    items: DataFrame,
    window_s: int = 3600,
    late_s: int = 1800,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming (or batch — same expression) tumbling-window rollup:
    (collection_id, window_start, window_end, n_items, n_geo).

    On a streaming DataFrame the ``withWatermark`` bounds state and drops
    rows later than ``late_s`` behind the max seen event time; on a batch
    DataFrame the identical code computes the full history (the
    batch-equivalence property tests rely on this).
    """
    w = items.withWatermark(ts_col, f"{late_s} seconds") if items.isStreaming else items
    win = F.window(F.col(ts_col), f"{window_s} seconds")
    return (
        w.groupBy(F.col("collection_id"), win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.when(F.col("lon").isNotNull(), 1).otherwise(0)).alias("n_geo"),
        )
        .select(
            "collection_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_items",
            "n_geo",
        )
    )


def stream_dedup_pages(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    late_s: int = 3600,
    key_col: str = "url",
    ts_col: str = "warc_ts",
):
    """Streaming exact-dedup of a crawl feed with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each seen key only until the
    watermark passes it, so re-crawled pages arriving within ``late_s`` of
    the original are dropped while state stays O(keys-per-window) instead
    of O(all keys ever) — the streaming reading of the batch exact-dedup
    contract (reference export.py:102-114) that a 10^12-row feed needs
    (an unbounded dropDuplicates would OOM its state store)."""
    deduped = (
        pages_stream.withWatermark(ts_col, f"{late_s} seconds")
        .dropDuplicatesWithinWatermark([key_col])
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_counts(
    pages_stream: DataFrame,
    cover: DataFrame,
    checkpoint_dir: str,
    window_s: int = 3600,
    late_s: int = 1800,
    query_name: str = "windowed_counts",
    out_dir: str | None = None,
):
    """pages stream → extract/join → watermarked tumbling-window counts,
    append mode (a window emits ONCE, when the watermark passes its end —
    the finalized-rollup contract; update mode would re-emit).

    ``out_dir=None`` → in-memory table named ``query_name`` (inspection;
    the memory sink cannot recover a checkpoint). A path → parquet sink,
    the resumable exactly-once production shape.
    """
    from ..plans.pipeline import build_items

    items = build_items(pages_stream, cover)
    agg = windowed_collection_counts(items, window_s=window_s, late_s=late_s)
    if out_dir is None:
        writer = agg.writeStream.format("memory").queryName(query_name)
    else:
        writer = agg.writeStream.format("parquet").option("path", out_dir)
    return (
        writer.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
