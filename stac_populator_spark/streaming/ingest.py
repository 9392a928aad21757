"""Structured Streaming ingest variant (SURVEY.md §2.8).

The reference is pure batch with file-level resume; the north_rule asks
for checkpoint resumability, which the batch path provides via
sources.checkpoint. This module adds the optional continuous-ingest shape:
new page files landing in a directory (the stand-in for an Iceberg
streaming read / Kafka WARC feed) stream through the *same* extraction +
cell-encode + PIP-join pipeline — transformations are shared, only the
source/sink differ — with exactly-once output via the streaming
checkpoint.

Micro-batch semantics: the PIP join is stateless (broadcast dim), so no
watermark is needed; the incremental collection-extent aggregation (the
reference's during-ingest update, populators.py:253-255) runs in update
mode per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import ITEM_SCHEMA  # noqa: F401  (re-export for callers)
from ..plans.pipeline import build_items

PAGES_DDL = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def read_pages_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_items(
    pages_stream: DataFrame,
    cover: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """pages stream → STAC items parquet sink, exactly-once via checkpoint.

    ``available_now=True`` drains everything currently available then
    stops — the testable micro-batch mode; ``False`` runs continuously.
    """
    items = build_items(pages_stream, cover)
    writer = (
        items.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_collection_counts(
    pages_stream: DataFrame,
    cover: DataFrame,
    checkpoint_dir: str,
):
    """Incremental per-collection item counts + extents in update mode —
    the streaming analogue of the reference's during-ingest collection
    update (populators.py:253-255, 302-305). Returns a streaming query
    writing to an in-memory table named 'collection_counts'."""
    from pyspark.sql import functions as F

    from ..operators.collection_agg import collection_extent

    # extents aggregate only footprint-matched items (same rule as the
    # batch run_pipeline); null-collection items still flow to the sink
    items = build_items(pages_stream, cover).filter(F.col("collection_id").isNotNull())
    agg = collection_extent(items)
    return (
        agg.writeStream.format("memory")
        .queryName("collection_counts")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
