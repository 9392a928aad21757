"""Streaming MERGE upsert: re-crawled urls replace their item rows, the
table converges under resume, and a no-new-data restart is a no-op —
the reference's POST→409→PUT semantics (api_requests.py:102-149) as a
foreachBatch sink."""

import os

import pytest
from pyspark.sql import functions as F

from stac_populator_spark.datagen import footprints_pdf, pages_pdf
from stac_populator_spark.operators.spatial_join import footprint_cover_df
from stac_populator_spark.streaming.ingest import read_pages_stream, stream_items_upsert


@pytest.fixture(scope="module")
def cover(spark):
    return footprint_cover_df(spark, footprints_pdf())


def _write(spark, d, pdf):
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d)


def test_stream_upsert_replaces_recrawled_urls(spark, tmp_path, cover):
    src = str(tmp_path / "in")
    tbl = str(tmp_path / "items_tbl")
    cp = str(tmp_path / "cp")

    _write(spark, src, pages_pdf(0, 200))
    stream_items_upsert(read_pages_stream(spark, src), cover, tbl, cp).awaitTermination(120)
    # snapshot NOW — merge_upsert atomically swaps the table directory, so
    # a lazy DataFrame over the old files would go stale after run 2
    t1 = spark.read.parquet(tbl).select("merge_key", "url", "warc_ts").toPandas()
    n1 = len(t1)
    assert n1 >= 200
    assert t1["merge_key"].nunique() == n1  # keyed table

    # re-crawl pages 100..199 (same urls → same ids → same merge keys) with
    # a LATER warc_ts, plus 100 genuinely new pages
    recrawl = pages_pdf(100, 100)
    recrawl["warc_ts"] = recrawl["warc_ts"] + __import__("pandas").Timedelta(days=7)
    _write(spark, src, recrawl)
    _write(spark, src, pages_pdf(200, 100))
    stream_items_upsert(read_pages_stream(spark, src), cover, tbl, cp).awaitTermination(120)

    t2 = spark.read.parquet(tbl).select("merge_key", "id", "url", "warc_ts").toPandas()
    assert t2["merge_key"].nunique() == len(t2)
    # new pages appended: ids 200..299 present
    assert t2["id"].nunique() >= 300
    # the re-crawled rows carry the NEW crawl timestamp (replace, not dup)
    recrawl_urls = set(recrawl["url"])
    new_ts = t2[t2["url"].isin(recrawl_urls)]["warc_ts"]
    old_ts = t1[t1["url"].isin(recrawl_urls)]["warc_ts"]
    assert len(new_ts) > 0 and len(old_ts) > 0
    assert new_ts.min() > old_ts.max()

    # restart with no new files: table byte-stable (idempotent no-op)
    stream_items_upsert(read_pages_stream(spark, src), cover, tbl, cp).awaitTermination(120)
    t3 = spark.read.parquet(tbl).select("merge_key", "id", "url", "warc_ts").toPandas()
    key = lambda df: sorted(map(tuple, df[["merge_key", "warc_ts"]].values.tolist()))
    assert key(t2) == key(t3)
