"""Structured Streaming ingest (exactly-once, resume) and multimodal
mapInPandas plumbing."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_populator_spark.datagen import footprints_pdf, pages_pdf
from stac_populator_spark.operators.multimodal import (
    decode_image,
    extract_features,
    sample_frames,
)
from stac_populator_spark.operators.spatial_join import footprint_cover_df
from stac_populator_spark.streaming.ingest import read_pages_stream, stream_items


@pytest.fixture(scope="module")
def cover(spark):
    return footprint_cover_df(spark, footprints_pdf())


def _write_pages_files(spark, d, batches):
    os.makedirs(d, exist_ok=True)
    for i, (start, count) in enumerate(batches):
        pdf = pages_pdf(start, count)
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d)


def test_stream_matches_batch(spark, tmp_path, cover):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "items_out")
    cp = str(tmp_path / "cp")
    _write_pages_files(spark, src, [(0, 300), (300, 300)])

    q = stream_items(read_pages_stream(spark, src), cover, out, cp)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    from stac_populator_spark.plans.pipeline import build_items

    batch = build_items(spark.read.parquet(src), cover)
    key = lambda df: sorted(
        (r["id"], r["collection_id"], r["cell_s2"]) for r in df.select("id", "collection_id", "cell_s2").collect()
    )
    assert key(got) == key(batch)


def test_stream_resume_no_duplicates(spark, tmp_path, cover):
    src = str(tmp_path / "pages_in2")
    out = str(tmp_path / "items_out2")
    cp = str(tmp_path / "cp2")
    _write_pages_files(spark, src, [(0, 300)])
    stream_items(read_pages_stream(spark, src), cover, out, cp).awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # new files arrive; resume from the same checkpoint → only new rows added
    _write_pages_files(spark, src, [(300, 300)])
    stream_items(read_pages_stream(spark, src), cover, out, cp).awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > n1
    assert got.groupBy("id", "collection_id").count().filter(F.col("count") > 1).count() == 0


def test_stream_collection_counts(spark, tmp_path, cover):
    from stac_populator_spark.streaming.ingest import stream_collection_counts

    src = str(tmp_path / "pages_in3")
    cp = str(tmp_path / "cp3")
    _write_pages_files(spark, src, [(0, 400)])
    q = stream_collection_counts(read_pages_stream(spark, src), cover, cp)
    q.awaitTermination(120)
    got = spark.sql("select * from collection_counts")
    # streaming incremental agg equals the batch aggregate (A6 semantics)
    from stac_populator_spark.operators.collection_agg import collection_extent
    from stac_populator_spark.plans.pipeline import build_items

    batch = collection_extent(
        build_items(spark.read.parquet(src), cover).filter(F.col("collection_id").isNotNull())
    )
    key = lambda df: sorted(
        (r["collection_id"], r["item_count"], tuple(r["bbox"])) for r in df.collect()
    )
    assert key(got) == key(batch)


def test_stream_windowed_counts_matches_batch_finalized(spark, tmp_path, cover):
    from stac_populator_spark.plans.pipeline import build_items
    from stac_populator_spark.streaming.ingest import read_pages_stream
    from stac_populator_spark.streaming.windows import (
        stream_windowed_counts,
        windowed_collection_counts,
    )

    src = str(tmp_path / "pages_w1")
    cp = str(tmp_path / "cp_w1")
    # two files so the watermark advances between micro-batches
    _write_pages_files(spark, src, [(0, 200), (200, 200)])
    q = stream_windowed_counts(
        read_pages_stream(spark, src, max_files_per_trigger=1), cover, cp,
        window_s=3600, late_s=600, query_name="win_a",
    )
    q.awaitTermination(180)
    got = {
        (r["collection_id"], r["window_start"]): (r["n_items"], r["n_geo"])
        for r in spark.sql("select * from win_a").collect()
    }
    batch_items = build_items(spark.read.parquet(src), cover)
    batch = windowed_collection_counts(batch_items, window_s=3600, late_s=600)
    full = {
        (r["collection_id"], r["window_start"]): (r["n_items"], r["n_geo"])
        for r in batch.collect()
    }
    # append mode emits only FINALIZED windows (watermark passed window
    # end); everything emitted must match the batch value exactly, and all
    # windows strictly older than the final watermark must have emitted
    assert got, "no finalized windows emitted"
    assert set(got).issubset(set(full))
    for k, v in got.items():
        assert full[k] == v
    max_ts = max(r["warc_ts"] for r in batch_items.select("warc_ts").collect())
    import datetime

    cutoff = max_ts - datetime.timedelta(seconds=600 + 3600)
    must_have = {k for k in full if k[1] < cutoff}
    assert must_have.issubset(set(got))


def test_stream_windowed_counts_drops_late_rows(spark, tmp_path, cover):
    from stac_populator_spark.streaming.ingest import read_pages_stream
    from stac_populator_spark.streaming.windows import stream_windowed_counts

    src = str(tmp_path / "pages_w2")
    cp = str(tmp_path / "cp_w2")
    out = str(tmp_path / "win_out")
    # recent pages first: watermark advances far past the early windows
    _write_pages_files(spark, src, [(500, 300)])
    q1 = stream_windowed_counts(
        read_pages_stream(spark, src), cover, cp, window_s=3600, late_s=600,
        out_dir=out,
    )
    q1.awaitTermination(180)

    # then VERY old pages arrive (event times hours behind the watermark):
    # the resumed query must drop them, counted by the state operator
    _write_pages_files(spark, src, [(0, 50)])
    q2 = stream_windowed_counts(
        read_pages_stream(spark, src), cover, cp, window_s=3600, late_s=600,
        out_dir=out,
    )
    q2.awaitTermination(180)
    progress = q2.lastProgress
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0) for op in progress["stateOperators"]
    )
    assert dropped > 0  # late data was dropped, not silently aggregated
    # and none of the old windows appear in the (exactly-once) output
    import datetime

    old_cutoff = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=50 * 137)
    late_rows = [
        r for r in spark.read.parquet(out).collect()
        if r["window_start"] < old_cutoff
    ]
    assert late_rows == []


def test_stream_dedup_within_watermark(spark, tmp_path):
    from stac_populator_spark.streaming.ingest import read_pages_stream
    from stac_populator_spark.streaming.windows import stream_dedup_pages

    src = str(tmp_path / "pages_dd")
    out = str(tmp_path / "dd_out")
    cp = str(tmp_path / "cp_dd")
    # the same 150 pages written twice (a re-crawl inside the watermark
    # horizon) plus 50 unique ones
    _write_pages_files(spark, src, [(0, 150)])
    _write_pages_files(spark, src, [(0, 150)])
    _write_pages_files(spark, src, [(150, 50)])
    q = stream_dedup_pages(read_pages_stream(spark, src), out, cp, late_s=10**6)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert got.count() == 200  # duplicates dropped
    assert got.select("url").distinct().count() == 200
    # resume: re-delivering old files adds nothing new
    _write_pages_files(spark, src, [(0, 100)])
    q2 = stream_dedup_pages(read_pages_stream(spark, src), out, cp, late_s=10**6)
    q2.awaitTermination(180)
    assert spark.read.parquet(out).select("url").distinct().count() == 200


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc")
    a = decode_image(b"abc", fake=True)
    b = decode_image(b"abc", fake=True)
    assert (a == b).all() and len(a) == 64


def test_extract_features(spark):
    pdf = pd.DataFrame(
        {
            "url": ["u1", "u2", "u3"],
            "kind": ["image", "audio", "image"],
            "payload": [b"\x01\x02\x03\x04" * 8, b"\x10\x20" * 64, b"\xff" * 16],
            "meta": [(4, 8, None, None), (None, None, 16000, None), (4, 4, None, None)],
        }
    )
    from stac_populator_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    out = extract_features(media, fake=True).collect()
    by_url = {r["url"]: r for r in out}
    assert len(by_url["u1"]["feature"]) == 16
    assert by_url["u3"]["feature"] == [pytest.approx(1.0)] * 16  # all \xff
    assert by_url["u2"]["n_bytes"] == 128
    # determinism across partitionings
    out2 = extract_features(media.repartition(3), fake=True).collect()
    assert {r["url"]: r["feature"] for r in out2} == {r["url"]: r["feature"] for r in out}


def test_sample_frames(spark):
    from stac_populator_spark.operators.multimodal import MEDIA_SCHEMA

    pdf = pd.DataFrame(
        {
            "url": ["v1"],
            "kind": ["video"],
            "payload": [b"x"],
            "meta": [(None, None, None, 35)],
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    frames = [r["frame_idx"] for r in sample_frames(media, every_n=10).collect()]
    assert frames == [0, 10, 20, 30]
