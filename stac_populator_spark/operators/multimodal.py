"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container has no PIL/ffmpeg — see the
driver brief): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder derives
"pixels"/"samples" from the payload bytes — so the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is real and
tested end-to-end, and a real decoder drops in behind the same signature.

Column model:
    media(url STRING, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT>)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim
    ]
)


def _fake_decode(payload: bytes, n: int = 64) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → n uint8 'pixels'.
    Pure function of the bytes — stable across partitions/runs."""
    b = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = int(np.ceil(n / len(b)))
    return np.tile(b, reps)[:n]


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stub"
        )
    return _fake_decode(payload, 64)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "real audio decode needs soundfile/ffmpeg (not in this container); "
            "pass fake=True for the deterministic stub"
        )
    return _fake_decode(payload, 256)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media → 16-dim feature vectors via mapInPandas (the real batch
    shape a GPU/CPU feature extractor would see: one Arrow batch of
    payloads in, one batch of float vectors out)."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = (
                    decode_image(payload, fake=fake)
                    if kind == "image"
                    else decode_audio(payload, fake=fake)
                )
                # 16 bucket-means — stand-in for an embedding model
                f = raw[: (len(raw) // 16) * 16].reshape(16, -1).mean(axis=1)
                feats.append((f / 255.0).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explodes frame indices
    0, every_n, 2·every_n, … up to meta.n_frames — pure JVM (sequence +
    explode); the per-frame decode would slot in as a mapInPandas stage."""
    vids = media.filter(F.col("kind") == "video")
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return vids.select("url", F.explode(idx).alias("frame_idx"))
