"""Training-data assembly ops: token-window document chunking and
deterministic train/val/test splitting.

Chunking is the step between quality filtering/dedup and tokenizer
packing in a web-scale training pipeline: each document becomes
ceil(n_tokens / chunk_tokens) fixed-width token windows. The explode is
narrow (rows fan out inside the same partition, no shuffle) and every
derived value is a JVM array expression — at 10^12 documents this stage
pipelines with the upstream filters exactly like the extraction kernel.

The split is a pure hash of the document id (md5 prefix mod 100), so it
is reproducible across runs, partitionings and cluster sizes, and any
stratification can be audited with a groupBy — the same determinism rule
the reference uses for item ids (/root/reference/STACpopulator/
implementations/CMIP6_UofT/../thredds.py:249-262: stable id from stable
input, never RNG state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
) -> DataFrame:
    """One row per (doc, chunk): fixed token windows, last chunk ragged.

    Output: (id, chunk_idx, chunk_len, chunk_text). Narrow fan-out —
    sequence+explode inside the partition, slice on the token array.
    """
    toks = tokens_col(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    d = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_idx") * chunk_tokens + 1, chunk_tokens)
    return d.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(chunk).alias("chunk_len"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def split_bucket(id_col: str = "doc_id") -> F.Column:
    """Deterministic 0..99 bucket from the id: first 8 hex digits of
    md5(string id), mod 100. Engine-portable (md5 is everywhere), stable
    under repartitioning."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )


def with_train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Append ``split`` ∈ {train, val, test} by hash bucket — reproducible
    across runs and cluster sizes, no RNG state."""
    b = split_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )
