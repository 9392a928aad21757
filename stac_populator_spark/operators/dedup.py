"""Deduplication family for web-scale training-data pipelines.

All hot paths are JVM-side (xxhash64 / explode / groupBy with map-side
partial aggregation) — no Python in the per-row loop at all. This is the
Spark-first reading of the reference's dedup-by-ID rule
(/root/reference/STACpopulator/export.py:102-114) generalized to content
dedup at 10^12 rows:

- exact: content-hash groupBy (one shuffle of (hash, id) pairs only)
- MinHash+LSH: shingle explode → per-seed min-hash aggregation → band
  buckets → bucket-local self-join (candidates ≪ n²) → exact Jaccard verify
- SimHash: token explode → per-bit weighted sums → 64-bit signature →
  16-bit band buckets → Hamming verify
- n-gram Jaccard: array_intersect/array_union on token shingle arrays
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MINHASH = 64
LSH_BANDS = 16  # 16 bands × 4 rows


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, canonical_id): groups of byte-identical content;
    canonical = smallest id (deterministic). One shuffle on the hash."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def shingles_col(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as array<string> (JVM transform)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(grams)


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       n_hashes: int = N_MINHASH) -> DataFrame:
    """(id, mh0..mh{n-1}): min over shingles of xxhash64(seed, h(shingle)).

    Each shingle string is hashed ONCE (h = xxhash64(sh)); the n seeded
    variants re-hash that single long — n× cheaper than re-hashing the
    string per seed, with the same min-wise independence.

    Shuffle profile: explode is narrow; the groupBy's 64 mins all combine
    map-side, so the exchange carries one 64-long row per document.
    """
    sh = df.select(F.col(id_col), F.explode(shingles_col(text_col)).alias("sh")).select(
        id_col, F.xxhash64("sh").alias("h")
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"mh{i}") for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_candidates(sigs: DataFrame, id_col: str = "doc_id",
                       n_hashes: int = N_MINHASH, bands: int = LSH_BANDS) -> DataFrame:
    """LSH banding: hash each band of rows, bucket-join ids sharing a band
    bucket. Returns candidate pairs (a, b) with a < b, distinct."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bhash")))
    buckets = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash"))
    l = buckets.select(F.col(id_col).alias("a"), "band", "bhash")
    r = buckets.select(F.col(id_col).alias("b"), "band", "bhash")
    return (
        l.join(r, ["band", "bhash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs (the
    verify-after-LSH stage). Join is on ids — candidates are few."""
    sh = df.select(F.col(id_col), shingles_col(text_col, n).alias("sh"))
    j = (
        pairs.join(sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b")), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "a",
        "b",
        (inter / F.when(union > 0, union)).alias("jaccard"),
    )


def minhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", threshold: float = 0.7) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band candidates →
    exact-Jaccard verify → pairs above threshold."""
    sigs = minhash_signatures(df, text_col, id_col)
    cands = minhash_candidates(sigs, id_col)
    return jaccard_pairs(df, cands, text_col, id_col).filter(F.col("jaccard") >= threshold)


def simhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      bits: int = 64) -> DataFrame:
    """(id, simhash): per-bit majority over token hashes, assembled into a
    64-bit bigint. Token explode → 64 conditional sums (all map-side)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when((F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return sums.select(F.col(id_col), sig.alias("simhash"))


def simhash_candidates(sigs: DataFrame, id_col: str = "doc_id",
                       max_hamming: int = 3) -> DataFrame:
    """Band the 64-bit simhash into 4×16-bit chunks; pairs sharing any
    chunk are candidates (pigeonhole: hamming ≤ 3 ⇒ some chunk equal);
    verify exact Hamming distance JVM-side via bit_count(xor)."""
    chunks = [
        (F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))).alias(f"c{c}")
        for c in range(4)
    ]
    b = sigs.select(F.col(id_col), F.col("simhash"), *chunks)
    pairs = None
    for c in range(4):
        l = b.select(F.col(id_col).alias("a"), F.col("simhash").alias("sig_a"), F.col(f"c{c}").alias("ck"))
        r = b.select(F.col(id_col).alias("b"), F.col("simhash").alias("sig_b"), F.col(f"c{c}").alias("ck"))
        p = l.join(r, "ck").filter(F.col("a") < F.col("b")).select("a", "b", "sig_a", "sig_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        pairs.distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
