"""Dedup family (exact / MinHash-LSH / SimHash / Jaccard), text stats,
language ID, fingerprint, similarity search — crafted-corpus tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_populator_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    simhash_candidates,
    simhash_signature,
)
from stac_populator_spark.operators.similarity import (
    cosine_near_duplicates,
    cosine_topk,
)
from stac_populator_spark.operators.textstats import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_stats,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the rain falls softly outside the window"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-token change
FAR = "completely different content about spark dataframes and shuffles at scale"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),          # exact duplicate of 0
        (2, NEAR),          # near duplicate of 0
        (3, FAR),
        (4, "short text"),
        (5, FAR + " with an extra tail of words"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).cache()


def test_exact_dedup(spark, corpus):
    out = {r["text_hash"]: r for r in exact_dedup(corpus).collect()}
    dups = [r for r in out.values() if r["n_dups"] > 1]
    assert len(dups) == 1
    assert dups[0]["n_dups"] == 2 and dups[0]["canonical_id"] == 0


def test_minhash_finds_near_duplicates(spark, corpus):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in minhash_near_duplicates(corpus, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.6    # near dup
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_minhash_signature_determinism(spark, corpus):
    s1 = minhash_signatures(corpus).orderBy("doc_id").collect()
    s2 = minhash_signatures(corpus.repartition(5)).orderBy("doc_id").collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    # identical docs → identical signatures
    assert tuple(s1[0])[1:] == tuple(s1[1])[1:]


def test_jaccard_exact_values(spark, corpus):
    pairs = spark.createDataFrame(pd.DataFrame({"a": [0], "b": [1]}))
    j = jaccard_pairs(corpus, pairs).collect()[0]
    assert j["jaccard"] == 1.0


def test_simhash_near_pairs(spark, corpus):
    sigs = simhash_signature(corpus)
    rows = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert rows[0] == rows[1]  # identical text → identical simhash
    cands = {(r["a"], r["b"]): r["hamming"] for r in simhash_candidates(sigs, max_hamming=16).collect()}
    assert cands[(0, 1)] == 0
    assert (0, 2) in cands and cands[(0, 2)] <= 16
    assert (0, 3) not in cands or cands.get((0, 3), 99) > 16


def test_minhash_exact_dup_flood_complete_and_bounded(spark):
    # the reference dedup contract (export.py:102-114) generalized: 1,000
    # byte-identical docs must (a) yield the complete C(1000,2) pair set
    # and (b) never enter the LSH join as a 1,000-deep bucket — the
    # collapse step reduces them to ONE representative before banding
    n = 1000
    rows = [(i, BASE) for i in range(n)]
    rows += [(n, NEAR), (n + 1, FAR), (n + 2, FAR + " tail")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = minhash_near_duplicates(df, threshold=0.5)
    got = {(r["a"], r["b"]): r["jaccard"] for r in out.collect()}
    within = [(a, b) for (a, b) in got if a < n and b < n]
    assert len(within) == n * (n - 1) // 2
    assert all(got[p] == 1.0 for p in within)
    # the NEAR doc pairs with EVERY member of the identical group (cross
    # expansion), at the rep-level jaccard
    near_pairs = [(a, b) for (a, b) in got if b == n]
    assert len(near_pairs) == n
    # internal LSH stage saw only the representatives: signatures of the
    # collapsed input are ≤ 4 rows, so candidate pairs ≤ C(4,2)
    sigs = minhash_signatures(df.dropDuplicates(["text"]))
    assert minhash_candidates(sigs).count() <= 6


def test_minhash_bucket_cap_bounds_pairs_keeps_connectivity(spark):
    # 300 docs forced into one band bucket (identical signatures would be
    # collapsed, so use near-identical: same text + tiny unique tail —
    # most bands still collide); cap=8 must bound candidates ≈ s·cap and
    # still connect every doc to the cluster representatives
    n = 300
    rows = [(i, BASE + f" tail{i}") for i in range(n)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = minhash_signatures(df)
    capped = minhash_candidates(sigs, bucket_cap=8)
    n_pairs = capped.count()
    assert 0 < n_pairs < n * (n - 1) // 2 / 4  # far below quadratic
    # every doc appears in at least one candidate pair (connectivity)
    ids = {r["a"] for r in capped.collect()} | {r["b"] for r in capped.collect()}
    assert len(ids) == n
    # uncapped equals the old all-pairs semantics on small buckets
    small = minhash_candidates(sigs, bucket_cap=10**9)
    assert small.count() >= n_pairs


def test_simhash_exact_dup_flood_collapsed(spark):
    n = 800
    rows = [(i, BASE) for i in range(n)] + [(n, NEAR), (n + 1, FAR)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = simhash_signature(df)
    out = simhash_candidates(sigs, max_hamming=3)
    got = {(r["a"], r["b"]): r["hamming"] for r in out.collect()}
    within = [(a, b) for (a, b) in got if a < n and b < n]
    assert len(within) == n * (n - 1) // 2
    assert all(got[p] == 0 for p in within)
    # rep-level banding saw ≤ 3 distinct signatures
    assert sigs.select("simhash").distinct().count() <= 3


def test_simhash_banding_exact_for_hamming_3(spark):
    # plant signatures at controlled Hamming distances; the 3-of-6-block
    # banding must find ALL pairs with hamming ≤ 3 (pigeonhole exactness),
    # including bits spread across 3 different blocks
    base = 0x0123456789ABCDEF
    sigs = [
        (0, base),
        (1, base ^ 0b1),                                  # hamming 1, one block
        (2, base ^ (1 << 5) ^ (1 << 20) ^ (1 << 60)),     # hamming 3, 3 blocks
        (3, base ^ (1 << 11) ^ (1 << 22)),                # hamming 2, 2 blocks
        (4, base ^ ((1 << 4) - 1) ^ ((1 << 40) - (1 << 36))),  # hamming 8
    ]
    df = spark.createDataFrame(pd.DataFrame(sigs, columns=["doc_id", "simhash"]))
    out = {(r["a"], r["b"]): r["hamming"] for r in simhash_candidates(df, max_hamming=3).collect()}
    assert out[(0, 1)] == 1
    assert out[(0, 2)] == 3
    assert out[(0, 3)] == 2
    assert (0, 4) not in out       # hamming 8 > 3
    assert (1, 2) not in out       # xor = bits {0,5,20,60} → hamming 4 > 3


def test_simhash_block_schemes_identical_pairs(spark):
    # pigeonhole exactness holds at EVERY block count > max_hamming —
    # the 4/5/6-block schemes trade band count against key width but must
    # produce the IDENTICAL pair set (r5: choose_simhash_blocks picks the
    # cheapest safe scheme from the corpus row count). 200 deterministic
    # pseudo-random signatures + planted neighbors at hamming 1/2/3/4
    # spread across block boundaries of ALL the schemes.
    import random

    rng = random.Random(42)
    sigs = [(i, rng.getrandbits(63)) for i in range(200)]
    nxt = 200
    for base_id in range(0, 40, 4):
        base = sigs[base_id][1]
        for bits in ([3], [3, 17], [5, 21, 43], [2, 18, 34, 50]):
            x = base
            for b in bits:
                x ^= 1 << b
            sigs.append((nxt, x))
            nxt += 1
    df = spark.createDataFrame(pd.DataFrame(sigs, columns=["doc_id", "simhash"]))
    results = []
    for n_blocks in (4, 5, 6):
        out = simhash_candidates(df, max_hamming=3, n_blocks=n_blocks)
        results.append(sorted((r["a"], r["b"], r["hamming"]) for r in out.collect()))
    assert results[0] == results[1] == results[2]
    assert len(results[0]) >= 30  # the planted hamming ≤3 neighbors


def test_choose_simhash_blocks_thresholds():
    from stac_populator_spark.operators.dedup import choose_simhash_blocks

    assert choose_simhash_blocks(50_000) == 4       # bench scale
    assert choose_simhash_blocks(4_000_000) == 4
    assert choose_simhash_blocks(10_000_000) == 5
    assert choose_simhash_blocks(10**9) == 5
    assert choose_simhash_blocks(10**12) == 6       # the 10^12-row regime
    # exactness precondition: chosen n always exceeds max_hamming
    for h in (1, 2, 3, 4, 5):
        for rows in (10, 10**6, 10**12):
            assert choose_simhash_blocks(rows, max_hamming=h) > h


def test_token_stats(spark, corpus):
    out = {r["doc_id"]: r for r in with_token_stats(corpus).collect()}
    assert out[4]["n_tokens"] == 2
    assert out[4]["n_bpe_tokens"] == 2
    assert out[0]["n_tokens"] == len(BASE.split())


def test_quality_score_bounds(spark, corpus):
    out = with_quality_score(corpus).collect()
    for r in out:
        assert 0.0 <= r["quality_score"] <= 1.0
    by_id = {r["doc_id"]: r["quality_score"] for r in out}
    assert by_id[4] < by_id[0]  # short text scores below real prose


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog sat in the garden of the house"),
        (1, "el gato y el perro en la casa de los abuelos"),
        (2, "der Hund und die Katze sind in das Haus von den Kindern"),
        (3, "le chat et le chien dans la maison des grands-parents les aiment"),
        (4, "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r["lang_pred"] for r in with_lang_id(df).collect()}
    assert out[0] == "en" and out[1] == "es" and out[2] == "de" and out[3] == "fr"
    assert out[4] == "unknown"


def test_repetition_stats_hand_computed(spark):
    from stac_populator_spark.operators.textstats import with_repetition_stats

    rows = [
        (0, "a b a b a b c"),          # 7 toks, 'a'×3 → top 3/7; 2-grams: 6 total, 3 distinct → dup 0.5
        (1, "one two three four"),      # all distinct → top 1/4, dup 0.0
        (2, "spam spam spam spam"),     # top 1.0, 2-grams all 'spam spam' → dup 2/3
        (3, "solo"),                    # single token → n2<1 → dup 0.0
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert out[0]["n_tokens"] == 7 and out[0]["n_distinct"] == 3
    assert out[0]["top_tok_share"] == round(3 / 7, 6)
    assert out[0]["dup_2gram_frac"] == 0.5
    assert out[0]["rep_flag"] == "repetitive"
    assert out[1]["top_tok_share"] == 0.25 and out[1]["dup_2gram_frac"] == 0.0
    assert out[1]["rep_flag"] == "repetitive"  # 1/4 = 0.25 > 0.2 (tiny doc)
    assert out[2]["top_tok_share"] == 1.0
    assert out[2]["dup_2gram_frac"] == round(1 - 1 / 3, 6)
    assert out[3]["dup_2gram_frac"] == 0.0 and out[3]["top_tok_share"] == 1.0


def test_fingerprint_deterministic_and_discriminative(spark, corpus):
    f1 = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(corpus).collect()}
    f2 = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(corpus.repartition(3)).collect()}
    assert f1 == f2
    assert f1[0] == f1[1]
    assert f1[0] != f1[3]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((20, 16)).astype(np.float64)
    base[7] = base[3] * 1.0001 + 1e-5  # near-duplicate pair (3, 7)
    pdf = pd.DataFrame({"vec_id": range(20), "embedding": [list(map(float, v)) for v in base]})
    return spark.createDataFrame(pdf).cache()


def test_cosine_topk_vs_numpy(spark, vectors):
    q = vectors.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk(vectors, q, k=4).collect()
    pdf = vectors.toPandas().sort_values("vec_id")
    M = np.stack(pdf["embedding"].map(np.asarray))
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in (0, 1):
        cos = Mn @ Mn[qid]
        order = sorted(range(20), key=lambda j: (-round(cos[j], 9), j))[:4]
        got_q = sorted([r for r in got if r["query_id"] == qid], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in got_q] == order


def test_ivf_topk_recall(spark, vectors):
    from stac_populator_spark.operators.similarity import ivf_topk

    q = vectors.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(vectors, q, k=3).collect()
    # full probe (n_probe = k_centroids) must equal brute force exactly
    full = ivf_topk(vectors, q, k=3, n_probe=8, dim=16, k_centroids=8).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["vec_id"]) for r in rows)
    assert key(full) == key(exact)
    # partial probe: rank-1 self-hit always survives (query is in corpus
    # and lands in its own cluster), recall@3 ≥ 2/3 on this corpus
    part = ivf_topk(vectors, q, k=3, n_probe=3, dim=16, k_centroids=8).collect()
    got = {(r["query_id"], r["vec_id"]) for r in part}
    want = {(r["query_id"], r["vec_id"]) for r in exact}
    assert all((qid, qid) in got for qid in (0, 1, 2))
    # random gaussian corpus is the worst case for IVF (near-uniform
    # cosines) — partial probe still must find most true neighbors
    assert len(got & want) >= 5


def test_ivf_trained_centroids_beat_random(spark):
    from stac_populator_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_train,
    )
    from stac_populator_spark.operators.similarity import cosine_topk as exact_topk

    # clustered corpus (8 gaussian blobs) — the case where random unit
    # centroids skew inverted-list sizes and lose recall
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 16)) * 3
    X = np.concatenate([c + rng.standard_normal((50, 16)) * 0.3 for c in centers])
    pdf = pd.DataFrame({"vec_id": range(len(X)), "embedding": [list(map(float, v)) for v in X]})
    df = spark.createDataFrame(pdf).cache()
    q = df.filter(F.col("vec_id") % 40 == 0).select(F.col("vec_id").alias("query_id"), "embedding")

    cents = ivf_train(df, k_centroids=8, sample_n=400, seed=7)
    assert cents.shape == (8, 16)
    # determinism
    cents2 = ivf_train(df.repartition(7), k_centroids=8, sample_n=400, seed=7)
    assert np.allclose(cents, cents2)

    exact = {(r["query_id"], r["vec_id"]) for r in exact_topk(df, q, k=5).collect()}

    def recall(centroids):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(df, q, k=5, n_probe=2, dim=16, k_centroids=8,
                              centroids=centroids).collect()
        }
        return len(got & exact) / len(exact)

    r_trained = recall(cents)
    r_random = recall(None)
    assert r_trained >= r_random
    assert r_trained >= 0.9  # blobs + trained lists: near-perfect recall

    # trained lists are balanced: max/min list size far tighter than random
    sizes = (
        ivf_assign(df, dim=16, k_centroids=8, centroids=cents)
        .groupBy("ivf_cluster").count().collect()
    )
    counts = sorted(r["count"] for r in sizes)
    # every list non-empty and bounded imbalance (k-means may split one
    # blob and merge two — 4× covers that; random centroids on blobs
    # typically leave lists empty or one list with most of the corpus)
    assert len(counts) == 8 and counts[0] > 0 and counts[-1] <= 4 * counts[0]


def test_cosine_near_duplicates(spark, vectors):
    pairs = {(r["a"], r["b"]): r["cos"] for r in cosine_near_duplicates(vectors, threshold=0.99, dim=16).collect()}
    assert (3, 7) in pairs and pairs[(3, 7)] > 0.999
    assert all(v >= 0.99 for v in pairs.values())


def test_chunk_documents_hand_computed(spark):
    from stac_populator_spark.operators.chunking import chunk_documents, with_train_val_split

    rows = [(0, " ".join(f"t{i}" for i in range(7))), (1, "a b c")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = chunk_documents(df, chunk_tokens=3).collect()
    by = {(r["doc_id"], r["chunk_idx"]): r for r in out}
    assert len(by) == 3 + 1                      # 7 toks → 3 chunks; 3 toks → 1
    assert by[(0, 0)]["chunk_text"] == "t0 t1 t2"
    assert by[(0, 2)]["chunk_text"] == "t6" and by[(0, 2)]["chunk_len"] == 1
    assert by[(1, 0)]["chunk_len"] == 3
    # split determinism: same ids → same split regardless of partitioning
    s1 = {r["doc_id"]: r["split"] for r in with_train_val_split(df).collect()}
    s2 = {r["doc_id"]: r["split"] for r in with_train_val_split(df.repartition(5)).collect()}
    assert s1 == s2


def test_chunking_plan_is_narrow(spark):
    import contextlib, io

    from stac_populator_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(10), "text": ["a b c d e"] * 10}))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunk_documents(df).explain("formatted")
    assert " Exchange (" not in buf.getvalue()


def test_chunk_roundtrip_property(spark):
    # reassembly law over 200 random docs: joining a doc's chunks in
    # chunk_idx order reproduces its token stream exactly, chunk count is
    # ceil(n/k), every chunk but the last is exactly k tokens
    from stac_populator_spark.operators.chunking import chunk_documents

    rng = np.random.default_rng(7)
    docs = [
        (i, " ".join(f"w{rng.integers(0, 50)}" for _ in range(int(rng.integers(1, 120)))))
        for i in range(200)
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    k = 16
    out = chunk_documents(df, chunk_tokens=k).toPandas()
    for doc_id, text in docs:
        toks = text.split()
        chunks = out[out.doc_id == doc_id].sort_values("chunk_idx")
        assert len(chunks) == -(-len(toks) // k)
        assert " ".join(chunks.chunk_text) == " ".join(toks)
        assert (chunks.chunk_len.iloc[:-1] == k).all()
        assert chunks.chunk_len.iloc[-1] == len(toks) - k * (len(chunks) - 1)


def test_ivf_partitioned_layout_prunes_and_matches(spark, tmp_path, vectors):
    import contextlib, io

    from pyspark.sql import functions as F
    from stac_populator_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_partitioned,
        ivf_write_partitioned,
    )

    corpus = vectors
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf_corpus")
    ivf_write_partitioned(corpus, path, dim=16, k_centroids=8)
    # one cluster directory per assigned cluster
    import os
    dirs = [d for d in os.listdir(path) if d.startswith("ivf_cluster=")]
    assert len(dirs) > 2

    got = ivf_topk_partitioned(spark, path, queries, k=5, n_probe=4, dim=16, k_centroids=8)
    want = ivf_topk(corpus, queries, k=5, n_probe=4, dim=16, k_centroids=8)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(got) == key(want)

    # the probe filter must reach the scan as a PARTITION filter — the
    # layout, not the executor, skips the unprobed clusters
    probes = ivf_topk_partitioned(spark, path, queries, k=5, n_probe=2, dim=16, k_centroids=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probes.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [ivf_cluster" in plan.replace("#", " #").replace("  ", " ") or "ivf_cluster IN" in plan


def test_connected_components_crafted_graph(spark):
    from stac_populator_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated edge 20-21
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {"a": [1, 2, 3, 10, 11, 10, 20], "b": [2, 3, 4, 11, 12, 12, 21]}
        )
    )
    out = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    from stac_populator_spark.operators.dedup import connected_components

    # plain min-label propagation needs ~diameter rounds; a 24-node chain
    # (diameter 23) must still converge within max_iter
    n = 24
    pairs = spark.createDataFrame(
        pd.DataFrame({"a": list(range(n - 1)), "b": list(range(1, n))})
    )
    out = {r["id"]: r["component"] for r in connected_components(pairs, max_iter=30).collect()}
    assert set(out.values()) == {0} and len(out) == n


def test_components_on_dup_flood(spark):
    # 300 byte-identical docs + one near-dup: the pair set is quadratic
    # (C(300,2) within-group + 300 cross pairs) and CC must collapse the
    # whole thing into ONE component rooted at the smallest id
    from stac_populator_spark.operators.dedup import connected_components

    n = 300
    rows = [(i, BASE) for i in range(n)] + [(n, NEAR)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = minhash_near_duplicates(df, threshold=0.5)
    labels = connected_components(pairs).collect()
    assert len(labels) == n + 1
    assert {r["component"] for r in labels} == {0}


def test_ivfpq_partitioned_layout_prunes_and_matches(spark, tmp_path):
    # round-4: the fully-composed IVF-PQ scale path — probe list becomes a
    # PARTITION filter, the ADC scan reads codes only (embedding pruned
    # out of the parquet read), results match the in-memory composition.
    import contextlib, io, os

    from pyspark.sql import functions as F
    from stac_populator_spark.operators.similarity import (
        ivfpq_topk,
        ivfpq_topk_partitioned,
        ivfpq_write_partitioned,
        pq_train,
    )

    rng = np.random.default_rng(5)
    n, dim, g = 200, 16, 4
    cents = np.zeros((g, dim))
    for c in range(g):
        cents[c, c * 4 : (c + 1) * 4] = 3.0
    X = rng.standard_normal((n, dim)) * 0.25 + cents[np.arange(n) % g]
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, v)) for v in X]})
    )
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_train(corpus, dim=dim, m=4, ksub=16)

    path = str(tmp_path / "ivfpq_corpus")
    ivfpq_write_partitioned(corpus, path, books, cents)
    dirs = [d for d in os.listdir(path) if d.startswith("ivf_cluster=")]
    assert len(dirs) == g

    got = ivfpq_topk_partitioned(
        spark, path, queries, books, cents, k=5, n_probe=2, shortlist=40
    )
    want = ivfpq_topk(corpus, queries, books, cents, k=5, n_probe=2, shortlist=40)
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(got) == key(want)
    # recall sanity: the planted-cluster corpus is separable, so the
    # composed path should agree with exact top-5 for ≥80% of slots
    from stac_populator_spark.operators.similarity import cosine_topk

    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(corpus, queries, k=5).collect()}
    hits = {(r["query_id"], r["vec_id"]) for r in got.collect()} & exact
    assert len(hits) >= 0.8 * len(exact)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    flat = plan.replace("#", " #").replace("  ", " ")
    assert "PartitionFilters: [ivf_cluster" in flat or "ivf_cluster IN" in plan
    # the ADC scan must NOT read the embedding column: some parquet scan
    # in the plan reads pq_code with embedding pruned away
    scans = [s for s in plan.split("ReadSchema: ")[1:]]
    assert any("pq_code" in s.splitlines()[0] and "embedding" not in s.splitlines()[0]
               for s in scans), plan


def test_simhash_giant_doc_takes_slow_path_exactly(spark):
    # r4 SWAR counters are 16-bit and ANSI long-add would overflow at
    # 32768 counts in the top field — docs beyond _SWAR_MAX_TOKENS take
    # the per-bit slow path via a per-row If and must produce the exact
    # per-bit-majority signature; normal docs keep the 16-pass SWAR cost.
    import numpy as np
    import pandas as pd

    from stac_populator_spark.operators.dedup import simhash_signature

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(50)]
    giant_toks = [vocab[i] for i in rng.integers(0, 50, 40000)]
    giant = " ".join(giant_toks)
    small = " ".join(giant_toks[:100])
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [giant, small]})
    )
    rows = {r["doc_id"]: r["simhash"] for r in simhash_signature(df).collect()}

    # independent per-bit majority in numpy via the same xxhash64 values
    from pyspark.sql import functions as F

    tok_df = spark.createDataFrame(pd.DataFrame({"t": sorted(set(giant_toks))}))
    hmap = {r["t"]: r["h"] for r in tok_df.select("t", F.xxhash64("t").alias("h")).collect()}

    def ref_sig(toks):
        hs = np.array([hmap[t] for t in toks], dtype=np.int64).astype(np.uint64)
        sig = 0
        for i in range(64):
            cnt = int(((hs >> np.uint64(i)) & np.uint64(1)).sum())
            if 2 * cnt > len(toks):
                sig |= 1 << i
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    assert rows[1] == ref_sig(giant_toks)
    assert rows[2] == ref_sig(giant_toks[:100])
