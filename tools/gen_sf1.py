"""Generate an sf1-equivalent dataset for the scale-stress run (VERDICT r2
ask #6): documents (50k rows, 10× sf0.1) + embeddings (20k rows) with the
same schemas and distribution shape as the driver's tables (31-word vocab,
10-100 words/doc, en-skewed lang mix, 20 sources, exact-dup and near-dup
plants; 64-dim unit embeddings in 10 clusters with planted twins).
Deterministic (fixed seeds, no wall-clock), pure numpy/pyarrow — no Spark.

Small dimension tables (region/nation/part/customer/supplier) are copied
from sf0.1 — TPC-H dims either don't scale (nation/region) or aren't
touched by the heavy documents-family queries.

    python tools/gen_sf1.py [out_dir]       # default /root/repo/benchdata/sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join key line "
    "merge order part query row scan slow small sort spark stream table the value "
    "vector window".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
N_LABELS = 10


def gen_documents(n: int = N_DOCS) -> pa.Table:
    rng = np.random.default_rng(1_000_003)
    lengths = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        words = VOCAB[rng.integers(0, len(VOCAB), size=lengths[i])]
        texts.append(" ".join(words))
    # plants: exact dups (~0.16%) and near dups (~1%) of the previous doc —
    # what the dedup family must find at scale
    for i in range(1, n):
        if i % 631 == 5:
            texts[i] = texts[i - 1]
        elif i % 97 == 1:
            w = texts[i - 1].split(" ")
            w[-1] = "dup"
            texts[i] = " ".join(w)
    lang = LANGS[rng.choice(len(LANGS), size=n, p=LANG_P)]
    source = np.char.add("src", rng.integers(0, 20, size=n).astype(str))
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(lang.tolist()),
            "source": pa.array(source.tolist()),
            "n_chars": pa.array(n_chars),
        }
    )


def gen_embeddings(n: int = N_VECS) -> pa.Table:
    rng = np.random.default_rng(2_000_003)
    centers = rng.normal(size=(N_LABELS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = (np.arange(n) % N_LABELS).astype(np.int32)
    emb = centers[label] * 0.6 + rng.normal(scale=0.35, size=(n, DIM))
    # planted twins (~2.5%): near-copies of the previous vector, the
    # cosine-neardup family's targets
    twin = (np.arange(n) % 40 == 1) & (np.arange(n) > 0)
    emb[twin] = emb[np.flatnonzero(twin) - 1] + rng.normal(
        scale=0.003, size=(twin.sum(), DIM)
    )
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb32 = emb.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb32), type=pa.list_(pa.float32())),
            "label": pa.array(label),
        }
    )


def main(out_dir: str = "/root/repo/benchdata/sf1", src_dims: str = "/root/testdata/sf0.1",
         n_docs: str | int = N_DOCS, n_vecs: str | int = N_VECS):
    """Extra args scale the two big tables — e.g. the sf10 probe
    (tools/stress_sf10.py) generates 500k docs / 200k vectors with the
    identical distribution shape and plant cadence:

        python tools/gen_sf1.py benchdata/sf10 /root/testdata/sf0.1 500000 200000
    """
    n_docs, n_vecs = int(n_docs), int(n_vecs)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(gen_documents(n_docs), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs), os.path.join(out_dir, "embeddings.parquet"))
    for dim in ("region", "nation", "part", "customer", "supplier"):
        src = os.path.join(src_dims, f"{dim}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, f"{dim}.parquet"))
    print(f"scaled data at {out_dir}: documents={n_docs} embeddings={n_vecs}")


if __name__ == "__main__":
    main(*sys.argv[1:])
