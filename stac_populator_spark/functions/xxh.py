"""Vectorized XXH64 over BIGINT chains — bit-exact numpy replica of
Spark's ``xxhash64(c1, .., ck)`` fold for LongType children.

Spark's XxHash64 expression folds children through
``hash = XXH64(child_bytes, seed=hash)`` starting from seed 42; for a
long child each round is the 8-byte XXH64 path (accumulate, one mix
round, avalanche). The same fold defines ``xxhash64(array<bigint>)``
(element-wise chain), so both the n-gram fingerprint
``xxhash64(h_1, .., h_n)`` and the short-document fingerprint
``xxhash64(hash_array)`` are reproducible here exactly.

Parity is pinned by tests/test_scrub.py::test_xxh64_chain_matches_spark
over random 64-bit inputs (multi-column chain, single column, and the
array fold), so kernels built on this module emit values bit-identical
to the former JVM expressions.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64_long(l: np.ndarray, seed) -> np.ndarray:
    """XXH64 of one 8-byte long per lane with per-lane (or scalar) seed —
    Spark's ``XxHash64Function.hashLong``. uint64 in/out, wraparound
    arithmetic (numpy overflow warnings suppressed by design)."""
    with np.errstate(over="ignore"):
        acc = seed + _P5 + np.uint64(8)
        k = l * _P2
        k = _rotl(k, 31)
        k = k * _P1
        acc = acc ^ k
        acc = _rotl(acc, 27) * _P1 + _P4
        acc ^= acc >> np.uint64(33)
        acc *= _P2
        acc ^= acc >> np.uint64(29)
        acc *= _P3
        acc ^= acc >> np.uint64(32)
        return acc


def xxh64_chain(cols: list[np.ndarray], seed: int = 42) -> np.ndarray:
    """Spark ``xxhash64(c1, .., ck)`` over k BIGINT columns (and, with the
    columns being successive array elements, ``xxhash64(array<bigint>)``)."""
    if not cols:
        raise ValueError("xxh64_chain needs at least one column")
    acc = np.full(cols[0].shape, np.uint64(seed), dtype=np.uint64)
    for c in cols:
        acc = xxh64_long(np.ascontiguousarray(c).view(np.uint64)
                         if c.dtype == np.int64 else c.astype(np.uint64), acc)
    return acc


def gram_fingerprints(values: np.ndarray, offsets: np.ndarray, n: int):
    """Distinct n-gram fingerprints per document over flattened per-token
    hash lists — the vectorized equivalent of
    ``array_distinct(transform(seq, i -> xxhash64(h_i.., h_{i+n-1})))``
    with the sub-n fallback ``array(xxhash64(hash_array))``.

    values: int64/uint64 flat token-hash buffer; offsets: int64 array of
    len(docs)+1 list offsets (null lists must be pre-resolved to empty).
    Returns (doc_idx, fingerprints): parallel arrays of the DISTINCT
    (document, fingerprint) pairs, doc_idx ascending.

    Empty lists fold zero elements → the bare seed (42), matching
    ``xxhash64(NULL)`` / the empty-array fold in the JVM.
    """
    values = values.view(np.uint64) if values.dtype == np.int64 else values.astype(np.uint64)
    lengths = np.diff(offsets)
    n_docs = len(lengths)
    doc_of_val = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)

    out_doc = []
    out_fp = []

    # long docs: every position p with p+n-1 inside the same doc starts a gram
    if values.size >= n:
        starts = np.arange(values.size - n + 1, dtype=np.int64)
        ok = doc_of_val[starts] == doc_of_val[starts + n - 1]
        starts = starts[ok]
        if starts.size:
            gh = xxh64_chain([values[starts + j] for j in range(n)])
            out_doc.append(doc_of_val[starts])
            out_fp.append(gh)

    # short docs (0 <= len < n): one fingerprint = chain over the whole list,
    # vectorized per distinct length (lengths 0..n-1, so at most n groups)
    short = np.flatnonzero(lengths < n)
    for L in np.unique(lengths[short]) if short.size else []:
        docs_l = short[lengths[short] == L]
        if L == 0:
            fp = np.full(docs_l.shape, SEED, dtype=np.uint64)
        else:
            base = offsets[docs_l]
            fp = xxh64_chain([values[base + j] for j in range(int(L))])
        out_doc.append(docs_l.astype(np.int64))
        out_fp.append(fp)

    if not out_doc:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    doc = np.concatenate(out_doc)
    fp = np.concatenate(out_fp)
    # distinct per doc
    order = np.lexsort((fp, doc))
    doc, fp = doc[order], fp[order]
    keep = np.ones(doc.shape, bool)
    keep[1:] = (doc[1:] != doc[:-1]) | (fp[1:] != fp[:-1])
    return doc[keep], fp[keep]
