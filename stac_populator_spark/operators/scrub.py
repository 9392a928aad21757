"""Corpus scrubbing stages for training-data pipelines: PII redaction and
benchmark decontamination.

Both are standard stages of public web-text pipelines (the GPT-3 paper's
13-gram eval-overlap filter, Appendix A; C4's regex scrubbing) re-expressed
Spark-first:

- **PII redaction** is a pure column-expression regexp_replace chain —
  whole-stage codegen, zero Python, linear scan. Patterns are
  deliberately RE2-compatible so the DuckDB oracle mirrors them verbatim.
- **Decontamination** is an n-gram-hash semi-join: the eval/benchmark side
  (small by construction) is exploded to distinct shingle hashes and
  broadcast; the training corpus explodes its shingles once and
  left-semi-joins — contaminated doc ids come back without shuffling the
  corpus (broadcast hash join), the aggregation is the only exchange.

Reference tie-in: the dead-letter/validity framing follows the same
route-don't-drop contract as operators/validate.py (reference
populators.py:268-274 failure isolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns (no backrefs/lookarounds): identical strings work in
# Spark (Java regex) and DuckDB (RE2) — the oracle mirrors them verbatim
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # \+?\b (not \b\+?): there is no word boundary between ' ' and '+', so
    # \b-first silently drops the leading '+' from the match
    "phone": r"\+?\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Replace each PII class with ``<CLASS>`` and count matches per class
    (``n_<class>`` columns; DuckDB mirror: LEN(REGEXP_EXTRACT_ALL(...))).

    Each ``n_<class>`` is counted against the PROGRESSIVELY-REDACTED text —
    the same value the class' own regexp_replace sees — so the count equals
    the number of replacements actually made (ADVICE r3: an IPv4-looking
    substring inside an already-redacted email must not inflate n_ipv4).

    r6 (guide §4.2): the six regex passes run as pyarrow RE2 kernels in
    one ``mapInArrow`` over whole batches instead of java.util.regex in
    codegen — the patterns are RE2-compatible BY CONTRACT (the DuckDB
    oracle executes the very same strings under RE2, so cross-engine
    equality already pins the two engines' match semantics on these
    patterns). Measured 3.3s → ~1s on the sf1 bench entry; counts/bytes
    verified identical at sf0.01/0.1/1.0. Column pruning note: pass only
    the columns you need — everything in ``df`` crosses the Arrow
    boundary (Catalyst cannot prune through mapInArrow)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"n_{name}", T.IntegerType()) for name in PII_PATTERNS]
        + [T.StructField(out_col, T.StringType())]
    )
    items = list(PII_PATTERNS.items())

    def run(batches):
        import pyarrow.compute as pc

        for batch in batches:
            if batch.num_rows == 0:
                continue
            red = batch.column(text_col)
            if not pa.types.is_string(red.type):
                red = pc.cast(red, pa.string())
            arrays = list(batch.columns)
            for name, pat in items:
                arrays.append(pc.cast(
                    pc.count_substring_regex(red, pattern=pat), pa.int32()
                ))
                red = pc.replace_substring_regex(
                    red, pattern=pat, replacement=f"<{name.upper()}>"
                )
            arrays.append(red)
            yield pa.RecordBatch.from_arrays(arrays, names=schema.fieldNames())

    return df.mapInArrow(run, schema=schema)


def words_col(text_col) -> F.Column:
    """Whitespace token array — materialize this in its OWN projection
    before handing it to :func:`ngram_hashes_from_words`."""
    return F.split(F.trim(text_col), r"\s+")


def ngram_hashes_from_words(words: F.Column, n: int = 5) -> F.Column:
    """Distinct xxhash64 hashes of word n-grams (the decontamination
    fingerprint unit; the GPT-3 filter used 13-grams — pick ``n`` to the
    corpus' typical document length).

    ``words`` MUST be a reference to an already-computed array column
    (guide §4/§1 measurement, r6): an expression embedded in a lambda body
    is re-evaluated PER ARRAY ELEMENT — higher-order functions run
    interpreted and nothing eliminates the common subexpression — so an
    inline ``split()`` here cost O(tokens²) regex work per document
    (measured 40.6s → 4.7s on the sf1 corpus gram stage alone)."""
    # positions 1..m-n+1 → sequence 0..m-n inclusive (m-n+1 grams)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, n))),
    )
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(
            F.array(F.xxhash64(F.concat_ws(" ", words)))
        )
    )


def ngram_hashes(text_col, n: int = 5) -> F.Column:
    """Single-expression spelling of :func:`ngram_hashes_from_words` —
    back-compat only. The inline ``split`` re-evaluates per element inside
    the transform lambda; hot paths must use the two-stage form."""
    return ngram_hashes_from_words(words_col(text_col), n)


def token_hashes_col(words: F.Column) -> F.Column:
    """Per-token xxhash64 array — materialize in its OWN projection before
    :func:`ngram_hashes_from_token_hashes` (same per-element re-evaluation
    rule as :func:`words_col`)."""
    return F.transform(words, lambda t: F.xxhash64(t))


def ngram_hashes_from_token_hashes(hashes: F.Column, n: int = 5) -> F.Column:
    """Distinct n-gram fingerprints over an already-computed per-token
    xxhash64 array: gram hash = xxhash64 over the n token hashes.

    r6 (guide §4.1): the string formulation
    (``xxhash64(concat_ws(' ', slice(words, i+1, n)))``) allocated a slice
    array + a joined string per gram inside the interpreted lambda; hashing
    the n token LONGS instead (each token's string is hashed ONCE up front)
    cuts the gram stage 3.6 s → 2.2 s at sf1. Matching semantics are
    unchanged: both sides of a decontamination join use the same
    fingerprint, two grams collide across formulations only at the 2^-64
    hash-collision level (same exactness class as the old spelling, whose
    distinct-gram counts were also hash-based), and the short-document
    branch hashes the whole token-hash array so sub-n docs still only match
    equal token sequences."""
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(hashes) - n, F.lit(0))),
        lambda i: F.xxhash64(*[F.element_at(hashes, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(hashes) >= n, grams).otherwise(F.array(F.xxhash64(hashes)))
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """(clean, contaminated): training docs sharing ANY word n-gram with
    the eval/benchmark set are routed out (never silently dropped —
    contaminated carries ``n_hits``).

    Scale shape: the eval side is small by construction (benchmarks are
    thousands of documents, the corpus is 10^12) → its distinct shingle
    hashes broadcast; the corpus side explodes shingles ONCE, inner-joins
    the broadcast table, and aggregates hit counts per doc — the only
    exchange is the per-doc hit aggregation, and it carries only
    (id, hash) pairs that actually matched.
    """
    # three-stage projection: token array, then per-token hashes, each in
    # its own child Project so lambdas reference materialized columns and
    # never re-evaluate an embedded subexpression per element (see
    # ngram_hashes_from_words); gram fingerprints hash the n token longs
    # (see ngram_hashes_from_token_hashes — 1.6× the string spelling).
    eval_hashes = (
        eval_set.select(words_col(F.col(text_col)).alias("_w"))
        .select(token_hashes_col(F.col("_w")).alias("_h"))
        .select(F.explode(ngram_hashes_from_token_hashes(F.col("_h"), n)).alias("h"))
        .distinct()
    )
    corpus_shingled = (
        corpus.select(F.col(id_col), words_col(F.col(text_col)).alias("_w"))
        .select(F.col(id_col), token_hashes_col(F.col("_w")).alias("_h"))
        .select(
            F.col(id_col),
            F.explode(ngram_hashes_from_token_hashes(F.col("_h"), n)).alias("h"),
        )
    )
    # hits is tiny (matched docs only) but its subtree holds the full
    # corpus shingle explode; the clean/contaminated consumers share its
    # aggregate stage through AQE ReuseExchange (r5: the former
    # localCheckpoint(eager=False) pin was measured no faster at sf0.1 or
    # sf1 and costs a plan re-analysis per invocation)
    hits = (
        corpus_shingled.join(F.broadcast(eval_hashes), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    contaminated = corpus.join(hits, id_col)
    clean = corpus.join(hits.select(id_col), id_col, "left_anti")
    return clean, contaminated
