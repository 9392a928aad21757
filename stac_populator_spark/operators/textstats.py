"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions — whole-stage
codegen, zero Python. These are the graft analogues of the reference's
per-item property derivations (prefix props, validators —
/root/reference/STACpopulator/extensions/cmip6.py:112-131) applied to web
text instead of CF metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em"],
    "ru": ["и", "в", "не", "на", "что", "с", "это", "как"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "不"],
    "ja": ["の", "に", "は", "を", "た", "が", "で", "て"],
}


def tokens_col(text_col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens (whitespace), n_bpe_tokens (BPE-ish regex), n_chars,
    avg_token_len."""
    toks = tokens_col(text_col)
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE))
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_bpe_tokens", bpe)
        .withColumn("n_chars_calc", F.length(text_col))
        .withColumn(
            "avg_token_len",
            F.round(F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / F.greatest(F.size(toks), F.lit(1)), 4),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score: length band, alpha
    ratio, punctuation ratio, stopword(en) hit ratio, repetition ratio."""
    length = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    toks = tokens_col(text_col)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_toks
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    d = (
        df.withColumn("alpha_ratio", F.round(alpha / F.greatest(length, F.lit(1)), 4))
        .withColumn("punct_ratio", F.round(punct / F.greatest(length, F.lit(1)), 4))
        .withColumn("distinct_ratio", F.round(distinct_ratio, 4))
        .withColumn("stop_distinct_hits", stop_hits)
    )
    score = (
        F.when(length < 32, 0.2).when(length > 20000, 0.5).otherwise(1.0)
        * (F.lit(0.5) + F.lit(0.5) * F.col("alpha_ratio"))
        * (F.lit(0.5) + F.lit(0.5) * F.col("distinct_ratio"))
    )
    return d.withColumn("quality_score", F.round(score, 4))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: predicted lang = argmax over per-language
    distinct-stopword hits (ties → lexicographically first lang). Pure
    array expressions over a literal stopword table — the broadcast-lookup
    pattern of the reference's controlled vocabularies
    (/root/reference/STACpopulator/extensions/cmip6.py:47-67)."""
    toks = tokens_col(text_col)
    scored = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(STOPWORDS.items())
        ]
    )
    # array_max on struct orders by first field then second — to get
    # "max hits, tie → first lang", invert lang ordering is overkill; take
    # max hits then the first lang achieving it.
    best_hits = F.array_max(F.transform(scored, lambda s: s["hits"]))
    pred = F.element_at(F.filter(scored, lambda s: s["hits"] == best_hits), 1)["lang"]
    return df.withColumn(
        "lang_pred", F.when(best_hits > 0, pred).otherwise(F.lit("unknown"))
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition quality signals (the Gopher-rule family, public: Rae et
    al. 2021 §A1.1): per document —

    - ``top_tok_share``  — count of the most frequent token / n_tokens
    - ``dup_2gram_frac`` — 1 − distinct-2-grams / total-2-grams
    - ``distinct_ratio`` — distinct tokens / n_tokens
    - ``rep_flag``       — 'repetitive' | 'low_diversity' | 'ok'

    Scale design: everything is computed INSIDE one narrow projection —
    the most-frequent-token count comes from a linear run-length scan over
    the sorted token array (``aggregate`` with a struct accumulator), not
    from the wordcount explode+groupBy formulation, so at 10^12 documents
    this stage shuffles NOTHING and pipelines with extraction.

    The token array is materialized in a child projection (``_toks_rep``,
    dropped before returning): lambda bodies re-evaluate embedded
    expressions per array element, so the former inline ``split`` inside
    the 2-gram transform re-ran the regex once per gram (r6; same finding
    as scrub.ngram_hashes_from_words — measured ~8× on the sf1 gram
    stage). The multiple references below also keep CollapseProject from
    inlining it back."""
    df = df.withColumn("_toks_rep", tokens_col(text_col)).withColumn(
        "_th_rep", F.transform(F.col("_toks_rep"), lambda x: F.xxhash64(x))
    )
    toks = F.col("_toks_rep")
    th = F.col("_th_rep")
    n_toks = F.size(toks)
    sorted_toks = F.array_sort(toks)
    zero = F.lit(0).cast("long")
    state0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def step(s, t):
        run = F.when(t.eqNullSafe(s["prev"]), s["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(t.alias("prev"), run.alias("run"), F.greatest(s["best"], run).alias("best"))

    max_tok_count = F.aggregate(sorted_toks, state0, step, lambda s: s["best"])
    n2 = n_toks - 1
    idx = F.sequence(F.lit(0), F.greatest(n2 - 1, F.lit(0)))
    # 2-gram fingerprints over the per-token xxhash64 array (r6): the
    # string spelling (concat_ws of a 2-token slice per gram) allocated a
    # slice + a joined string per gram — hashing the two token longs is
    # 2× cheaper (2.26 s → 1.15 s at sf1 for this expression alone).
    # Distinct-gram counts are exact up to xxhash64 collisions (two
    # distinct grams in ONE document colliding: ~n²/2⁶⁵ per doc — the
    # same exactness class the dedup/decontamination fingerprints already
    # accept). element_at stays in ANSI bounds: the otherwise-branch only
    # evaluates when n2 ≥ 1, so i + 2 ≤ n2 + 1 = size(toks).
    grams = F.transform(
        idx, lambda i: F.xxhash64(F.element_at(th, i + 1), F.element_at(th, i + 2))
    )
    dup_2gram = F.when(
        n2 < 1, F.lit(0.0)
    ).otherwise(F.lit(1.0) - F.size(F.array_distinct(grams)) / n2)
    d = (
        df.withColumn("n_tokens", n_toks)
        .withColumn("n_distinct", F.size(F.array_distinct(toks)))
        .withColumn("top_tok_share", F.round(max_tok_count / F.greatest(n_toks, F.lit(1)), 6))
        .withColumn("dup_2gram_frac", F.round(dup_2gram, 6))
        .withColumn(
            "distinct_tok_ratio",
            F.round(F.size(F.array_distinct(toks)) / F.greatest(n_toks, F.lit(1)), 6),
        )
    )
    return d.withColumn(
        "rep_flag",
        F.when(F.col("top_tok_share") > 0.2, "repetitive")
        .when(F.col("distinct_tok_ratio") < 0.3, "low_diversity")
        .otherwise("ok"),
    ).drop("_toks_rep", "_th_rep")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit rolling hash over tokens: fp = fold(tokens, 0,
    xxhash64(acc, tok)) — hash chaining as a single JVM ``aggregate``
    expression (order-sensitive, overflow-free under ANSI mode)."""
    toks = tokens_col(text_col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc, t),
    )
    return df.withColumn("fingerprint", fp)
