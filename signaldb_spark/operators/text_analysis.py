"""Text analysis for training-data curation: language ID, quality
scoring, token counting, fingerprinting. All built-in column
expressions — regex + length arithmetic — so they run in whole-stage
codegen and are oracle-expressible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import fan_out, normalize_text

# language marker words for the n-gram/stopword-heuristic language ID;
# deliberately tiny and deterministic (a real pipeline would load a
# frequency model — the *shape* of the operator is what matters here)
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "et", "la", "est"],
    "es": ["el", "y", "la", "es"],
}


def _count_word(text: Column, word: str) -> Column:
    """Occurrences of a whole word in normalized text. NULL text counts
    ZERO — size(NULL) is -1 under Spark's legacy sizeOfNull, which would
    make every marker score negative for null-body rows."""
    return F.greatest(
        F.size(F.regexp_extract_all(text, F.lit(rf"\b{word}\b"), F.lit(0))),
        F.lit(0),
    )


def lang_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Marker-hit score per language + argmax prediction (ties → first
    language in fixed en/de/fr/es order; zero hits → 'und')."""
    t = normalize_text(F.col(text_col))
    out = fan_out(df)
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            c = _count_word(t, w)
            score = c if score is None else score + c
        out = out.withColumn(f"score_{lang}", score.cast("long"))
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):
        pred = F.when(F.col(f"score_{l}") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return out.withColumn("pred_lang", pred)


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    features + a composite quality score in [0, 1].

    The score is a fixed linear blend — deterministic, documented, and
    monotone in the obvious directions (more stopwords & moderate word
    length = more natural-language-like).
    """
    t = normalize_text(F.col(text_col))
    n_chars = F.length(t)
    words = F.split(t, " ")
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    n_stop = F.size(
        F.regexp_extract_all(t, F.lit(r"\b(the|and|of|is|a|to|in)\b"), F.lit(0))
    )
    # ratios feed the score UNROUNDED (pre-rounding to 6dp manufactures
    # decimal ties that round differently across engines); outputs are
    # rounded only at the edge
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    mean_wlen = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    score = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            F.lit(0.5)
            + F.lit(2.0) * stop_ratio
            - F.lit(3.0) * punct_ratio
            - F.abs(mean_wlen - 5.0) / 10.0,
        ),
    )
    # explicit half-up rounding (floor(x*1e6+0.5)/1e6): the score mixes
    # dyadic rationals that land EXACTLY on .5 at the 7th decimal, where
    # engine round() modes disagree (HALF_UP vs HALF_EVEN)
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6
    return fan_out(df).select(
        "*",
        n_chars.cast("long").alias("q_chars"),
        n_words.cast("long").alias("q_words"),
        r6(punct_ratio).alias("punct_ratio"),
        r6(stop_ratio).alias("stop_ratio"),
        r6(mean_wlen).alias("mean_word_len"),
        r6(score).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate: count of
    runs matching letters / digits / single punctuation, plus a
    chars/4 heuristic — the standard pre-tokenizer shape."""
    t = normalize_text(F.col(text_col))
    ws = F.size(F.split(t, " "))
    bpe_ish = F.size(
        F.regexp_extract_all(t, F.lit(r"[a-z]+|[0-9]+|[^\w\s]"), F.lit(0))
    )
    approx4 = F.ceil(F.length(t) / 4)
    return fan_out(df).select(
        "*",
        ws.cast("long").alias("ws_tokens"),
        bpe_ish.cast("long").alias("bpe_tokens"),
        approx4.cast("long").alias("chars_div4_tokens"),
    )


def repetition_features(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-bigram fraction,
    top-bigram fraction, duplicate-token fraction.

    High values indicate boilerplate / machine-generated text (the
    Gopher rules filter on exactly these). Entirely higher-order array
    functions over the per-row token array — sort + fold, **zero
    shuffles**, whole-stage codegen; the per-doc "group-by bigram" is an
    ``array_sort`` + linear ``aggregate`` run-length fold instead of an
    explode + groupBy, so nothing leaves the row.
    """
    # token and bigram arrays materialize as columns before reuse: a
    # lambda (or repeated expression) referencing the raw
    # split(normalize) re-evaluates the regex pipeline per element
    base = fan_out(df).withColumn(
        "_toks", F.split(normalize_text(F.col(text_col)), " ")
    )
    tokens = F.col("_toks")
    n_tok = F.size(tokens)
    n_bi = n_tok - 1
    bigrams_expr = F.when(
        n_bi >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_bi, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = base.withColumn("_bigrams", bigrams_expr)
    bigrams = F.col("_bigrams")
    total = F.size(bigrams)
    distinct_bi = F.size(F.array_distinct(bigrams))
    # longest run in the sorted bigram array == max per-bigram count
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def _merge(acc, x):
        newrun = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.greatest(acc["best"], newrun).alias("best"),
        )

    top_bi = F.aggregate(F.array_sort(bigrams), acc0, _merge, lambda acc: acc["best"])
    dup_tok = n_tok - F.size(F.array_distinct(tokens))
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6
    safe_total = F.greatest(total, F.lit(1))
    return base.select(
        "*",
        total.cast("long").alias("n_bigrams"),
        distinct_bi.cast("long").alias("n_distinct_bigrams"),
        r6(F.when(total > 0, (total - distinct_bi) / safe_total).otherwise(F.lit(0.0))).alias(
            "dup_bigram_frac"
        ),
        r6(F.when(total > 0, top_bi / safe_total).otherwise(F.lit(0.0))).alias(
            "top_bigram_frac"
        ),
        r6(dup_tok / F.greatest(n_tok, F.lit(1))).alias("dup_token_frac"),
    ).drop("_toks", "_bigrams")


def fingerprint(df: DataFrame, text_col: str) -> DataFrame:
    """Content fingerprint: md5 of normalized text (stable id for dedup
    joins) + a 16-bit locality bucket from the digest's first nibbles."""
    t = normalize_text(F.col(text_col))
    digest = F.md5(t)
    return fan_out(df).select(
        "*",
        digest.alias("fingerprint"),
        F.conv(F.substring(digest, 1, 4), 16, 10).cast("long").alias("fp_bucket"),
    )
