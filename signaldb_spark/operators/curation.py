"""End-to-end training-data curation: score → filter → dedup → yield.

The composite pipeline a corpus-preparation job runs before
tokenization, expressed as two shuffles total regardless of corpus
size: quality/token features are codegen column expressions over the
scan (no shuffle), the language+quality filter prunes before any
exchange, exact dedup is ONE hash shuffle on the content digest
(min_by inside the aggregate — no join back to the corpus), and the
per-source yield report is ONE more partial+final aggregation on a
low-cardinality key. At 100 TB the digest shuffle carries only
(digest, source, tokens, score) — the text itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from .text_analysis import quality_features, token_counts


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.45,
) -> DataFrame:
    """Per-source curation yield after language filter, quality filter
    (on the half-up-6dp rounded score, so the threshold compare is
    engine-stable), and exact dedup keeping the lowest id per
    normalized-text digest. Returns (source, kept_docs,
    sum_bpe_tokens, avg_quality) sorted by source."""
    scored = token_counts(quality_features(df, text_col), text_col)
    kept = scored.filter(
        F.col(lang_col).isin(*langs) & (F.col("quality_score") >= min_quality)
    )
    digest = F.md5(normalize_text(F.col(text_col)))
    survivors = (
        kept.select(
            digest.alias("digest"),
            F.col(id_col).alias("_id"),
            "source",
            "bpe_tokens",
            "quality_score",
        )
        .groupBy("digest")
        .agg(
            F.min_by(
                F.struct("source", "bpe_tokens", "quality_score"), F.col("_id")
            ).alias("s")
        )
        .select("s.*")
    )
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("bpe_tokens").alias("sum_bpe_tokens"),
            r6(F.avg("quality_score")).alias("avg_quality"),
        )
        .orderBy("source")
    )
