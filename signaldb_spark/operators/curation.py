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

from .dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_from_shingles,
    normalize_text,
    word_shingles,
)
from .text_analysis import quality_features, repetition_features, token_counts


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
            # avg over EXACT integer micro-units: quality_score is already
            # 6dp, so sum(round(qs*1e6)) is an exact integer in any
            # summation order — the half-up r6 of a float avg is one ulp
            # from a boundary flip across engines (seen at sf0.01)
            r6(
                F.sum(F.round(F.col("quality_score") * 1e6, 0).cast("long"))
                / F.count(F.lit(1)) / 1e6
            ).alias("avg_quality"),
        )
        .orderBy("source")
    )


def curate_corpus_full(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    benchmark_filter=None,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.45,
    max_dup_bigram_frac: float = 0.05,
    decontam_threshold: float = 0.05,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    eager: bool = False,
) -> DataFrame:
    """The full C4/RefinedWeb-shaped curation pipeline in one plan:

    1. per-row signals (quality, tokens, Gopher repetition) — codegen
       expressions, zero shuffle;
    2. language + quality + repetition filter — prunes before any
       exchange, on the half-up-6dp-rounded scores so every threshold
       compare is engine-stable;
    3. benchmark decontamination — broadcast eval-suite shingle probe,
       contaminated docs anti-joined out;
    4. near-dup consolidation — MinHash + LSH banding over survivors,
       connected components, keep the min-id doc per cluster;
    5. per-source yield report — one partial+final aggregation.

    At 100 TB: the text column never crosses an exchange (all hashing
    happens before the shuffles; pair joins carry longs); the benchmark
    set is broadcast; the LSH pair join is banded, never all-pairs; and
    the cluster drop-list arrives as an anti-join, which AQE turns into
    a broadcast when (as always) duplicates are a small corpus
    fraction.
    """
    scored = token_counts(
        quality_features(repetition_features(df, text_col), text_col), text_col
    )
    corpus = scored.filter(~benchmark_filter) if benchmark_filter is not None else scored
    # The filter survivors feed three consumers (decontamination probe,
    # MinHash signatures, final yield agg). Cache the slim projection so
    # the regex-heavy scoring subtree evaluates ONCE per document, not
    # once per consumer; .cache() is MEMORY_AND_DISK, so at 100 TB the
    # post-filter survivors spill rather than recompute.
    kept = corpus.filter(
        F.col(lang_col).isin(*langs)
        & (F.col("quality_score") >= min_quality)
        & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
    ).select(id_col, "source", "bpe_tokens", "quality_score", text_col).cache()
    # Shingle the survivors ONCE; both the decontamination probe and the
    # MinHash aggregation read this table. Cached in raw-string form
    # (MinHash needs the string; the probe derives its 64-bit key).
    ksh = word_shingles(kept, id_col, text_col, n).cache()
    if benchmark_filter is not None:
        bench_sh = F.broadcast(
            word_shingles(df.filter(benchmark_filter), id_col, text_col, n)
            .select(F.xxhash64("shingle").alias("sh64"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        # cached: the contamination drop-list feeds BOTH the clean corpus
        # anti-join and the clean-shingle anti-join; uncached it would
        # re-run the broadcast probe per consumer. It is a bounded id
        # list (contaminated docs only), so the cache is tiny.
        contaminated = (
            ksh.select(F.col(id_col), F.xxhash64("shingle").alias("sh64"))
            .join(bench_sh, "sh64", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("_n"), F.count("hit").alias("_c"))
            .filter((F.col("_c") / F.col("_n")) >= decontam_threshold)
            .select(id_col)
            .cache()
        )
        clean = kept.join(contaminated, id_col, "left_anti")
        csh = ksh.join(contaminated, id_col, "left_anti")
    else:
        clean = kept
        csh = ksh
    sigs = minhash_from_shingles(csh, id_col, num_hashes=num_hashes)
    pairs = lsh_candidate_pairs(sigs, id_col, num_hashes=num_hashes, bands=bands)
    comps = connected_components(pairs)
    dropped = comps.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    final = clean.join(dropped, id_col, "left_anti")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6
    report = final.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("bpe_tokens").alias("sum_bpe_tokens"),
        # avg over EXACT integer micro-units: quality_score is already
        # 6dp, so sum(round(qs*1e6)) is an exact integer in any
        # summation order — the half-up r6 of a float avg is one ulp
        # from a boundary flip across engines (seen at sf0.01)
        r6(
            F.sum(F.round(F.col("quality_score") * 1e6, 0).cast("long"))
            / F.count(F.lit(1)) / 1e6
        ).alias("avg_quality"),
    )
    # Cache lifecycle: the default (lazy) keeps the intermediates cached
    # after the caller's action — repeated calls over the SAME corpus
    # reuse them (Spark's CacheManager dedups identical plans), but a
    # long-lived session curating MANY corpora accumulates entries until
    # LRU pressure; such callers pass ``eager=True`` to materialize the
    # per-source report here and release every intermediate immediately.
    if not eager:
        return report.orderBy("source")
    report = report.localCheckpoint()
    kept.unpersist()
    ksh.unpersist()
    if benchmark_filter is not None:
        contaminated.unpersist()
    return report.orderBy("source")
