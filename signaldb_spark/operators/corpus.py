"""Corpus-level curation operators: TF-IDF term ranking, benchmark
decontamination, and deterministic stratified sampling.

These are the cross-document counterparts of ``text_analysis`` (which is
purely per-row): they need corpus statistics (document frequency, a
benchmark shingle set, per-stratum quotas) and are therefore built as
small-aggregate joins — the big text table is never shuffled, only
(id, hash) or (id, term) pairs.

Cross-engine determinism: scores avoid ``ln`` (libm rounding differs
across engines at the last ulp); a ratio of exact integers divides to
the *same* IEEE double everywhere, so ``tf * N / df`` replaces
``tf * ln(N/df)`` — same ranking direction, bit-identical result.
Sampling keys are md5-derived integers compared against integer
thresholds: no floats anywhere in the keep/drop decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import fan_out, normalize_text, word_shingles


def _r6(c):
    # explicit half-up rounding — see text_analysis.quality_features
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by rarity-weighted term
    frequency: ``score = tf * n_docs / doc_freq``.

    Shape (scales to 100 TB):
    - tokenize+explode → partial+final count on (doc, term): one shuffle
      whose rows are (id, term) — the text itself never moves;
    - doc-frequency is a groupBy on the term table (vocab-sized, orders
      of magnitude smaller than the corpus);
    - the corpus row count joins in as a broadcast 1-row cross join —
      no driver-side count action, single job;
    - per-doc top-k is a Window over doc_id (already the partition key
      of the tf table — AQE coalesces, no extra exchange needed).

    ``ln`` is deliberately absent from the score (docstring header); the
    integer ratio keeps the ranking oracle-exact.
    """
    tokens = fan_out(df).select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term")
    ).filter(F.col("term") != "")  # empty/whitespace-only docs tokenize
    # to [''] — an empty "term" with tiny df would otherwise rank as the
    # doc's top characteristic term
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", (F.col("tf") * F.col("n_docs")) / F.col("term_df"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col(id_col),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("term_df").cast("long").alias("term_df"),
            _r6(F.col("score")).alias("tfidf"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark_filter,
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents whose word
    n-gram shingles overlap a held-out benchmark set.

    The standard pre-training hygiene step (eval-set leakage check):
    every corpus doc is scored by ``|shingles ∩ benchmark| /
    |shingles|`` and flagged when the fraction reaches ``threshold``.

    Shape (scales to 100 TB): benchmark sets are tiny (an eval suite is
    KBs–MBs against a 100 TB corpus), so the distinct benchmark shingle
    set is **broadcast** — the corpus-side scan streams once through a
    map-side hash probe, then one groupBy on doc id aggregates counts.
    Shingles travel as xxhash64 longs, never strings (same trick as
    ``dedup.jaccard_pairs``).
    """
    bench_sh = F.broadcast(
        word_shingles(df.filter(benchmark_filter), id_col, text_col, n)
        .select(F.xxhash64("shingle").alias("shingle"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = df.filter(~benchmark_filter)
    corp_sh = word_shingles(corpus, id_col, text_col, n).select(
        F.col(id_col), F.xxhash64("shingle").alias("shingle")
    )
    # one pass: the broadcast probe marks hits, a single groupBy yields
    # both the per-doc shingle count and the overlap count — no second
    # aggregation, no extra join
    counts = (
        corp_sh.join(bench_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_common"),
        )
    )
    # 'source' rides along when the corpus has one (the composition
    # reports group on it) but is not required — the overlap math never
    # reads it, and hardcoding it crashed source-less corpora
    src_cols = ["source"] if "source" in corpus.columns else []
    base = corpus.select(id_col, *src_cols)
    out = base.join(counts, id_col, "left").select(
        F.col(id_col),
        *src_cols,
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
    )
    frac = F.when(
        F.col("n_shingles") > 0, F.col("n_common") / F.col("n_shingles")
    ).otherwise(F.lit(0.0))
    return out.select(
        "*",
        _r6(frac).alias("overlap_frac"),
        # int, not boolean: keeps the gate's canonicalized value compare
        # engine-neutral (bool str() forms differ across drivers)
        (frac >= F.lit(threshold)).cast("int").alias("contaminated"),
    )


SAMPLE_KEY_SPACE = 16 ** 8  # 8 md5 hex nibbles → [0, 2^32)


def sample_thresholds(rates: dict[str, float]) -> dict[str, int]:
    """Integer keep-thresholds from per-stratum rates — computed once in
    Python so the executor-side comparison is pure integer math."""
    return {k: int(rate * SAMPLE_KEY_SPACE) for k, rate in rates.items()}


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s1",
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff the first 32
    bits of ``md5(salt:id)`` fall under the stratum's integer threshold.

    Properties a training pipeline needs and ``df.sample`` lacks:
    reproducible across runs/engines (seeded by content, not RNG state),
    per-stratum rates (down-weight crawl, keep all of curated sources),
    and stable under re-partitioning. Pure map-side filter — zero
    shuffles, scales linearly.
    """
    thresholds = sample_thresholds(rates)
    key = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    thr = F.lit(int(default_rate * SAMPLE_KEY_SPACE))
    for stratum, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(t)).otherwise(thr)
    return (
        df.withColumn("sample_key", key)
        .filter(F.col("sample_key") < thr)
        .select(F.col(id_col), F.col(strata_col), "sample_key")
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 8,
    keep_first: bool = True,
) -> DataFrame:
    """C4-style segment-level dedup: split each document into
    consecutive ``seg_words``-word segments, and for any segment string
    that occurs more than once in the corpus keep only its first
    occurrence (min (doc, position)); the cleaned document is the
    surviving segments re-joined in original order.

    This is the boilerplate-removal step of C4/CCNet ("discard all but
    one of any three-sentence span occurring more than once") at word
    granularity. Shape at 100 TB: segments travel as (id, pos,
    xxhash64) — the text string itself never shuffles; one groupBy on
    the segment hash computes (count, first-occurrence) per segment; the
    verdict joins back on the hash; reassembly is one groupBy per doc of
    already-filtered segments. Three shuffles total, all on longs.

    Output: (id, clean_text, n_segments, n_kept) — docs whose every
    segment was dropped still appear, with empty clean_text.
    """
    # token array materializes before the transform — a lambda slicing
    # the raw split(normalize) expression re-runs the regex pipeline
    # once per segment
    base = fan_out(df).select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tokens = F.col("_toks")
    n_seg = F.ceil(F.size(tokens) / seg_words).cast("int")
    segs = F.when(
        F.size(tokens) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_seg, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.slice(tokens, (i - F.lit(1)) * seg_words + 1, seg_words)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = (
        base
        .select(F.col(id_col), F.posexplode(segs).alias("pos", "seg"))
        .withColumn("seg_h", F.xxhash64("seg"))
    )
    # one aggregation decides every segment's fate: occurrence count and
    # the first (doc, pos) occurrence as a lexicographic struct min —
    # works for any comparable id type and any document length (an
    # arithmetic id*K+pos encoding would break on non-numeric ids or
    # ≥K-segment documents)
    occ = F.struct(F.col(id_col), F.col("pos"))
    verdict = exploded.select("seg_h", occ.alias("occ")).groupBy("seg_h").agg(
        F.count(F.lit(1)).alias("seg_n"), F.min("occ").alias("first_occ")
    )
    keep_cond = F.col("seg_n") == 1
    if keep_first:
        keep_cond = keep_cond | (occ == F.col("first_occ"))
    # verdicts travel WITHOUT segment text — (id, pos, seg_h) longs only
    # through the seg_h shuffle and the per-doc groupBy; the text joins
    # back exactly once (base join on id) and clean_text re-slices from
    # the doc's own token array. The previous shape carried every
    # segment string through BOTH shuffles, which at scale made the
    # exchanges text-width, not long-width.
    kept = (
        exploded.select(id_col, "pos", "seg_h")
        .join(verdict, "seg_h")
        .withColumn("_keep", keep_cond.cast("int"))
    )
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("_keep").cast("long").alias("n_kept"),
        F.sort_array(
            F.collect_list(F.when(F.col("_keep") == 1, F.col("pos")))
        ).alias("_kept_pos"),
    )
    # LEFT join from base: a doc with NULL/empty text produced no
    # segments and would otherwise vanish — the docstring's contract is
    # that every input doc appears (empty clean_text, zero counts)
    joined = base.join(per_doc, id_col, "left")
    clean = F.concat_ws(
        " ",
        F.transform(
            F.coalesce(F.col("_kept_pos"), F.array().cast("array<int>")),
            lambda p: F.concat_ws(
                " ", F.slice(tokens, p * seg_words + 1, seg_words)
            ),
        ),
    )
    return joined.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(salt:id) → 32-bit
    integer key compared against cumulative integer thresholds — the
    same no-floats mechanism as stratified_sample, so membership is
    reproducible across engines, runs, and cluster sizes, and a
    document NEVER changes split when the corpus grows (the property
    random splits lack). Map-only, zero shuffles."""
    ws = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(ws)
    total = sum(ws.values())
    space = 16 ** 8
    cuts, acc = [], 0.0
    for n in names[:-1]:
        acc += ws[n] / total
        cuts.append(int(acc * space))
    key = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))), 1, 8), 16, 10).cast("long")
    # build the when-chain from the LAST threshold outward so the first
    # (smallest) threshold ends up evaluated first
    split = F.lit(names[-1])
    for n, cut in zip(names[:-1][::-1], cuts[::-1]):
        split = F.when(key < F.lit(cut), F.lit(n)).otherwise(split)
    return df.select(F.col(id_col), key.alias("split_key"), split.alias("split"))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "bpe_tokens",
    budget: int = 2048,
) -> DataFrame:
    """Contiguous sequence packing for pretraining: documents in id
    order fill fixed ``budget``-token bins; a document's bin is where
    its FIRST token lands (documents may straddle a boundary — the
    dense-packing variant used when an attention mask handles document
    breaks; first-fit-no-straddle is inherently sequential and belongs
    in the single-writer tail of the pipeline, not the distributed
    bulk). One window cumsum ordered by id — at 100 TB this is a range
    partition + per-partition scan, the same cost as any global sort.

    Output: (id, tokens, bin, bin_offset) with bin_offset = the
    document's first-token position inside its bin.

    The global cumsum is DISTRIBUTED, not a single-partition window:
    range-partition by id (range r maps to partition id r in id order —
    the RangePartitioner invariant this relies on), local cumsum per
    partition, then each partition's start offset arrives as a
    broadcast of the tiny per-partition totals. The result is invariant
    to the partition boundaries, so sampling-based range bounds don't
    affect output."""
    spark = df.sparkSession
    # NULL token counts (NULL-text docs upstream) pack as zero-length
    # sequences: without the coalesce, a partition of all-NULL counts
    # crashes the driver on int(None) and mixed rows silently emit
    # bin=NULL rows no unpacker can place
    df = df.withColumn(token_col, F.coalesce(F.col(token_col), F.lit(0)))
    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    part = df.repartitionByRange(n_parts, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # localCheckpoint (eager), not cache(): _pid comes from
    # spark_partition_id() over an AQE-managed range shuffle, and AQE may
    # coalesce DIFFERENTLY between the totals job and the output job. A
    # cache only *probably* pins one materialization — if cached
    # partitions are evicted/lost, recomputation could re-plan the
    # shuffle and silently desync bin assignments from the collected
    # offsets. Checkpointing truncates lineage, so recomputation with
    # different partition ids is impossible (a lost checkpoint block
    # fails loudly instead).
    with_local = part.withColumn(
        "_lc", F.sum(F.col(token_col)).over(w_local)
    ).localCheckpoint()
    totals = sorted(
        (r["_pid"], r["_tot"])
        for r in with_local.groupBy("_pid").agg(F.max("_lc").alias("_tot")).collect()
    )
    offsets, acc = [], 0
    for pid, tot in totals:
        offsets.append((pid, acc))
        acc += int(tot)
    off_df = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    )
    start = (F.col("_off") + F.col("_lc") - F.col(token_col)).cast("long")
    return (
        with_local.join(off_df, "_pid")
        .select(
            F.col(id_col),
            F.col(token_col).alias("tokens"),
            F.floor(start / budget).cast("long").alias("bin"),
            (start % budget).cast("long").alias("bin_offset"),
        )
    )


def bigram_familiarity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Language-model familiarity score — the no-external-model stand-in
    for CCNet/RefinedWeb perplexity filtering: train a word-bigram model
    ON THE CORPUS ITSELF (P(w2|w1) = c(w1,w2) / c(w1,·)) and score each
    document by the mean transition probability over its bigram tokens.
    Gibberish and boilerplate-free outlier docs score low; formulaic
    duplicates score high — the same separation axis perplexity gives,
    without ``ln`` (libm rounding differs across engines; an arithmetic
    mean of exact integer ratios stays oracle-exact — header note).

    Shape at 100 TB: bigrams explode once (positions via one transform,
    no self-join); model = two partial+final counts (bigram-vocab and
    unigram-vocab sized); scoring joins doc bigrams against the
    vocab-sized model table, then one per-doc aggregation. The mean
    accumulates 6dp-rounded probabilities as exact integer micro-units,
    so the sum is order-independent (the avg_quality trick).

    Output: (id, n_bigrams, familiarity ∈ [0,1]) for every document;
    docs with fewer than two tokens score 0 over 0 bigrams.
    """
    # token array materializes before the transform — a lambda indexing
    # the raw split(normalize) expression re-runs the regex pipeline
    # twice per bigram
    tok_base = fan_out(df).select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tokens = F.col("_toks")
    n_bg = F.size(tokens) - 1
    bigrams = F.when(
        n_bg >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_bg, F.lit(1))),
            lambda i: F.struct(
                F.element_at(tokens, i).alias("w1"),
                F.element_at(tokens, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    # Shuffles carry xxhash64 longs, not word strings: the bigram key
    # (h2) and the unigram key (h1) hash before any exchange — at 100 TB
    # the model join's shuffle width is the cost center and the word
    # pair is its widest column (same trick as dedup.jaccard_pairs).
    bg = (
        tok_base
        .select(F.col(id_col), F.explode(bigrams).alias("b"))
        .select(
            F.col(id_col),
            F.xxhash64("b.w1").alias("h1"),
            F.xxhash64("b.w1", "b.w2").alias("h2"),
        )
    )
    cnt = bg.groupBy("h2").agg(
        F.count(F.lit(1)).alias("c2"), F.first("h1").alias("h1")
    )
    den = bg.groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    p = cnt.join(den, "h1").select(
        "h2", _r6(F.col("c2") / F.col("c1")).alias("p")
    )
    scored = (
        bg.join(p, "h2")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.round(F.col("p") * 1e6, 0).cast("long")).alias("_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(
                _r6(F.col("_micro") / F.col("n_bigrams") / 1e6), F.lit(0.0)
            ).alias("familiarity"),
        )
    )


def source_cap(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    cap: int = 100,
    salt: str = "cap1",
) -> DataFrame:
    """Per-source quota capping — the domain-cap step of web-corpus
    curation (no single crawl source may dominate the training mix):
    keep at most ``cap`` documents per source, selected by md5 order so
    the survivors are an unbiased deterministic sample rather than the
    lowest ids (which correlate with crawl time).

    One window per source over (md5 key, id); everything else is
    map-side. A skewed giant source behaves like any hot window key —
    pre-filter with stratified_sample when one source is most of the
    corpus. Output: every kept (id, source, keep_rank)."""
    key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(source_col).orderBy(key, F.col(id_col))
    return (
        df.select(F.col(id_col), F.col(source_col), key.alias("_k"))
        .withColumn("keep_rank", F.row_number().over(w))
        .filter(F.col("keep_rank") <= cap)
        .select(id_col, source_col, F.col("keep_rank").cast("long").alias("keep_rank"))
    )


def repeated_ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Substring-level duplication signal (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" exact-substring pass,
    n-gram-window approximation): every length-``n`` token window that
    occurs ≥ ``min_occurrences`` times ANYWHERE in the corpus (cross- or
    within-document) marks its token span; per document the masked
    positions are interval-unioned into a repeated-token count.

    Scale shape: windows travel the shuffle as (doc, pos, xxhash64)
    longs — never text. One groupBy on the window hash finds hot
    windows; one join back (hash-keyed) tags positions; the interval
    union is an in-row fold over each doc's sorted positions
    (``least(n, gap)`` per step — exact for fixed-length intervals).
    Suffix arrays find arbitrary-length repeats; fixed-n windows find
    every repeat of length ≥ n at ~1/n the index cost, which is the
    standard production tradeoff.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    # fan_out: the per-row xxhash64 window work below is the heaviest
    # map stage in the file — a single-split input must not serialize it
    # on one core. greatest(…, 0): size(NULL) is -1 for NULL-text docs,
    # which would emit total_tokens = -1 into downstream sums.
    base = fan_out(df).select(F.col(id_col), toks.alias("_t")).select(
        id_col, "_t",
        F.greatest(F.size("_t"), F.lit(0)).alias("total_tokens"),
    )
    # window hashes with their start position (0-based)
    win = base.select(
        id_col,
        "total_tokens",
        F.explode(
            F.when(
                F.col("total_tokens") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.col("total_tokens") - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(F.array_join(F.slice("_t", i + 1, n), "\x1f")).alias(
                            "wh"
                        ),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,wh:long>>"))
        ).alias("w"),
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.wh").alias("wh"))
    hot = (
        win.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") >= min_occurrences)
        .select("wh")
    )
    hits = win.join(hot, "wh").select(id_col, "pos")
    acc0 = F.struct(
        F.lit(-(10**9)).alias("last"), F.lit(0).cast("long").alias("covered")
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list("pos")),
        acc0,
        lambda a, p: F.struct(
            p.alias("last"),
            (a["covered"] + F.least(F.lit(n), p - a["last"])).alias("covered"),
        ),
        lambda a: a["covered"],
    )
    per_doc = hits.groupBy(id_col).agg(
        F.countDistinct("pos").alias("repeated_windows"), folded.alias("masked_tokens")
    )
    out = base.select(id_col, "total_tokens").join(per_doc, id_col, "left")
    return out.select(
        id_col,
        "total_tokens",
        F.coalesce("repeated_windows", F.lit(0)).cast("long").alias("repeated_windows"),
        F.coalesce("masked_tokens", F.lit(0)).cast("long").alias("masked_tokens"),
        _r6(
            F.coalesce("masked_tokens", F.lit(0))
            / F.greatest(F.col("total_tokens"), F.lit(1))
        ).alias("repeated_frac"),
    )


def corpus_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str = "source",
    quality_threshold: float = 0.5,
) -> DataFrame:
    """Per-source dataset-card composition report: document counts,
    length stats, quality pass rate (text_analysis.quality_features
    composite ≥ threshold), and the exact-dup rate (1 − distinct
    normalized digests / docs) — the summary table every curation run
    publishes next to its output.

    ONE partial+final aggregation over the per-row features plus one
    digest count-distinct; document text contributes a digest and
    per-row scalars to the shuffle, never the text itself."""
    from .text_analysis import quality_features

    feats = quality_features(df, text_col)
    digest = F.md5(normalize_text(F.col(text_col)))
    r6 = _r6
    return (
        feats.withColumn("_digest", digest)
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("q_chars").cast("long").alias("total_chars"),
            r6(F.avg("q_words")).alias("mean_words"),
            r6(F.avg("quality_score")).alias("mean_quality"),
            r6(
                F.avg((F.col("quality_score") >= quality_threshold).cast("double"))
            ).alias("quality_pass_rate"),
            # denominator counts non-null digests only, matching the
            # countDistinct numerator — NULL-text docs are not
            # duplicates of each other and must not inflate the rate
            # (all-null source would otherwise report 1.0)
            r6(
                F.when(
                    F.count("_digest") > 0,
                    F.lit(1.0) - F.countDistinct("_digest") / F.count("_digest"),
                ).otherwise(F.lit(0.0))
            ).alias("exact_dup_rate"),
        )
        .orderBy("source")
    )


def chunk_token_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/pretraining document
    splitter: chunk ``i`` covers normalized whitespace tokens
    ``[i*stride, i*stride + chunk_size)``; the last chunk is the first
    window that reaches the end of the document, so every token is
    covered, consecutive chunks overlap by ``chunk_size - stride``
    tokens, and no chunk is fully contained in its predecessor.

    Shape (scales to 100 TB): tokenization, the chunk-index
    ``sequence`` + ``posexplode``, and the per-chunk slice are all
    map-side per-row expressions — zero shuffles, zero Python; the fan
    -out factor is ~n_tokens/stride per document, so output size is a
    constant multiple of input. Returns one row per chunk:
    (id, chunk_id, chunk_tokens, chunk_text).
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n_tok = F.size(toks)
    # number of stride positions that start inside the document
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n_tok - F.lit(chunk_size)) / F.lit(stride)).cast("int")
        + F.lit(1),
    )
    base = fan_out(df).select(
        F.col(id_col), toks.alias("_toks"), n_tok.alias("_n_tok"),
        F.sequence(F.lit(0), n_chunks - 1).alias("_idx"),
    )
    start = F.col("chunk_id") * stride
    chunk_len = F.least(F.lit(chunk_size), F.col("_n_tok") - start)
    chunk = F.slice(F.col("_toks"), start + 1, chunk_len)
    return (
        base.select(
            id_col, "_toks", "_n_tok",
            F.explode("_idx").alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            chunk_len.cast("long").alias("chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> "list[dict]":
    """Distributed byte-pair-encoding merge learning (Sennrich 2016):
    the ``n_merges`` highest-frequency adjacent symbol pairs over the
    corpus vocabulary, applied greedily left-to-right in frequency
    order. Returns the learned merge table
    ``[{rank, left, right, merged, weight}, ...]`` — the artifact a
    tokenizer trainer persists.

    Scale shape (100 TB): the corpus text is read ONCE to build the
    word-frequency table (explode → groupBy word, the wordcount
    shuffle); every BPE iteration then runs over the VOCABULARY table
    only (distinct alphanumeric words — millions of rows at web scale,
    orders of magnitude smaller than the corpus) with one vocab-sized
    pair aggregation and a 1-row argmax collect per merge. The per-word
    symbol sequence is an in-row string; the merge application is a
    literal JVM-side replace, no Python in the loop. The vocab table is
    eagerly localCheckpoint-ed each iteration so plan lineage stays
    flat across merges.

    Determinism: ties on pair weight break on (left, right) ascending;
    only ``[a-z0-9]+`` words participate (symbols can then never
    contain the ``|`` sequence delimiter and are regex-metachar-free on
    both engines). Greedy overlap semantics (``aaa`` + merge ``a+a`` →
    ``aa,a``) follow from non-overlapping left-to-right literal
    replacement on the ``|l||r|`` delimited form, where every symbol
    carries its own boundaries so adjacent matches never share a
    delimiter.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    words = (
        fan_out(df)
        .select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    # |c||h||a||r| delimited symbol sequence: each symbol owns BOTH its
    # boundary markers, so replacing |l||r| with |lr| is exact greedy
    # BPE even for self-pairs on runs
    vocab = words.select(
        "freq",
        F.concat(
            F.lit("|"),
            F.array_join(F.split(F.col("w"), "(?!$)"), "||"),
            F.lit("|"),
        ).alias("seq"),
    ).localCheckpoint(eager=True)

    merges: list[dict] = []
    for rank in range(n_merges):
        syms = F.split(
            F.regexp_replace(F.col("seq"), r"^\||\|$", ""), r"\|\|"
        )
        pairs = vocab.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
                    F.slice(
                        syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))
                    ),
                    lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("weight"))
            .orderBy(F.desc("weight"), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["p"]["l"], best[0]["p"]["r"]
        merged = left + right
        merges.append({
            "rank": rank, "left": left, "right": right,
            "merged": merged, "weight": int(best[0]["weight"]),
        })
        old = vocab
        vocab = vocab.select(
            "freq",
            F.replace(
                F.col("seq"),
                F.lit(f"|{left}||{right}|"),
                F.lit(f"|{merged}|"),
            ).alias("seq"),
        ).localCheckpoint(eager=True)
        old.unpersist()
    return merges


def bpe_apply_merges(
    df: DataFrame,
    merges: "list[dict]",
    text_col: str = "text",
    id_col: "str | None" = None,
) -> DataFrame:
    """Tokenize with a learned merge table: every ``[a-z0-9]+`` word
    maps to its post-merge symbol count (non-participating words count
    1 symbol per character, their BPE-less floor). Map-only — the merge
    ranks apply as a chain of literal replaces per row; returns the
    input plus ``bpe_symbols`` (per-document symbol total) and
    ``bpe_words`` (participating word count).

    With ``id_col`` set (unique per row), counts group by that key and
    left-join back to ``df``, so documents with zero ``[a-z0-9]+``
    words return ``bpe_symbols = bpe_words = 0``. Without it, the
    group-by spans ALL input columns: zero-word documents are dropped
    from the output and exact-duplicate input rows collapse into one
    row with combined counts."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    word = F.col("w")
    seq = F.concat(
        F.lit("|"), F.array_join(F.split(word, "(?!$)"), "||"), F.lit("|")
    )
    for m in merges:
        seq = F.replace(
            seq,
            F.lit(f"|{m['left']}||{m['right']}|"),
            F.lit(f"|{m['merged']}|"),
        )
    n_syms = F.size(F.split(F.regexp_replace(seq, r"^\||\|$", ""), r"\|\|"))
    exploded = fan_out(df).select(
        "*", F.explode(toks).alias("w")
    ).filter(word.rlike("^[a-z0-9]+$"))
    counted = exploded.withColumn("_syms", n_syms)
    if id_col is not None:
        per_id = counted.groupBy(id_col).agg(
            F.sum("_syms").cast("long").alias("bpe_symbols"),
            F.count(F.lit(1)).cast("long").alias("bpe_words"),
        )
        return df.join(per_id, id_col, "left").select(
            *df.columns,
            F.coalesce("bpe_symbols", F.lit(0)).cast("long")
            .alias("bpe_symbols"),
            F.coalesce("bpe_words", F.lit(0)).cast("long")
            .alias("bpe_words"),
        )
    keys = [c for c in df.columns]
    return (
        counted.groupBy(*keys)
        .agg(
            F.sum("_syms").cast("long").alias("bpe_symbols"),
            F.count(F.lit(1)).cast("long").alias("bpe_words"),
        )
    )


def epoch_shuffle_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    batch_size: int = 256,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic epoch shuffling with exact-size batch assembly —
    the training-loader order, computed in-engine: every row gets a
    global shuffle rank (the ascending order of ``md5(salt:epoch:id)``,
    a different but reproducible permutation per epoch) and a batch id
    ``rank // batch_size``. Same inputs → same batches, on any cluster,
    at any partitioning — the property ``df.orderBy(rand())`` cannot
    give.

    Precondition: ``id_col`` values must be UNIQUE. Duplicate ids tie
    exactly on (shuffle_key, id), and row_number's order over exact
    ties is not deterministic across runs/partitionings — dedupe or
    synthesize a unique id first. (A content tiebreak is deliberately
    not added: hashing every remaining column per row would double the
    shuffle width for a precondition any loader pipeline already
    guarantees.)

    Scale shape: a GLOBAL row_number would be one single-partition
    window — the driver-side-loop anti-pattern in window form. Instead
    the global rank assembles from two scale-safe pieces: a rank WITHIN
    each of 65536 hash-prefix buckets (windows partitioned by bucket —
    parallel, skew-free since md5 is uniform) plus each bucket's
    cumulative row offset (a 65536-row aggregate, broadcast back). Two
    shuffles total (bucket window + tiny-agg join), both keyed by the
    uniform hash — no sampling, no range-exchange, exact ranks.

    Returns the input plus (shuffle_key, batch_id, pos_in_batch).
    """
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    key_hex = F.md5(
        F.concat_ws(":", F.lit(salt), F.lit(str(epoch)),
                    F.col(id_col).cast("string"))
    )
    # first 4 hex nibbles = 65536 uniform buckets; remaining nibbles
    # order within the bucket (with the id as an exact tiebreak for the
    # astronomically-unlikely collision)
    bucket = F.conv(F.substring(key_hex, 1, 4), 16, 10).cast("long")
    base = fan_out(df).select(
        "*", key_hex.alias("shuffle_key"), bucket.alias("_bucket")
    )
    w = Window.partitionBy("_bucket").orderBy("shuffle_key", F.col(id_col))
    ranked = base.withColumn("_local", F.row_number().over(w) - 1)
    offsets = (
        base.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_bucket")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_bucket", "_offset")
    )
    out = ranked.join(F.broadcast(offsets), "_bucket")
    rank = F.col("_local") + F.col("_offset")
    return out.select(
        *[c for c in df.columns],
        "shuffle_key",
        (rank / batch_size).cast("long").alias("batch_id"),
        (rank % batch_size).cast("long").alias("pos_in_batch"),
    )
