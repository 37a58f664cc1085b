"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference capability (SURVEY §7.11): exact dedup, word-shingle
Jaccard, MinHash+LSH banding, and SimHash — all as pure DataFrame
transforms (explode + groupBy + join), no driver-side loops, so they
scale by partitioning.

Cross-engine determinism: every hash is ``md5`` (bit-identical in any
engine) — MinHash's k hash functions are ``md5(k || ':' || shingle)``
and SimHash's projection is the md5 nibble value at a fixed position.
That makes even the sketch-based operators oracle-checkable in SQL.

Scale notes (100 TB):
- exact dedup is one hash-shuffle on the digest — the canonical pattern;
- shingle explosion multiplies rows by ~tokens-per-doc; the pair join is
  bounded by per-shingle doc frequency (a hot shingle with df=d creates
  d² candidate pairs — cap df like production MinHash pipelines when
  corpus vocabulary is skewed);
- MinHash reduces the pair join to (num_bands) bucket joins whose keys
  are band signatures — collision probability follows the standard
  (1-(1-s^r)^b) S-curve; banded buckets distribute uniformly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEXDIGITS = "0123456789abcdef"


def fan_out(df: DataFrame) -> DataFrame:
    """Spread an under-partitioned scan across the cluster before a
    compute-heavy expansion (shingle explode, per-row md5 batteries).

    A small parquet file arrives as ONE input split, serializing all
    downstream hashing onto one core regardless of cluster size; a
    bounded repartition up front costs one tiny shuffle of the raw rows
    and buys full parallelism. No-op when the scan is already at least
    as parallel as the cluster — at 100 TB, file splits dominate and
    this never fires.

    Stays inside the DataFrame API: the split estimate comes from
    ``inputFiles()`` + on-disk size (a ``df.rdd`` probe would force plan
    analysis outside AQE on every call)."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return df  # non-file-backed plan: leave partitioning to AQE
    if len(files) >= target:
        return df
    try:
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        max_bytes = int(raw.lower().rstrip("b")) or 128 * 1024 * 1024
    except Exception:
        max_bytes = 128 * 1024 * 1024
    est_splits = 0
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        try:
            size = os.path.getsize(path)
            est_splits += max(1, -(-size // max_bytes))
        except OSError:
            est_splits += 1  # remote scheme: count the file as one split
    if est_splits < target:
        return df.repartition(target)
    return df


def normalize_text(col):
    """Lowercase + whitespace collapse — the canonical pre-dedup form."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content digest: keeper = min id.

    One shuffle on the md5 digest; at 100 TB hash first, never shuffle
    the full text.
    """
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, exploded.

    Built-in higher-order functions only (split → sequence → transform →
    explode): stays in whole-stage codegen, no Python in the loop. The
    token array MATERIALIZES as a column before the transform — a
    lambda referencing the raw split(normalize) expression re-evaluates
    the regex pipeline once per shingle (no common-subexpression
    elimination across the lambda boundary; measured 2.2x slower at
    sf0.1).
    """
    base = fan_out(df).select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tokens = F.col("_toks")
    count = F.size(tokens) - (n - 1)
    shingles = F.when(count >= 1, F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )).otherwise(F.array().cast("array<string>"))
    return base.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


DEFAULT_MAX_SHINGLE_DF = 100


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """All-pairs word-n-gram Jaccard similarity ≥ threshold.

    |A∩B| via self-join on shared shingles; |A∪B| = |A|+|B|-|A∩B|.
    ``max_shingle_df`` drops ubiquitous shingles before the pair join —
    the df² blowup guard (a shingle in d docs makes d² candidate pairs),
    ON by default because an uncapped hot shingle is fatal at scale.
    Sizes (|A|, |B|) stay uncapped, so only the intersection count is
    approximated — pairs whose overlap rides on ubiquitous shingles may
    drop below threshold. Pass ``None`` for the exact baseline.

    Shingles are reduced to 64-bit hashes *before* the cache and the
    pair join: every exchange then carries (long, long) rows instead of
    multi-word strings — at 100 TB the pair join's shuffle is the cost
    center and the key is its widest column. Equality on the hash is
    equality on the shingle up to xxhash64 collisions (expected
    colliding pairs ≈ d²/2⁶⁵ — zero in practice).
    """
    overlap = _pair_overlap(df, id_col, text_col, n, max_shingle_df)
    return (
        overlap.withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _pair_overlap(
    df: DataFrame, id_col: str, text_col: str, n: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """Shared pair-generation for the shingle-overlap family
    (jaccard_pairs / containment_pairs): hashed shingles, hot-shingle
    broadcast anti join, one equi-join intersection, sizes joined in.
    Returns (id_a, id_b, n_common, n_a, n_b).

    The size joins are ordinary equi-joins, NOT forced broadcasts:
    ``sizes`` is one row per document — corpus-sized — and a forced
    broadcast of it would ship a multi-GB table through the driver at
    exactly the scale this module is designed for; AQE still broadcasts
    it when it is actually small. (The HOT list broadcast above is the
    bounded one: at most Σdf/cap entries.)"""
    sh = (
        word_shingles(df, id_col, text_col, n)
        .select(F.col(id_col), F.xxhash64("shingle").alias("shingle"))
        .cache()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        # broadcast ANTI join against the HOT list (df > cap), not an
        # inner join against the keep list: hot shingles number at most
        # Σdf/cap ≪ vocabulary, so the broadcast is tiny (usually
        # empty), and the anti join keeps sh's partitioning instead of
        # shuffling the whole corpus against a vocabulary-sized keep set
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_")).filter(
            F.col("df_") > max_shingle_df
        ).select("shingle")
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b")
    return inter.join(sa, "id_a").join(sb, "id_b")


def containment_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Near-SUPERSET detection: shingle containment
    ``|A∩B| / min(|A|, |B|)`` ≥ threshold — catches a document embedded
    inside a larger one (boilerplate wrapping, quote-with-commentary),
    which symmetric Jaccard misses because the union is dominated by
    the big document.

    Identical pair-generation shape (and df² guard) as
    :func:`jaccard_pairs` — shared via :func:`_pair_overlap`; only the
    score formula differs."""
    overlap = _pair_overlap(df, id_col, text_col, n, max_shingle_df)
    return (
        overlap.withColumn(
            "containment",
            F.round(F.col("n_common") / F.least("n_a", "n_b"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def minhash_from_shingles(
    sh: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """MinHash signatures from an already-shingled (id, shingle) table —
    lets a pipeline shingle the corpus ONCE and feed both a
    decontamination probe and the signature aggregation from the same
    cached table instead of re-exploding the text per consumer.

    The explode(0..num_hashes-1) → md5 → (id, h) min-aggregate shape is
    deliberate: partial (map-side) aggregation reduces the shuffle to
    ~docs×num_hashes pre-aggregated rows, strictly less than the
    collect_list-per-doc alternative, which ships the whole shingle
    corpus to fold signatures in one row (A/B-measured slower r12 —
    the array-fold trick only wins where the per-doc array already
    exists pre-explode, as in minhash_error_bands)."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h")
    expanded = sh.select(id_col, "shingle", idx)
    return (
        expanded.withColumn(
            "hv", F.md5(F.concat_ws(":", F.col("h"), F.col("shingle")))
        )
        .groupBy(id_col, "h")
        .agg(F.min("hv").alias("minhash"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per document: for hash i, min over shingles of
    md5(i || ':' || shingle). One row per (doc, hash_index).

    The min of a cryptographic hash over the shingle set is the standard
    MinHash estimator; md5-as-string min is deterministic everywhere.
    """
    return minhash_from_shingles(
        word_shingles(df, id_col, text_col, n), id_col, num_hashes
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """LSH banding: group the signature into ``bands`` bands of
    num_hashes/bands rows, hash each band, and self-join on
    (band, band_hash) to emit candidate pairs.

    The band hash sorts the band's minhash VALUES — positional fidelity
    is preserved anyway because each value embeds its hash index in the
    salt (md5(h:shingle)), so values from different positions collide
    only on an md5 collision.
    """
    if bands <= 0 or bands > num_hashes or num_hashes % bands != 0:
        # bands > num_hashes would make rows_per_band 0 and the band
        # expression h/0 — every doc in one NULL band, banding silently
        # collapsed; non-dividing values silently change the band count
        raise ValueError(
            f"bands must evenly divide num_hashes "
            f"(num_hashes={num_hashes}, bands={bands})"
        )
    rows_per_band = num_hashes // bands
    banded = (
        sigs.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list("minhash")))).alias("band_hash"))
    )
    # Pairs are emitted by grouping each (band, band_hash) bucket and
    # expanding i<j combinations with a higher-order transform — NOT by
    # self-joining `banded` with itself: a self-join evaluates the whole
    # upstream minhash pipeline twice (Spark shares no work between the
    # two join inputs), and at 100 TB that doubles the dominant shuffle.
    # One groupBy replaces the join; array_sort gives the same a < b
    # ordering the join's filter imposed. Bucket membership lists are
    # near-dup groups, so they stay small by construction.
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda a, i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                    lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                ),
            )
        )
    )
    return (
        buckets.select(pair.alias("p")).select("p.id_a", "p.id_b").distinct()
    )


def connected_components(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b",
    max_iterations: int = 20, driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Duplicate-cluster consolidation: connected components over a
    near-dup pair list → (id, cluster_id, cluster_size) with
    cluster_id = min member id (the canonical keeper).

    Hash-min with pointer jumping: every node starts labeled with its
    own id; each round a node takes the min of its own and its
    neighbors' labels (hash-min), then replaces its label with its
    label's label (path compression). The jump halves path lengths, so
    rounds needed are O(log diameter) instead of O(diameter) — the
    difference between ~5 and ~30 Spark jobs on the chain-shaped
    components LSH near-dup graphs actually produce. Each round's label
    table is eagerly checkpointed (reliable ``checkpoint`` when the
    session has a checkpoint dir, ``localCheckpoint`` otherwise), which
    TRUNCATES the logical
    plan — a plain ``.cache()`` bounds recomputation but not the plan,
    and since every round references the previous one ~4× (union +
    propagation join + pointer-jump self-join) a cached loop grows the
    Catalyst tree ~4^k until analysis itself OOMs the driver.
    Convergence is detected from a one-row bit_xor(xxhash64) checksum of
    the label table (one cheap action per round instead of a
    compare-join).

    Only ids that appear in ``pairs`` are clustered — singletons never
    entered the pair list and need no consolidation.

    Regime split (same contract both ways): below
    ``driver_threshold`` edges the pair list is collected and resolved
    with union-find on the driver — the graph is bounded and tiny
    relative to the corpus it came from, and a Spark iteration on an
    overhead-bound graph costs seconds per round for no parallelism
    gain (the same reasoning that broadcasts a small join side). Above
    the threshold the distributed hash-min/pointer-jump loop runs, which
    is the shape that survives billions of edges.
    """
    pairs = pairs.cache()
    n_edges = pairs.count()
    if n_edges <= driver_threshold:
        rows = pairs.select(a_col, b_col).collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ra, rb = find(r[0]), find(r[1])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members: dict = {}
        for node in list(parent):
            members.setdefault(find(node), []).append(node)
        out = [
            (node, root, len(nodes))
            for root, nodes in members.items()
            for node in nodes
        ]
        spark = pairs.sparkSession
        id_type = pairs.schema[a_col].dataType
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType(
            [
                StructField("id", id_type),
                StructField("cluster_id", id_type),
                StructField("cluster_size", LongType()),
            ]
        )
        pairs.unpersist()
        return spark.createDataFrame(out, schema)
    # pairs are (id_a < id_b) and already distinct, so the two directed
    # legs can never collide — no dedup pass needed. Cache pairs so the
    # union's two legs share one upstream run, and pre-partition edges
    # on src: every iteration's propagation join then reuses this
    # partitioning and only the (smaller) label side shuffles.
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    # Right-size the loop's shuffle width to the edge count (known from
    # the regime split above): ~1M edges per partition, capped at the
    # session's shuffle parallelism. An explicit repartition is exempt
    # from AQE coalescing, so without this every iteration schedules
    # full-width tasks over a graph that may be far smaller than the
    # corpus it came from.
    spark = pairs.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_parts = max(1, min(width, 1 + n_edges // 1_000_000))
    edges = fwd.unionByName(rev).repartition(n_parts, "src").cache()

    # Eager checkpoints: each round's labels must start from a truncated
    # plan or the loop's Catalyst tree grows ~4^k. When a checkpoint dir
    # is configured (sc.setCheckpointDir) use RELIABLE checkpoints —
    # blocks written to shared storage survive executor loss, the right
    # choice under dynamic allocation / spot decommission where a lost
    # executor would otherwise fail the whole loop (the truncated plan
    # cannot recompute). Otherwise fall back to localCheckpoint: blocks
    # live only on executors (MEMORY_AND_DISK, spillable) — faster, and
    # safe on static-executor / local deployments; the ContextCleaner
    # reclaims each round's blocks once the rebound Python reference
    # drops.
    reliable = spark.sparkContext.getCheckpointDir() is not None

    def _truncate(df):
        # Reliable checkpoints stay EAGER: a lazy Dataset.checkpoint
        # writes its files in a separate job after the first action,
        # recomputing every partition. localCheckpoint persists blocks
        # during the first computation, so the lazy form lets each
        # round's convergence checksum double as the materializing
        # action — one job per round instead of two (materialize, then
        # checksum) for the same truncated plan.
        return df.checkpoint(eager=True) if reliable \
            else df.localCheckpoint(eager=False)

    labels = _truncate(
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("lab", F.col("id"))
    )
    prev_sig = None
    for _ in range(max_iterations):
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "lab")
        )
        merged = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("lab").alias("lab"))
        )
        # pointer jump: lab <- lab(lab). Labels are always ids of real
        # nodes, so the self-join hits; coalesce guards the no-op case.
        jump = merged.select(F.col("id").alias("_jid"), F.col("lab").alias("_jlab"))
        new = _truncate(
            merged.join(jump, merged.lab == jump._jid, "left")
            .select(
                merged.id,
                F.coalesce(F.col("_jlab"), merged.lab).alias("lab"),
            )
        )
        sig = new.agg(F.expr("bit_xor(xxhash64(id, lab))")).collect()[0][0]
        labels = new
        if sig == prev_sig:
            break
        prev_sig = sig
    edges.unpersist()
    pairs.unpersist()
    w = Window.partitionBy("lab")
    return (
        labels.withColumn("cluster_size", F.count(F.lit(1)).over(w).cast("long"))
        .select(F.col("id"), F.col("lab").alias("cluster_id"), "cluster_size")
    )


def _nibble(col, pos: int):
    """Value 0-15 of hex digit ``pos`` (1-based) of an md5 hex string."""
    return F.conv(F.substring(col, pos, 1), 16, 10).cast("int")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash over word tokens: bit p = sign of sum over distinct tokens
    of (nibble_p(md5(token)) - 7.5). One long column ``simhash``.

    A 16-dimension nibble projection rather than the classic 64-bit —
    the estimator is identical in structure and fully cross-engine
    deterministic. Output bit p set iff the summed projection > 0.
    """
    tokens = fan_out(df).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
        ).alias("tok"),
    ).withColumn("hv", F.md5(F.col("tok")))
    per_bit = [
        F.sum(_nibble(F.col("hv"), p + 1) - 7.5).alias(f"s{p}") for p in range(bits)
    ]
    agg = tokens.groupBy(id_col).agg(*per_bit)
    sim = None
    for p in range(bits):
        bit = F.when(F.col(f"s{p}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p)
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_near_pairs(sim: DataFrame, id_col: str, max_hamming: int = 3, bits: int = 16) -> DataFrame:
    """Near-dup pairs by Hamming distance on the simhash, via bit-band
    blocking — the same shape as MinHash banding, and EXACT:

    Split the hash into ``max_hamming + 1`` contiguous bit-bands. By
    pigeonhole, any pair within hamming ≤ max_hamming differs in at most
    max_hamming bands, so at least one band is bit-identical — an
    equi-join per band finds every qualifying pair, and the exact
    bit_count check inside candidates discards false positives. No
    cartesian product; candidate volume is bounded by per-band bucket
    occupancy instead of n².
    """
    n_bands = max_hamming + 1
    if n_bands > bits:
        raise ValueError(
            f"max_hamming + 1 bands need at least that many bits "
            f"(bits={bits}, bands={n_bands})"
        )
    # even-split band boundaries, NOT ceil-width: with ceil, bands=5 over
    # bits=16 makes the last band zero-width — constant 0 for every doc,
    # so that band's equi-join degenerates to a full cross product
    # (results stay correct through the hamming filter, but the job is
    # O(n²) at exactly the scale banding exists for)
    bounds = [(i * bits) // n_bands for i in range(n_bands + 1)]

    def band_val(col, i):
        lo, hi = bounds[i], bounds[i + 1]
        return F.shiftright(col, lo).bitwiseAND(F.lit((1 << (hi - lo)) - 1))

    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                band_val(F.col("simhash"), i).alias("band_val"),
            )
            for i in range(n_bands)
        ]
    )
    # (id, simhash, band, band_val) is 4 longs per doc×band — cache it so
    # the self-join's two legs don't each re-run the token-explode
    # simhash aggregation upstream
    ex = (
        sim.select(F.col(id_col), F.col("simhash"), F.explode(bands).alias("bv"))
        .select(
            id_col, "simhash", F.col("bv.band").alias("band"),
            F.col("bv.band_val").alias("band_val"),
        )
        .cache()
    )
    a = ex.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "band_val"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "band_val"
    )
    # A pair that matches in several bands would surface once per band;
    # instead of a dropDuplicates shuffle over the full candidate set,
    # keep only the FIRST matching band: for band i require every band
    # j < i to differ. Pure map-side arithmetic on (sh_a, sh_b) — each
    # qualifying pair survives exactly once, so the result needs no
    # dedup pass at all.
    first_match = F.lit(True)
    for i in range(1, n_bands):
        earlier_differs = F.lit(True)
        for j in range(i):
            earlier_differs = earlier_differs & (
                band_val(F.col("sh_a"), j) != band_val(F.col("sh_b"), j)
            )
        first_match = F.when(F.col("band") == i, earlier_differs).otherwise(first_match)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_match)
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def incremental_dedup(
    new_batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup a NEW ingest batch against an EXISTING corpus — the
    incremental form every production pipeline actually runs (full-corpus
    re-dedup per batch is O(corpus), this is O(batch + digest join).

    Verdicts per new document:
    - ``dup_of_corpus``: content digest already present in the corpus;
    - ``dup_in_batch``: digest is new to the corpus but another batch
      document with a smaller id carries it;
    - ``new``: first occurrence anywhere.

    Scale shape: the corpus projects to DISTINCT 16-byte digests only
    (never text); the probe is one left join on the digest — AQE
    broadcasts it when the historical digest set is small, hash-joins
    otherwise (at 100 TB the digest table is what you'd bucket by digest
    and co-locate). Within-batch ranking is one window over the batch's
    own digests.
    """
    digest = F.md5(normalize_text(F.col(text_col)))
    corpus_digests = (
        corpus.select(F.md5(normalize_text(F.col(text_col))).alias("digest"))
        .distinct()
        .withColumn("_in_corpus", F.lit(1))
    )
    batch = new_batch.select(F.col(id_col), digest.alias("digest"))
    w = Window.partitionBy("digest").orderBy(id_col)
    return (
        batch.join(corpus_digests, "digest", "left")
        .withColumn("_rk", F.row_number().over(w))
        .select(
            F.col(id_col),
            "digest",
            F.when(F.col("_in_corpus").isNotNull(), F.lit("dup_of_corpus"))
            .when(F.col("_rk") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


def verify_candidate_pairs(
    pairs: DataFrame,
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard VERIFICATION of sketch candidates — the second
    stage of every production near-dup pipeline: MinHash/SimHash
    banding over-generates (the S-curve admits false positives), so
    surviving pairs are re-scored with exact set Jaccard before any
    document is dropped.

    ``pairs`` is a candidate list (id_a, id_b); ``sh`` is the shingle
    table (id, shingle) — pass the xxhash64-reduced form so every join
    below shuffles longs. Shape: shingles join the candidate list
    FIRST (per-pair work is bounded by candidates × shingles-per-doc,
    never corpus²), then one equi-join on (pair, shingle) counts the
    intersection and sizes join in. Output: (id_a, id_b, jaccard)
    filtered to ``threshold``."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = pairs.join(
        sh.select(F.col(id_col).alias("id_a"), F.col("shingle")), "id_a"
    )
    inter = (
        a.join(
            sh.select(F.col(id_col).alias("id_b"), F.col("shingle")),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .fillna({"n_common": 0})
        # LEFT joins, consistent with the n_common fill: a candidate
        # whose doc produced zero shingles (shorter than n words —
        # simhash candidates can be) has no sizes row; an inner join
        # silently dropped the pair instead of scoring it 0
        .join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .fillna({"n_a": 0, "n_b": 0})
        .withColumn(
            "jaccard",
            F.when(
                (F.col("n_a") + F.col("n_b") - F.col("n_common")) > 0,
                F.round(
                    F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shared_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_tokens: int = 16,
    max_shingle_df: int = 64,
) -> DataFrame:
    """Cross-document duplicated-passage extraction — the ExactSubstr
    dedup shape (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): maximal runs of consecutive shared
    n-token shingles between document pairs, reported when the run
    spans at least ``min_tokens`` tokens (a run of L shingles covers
    L + n - 1 tokens). Returns one row per maximal passage:
    (id_a, id_b, start_a, start_b, match_tokens), id_a < id_b,
    positions 0-based in normalized-token space.

    Shape (scales to 100 TB):
    - positional shingles travel as (id, pos, xxhash64) longs — text
      never shuffles;
    - a shingle-frequency pass keeps only shingles shared by 2..
      ``max_shingle_df`` documents: df=1 shingles (the overwhelming
      majority of a real corpus) never reach the pair join, and
      boilerplate shingles hotter than the cap are dropped explicitly
      (an uncapped hot shingle creates df² pairs — fatal at scale, the
      same guard as jaccard_pairs);
    - pair volume is then Σ C(df,2) over SHARED shingles — bounded by
      duplicated content, not corpus size;
    - run consolidation is one window per (pair, diagonal): positions
      on the same diagonal (pos_a - pos_b) with consecutive pos_a form
      an island (pos_a - row_number), one groupBy emits the maximal
      run. Hash collisions can only create spurious single-shingle
      matches (two colliding 64-bit shingles), which ``min_tokens``
      filters unless n >= min_tokens; collision-tolerant by the same
      argument as repeated_ngrams.
    - the (id, pos, h) shingle derivation is deliberately RECOMPUTED
      per join leg rather than cached: it is corpus-token-sized (~24
      bytes x total tokens — far beyond executor memory at 100 TB) and
      each recomputation is a map-only pass over the scan, which is
      cheaper than spilling a cache of it. A production pipeline
      running this repeatedly would materialize the shingle projection
      to storage once and feed that table here.
    """
    base = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"),
    )
    tokens = F.col("_toks")
    count = F.size(tokens) - (n - 1)
    sh = base.select(
        "id",
        F.explode(
            F.when(count >= 1, F.transform(
                F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                lambda i: F.struct(
                    (i - 1).cast("long").alias("pos"),
                    F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, n)))
                    .alias("h"),
                ),
            )).otherwise(
                F.array().cast("array<struct<pos:long,h:long>>")
            )
        ).alias("s"),
    ).select("id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    shared = (
        sh.groupBy("h")
        .agg(F.count_distinct("id").alias("sdf"))
        .filter((F.col("sdf") >= 2) & (F.col("sdf") <= max_shingle_df))
        .select("h")
    )
    sh = sh.join(shared, "h")
    a = sh.select(F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), "h")
    hits = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", "pos_a", "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
        # the same n-gram repeated inside one document lands the same
        # (pair, diag, pos_a) via different shingle hashes only on
        # collision; distinct keeps the window's row_number arithmetic
        # honest regardless
        .distinct()
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = (
        hits.withColumn(
            "island", F.col("pos_a") - F.row_number().over(w)
        )
        .groupBy("id_a", "id_b", "diag", "island")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(n - 1)).cast("long")
            .alias("match_tokens"),
        )
        .filter(F.col("match_tokens") >= min_tokens)
    )
    return runs.select("id_a", "id_b", "start_a", "start_b", "match_tokens")
