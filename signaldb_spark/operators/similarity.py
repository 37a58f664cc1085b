"""Similarity search over embedding columns (``array<float>``).

Beyond-reference capability: brute-force cosine top-k as the exactness
baseline, and a deterministic hyperplane-LSH bucketing as the scale
path. Dot products use ``zip_with`` + ``aggregate`` higher-order
functions — JVM-side, single pass over the array, no Python UDF in the
hot loop (measured faster than unrolled per-element access chains).

Scale notes (100 TB): brute force is O(|queries| × |corpus|); with the
query side broadcast it is embarrassingly parallel over corpus
partitions and the top-k per query is a bucket-partitioned Window. The
LSH path cuts the corpus per query to one bucket; its hyperplanes are
derived from md5 nibbles so both engines (and any rerun) agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import HEXDIGITS, fan_out


def _dot(a, b, dims: int | None = None):
    """Dot product as a single-pass ``zip_with`` + ``aggregate`` fold.

    Measured note: an unrolled ``element_at``/``getItem`` sum chain is
    ~3× SLOWER than this fold (64 scattered array reads defeat codegen;
    the fold streams the array once), so the fold is the fast path and
    ``dims`` is accepted only for call-site symmetry."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a, dims: int | None = None):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 5, dims: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Query side is broadcast (small); ties broken by corpus id for
    determinism. Self-matches (same id) excluded. Pass ``dims`` when the
    embedding width is known to unroll the scoring into codegen.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = fan_out(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("cv"), dims)
                / (_norm(F.col("qv"), dims) * _norm(F.col("cv"), dims)),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def mips_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 5, dims: int | None = None,
) -> DataFrame:
    """Exact maximum-inner-product top-k per query vector — the
    retrieval objective for unnormalized embeddings (e.g. recommender
    towers), where cosine's normalization would discard magnitude.

    Same shape as :func:`cosine_topk`: broadcast query battery ×
    corpus scan, no norms; ties broken by corpus id. Self-matches
    excluded."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = fan_out(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", F.round(_dot(F.col("qv"), F.col("cv"), dims), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "dot", F.col("rk").cast("long").alias("rk"))
    )


def hyperplane_weight(bit: int, dim: int, salt: str | None = None) -> float:
    """Deterministic pseudo-random weight in [-7.5, 7.5]: the first md5
    nibble of '[<salt>:]b:<bit>:d:<dim>'. hashlib.md5 here is
    bit-identical to any engine's md5 of the same string, so the
    hyperplanes are reproducible across engines and reruns; a salt
    yields an independent hyperplane set (bucket rotation)."""
    import hashlib

    key = (f"{salt}:" if salt is not None else "") + f"b:{bit}:d:{dim}"
    return int(hashlib.md5(key.encode()).hexdigest()[0], 16) - 7.5


def lsh_bucket(
    df: DataFrame, vec_col: str, n_bits: int, dims: int, salt: str | None = None
) -> DataFrame:
    """Sign-of-projection LSH bucket id (0..2^n_bits-1) per vector.

    The whole bucket expression is emitted as ONE SQL string: building
    n_bits × dims Column terms through the Python API costs thousands of
    Py4J round-trips (measured: seconds of driver time per call site);
    one ``F.expr`` parse is milliseconds. The weights fold to literals
    either way, so the executed plan is identical."""
    parts = []
    for b in range(n_bits):
        ws = ", ".join(f"{hyperplane_weight(b, d, salt)!r}D" for d in range(dims))
        proj = (
            f"aggregate(zip_with({vec_col}, array({ws}),"
            " (x, w) -> CAST(x AS DOUBLE) * w), 0D, (a, v) -> a + v)"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN {2 ** b} ELSE 0 END)")
    # loud width guard: with dims != the actual vector width, zip_with
    # pads with NULLs, every projection aggregates to NULL, and every
    # row lands in bucket 0 — the "scale path" silently becomes the
    # full cross product. A mismatch is a caller bug; fail the query.
    guard = F.when(
        F.size(F.col(vec_col)) != dims,
        F.raise_error(
            f"lsh_bucket: embedding width != dims={dims} — every vector "
            "would land in bucket 0 (full cross product)"),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "bucket", (F.expr(" + ".join(parts)) + guard).cast("long")
    )


def lsh_ann_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 5, n_bits: int = 4, dims: int = 64,
) -> DataFrame:
    """Approximate top-k: restrict the exact cosine ranking to the
    query's LSH bucket. Recall < 1 by design; the bucket join replaces
    the full cross product (corpus/2^bits per query on average)."""
    cb = lsh_bucket(
        fan_out(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv", n_bits, dims,
    )
    qb = F.broadcast(
        lsh_bucket(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
            "qv", n_bits, dims,
        )
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("cv"), dims)
                / (_norm(F.col("qv"), dims) * _norm(F.col("cv"), dims)),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def _cell_scores(vec_col: str, centroids: list[list[float]]):
    """array of round(cosine(vec, centroid_i), 6) for every centroid —
    pure JVM higher-order expressions over a literal centroid table,
    emitted as one SQL string (hundreds of F.lit Column calls cost
    seconds of Py4J driver time; one parse is milliseconds)."""
    cents = ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids
    )
    dot = (
        f"aggregate(zip_with({vec_col}, c, (x, y) -> CAST(x AS DOUBLE) * y),"
        " 0D, (a, v) -> a + v)"
    )
    nv = (
        f"sqrt(aggregate({vec_col}, 0D,"
        " (a, v) -> a + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    nc = "sqrt(aggregate(c, 0D, (a, v) -> a + v * v))"
    return F.expr(f"transform(array({cents}), c -> round({dot} / ({nv} * {nc}), 6))")


def ivf_assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid cell id (1-based; ties → lowest cell). The
    centroid list is index metadata (driver-side, like any IVF index):
    assignment is a map-only expression — no shuffle, no join — so it
    scales linearly with the corpus."""
    scores = _cell_scores(vec_col, centroids)
    return df.withColumn(
        "cell", F.array_position(scores, F.array_max(scores)).cast("long")
    )


def ivf_probe_cells(
    df: DataFrame, vec_col: str, centroids: list[list[float]], nprobe: int
) -> DataFrame:
    """Explode each query row into its ``nprobe`` nearest cells
    (score desc, cell asc)."""
    scores = _cell_scores(vec_col, centroids)
    ranked = F.array_sort(
        F.zip_with(
            scores,
            F.sequence(F.lit(1), F.lit(len(centroids))),
            lambda s, i: F.struct(s.alias("score"), i.alias("cell")),
        ),
        lambda l, r: F.when(l.score > r.score, -1)
        .when(l.score < r.score, 1)
        .when(l.cell < r.cell, -1)
        .when(l.cell > r.cell, 1)
        .otherwise(0),
    )
    return df.withColumn(
        "cell", F.explode(F.transform(F.slice(ranked, 1, nprobe), lambda x: x.cell))
    ).withColumn("cell", F.col("cell").cast("long"))


def ivf_ann_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str = "vec_id",
    vec_col: str = "embedding", k: int = 5, n_cells: int = 8, nprobe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into
    nearest-centroid cells, probe only the query's ``nprobe`` closest
    cells, rank exactly inside them.

    Centroid choice here is deterministic (the ``n_cells`` lowest-id
    corpus vectors) so the index is reproducible in any engine and the
    whole operator sits under the DuckDB cross-check; at scale you
    would fit centroids with k-means (same plumbing — the centroid list
    is small driver metadata either way). Corpus assignment is
    map-only; the probe is a cell equi-join with the query side
    broadcast — corpus/n_cells × nprobe candidates per query instead of
    a full scan, and never a cartesian product."""
    cent_rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .limit(n_cells)
        .collect()
    )  # bounded: n_cells rows of index metadata
    centroids = [list(r.cv) for r in cent_rows]
    cb = ivf_assign(
        fan_out(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv", centroids,
    )
    qb = F.broadcast(
        ivf_probe_cells(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
            "qv", centroids, nprobe,
        )
    )
    dims = len(centroids[0]) if centroids else None
    scored = (
        qb.join(cb, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("qv"), F.col("cv"), dims)
                / (_norm(F.col("qv"), dims) * _norm(F.col("cv"), dims)),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def cosine_near_dup_pairs(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_bits: int = 4, dims: int = 64, rotations: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b) with cosine ≥
    threshold among candidates that share an LSH bucket in ANY of
    ``rotations`` independent hyperplane sets — the embedding leg of the
    dedup family (SURVEY §7.11).

    The bucket equi-join replaces the all-pairs cross product (candidate
    volume ~ rotations × Σ bucket², not n²); recall for a pair at angle
    θ is 1-(1-(1-θ/π)^n_bits)^rotations — high-cosine pairs land in the
    same bucket with near-certainty, which is exactly the near-dup
    regime. ``rotations=0`` (or ``n_bits=0``) falls back to the exact
    all-pairs baseline for small corpora.
    """
    cos = F.round(
        _dot(F.col("va"), F.col("vb"), dims) / (F.col("na") * F.col("nb")), 6
    )
    if rotations <= 0 or n_bits <= 0:
        withn = corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).withColumn("n", _norm(F.col("v"), dims))
        a = withn.select(
            F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
        )
        b = withn.select(
            F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
        )
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
    # norms computed once per vector BEFORE the join (not per candidate
    # pair); the threshold filter runs inside each rotation so only true
    # near-dup pairs — not the full candidate set — reach the final
    # distinct, and the dedup shuffle carries (id, id, cosine), never
    # the vectors themselves.
    base = (
        fan_out(corpus)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("n", _norm(F.col("v"), dims))
        # cached: each rotation's self-join evaluates its upstream TWICE
        # (Spark shares no work between join legs) and the loop repeats
        # it per rotation — uncached, the corpus scan + norm pipeline
        # runs 2×rotations times
        .cache()
    )
    cand = None
    for r in range(rotations):
        bb = lsh_bucket(base, "v", n_bits, dims, salt=f"r{r}")
        a = bb.select(
            F.col("id").alias("id_a"), F.col("v").alias("va"),
            F.col("n").alias("na"), "bucket",
        )
        b = bb.select(
            F.col("id").alias("id_b"), F.col("v").alias("vb"),
            F.col("n").alias("nb"), "bucket",
        )
        p = (
            a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
        cand = p if cand is None else cand.unionByName(p)
    # materialize the (id, id, cosine) pair set eagerly so the cached
    # corpus can be released NOW: returning the lazy plan would pin the
    # cached blocks in executor memory until the caller's action, and
    # repeated calls in one session would accumulate them unboundedly.
    # localCheckpoint truncates the lineage, so the result no longer
    # references `base` at all; the pair set is threshold-filtered
    # near-dups only — orders of magnitude smaller than the corpus.
    pairs = cand.dropDuplicates(["id_a", "id_b"]).localCheckpoint(eager=True)
    base.unpersist()
    return pairs


def kmeans_iterations(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Spherical k-means (cosine) with a deterministic trajectory:
    init = the first ``k`` vectors by id, a FIXED iteration count, and
    every score / centroid component rounded to 6dp — the same trick
    that puts the IVF index under the cross-engine oracle, extended to
    the whole Lloyd loop.

    Scale shape: centroids are index metadata (k × dims doubles) that
    live driver-side exactly like the IVF centroid table — each
    iteration is ONE map-only assignment pass (literal-centroid cosine
    argmax, no shuffle, no join) plus ONE (cell, dim) aggregation for
    the update; the corpus itself never joins anything. A cell that
    loses all members keeps its previous centroid.

    Output after the final update: (id, cell, score).
    """
    init = [
        [float(x) for x in row[vec_col]]
        for row in df.orderBy(id_col).limit(k).collect()
    ]
    if len(init) < k:
        raise ValueError(
            f"kmeans_iterations: k={k} but the corpus has only "
            f"{len(init)} vectors; pass k <= corpus size"
        )
    cents = init
    for _ in range(iterations):
        assigned = ivf_assign(df, vec_col, cents)
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        by_cell = {row["cell"]: list(row["cv"]) for row in means}
        cents = [by_cell.get(i + 1, cents[i]) for i in range(k)]
    scores = _cell_scores(vec_col, cents)
    return df.select(
        F.col(id_col),
        F.array_position(scores, F.array_max(scores)).cast("long").alias("cell"),
        F.array_max(scores).alias("score"),
    )


def mean_pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Mean-pool vectors per group — the chunk→document pooling step of
    an embedding pipeline (doc embedding = mean of its chunk
    embeddings). One (group, dim) aggregation with map-side partial
    sums; components round to 6dp for cross-engine determinism. Output:
    (group, pooled array<double>, n_vectors)."""
    per_dim = (
        fan_out(df)
        .select(F.col(group_col), F.posexplode(vec_col).alias("d", "x"))
        .groupBy(group_col, "d")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), 6).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_dim.groupBy(group_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
            ).alias("pooled"),
            F.max("n").alias("n_vectors"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector scalar quantization (the int8 storage path of every
    production ANN index — FAISS SQ8 shape): each vector maps to
    ``levels = 2^bits - 1`` uniform steps between its own min and max,
    ``q_i = round((x_i - min) / scale)``. Output per vector: the
    (min, max) dequantization params, an integer checksum over the
    codes (Σ q_i — cross-engine exact), and the mean absolute
    reconstruction error.

    Map-only over the scan — zero shuffles, scales linearly; pairs with
    the ANN operators by shrinking vector bytes 4× before they ever
    reach a bucket join. Constant-vector degenerate case (max == min)
    quantizes to all-zero codes with zero error.
    """
    levels = 2 ** bits - 1
    # stage the per-vector scalars (min/max) and the code array as
    # columns: embedded directly in the per-element lambdas they would
    # re-evaluate array_min/array_max for EVERY element — O(d^2) per row
    # (measured 5.5x slower at 64 dims)
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    staged = df.select(F.col(id_col), x.alias("_x")).withColumns(
        {"_vmin": F.array_min("_x"), "_vmax": F.array_max("_x")}
    )
    vmin, vmax = F.col("_vmin"), F.col("_vmax")
    scale = (vmax - vmin) / levels
    q = F.transform(
        F.col("_x"),
        lambda v: F.when(
            vmax > vmin, F.floor((v - vmin) / scale + F.lit(0.5))
        ).otherwise(F.lit(0)).cast("long"),
    )
    staged = staged.withColumn("_q", q)
    abs_err = F.zip_with(
        F.col("_x"), F.col("_q"), lambda v, code: F.abs(v - (code * scale + vmin))
    )
    return staged.select(
        F.col(id_col),
        F.round(vmin, 6).alias("q_min"),
        F.round(vmax, 6).alias("q_max"),
        F.aggregate(
            F.col("_q"), F.lit(0).cast("long"), lambda a, c: a + c
        ).alias("checksum"),
        F.round(
            F.aggregate(abs_err, F.lit(0.0), lambda a, e: a + e)
            / F.size(F.col("_x")),
            6,
        ).alias("mean_abs_err"),
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    dims: int | None = None,
    ann_bits: int | None = None,
) -> DataFrame:
    """k-NN majority-vote classification over the embedding space — the
    weak-supervision / label-propagation step of a training-data
    pipeline (predict labels for unlabeled items from their nearest
    labeled neighbors).

    Built on :func:`cosine_topk` (exact baseline) or, with ``ann_bits``
    set, the hyperplane-LSH bucket join (:func:`lsh_ann_topk`) — the
    100 TB path: neighbor search restricted to the query's bucket
    instead of the full cross product. Then one aggregation per query
    counting votes; ties break to the smaller label for determinism.
    Output: (query_id, predicted_label, votes, total) —
    ``votes``/``total`` is the confidence."""
    if ann_bits is not None:
        nbrs = lsh_ann_topk(
            corpus, queries, id_col, vec_col, k=k, n_bits=ann_bits, dims=dims or 64
        )
    else:
        nbrs = cosine_topk(corpus, queries, id_col, vec_col, k=k, dims=dims)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_nl")
    ).filter(F.col("_nl").isNotNull())  # unlabeled rows cannot vote —
    # NULL sorts first under the ascending tie-break and would win ties
    votes = (
        nbrs.join(labels, "neighbor_id")
        .groupBy("query_id", "_nl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("_nl").asc()
    )
    return (
        votes.withColumn("_rk", F.row_number().over(w))
        .withColumn("total", F.sum("votes").over(Window.partitionBy("query_id")))
        .filter(F.col("_rk") == 1)
        .select(
            "query_id",
            F.col("_nl").alias("predicted_label"),
            F.col("votes").cast("long").alias("votes"),
            F.col("total").cast("long").alias("total"),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dims: int | None = None,
) -> DataFrame:
    """SEMANTIC benchmark decontamination: flag corpus items whose
    embedding is near-identical to any held-out benchmark item —
    catches paraphrased eval leakage that n-gram overlap
    (corpus.decontaminate) misses.

    The benchmark side is tiny (an eval suite) and broadcasts, exactly
    like the n-gram variant's shingle set: the corpus streams once
    through a map-side cosine battery, one aggregation takes the max
    per corpus item. Output: (id, max_cosine, nearest benchmark id,
    contaminated flag) for EVERY corpus item."""
    b = F.broadcast(
        benchmark.select(F.col(id_col).alias("bench_id"), F.col(vec_col).alias("bv"))
    )
    c = fan_out(corpus).select(F.col(id_col), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(b).withColumn(
        "cosine",
        F.round(
            _dot(F.col("cv"), F.col("bv"), dims)
            / (_norm(F.col("cv"), dims) * _norm(F.col("bv"), dims)),
            6,
        ),
    )
    best = scored.groupBy(id_col).agg(
        F.max("cosine").alias("max_cosine"),
        # deterministic nearest pick: highest cosine, then smallest id
        F.min_by(
            F.col("bench_id"), F.struct(-F.col("cosine"), F.col("bench_id"))
        ).alias("nearest_bench_id"),
    )
    return best.select(
        id_col,
        "max_cosine",
        "nearest_bench_id",
        (F.col("max_cosine") >= threshold).cast("int").alias("contaminated"),
    )


def pq_codes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
    codebooks: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """Product quantization (FAISS-PQ shape): split each vector into
    ``m`` contiguous subvectors, train an independent euclidean k-means
    codebook per subspace (deterministic: init = first k subvectors by
    id, fixed iterations, 6dp-rounded distances and centroid
    components), and encode every vector as its nearest code per
    subspace. Output: (id, subspace, code) — m rows per vector, code in
    [0, k).

    Scale shape: codebooks are m·k·(dims/m) doubles of driver-side
    index metadata (same regime as IVF/k-means centroids); training is
    ``iterations`` map-only assignment passes + one (cell, dim) agg per
    subspace, and encoding is one map-only pass — the corpus never
    joins anything. The determinism trick puts the WHOLE train+encode
    pipeline under the cross-engine oracle, as kmeans_iterations does
    for Lloyd's loop."""
    if codebooks is None:
        codebooks = pq_train(df, id_col, vec_col, dims, m, k, iterations)
    exploded = _explode_subspaces(df, id_col, vec_col, dims, m)
    return exploded.select(
        F.col(id_col),
        F.col("subspace"),
        (_pq_cell_expr(codebooks) - 1).cast("int").alias("code"),
    )


def _explode_subspaces(df, id_col, vec_col, dims, m):
    """(id, subspace, _sv): every row split into its m contiguous
    subvectors IN ONE PASS — the whole PQ pipeline then runs one Spark
    job per step instead of one per subspace."""
    sub = dims // m
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                F.slice(F.col(vec_col), j * sub + 1, sub).alias("_sv"),
            )
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(subs).alias("_s")).select(
        id_col, F.col("_s.subspace").alias("subspace"), F.col("_s._sv").alias("_sv")
    )


def _pq_cell_expr(codebooks: list[list[list[float]]]):
    """1-based nearest-cell id for an exploded (subspace, _sv) row.

    The m·k codebooks travel as ONE literal 3-d array constant indexed
    by the row's subspace, and the k distances come from a single
    ``transform`` over that subspace's centroid list — codegen stays
    one small loop regardless of m·k, where the previous unrolled
    per-centroid when-chain emitted a multi-KB Janino method that was
    recompiled for every training iteration's new literals (compile
    time dominated the PQ pipeline at bench scale). Arithmetic
    contract: double math, 6dp-rounded squared L2 (the same
    literal-centroid trick as ivf_assign, with L2 instead of cosine —
    PQ quantizes residual geometry, not direction), ties → lowest cell
    via array_position-of-min."""
    books = F.array(
        *[
            F.array(
                *[F.array(*[F.lit(float(x)) for x in cent]) for cent in sub_book]
            )
            for sub_book in codebooks
        ]
    )
    cents = F.element_at(books, F.col("subspace") + 1)
    scores = F.transform(
        cents,
        lambda c: F.round(
            F.aggregate(
                F.zip_with(
                    F.col("_sv"),
                    c,
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ),
    )
    return F.array_position(scores, F.array_min(scores))


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    m: int = 4,
    k: int = 8,
    iterations: int = 2,
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (see :func:`pq_codes` for the
    determinism contract) and return them as driver-side metadata —
    m × k × (dims/m) doubles, the same regime as IVF centroids.

    All m subspaces train TOGETHER: one init collect (the first k full
    vectors, sliced driver-side), then per Lloyd iteration ONE job —
    subspace-exploded assignment + a (subspace, cell, dim) mean
    aggregate — instead of m sequential mini-jobs; with the default
    m=4, iterations=2 that is 3 Spark jobs total."""
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    sub = dims // m
    init_rows = [
        [float(x) for x in row[vec_col]]
        for row in df.orderBy(id_col).limit(k).collect()
    ]
    if len(init_rows) < k:
        raise ValueError(
            f"pq_train: k={k} but the corpus has only {len(init_rows)} vectors"
        )
    books = [
        [vec[j * sub:(j + 1) * sub] for vec in init_rows] for j in range(m)
    ]
    exploded = _explode_subspaces(df, id_col, vec_col, dims, m)
    for _ in range(iterations):
        assigned = exploded.withColumn("cell", _pq_cell_expr(books).cast("int"))
        means = (
            assigned.select("subspace", "cell", F.posexplode("_sv").alias("d", "x"))
            .groupBy("subspace", "cell", "d")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("cm"))
            .groupBy("subspace", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "cm"))),
                    lambda st: st["cm"],
                ).alias("cv")
            )
            .collect()
        )
        by_key = {(row["subspace"], row["cell"]): list(row["cv"]) for row in means}
        books = [
            [by_key.get((j, i + 1), books[j][i]) for i in range(k)]
            for j in range(m)
        ]
    return books


def pq_adc_topn(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    n: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric distance computation over PQ codes — the FAISS search
    path: the query stays full-precision; per subspace a k-entry lookup
    table of 6dp-rounded squared distances query-sub ↔ centroid is
    computed ONCE driver-side, and every encoded vector scores as the
    sum of m table entries. Map-side literal-array lookup + one groupBy
    on the id — the stored vectors are never touched, which is the
    entire point of PQ at 100 TB (codes are ~dims·4/m bytes per
    vector). Deterministic top-n by (distance, id)."""
    m = len(codebooks)
    sub = len(query) // m
    lut = []
    for j, cents in enumerate(codebooks):
        q = query[j * sub:(j + 1) * sub]
        lut.append(
            [round(sum((a - b) * (a - b) for a, b in zip(q, c)), 6) for c in cents]
        )
    lut2d = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    part = F.element_at(
        F.element_at(lut2d, F.col("subspace") + 1), F.col("code") + 1
    )
    return (
        codes.select(F.col(id_col), part.alias("_p"))
        .groupBy(id_col)
        .agg(F.round(F.sum("_p"), 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(n)
    )


def ivf_pq_topn(
    corpus: DataFrame,
    query: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
    n: int = 10,
    codebooks: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """IVF-PQ — the production ANN composition (FAISS IndexIVFPQ shape):
    the coarse quantizer restricts candidates to the query's ``nprobe``
    nearest cells, then ADC over PQ codes scores ONLY those candidates,
    never touching a stored vector. Candidate count per query is
    ~corpus·nprobe/n_cells, and each candidate costs m table lookups.

    Determinism contract as everywhere in this module: coarse centroids
    are the first ``n_cells`` vectors by id, probe ranking is
    6dp-rounded cosine with cell-ascending ties, and the PQ trajectory
    is the replayable :func:`pq_train` one. Simplification vs FAISS:
    codes quantize the raw vectors, not per-cell residuals — recall is
    lower but the whole pipeline stays under the cross-engine oracle.
    """
    def _coarse_chain():
        cent_rows = (
            corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
            .orderBy("cid")
            .limit(n_cells)
            .collect()
        )
        cents = [list(r.cv) for r in cent_rows]
        # probe ranking via the SAME _cell_scores expression the corpus
        # assignment uses — one rounding/tie-break contract, no
        # dual-language cosine to drift (NULL-safe on degenerate vectors)
        qdf = corpus.sparkSession.createDataFrame(
            [([float(x) for x in query],)], "qv array<double>"
        )
        return cents, [
            r["cell"]
            for r in ivf_probe_cells(qdf, "qv", cents, nprobe).collect()
        ]

    # The coarse-quantizer chain (centroid fetch → probe ranking) and
    # PQ codebook training touch disjoint driver metadata and are both
    # short multi-job pipelines over the same corpus — run them as
    # overlapping jobs (optimization guide §2.6) instead of serially
    # idling the cluster through each collect's tail. Results are the
    # same driver-side lists either way.
    if codebooks is None:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.util import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=2) as pool:
            coarse_fut = pool.submit(inheritable_thread_target(_coarse_chain))
            train_fut = pool.submit(
                inheritable_thread_target(pq_train),
                corpus, id_col, vec_col, dims, m, k, iterations,
            )
            (centroids, probe), codebooks = coarse_fut.result(), train_fut.result()
    else:
        centroids, probe = _coarse_chain()

    assigned = ivf_assign(
        corpus.select(F.col(id_col), F.col(vec_col).alias("cv")), "cv", centroids
    )
    cand = assigned.filter(F.col("cell").isin(probe)).select(id_col)
    # encode ONLY the probed cells' rows — codebooks are corpus-trained,
    # so restricting before encoding changes nothing but the work
    cand_corpus = corpus.join(F.broadcast(cand), id_col, "leftsemi")
    codes = pq_codes(cand_corpus, id_col, vec_col, dims, m, k, codebooks=codebooks)
    return pq_adc_topn(codes, codebooks, query, n=n, id_col=id_col)
