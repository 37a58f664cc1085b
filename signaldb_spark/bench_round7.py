"""Round-7 staging battery: oracle-gated queries registered AFTER the
round-6 block so the round-6 driver prefix stays exactly the 50 it was
tuned to prove; these become fresh evidence the round after.

Same conventions as bench_queries (round(x, 6) floats, BIGINT counts,
explicit tiebreaks, aliases identical on both sides).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def q_cross_lingual_contamination(spark, sf_dir):
    """Translation-pair / contamination sweep: documents whose EXACT
    text recurs under a different language tag — a corpus-hygiene check
    before language-stratified training splits. Text projects to md5
    digests before the self-join; the join key is 32 bytes, never the
    text."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5("text").alias("digest")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.digest") == F.col("b.digest"))
               & (F.col("a.lang") < F.col("b.lang")))
        .groupBy(
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_docs"))
        .orderBy("lang_a", "lang_b")
    )


ORACLE_CROSS_LINGUAL_CONTAMINATION = """
WITH d AS (SELECT doc_id, lang, md5(text) AS digest FROM documents)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(count(*) AS BIGINT) AS n_shared_docs
FROM d a JOIN d b ON a.digest = b.digest AND a.lang < b.lang
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["cross_lingual_contamination"] = q_cross_lingual_contamination
ORACLES["cross_lingual_contamination"] = ORACLE_CROSS_LINGUAL_CONTAMINATION


def q_embedding_outliers(spark, sf_dir):
    """Index-hygiene outlier sweep: vectors whose distance from their
    label centroid exceeds mean + 2 stddev of that label's distances.
    Two stacked partial+final aggs (centroid, then distance moments) and
    ONE map-side re-scan with the per-label thresholds broadcast — the
    vectors never shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    dim = 64
    sums = [
        F.sum(F.element_at("embedding", i + 1).cast("double")).alias(f"s{i}")
        for i in range(dim)
    ]
    cent = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"), *sums).select(
        "label",
        F.array(*[(F.col(f"s{i}") / F.col("n")) for i in range(dim)]).alias("centroid"),
    )
    dist = (
        e.join(F.broadcast(cent), "label")
        .select(
            "label", "vec_id",
            F.sqrt(F.aggregate(
                F.zip_with("embedding", "centroid",
                           lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
                F.lit(0.0), lambda a, x: a + x,
            )).alias("dist"),
        )
    )
    stats = dist.groupBy("label").agg(
        (F.avg("dist") + 2 * F.stddev_samp("dist")).alias("cut")
    )
    return (
        dist.join(F.broadcast(stats), "label")
        .filter(F.col("dist") > F.col("cut"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_outliers"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
        .orderBy("label")
    )


ORACLE_EMBEDDING_OUTLIERS = """
WITH ex AS (
  SELECT label, vec_id, t.i,
         CAST(embedding[t.i] AS DOUBLE) AS x
  FROM embeddings, range(1, 65) t(i)
), cent AS (
  SELECT label, i, avg(x) AS c FROM ex GROUP BY 1, 2
), dist AS (
  SELECT ex.label, ex.vec_id,
         sqrt(sum((ex.x - cent.c) * (ex.x - cent.c))) AS dist
  FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
  GROUP BY 1, 2
), stats AS (
  SELECT label, avg(dist) + 2 * stddev_samp(dist) AS cut
  FROM dist GROUP BY label
)
SELECT d.label, CAST(count(*) AS BIGINT) AS n_outliers,
       round(max(d.dist), 6) AS max_dist
FROM dist d JOIN stats s ON d.label = s.label
WHERE d.dist > s.cut
GROUP BY 1 ORDER BY 1
"""

QUERIES["embedding_outliers"] = q_embedding_outliers
ORACLES["embedding_outliers"] = ORACLE_EMBEDDING_OUTLIERS


def q_source_overlap_matrix(spark, sf_dir):
    """Pairwise source-overlap matrix: how many exact texts each source
    pair shares — the dedup-planning input that decides which sources to
    cross-check first. Digest projection → distinct (source, digest) →
    self-join on the digest only."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.md5("text").alias("digest"))
        .distinct()
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.digest") == F.col("b.digest"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .orderBy("source_a", "source_b")
    )


ORACLE_SOURCE_OVERLAP_MATRIX = """
WITH d AS (
  SELECT DISTINCT source, md5(text) AS digest FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM d a JOIN d b ON a.digest = b.digest AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["source_overlap_matrix"] = q_source_overlap_matrix
ORACLES["source_overlap_matrix"] = ORACLE_SOURCE_OVERLAP_MATRIX


def q_open_order_aging(spark, sf_dir):
    """Aging report: open orders ('O') bucketed by age at the dataset's
    reference date (max orderdate), p50/p95 age per priority — the
    'how stale is the queue' ops panel, windows over a per-priority
    rollup never the raw scan."""
    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("ref"))
    aged = o.filter(F.col("o_orderstatus") == "O").crossJoin(
        F.broadcast(ref)
    ).select(
        "o_orderpriority",
        ((F.col("ref").cast("double") - F.col("o_orderdate").cast("double"))
         / 86400.0).alias("age_days"),
    )
    return (
        aged.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_open"),
            F.round(F.percentile("age_days", F.lit(0.5)), 6).alias("p50_age_days"),
            F.round(F.percentile("age_days", F.lit(0.95)), 6).alias("p95_age_days"),
        )
        .orderBy("priority")
    )


ORACLE_OPEN_ORDER_AGING = """
WITH ref AS (SELECT max(o_orderdate) AS ref FROM orders),
aged AS (
  SELECT o_orderpriority,
         (epoch(ref.ref) - epoch(o_orderdate)) / 86400.0 AS age_days
  FROM orders, ref WHERE o_orderstatus = 'O'
)
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_open,
       round(quantile_cont(age_days, 0.5), 6) AS p50_age_days,
       round(quantile_cont(age_days, 0.95), 6) AS p95_age_days
FROM aged GROUP BY 1 ORDER BY 1
"""

QUERIES["open_order_aging"] = q_open_order_aging
ORACLES["open_order_aging"] = ORACLE_OPEN_ORDER_AGING
