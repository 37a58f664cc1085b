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


def q_latency_heatmap(spark, sf_dir):
    """Grafana-heatmap input: (hour bucket, value band) counts — the 2D
    histogram behind a latency heatmap panel. One partial+final agg on a
    short composite key; band edges are exact decimal arithmetic
    (width-10 bands), never a float log that can flip at a power
    boundary."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").cast("string").alias("hour"),
            (F.floor(F.col("value") / 10) * 10).cast("bigint").alias("band_lo"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("hour", "band_lo")
    )


ORACLE_LATENCY_HEATMAP = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
       CAST(floor(value / 10) * 10 AS BIGINT) AS band_lo,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["latency_heatmap"] = q_latency_heatmap
ORACLES["latency_heatmap"] = ORACLE_LATENCY_HEATMAP


def q_daily_reconciliation(spark, sf_dir):
    """Two-pipeline reconciliation: per-day order headers FULL OUTER
    JOIN per-day shipped lineitems — days where either side is missing
    or the ratio is off are the rows an ops runbook looks at first. The
    outer join runs on two pre-aggregated daily rollups, never raw."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    od = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    ld = l.groupBy(
        F.col("l_shipdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_shipped"))
    return (
        od.join(ld, "day", "full_outer")
        .select(
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce("n_shipped", F.lit(0)).cast("bigint").alias("n_shipped"),
            (F.col("n_orders").isNull() | F.col("n_shipped").isNull())
            .alias("one_sided"),
        )
        .orderBy("day")
    )


ORACLE_DAILY_RECONCILIATION = """
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), ld AS (
  SELECT CAST(l_shipdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_shipped
  FROM lineitem GROUP BY 1
)
SELECT CAST(coalesce(od.day, ld.day) AS VARCHAR) AS day,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(n_shipped, 0) AS BIGINT) AS n_shipped,
       (od.day IS NULL OR ld.day IS NULL) AS one_sided
FROM od FULL OUTER JOIN ld ON od.day = ld.day
ORDER BY 1
"""

QUERIES["daily_reconciliation"] = q_daily_reconciliation
ORACLES["daily_reconciliation"] = ORACLE_DAILY_RECONCILIATION


def q_wow_service_volume(spark, sf_dir):
    """Week-over-week volume change per stream: lag window over the
    weekly rollup; the pct change divides two exact BIGINT counts, so
    cross-engine float drift is impossible."""
    e = load_table(spark, sf_dir, "events")
    weekly = e.groupBy(
        F.col("event_type").alias("service"),
        F.date_trunc("week", "ts").cast("date").alias("week"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("service").orderBy("week")
    return (
        weekly.withColumn("prev_n", F.lag("n").over(w))
        .withColumn(
            "wow_pct",
            F.round((F.col("n") - F.col("prev_n")) / F.col("prev_n"), 6),
        )
        .select(F.col("week").cast("string").alias("week"), "service",
                "n", "prev_n", "wow_pct")
        .orderBy("service", "week")
    )


ORACLE_WOW_SERVICE_VOLUME = """
WITH weekly AS (
  SELECT event_type AS service, CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(week AS VARCHAR) AS week, service, n,
       lag(n) OVER (PARTITION BY service ORDER BY week) AS prev_n,
       round((n - lag(n) OVER (PARTITION BY service ORDER BY week)) * 1.0
             / lag(n) OVER (PARTITION BY service ORDER BY week), 6) AS wow_pct
FROM weekly ORDER BY service, week
"""

QUERIES["wow_service_volume"] = q_wow_service_volume
ORACLES["wow_service_volume"] = ORACLE_WOW_SERVICE_VOLUME


def q_char_trigram_signature(spark, sf_dir):
    """Language-signature trigrams: top-5 character trigrams per
    language (the n-gram profile language-ID models rank against) over
    each document's 200-char PREFIX — the standard LID practice, and
    what bounds the explode at 200 rows/doc regardless of document
    length. Wordcount-class shuffle on a 3-char key with map-side
    partials. The trigrams are sliced and regex-filtered INSIDE one
    array transform before the explode, so the exploded rows carry
    3-char strings only — exploding the index first would duplicate
    the 200-char prefix into every one of its ~198 rows (measured
    1.6x slower at sf0.1). The prefix MATERIALIZES as a column before
    the transform: a lambda referencing the raw substring(lower())
    expression re-evaluates it per element (no common-subexpression
    elimination across the lambda boundary)."""
    d = load_table(spark, sf_dir, "documents")
    pre = d.select(
        "lang", F.substring(F.lower("text"), 1, 200).alias("pfx")
    )
    pfx = F.col("pfx")
    tris = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(pfx) - 2, F.lit(0))),
            lambda i: pfx.substr(i, F.lit(3)),
        ),
        lambda t: t.rlike("^[a-z ]{3}$"),
    )
    tri = (
        pre.select("lang", F.explode(tris).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "tri")
    return (
        tri.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", F.col("rnk").cast("bigint").alias("rnk"), "tri", "n")
        .orderBy("lang", "rnk")
    )


ORACLE_CHAR_TRIGRAM_SIGNATURE = """
WITH idx AS (
  SELECT lang, substr(lower(text), 1, 200) AS t,
         unnest(range(1, greatest(length(substr(lower(text), 1, 200)) - 1, 1))) AS i
  FROM documents
), tri AS (
  SELECT lang, substr(t, CAST(i AS INT), 3) AS tri FROM idx
), counts AS (
  SELECT lang, tri, CAST(count(*) AS BIGINT) AS n
  FROM tri WHERE regexp_full_match(tri, '[a-z ]{3}')
  GROUP BY 1, 2
), ranked AS (
  SELECT lang, tri, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, tri) AS rnk
  FROM counts
)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, tri, n
FROM ranked WHERE rnk <= 5 ORDER BY lang, rnk
"""

QUERIES["char_trigram_signature"] = q_char_trigram_signature
ORACLES["char_trigram_signature"] = ORACLE_CHAR_TRIGRAM_SIGNATURE


def q_vocab_growth_curve(spark, sf_dir):
    """Heaps'-law vocabulary growth: corpus in 10 doc-id buckets, new
    terms per bucket (term first-seen bucket via one min-agg — the
    first-seen trick again, no running distinct state) + the running
    vocabulary size over the 10-row rollup."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mx"))
    terms = (
        d.crossJoin(F.broadcast(mx))
        .select(
            F.least(F.lit(9), F.floor(F.col("doc_id") * 10 / (F.col("mx") + 1)))
            .cast("bigint").alias("bucket"),
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") > 0)
    )
    first_seen = terms.groupBy("term").agg(F.min("bucket").alias("bucket"))
    per_bucket = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_terms")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.withColumn(
            "vocab_size", F.sum("new_terms").over(w).cast("bigint")
        )
        .orderBy("bucket")
    )


ORACLE_VOCAB_GROWTH_CURVE = """
WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
terms AS (
  SELECT least(9, CAST(floor(d.doc_id * 10 / (mx.mx + 1)) AS BIGINT)) AS bucket,
         t.term
  FROM documents d, mx,
       LATERAL unnest(string_split_regex(lower(d.text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) > 0
), first_seen AS (
  SELECT term, min(bucket) AS bucket FROM terms GROUP BY 1
), per_bucket AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS new_terms
  FROM first_seen GROUP BY 1
)
SELECT bucket, new_terms,
       CAST(sum(new_terms) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS vocab_size
FROM per_bucket ORDER BY bucket
"""

QUERIES["vocab_growth_curve"] = q_vocab_growth_curve
ORACLES["vocab_growth_curve"] = ORACLE_VOCAB_GROWTH_CURVE


def q_unpivot_daily_mix(spark, sf_dir):
    """Wide-to-long UNPIVOT (melt) — the inverse of the pivot gate and
    the reshape every per-metric-column table needs before a long-form
    engine can aggregate it. A conditional agg first builds the wide
    per-day event-mix table (one shuffle), then `unpivot` melts the
    five type columns back to (day, event_type, n) rows — Expand-based,
    map-only, no second shuffle."""
    e = load_table(spark, sf_dir, "events")
    wide = e.groupBy(
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day")
    ).agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1))
            .cast("bigint")
            .alias(t)
            for t in ["click", "error", "purchase", "signup", "view"]
        ]
    )
    return (
        wide.unpivot(
            "day",
            ["click", "error", "purchase", "signup", "view"],
            "event_type",
            "n",
        )
        .orderBy("day", "event_type")
    )


ORACLE_UNPIVOT_DAILY_MIX = """
WITH wide AS (
  SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
         CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
         CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
         CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
         CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
  FROM events GROUP BY 1
)
SELECT day, event_type, n
FROM wide UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))
ORDER BY day, event_type
"""

QUERIES["unpivot_daily_mix"] = q_unpivot_daily_mix
ORACLES["unpivot_daily_mix"] = ORACLE_UNPIVOT_DAILY_MIX


def q_top_product_pairs(spark, sf_dir):
    """Market-basket co-occurrence: the 20 part pairs most often bought
    in the same order. Per-order distinct parts first (kills line-level
    multiplicity), then the pair self-join runs WITHIN an order — work
    is bounded by sum(lines_per_order choose 2), ~6 pairs/order at any
    scale, never a global cross join. Deterministic cut: (n DESC, pa,
    pb)."""
    l = load_table(spark, sf_dir, "lineitem")
    parts = l.select("l_orderkey", "l_partkey").distinct()
    a, b = parts.alias("a"), parts.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
    )
    return (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "pa", "pb")
        .limit(20)
    )


ORACLE_TOP_PRODUCT_PAIRS = """
WITH parts AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS pa, b.l_partkey AS pb,
       CAST(count(*) AS BIGINT) AS n
FROM parts a JOIN parts b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 ORDER BY n DESC, pa, pb LIMIT 20
"""

QUERIES["top_product_pairs"] = q_top_product_pairs
ORACLES["top_product_pairs"] = ORACLE_TOP_PRODUCT_PAIRS


def q_graph_2hop_reach(spark, sf_dir):
    """2-hop reachability over the behavior graph: edges are distinct
    consecutive event-type transitions per user (lag window, event_id
    tiebreak); reach(origin) counts distinct non-origin types reachable
    in <= 2 hops. The edge list collapses to the type-vocabulary domain
    BEFORE the hop join, so the self-join is vocabulary-sized (KB)
    regardless of event volume — the service-graph trick one hop
    deeper."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("event_type")))
        .select("src", F.col("event_type").alias("dst"))
        .distinct()
    )
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    two = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst")
    )
    return (
        edges.unionByName(two)
        .filter(F.col("dst") != F.col("src"))
        .distinct()
        .groupBy(F.col("src").alias("origin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_reachable_2hop"))
        .orderBy("origin")
    )


ORACLE_GRAPH_2HOP_REACH = """
WITH lagged AS (
  SELECT user_id, event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), edges AS (
  SELECT DISTINCT src, dst FROM lagged
  WHERE src IS NOT NULL AND src <> dst
), two AS (
  SELECT e1.src, e2.dst FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
), reach AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT src, dst FROM two
  ) WHERE dst <> src
)
SELECT src AS origin, CAST(count(*) AS BIGINT) AS n_reachable_2hop
FROM reach GROUP BY 1 ORDER BY 1
"""

QUERIES["graph_2hop_reach"] = q_graph_2hop_reach
ORACLES["graph_2hop_reach"] = ORACLE_GRAPH_2HOP_REACH


def q_ohlc_candles(spark, sf_dir):
    """OHLC downsampling (the Gorilla/M3-style candle rollup every
    metrics UI draws): per event_type per hour, open/close = first/last
    value in (ts, event_id) order, high/low = max/min. Open/close ride
    a bounded window INSIDE the (type, hour) partition, then one
    groupBy; values are carried, never summed, so cross-engine float
    drift is impossible."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "hour", F.date_trunc("hour", "ts")
    )
    w = (
        Window.partitionBy("event_type", "hour")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cand = e.select(
        "event_type",
        F.col("hour").cast("string").alias("hour"),
        "value",
        F.first("value").over(w).alias("open"),
        F.last("value").over(w).alias("close"),
    )
    return (
        cand.groupBy("event_type", "hour")
        .agg(
            F.min("open").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.min("close").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("event_type", "hour")
    )


ORACLE_OHLC_CANDLES = """
WITH c AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, value,
         first_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS open,
         last_value(value) OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS close
  FROM events
)
SELECT event_type, hour, min(open) AS open, max(value) AS high,
       min(value) AS low, min(close) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ohlc_candles"] = q_ohlc_candles
ORACLES["ohlc_candles"] = ORACLE_OHLC_CANDLES


def q_partition_fingerprint(spark, sf_dir):
    """Cross-engine table-diff fingerprint: per day, row count + an
    order-independent content checksum (sum of md5-derived 32-bit keys
    over the identity columns). This is how two copies of a 100 TB
    table are reconciled without moving rows — map-only key derivation,
    one tiny agg; a mismatched day pinpoints where to re-sync. md5 is
    the one hash both engines (and every other engine) agree on."""
    e = load_table(spark, sf_dir, "events")
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", "event_id", "event_type", "user_id")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        e.groupBy(F.date_trunc("day", "ts").cast("date").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(key).cast("bigint").alias("fingerprint"),
        )
        .orderBy("day")
    )


ORACLE_PARTITION_FINGERPRINT = """
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(('0x' || substr(md5(
              event_id::VARCHAR || ':' || event_type || ':' ||
              user_id::VARCHAR), 1, 8)) AS BIGINT)) AS BIGINT)
         AS fingerprint
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["partition_fingerprint"] = q_partition_fingerprint
ORACLES["partition_fingerprint"] = ORACLE_PARTITION_FINGERPRINT


def q_grouping_sets_explicit(spark, sf_dir):
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE are sugar
    for: ((priority, status), (priority), ()) with the grouping_id
    bitmask disambiguating NULL-as-aggregated from NULL-as-value.
    Lowers to ONE Expand + one shuffle, same as the rollup gate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("gid", "o_orderpriority", "o_orderstatus")
    )


ORACLE_GROUPING_SETS_EXPLICIT = """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
ORDER BY gid, o_orderpriority, o_orderstatus
"""

QUERIES["grouping_sets_explicit"] = q_grouping_sets_explicit
ORACLES["grouping_sets_explicit"] = ORACLE_GROUPING_SETS_EXPLICIT


def q_decile_lift(spark, sf_dir):
    """Model-lift table: customers ranked into acctbal deciles, revenue
    share + cumulative share per decile. Revenue sums in exact integer
    CENTS (round(x*100) per order before the sum) so the decile sums
    are drift-free; shares divide two BIGINTs. ntile here is exact over
    the customer table — at 100 TB the decile BOUNDS would come from
    approx quantiles and assignment becomes a map-only broadcast
    compare; the lift math is unchanged."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    dec = c.select(
        "c_custkey",
        F.ntile(10)
        .over(Window.orderBy(F.desc("c_acctbal"), "c_custkey"))
        .cast("bigint")
        .alias("decile"),
    )
    per = (
        dec.join(rev, dec.c_custkey == rev.o_custkey, "left")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("revenue_cents"),
        )
    )
    wall = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn("_tot", F.sum("revenue_cents").over(wall))
        .withColumn(
            "rev_share", F.round(F.col("revenue_cents") / F.col("_tot"), 6)
        )
        .withColumn(
            "cum_share",
            F.round(F.sum("revenue_cents").over(wcum) / F.col("_tot"), 6),
        )
        .select("decile", "n_customers", "revenue_cents", "rev_share", "cum_share")
        .orderBy("decile")
    )


ORACLE_DECILE_LIFT = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), dec AS (
  SELECT c_custkey,
         CAST(ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
           AS decile
  FROM customer
), per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(coalesce(sum(cents), 0) AS BIGINT) AS revenue_cents
  FROM dec LEFT JOIN rev ON c_custkey = o_custkey
  GROUP BY 1
)
SELECT decile, n_customers, revenue_cents,
       round(revenue_cents * 1.0 / sum(revenue_cents) OVER (), 6)
         AS rev_share,
       round(sum(revenue_cents) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
             * 1.0 / sum(revenue_cents) OVER (), 6) AS cum_share
FROM per ORDER BY decile
"""

QUERIES["decile_lift"] = q_decile_lift
ORACLES["decile_lift"] = ORACLE_DECILE_LIFT


def q_seq_bigram_pmi(spark, sf_dir):
    """Pointwise mutual information of consecutive event-type bigrams —
    the sequence-mining score behind 'what actually follows what'
    (vs what follows anything). One lag window builds bigrams, one
    groupBy counts them; marginals and the grand total are window sums
    over the vocabulary-sized count table (|types|^2 rows), so the
    information math never touches the event stream again."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    big = (
        e.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    wsrc = Window.partitionBy("src")
    wdst = Window.partitionBy("dst")
    wall = Window.partitionBy()
    return (
        big.withColumn("n_a", F.sum("n_ab").over(wsrc).cast("bigint"))
        .withColumn("n_b", F.sum("n_ab").over(wdst).cast("bigint"))
        .withColumn("n_tot", F.sum("n_ab").over(wall).cast("bigint"))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n_tot"))
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ),
        )
        .select("src", "dst", "n_ab", "pmi")
        .orderBy("src", "dst")
    )


ORACLE_SEQ_BIGRAM_PMI = """
WITH lagged AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), big AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n_ab
  FROM lagged WHERE src IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, n_ab,
       round(ln((n_ab * (sum(n_ab) OVER ())) * 1.0
                / ((sum(n_ab) OVER (PARTITION BY src))
                   * (sum(n_ab) OVER (PARTITION BY dst)))), 6) AS pmi
FROM big ORDER BY src, dst
"""

QUERIES["seq_bigram_pmi"] = q_seq_bigram_pmi
ORACLES["seq_bigram_pmi"] = ORACLE_SEQ_BIGRAM_PMI


def q_gapfill_daily_counts(spark, sf_dir):
    """Dense calendar-spine gap fill — the null-fill every time-series
    UI needs before drawing a continuous line: a generated day spine
    (min..max) crossed with the stream vocabulary, LEFT JOIN the real
    daily rollup, zero-fill, and flag the filled rows. Both spine sides
    are KB-scale derived dims at any fact size, so the cross join is
    broadcast territory; the fact table is touched exactly once by the
    rollup."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("service"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("mn"), F.max(F.to_date("ts")).alias("mx")
    )
    days = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("day")
    )
    services = e.select(F.col("event_type").alias("service")).distinct()
    spine = days.crossJoin(F.broadcast(services))
    return (
        spine.join(daily, ["service", "day"], "left")
        .select(
            F.col("day").cast("string").alias("day"),
            "service",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.col("n").isNull().alias("filled"),
        )
        .orderBy("day", "service")
    )


ORACLE_GAPFILL_DAILY_COUNTS = """
WITH daily AS (
  SELECT event_type AS service, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), days AS (
  SELECT CAST(unnest(generate_series(
           (SELECT min(CAST(ts AS DATE)) FROM events),
           (SELECT max(CAST(ts AS DATE)) FROM events),
           INTERVAL 1 DAY)) AS DATE) AS day
), spine AS (
  SELECT day, service FROM days
  CROSS JOIN (SELECT DISTINCT event_type AS service FROM events)
)
SELECT CAST(s.day AS VARCHAR) AS day, s.service,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n,
       d.n IS NULL AS filled
FROM spine s LEFT JOIN daily d ON s.day = d.day AND s.service = d.service
ORDER BY 1, 2
"""

QUERIES["gapfill_daily_counts"] = q_gapfill_daily_counts
ORACLES["gapfill_daily_counts"] = ORACLE_GAPFILL_DAILY_COUNTS


def q_except_all_multiset(spark, sf_dir):
    """EXCEPT ALL — bag (multiset) difference, the set op the engine's
    INTERSECT/EXCEPT gate does NOT cover: per part, returned-line
    multiplicity minus accepted-line multiplicity, keeping survivors
    with their counts. Spark's exceptAll lowers to the
    count-and-replicate rewrite (no row-pairing join); the gate keeps
    the top-50 surviving parts with a full deterministic tiebreak."""
    l = load_table(spark, sf_dir, "lineitem")
    returned = l.filter(F.col("l_returnflag") == "R").select("l_partkey")
    accepted = l.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return (
        returned.exceptAll(accepted)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("surplus"))
        .orderBy(F.desc("surplus"), "l_partkey")
        .limit(50)
    )


ORACLE_EXCEPT_ALL_MULTISET = """
WITH surv AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS surplus
FROM surv GROUP BY 1 ORDER BY surplus DESC, l_partkey LIMIT 50
"""

QUERIES["except_all_multiset"] = q_except_all_multiset
ORACLES["except_all_multiset"] = ORACLE_EXCEPT_ALL_MULTISET


def q_chi_square_independence(spark, sf_dir):
    """Chi-square independence test on the event_type x weekday
    contingency table — the statistical QA check behind 'is traffic mix
    actually day-of-week dependent'. Observed counts come from one
    partial+final agg; expected counts are marginal window products
    over the contingency rollup (|types| x 7 rows), so the statistic
    never rescans the stream. Weekday alignment: Spark dayofweek is
    1=Sunday..7, DuckDB's is 0=Sunday..6 — the oracle adds 1."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.dayofweek("ts").cast("bigint").alias("dow")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    wrow = Window.partitionBy("event_type")
    wcol = Window.partitionBy("dow")
    wall = Window.partitionBy()
    cells = (
        obs.withColumn("row_tot", F.sum("obs").over(wrow))
        .withColumn("col_tot", F.sum("obs").over(wcol))
        .withColumn("n_tot", F.sum("obs").over(wall))
        .withColumn("exp", F.col("row_tot") * F.col("col_tot") / F.col("n_tot"))
    )
    return cells.agg(
        F.round(
            F.sum((F.col("obs") - F.col("exp")) ** 2 / F.col("exp")), 6
        ).alias("chi2"),
        ((F.count_distinct("event_type") - 1) * (F.count_distinct("dow") - 1))
        .cast("bigint")
        .alias("dof"),
    )


ORACLE_CHI_SQUARE_INDEPENDENCE = """
WITH obs AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         CAST(count(*) AS DOUBLE) AS obs
  FROM events GROUP BY 1, 2
), cells AS (
  SELECT obs,
         sum(obs) OVER (PARTITION BY event_type) AS row_tot,
         sum(obs) OVER (PARTITION BY dow) AS col_tot,
         sum(obs) OVER () AS n_tot,
         event_type, dow
  FROM obs
)
SELECT round(sum(pow(obs - row_tot * col_tot / n_tot, 2)
                 / (row_tot * col_tot / n_tot)), 6) AS chi2,
       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1)
            AS BIGINT) AS dof
FROM cells
"""

QUERIES["chi_square_independence"] = q_chi_square_independence
ORACLES["chi_square_independence"] = ORACLE_CHI_SQUARE_INDEPENDENCE


def q_benford_deviation(spark, sf_dir):
    """Benford's-law first-digit audit on order totals — the forensic
    data-quality sweep for fabricated or truncated numeric columns. The
    first significant digit comes from the INTEGER cents string (never
    float formatting, which engines disagree on); expected share is
    log10(1 + 1/d). Map-only digit derivation + one 9-row agg."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    w = Window.partitionBy()
    return (
        o.groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("total", F.sum("n").over(w))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("observed_share"),
            F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("benford_share"),
            F.round(
                F.abs(F.col("n") / F.col("total") - F.log10(1 + 1 / F.col("digit"))),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


ORACLE_BENFORD_DEVIATION = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
)
SELECT digit, n,
       round(n * 1.0 / sum(n) OVER (), 6) AS observed_share,
       round(log10(1 + 1.0 / digit), 6) AS benford_share,
       round(abs(n * 1.0 / sum(n) OVER () - log10(1 + 1.0 / digit)), 6)
         AS abs_dev
FROM counts ORDER BY digit
"""

QUERIES["benford_deviation"] = q_benford_deviation
ORACLES["benford_deviation"] = ORACLE_BENFORD_DEVIATION


def q_rfm_segments(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary) with explicit
    integer thresholds — the marketing-analytics rollup, drift-free:
    monetary sums exact cents, recency is whole days against the
    corpus max day (broadcast scalar), segments are a deterministic
    CASE. One agg over events + one 4-row re-agg."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.to_date("ts")).alias("mx"))
    per_user = (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.datediff(F.first("mx"), F.max(F.to_date("ts")))
            .cast("bigint")
            .alias("recency_d"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
    )
    seg = (
        F.when((F.col("recency_d") <= 0) & (F.col("freq") >= 67), "champion")
        .when(F.col("recency_d") <= 0, "recent")
        .when(F.col("freq") >= 67, "loyal_lapsing")
        .otherwise("dormant")
    )
    return (
        per_user.groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("segment")
    )


ORACLE_RFM_SEGMENTS = """
WITH per_user AS (
  SELECT user_id,
         CAST(date_diff('day', max(CAST(ts AS DATE)),
              (SELECT max(CAST(ts AS DATE)) FROM events)) AS BIGINT)
           AS recency_d,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
)
SELECT CASE WHEN recency_d <= 0 AND freq >= 67 THEN 'champion'
            WHEN recency_d <= 0 THEN 'recent'
            WHEN freq >= 67 THEN 'loyal_lapsing'
            ELSE 'dormant' END AS segment,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["rfm_segments"] = q_rfm_segments
ORACLES["rfm_segments"] = ORACLE_RFM_SEGMENTS


def q_session_path_trigrams(spark, sf_dir):
    """Top-15 three-step paths within 30-minute-gap sessions — sequence
    mining one step deeper than the bigram/markov gates, with the
    sessionization done by the portable lag-gap-cumsum idiom (the same
    rows session_window produces, but expressible identically in the
    oracle). All windows partition on user_id; paths never cross a
    session boundary."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
    sess = e.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "sess_id",
        F.sum("new_s").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    tri = (
        sess.withColumn("p1", F.lag("event_type", 2).over(ws))
        .withColumn("p2", F.lag("event_type", 1).over(ws))
        .filter(F.col("p1").isNotNull())
        .select(
            F.concat_ws(">", "p1", "p2", "event_type").alias("path")
        )
    )
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(15)
    )


ORACLE_SESSION_PATH_TRIGRAMS = """
WITH gapped AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_s) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM gapped
), tri AS (
  SELECT lag(event_type, 2) OVER ws AS p1,
         lag(event_type, 1) OVER ws AS p2,
         event_type
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, sess_id ORDER BY ts, event_id)
)
SELECT p1 || '>' || p2 || '>' || event_type AS path,
       CAST(count(*) AS BIGINT) AS n
FROM tri WHERE p1 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 15
"""

QUERIES["session_path_trigrams"] = q_session_path_trigrams
ORACLES["session_path_trigrams"] = ORACLE_SESSION_PATH_TRIGRAMS


def q_padding_waste_analysis(spark, sf_dir):
    """Sequence-packing economics: for each candidate max length, how
    many documents fit, how many truncate, how many pad tokens a
    naive one-doc-per-row batch wastes, and the utilization pct — the
    table that decides a pretraining context length. Token counts are
    whitespace-class word counts (exact integers); candidate lengths
    explode from a 3-element literal array, so the pass over documents
    stays single-scan map-side."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.size(
            F.filter(
                F.split(F.lower("text"), "[^a-z]+"), lambda t: F.length(t) > 0
            )
        )
        .cast("bigint")
        .alias("tokens")
    )
    cand = toks.select(
        "tokens", F.explode(F.array(F.lit(128), F.lit(256), F.lit(512))).alias("max_len")
    )
    return (
        cand.groupBy(F.col("max_len").cast("bigint").alias("max_len"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("tokens") > F.col("max_len")).cast("int"))
            .cast("bigint")
            .alias("n_truncated"),
            F.sum(
                F.greatest(F.col("max_len") - F.col("tokens"), F.lit(0))
            )
            .cast("bigint")
            .alias("pad_tokens"),
            F.round(
                F.sum(F.least(F.col("tokens"), F.col("max_len")))
                / F.sum(F.col("max_len")),
                6,
            ).alias("utilization"),
        )
        .orderBy("max_len")
    )


ORACLE_PADDING_WASTE_ANALYSIS = """
WITH toks AS (
  SELECT CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              t -> len(t) > 0)) AS BIGINT) AS tokens
  FROM documents
), cand AS (
  SELECT tokens, CAST(unnest([128, 256, 512]) AS BIGINT) AS max_len FROM toks
)
SELECT max_len, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN tokens > max_len THEN 1 ELSE 0 END) AS BIGINT)
         AS n_truncated,
       CAST(sum(greatest(max_len - tokens, 0)) AS BIGINT) AS pad_tokens,
       round(sum(least(tokens, max_len)) * 1.0 / sum(max_len), 6)
         AS utilization
FROM cand GROUP BY 1 ORDER BY 1
"""

QUERIES["padding_waste_analysis"] = q_padding_waste_analysis
ORACLES["padding_waste_analysis"] = ORACLE_PADDING_WASTE_ANALYSIS


def q_hopping_window_counts(spark, sf_dir):
    """Hopping (sliding) windows in BATCH mode: 1-hour windows hopping
    every 15 minutes — each event lands in exactly four overlapping
    buckets, the shape Structured Streaming's F.window(slide) executes
    and Grafana's smoothed rate panels consume. Spark's window() does
    the multi-assignment natively (one Expand-style explode, map-side);
    the oracle replays the same epoch-aligned window-start arithmetic.
    Restricted to one day so the gate stays bucket-bounded."""
    e = load_table(spark, sf_dir, "events").filter(
        F.to_date("ts") == F.lit("2024-01-02")
    )
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("w.start").cast("string").alias("win_start"),
            "event_type",
            "n",
        )
        .orderBy("win_start", "event_type")
    )


ORACLE_HOPPING_WINDOW_COUNTS = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us FROM events
  WHERE CAST(ts AS DATE) = DATE '2024-01-02'
), assigned AS (
  SELECT event_type,
         (CAST(floor(us / (900 * 1000000)) AS BIGINT) - i) * 900 AS win_s
  FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS i)
  WHERE (CAST(floor(us / (900 * 1000000)) AS BIGINT) - i) * 900
        > us / 1000000 - 3600
)
SELECT CAST(to_timestamp(win_s) AT TIME ZONE 'UTC' AS VARCHAR) AS win_start,
       event_type, CAST(count(*) AS BIGINT) AS n
FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["hopping_window_counts"] = q_hopping_window_counts
ORACLES["hopping_window_counts"] = ORACLE_HOPPING_WINDOW_COUNTS


def q_audience_overlap(spark, sf_dir):
    """Audience set algebra via boolean aggregation — the bitmap-index
    idiom: one pass flags each user's week-1 / week-2 activity with two
    conditional max-aggs (no self-join, no distinct-of-distinct), then
    a 1-row re-agg yields intersection, union, each side's exclusive
    count, and the exact Jaccard. At 100 TB this is the shape roaring-
    bitmap audience engines compute; here it is two stacked partial+
    final aggs."""
    e = load_table(spark, sf_dir, "events")
    flags = (
        e.withColumn("d", F.to_date("ts"))
        .groupBy("user_id")
        .agg(
            F.max(
                (F.col("d").between("2024-01-01", "2024-01-07")).cast("int")
            ).alias("w1"),
            F.max(
                (F.col("d").between("2024-01-08", "2024-01-14")).cast("int")
            ).alias("w2"),
        )
    )
    return flags.agg(
        F.sum((F.col("w1") * F.col("w2"))).cast("bigint").alias("both"),
        F.sum(F.greatest("w1", "w2")).cast("bigint").alias("either"),
        F.sum(F.col("w1") * (1 - F.col("w2"))).cast("bigint").alias("only_w1"),
        F.sum(F.col("w2") * (1 - F.col("w1"))).cast("bigint").alias("only_w2"),
        F.round(
            F.sum(F.col("w1") * F.col("w2"))
            / F.sum(F.greatest("w1", "w2")),
            6,
        ).alias("jaccard"),
    )


ORACLE_AUDIENCE_OVERLAP = """
WITH flags AS (
  SELECT user_id,
         max(CASE WHEN CAST(ts AS DATE) BETWEEN DATE '2024-01-01'
                   AND DATE '2024-01-07' THEN 1 ELSE 0 END) AS w1,
         max(CASE WHEN CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
                   AND DATE '2024-01-14' THEN 1 ELSE 0 END) AS w2
  FROM events GROUP BY 1
)
SELECT CAST(sum(w1 * w2) AS BIGINT) AS both,
       CAST(sum(greatest(w1, w2)) AS BIGINT) AS either,
       CAST(sum(w1 * (1 - w2)) AS BIGINT) AS only_w1,
       CAST(sum(w2 * (1 - w1)) AS BIGINT) AS only_w2,
       round(sum(w1 * w2) * 1.0 / sum(greatest(w1, w2)), 6) AS jaccard
FROM flags
"""

QUERIES["audience_overlap"] = q_audience_overlap
ORACLES["audience_overlap"] = ORACLE_AUDIENCE_OVERLAP


def q_ks_drift_statistic(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between order-total
    distributions before/after 1998 — the data-drift monitor an ML
    pipeline runs between training and serving windows. Values band to
    exact integer $100 buckets first (the two sides' rollups are
    band-vocabulary sized), the banded CDFs come from cumulative window
    sums over the FULL OUTER of the two rollups, and D = max |cdfA -
    cdfB|. The raw table is scanned once; every float is a ratio of
    exact BIGINTs."""
    o = load_table(spark, sf_dir, "orders")
    side = F.when(F.col("o_orderdate") < "1998-01-01", "a").otherwise("b")
    band = (F.floor(F.col("o_totalprice") / 100) * 100).cast("bigint")
    rolled = o.groupBy(side.alias("side"), band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = rolled.filter(F.col("side") == "a").select(
        "band", F.col("n").alias("na"))
    b = rolled.filter(F.col("side") == "b").select(
        "band", F.col("n").alias("nb"))
    j = (
        a.join(b, "band", "full_outer")
        .select(
            "band",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    wcum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cdf = (
        j.withColumn("ca", F.sum("na").over(wcum) / F.sum("na").over(wall))
        .withColumn("cb", F.sum("nb").over(wcum) / F.sum("nb").over(wall))
    )
    return cdf.agg(
        F.round(F.max(F.abs(F.col("ca") - F.col("cb"))), 6).alias("ks_d"),
        F.count(F.lit(1)).cast("bigint").alias("n_bands"),
    )


ORACLE_KS_DRIFT_STATISTIC = """
WITH rolled AS (
  SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a'
              ELSE 'b' END AS side,
         CAST(floor(o_totalprice / 100) * 100 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), j AS (
  SELECT coalesce(a.band, b.band) AS band,
         coalesce(a.n, 0) AS na, coalesce(b.n, 0) AS nb
  FROM (SELECT band, n FROM rolled WHERE side = 'a') a
  FULL OUTER JOIN (SELECT band, n FROM rolled WHERE side = 'b') b
    ON a.band = b.band
), cdf AS (
  SELECT band,
         sum(na) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) * 1.0
           / sum(na) OVER () AS ca,
         sum(nb) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) * 1.0
           / sum(nb) OVER () AS cb
  FROM j
)
SELECT round(max(abs(ca - cb)), 6) AS ks_d,
       CAST(count(*) AS BIGINT) AS n_bands
FROM cdf
"""

QUERIES["ks_drift_statistic"] = q_ks_drift_statistic
ORACLES["ks_drift_statistic"] = ORACLE_KS_DRIFT_STATISTIC


def q_alert_debounce(spark, sf_dir):
    """Alert flap suppression: an 'error' event is SUPPRESSED when the
    same user fired one under 5 minutes earlier — the notification
    debounce every alerting pipeline applies before paging. One lag
    window per (user), then a per-stream rollup of kept vs suppressed;
    no state machine, no self-join."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = e.withColumn(
        "suppressed",
        F.when(gap_us.isNotNull() & (gap_us < 5 * 60 * 1_000_000), 1)
        .otherwise(0),
    )
    return flagged.groupBy(
        F.to_date("ts").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_alerts"),
        F.sum("suppressed").cast("bigint").alias("n_suppressed"),
        (F.count(F.lit(1)) - F.sum("suppressed")).cast("bigint").alias("n_paged"),
    ).orderBy("day")


ORACLE_ALERT_DEBOUNCE = """
WITH err AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events WHERE event_type = 'error'
), flagged AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CASE WHEN gap_us IS NOT NULL AND gap_us < 5 * 60 * 1000000
              THEN 1 ELSE 0 END AS suppressed
  FROM err
)
SELECT day, CAST(count(*) AS BIGINT) AS n_alerts,
       CAST(sum(suppressed) AS BIGINT) AS n_suppressed,
       CAST(count(*) - sum(suppressed) AS BIGINT) AS n_paged
FROM flagged GROUP BY 1 ORDER BY 1
"""

QUERIES["alert_debounce"] = q_alert_debounce
ORACLES["alert_debounce"] = ORACLE_ALERT_DEBOUNCE


def q_topk_with_ties(spark, sf_dir):
    """Top-3 parts per brand by shipped quantity WITH ties (rank, not
    row_number) — the semantic difference every leaderboard eventually
    hits: equal quantities share a rank and all survive the cut, so the
    result is deterministic WITHOUT a tiebreak column. Quantities sum
    exactly (doubles holding small integers), the rank window
    partitions on brand."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    qty = (
        l.join(F.broadcast(p.select("p_partkey", "p_brand")),
               l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("qty"))
    return (
        qty.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .orderBy("p_brand", "rnk", "l_partkey")
    )


ORACLE_TOPK_WITH_TIES = """
WITH qty AS (
  SELECT p_brand, l_partkey, CAST(sum(l_quantity) AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_brand, l_partkey, qty,
       CAST(rank() OVER (PARTITION BY p_brand ORDER BY qty DESC) AS BIGINT)
         AS rnk
FROM qty QUALIFY rnk <= 3
ORDER BY p_brand, rnk, l_partkey
"""

QUERIES["topk_with_ties"] = q_topk_with_ties
ORACLES["topk_with_ties"] = ORACLE_TOPK_WITH_TIES


def q_gini_coefficient(spark, sf_dir):
    """Gini inequality coefficient of order value per market segment —
    the rank-weighted ordered aggregation (G = 2*sum(i*x)/(n*sum(x)) -
    (n+1)/n over ascending x). Order values are exact integer cents, so
    both the rank weights and the sums are drift-free BIGINT math until
    the single final division; the rank window partitions on segment."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    ranked = cents.withColumn("i", F.row_number().over(w).cast("bigint"))
    return (
        ranked.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                2 * F.sum(F.col("i") * F.col("cents"))
                / (F.count(F.lit(1)) * F.sum("cents"))
                - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
                6,
            ).alias("gini"),
        )
        .orderBy("segment")
    )


ORACLE_GINI_COEFFICIENT = """
WITH cents AS (
  SELECT c_mktsegment AS segment, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), ranked AS (
  SELECT segment, cents,
         CAST(row_number() OVER (
           PARTITION BY segment ORDER BY cents, o_orderkey) AS BIGINT) AS i
  FROM cents
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
       round(2.0 * sum(i * cents) / (count(*) * sum(cents))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["gini_coefficient"] = q_gini_coefficient
ORACLES["gini_coefficient"] = ORACLE_GINI_COEFFICIENT


def q_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint localization: per stream, the day where the
    cumulative deviation from that stream's own daily mean peaks in
    magnitude — where the level shift happened, not just that one did
    (the complement of the z-score anomaly gate). All windows run over
    the (service, day) rollup; deterministic tie-break on earliest
    day."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("service"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    ws = Window.partitionBy("service")
    wcum = Window.partitionBy("service").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cs = (
        daily.withColumn("mean_n", F.avg("n").over(ws))
        .withColumn("cusum", F.sum(F.col("n") - F.col("mean_n")).over(wcum))
    )
    wpick = Window.partitionBy("service").orderBy(
        F.desc(F.abs(F.col("cusum"))), "day"
    )
    return (
        cs.withColumn("rk", F.row_number().over(wpick))
        .filter(F.col("rk") == 1)
        .select(
            "service",
            F.col("day").cast("string").alias("change_day"),
            F.round("cusum", 6).alias("peak_cusum"),
        )
        .orderBy("service")
    )


ORACLE_CUSUM_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type AS service, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
), withmean AS (
  SELECT service, day, n, avg(n) OVER (PARTITION BY service) AS mean_n
  FROM daily
), cs AS (
  SELECT service, day,
         sum(n - mean_n) OVER (
           PARTITION BY service ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS cusum
  FROM withmean
), picked AS (
  SELECT service, day, cusum,
         row_number() OVER (
           PARTITION BY service ORDER BY abs(cusum) DESC, day) AS rk
  FROM cs
)
SELECT service, CAST(day AS VARCHAR) AS change_day,
       round(cusum, 6) AS peak_cusum
FROM picked WHERE rk = 1 ORDER BY service
"""

QUERIES["cusum_changepoint"] = q_cusum_changepoint
ORACLES["cusum_changepoint"] = ORACLE_CUSUM_CHANGEPOINT


def q_posting_lists(spark, sf_dir):
    """Inverted-index build: per term, document frequency and the first
    ten postings (sorted doc ids, comma-joined) — the search-index
    construction every retrieval stack runs over a corpus. One distinct
    + one groupBy on the term key; posting arrays are truncated BEFORE
    stringification so the shuffle rows stay bounded. Top-20 terms by
    (df DESC, term)."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") >= 3)
        .distinct()
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.array_sort(F.collect_list("doc_id")), 1, 10),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .orderBy(F.desc("df"), "term")
        .limit(20)
    )


ORACLE_POSTING_LISTS = """
WITH toks AS (
  SELECT DISTINCT d.doc_id, t.term
  FROM documents d,
       LATERAL unnest(string_split_regex(lower(d.text), '[^a-z]+')) AS t(term)
  WHERE len(t.term) >= 3
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
FROM toks GROUP BY 1 ORDER BY df DESC, term LIMIT 20
"""

QUERIES["posting_lists"] = q_posting_lists
ORACLES["posting_lists"] = ORACLE_POSTING_LISTS


def q_ring_negative_pairs(spark, sf_dir):
    """Deterministic negative sampling for contrastive training: each
    document pairs with its successor on an md5 hash ring (uniform
    pseudo-random partner, reproducible across runs — no RNG), the last
    ring position wrapping to the first. Here the ring is one global
    ordered window; at 100 TB the same pairing runs inside hash-RANGE
    partitions (successors stay adjacent within a range; only the
    per-partition boundary doc needs the cross-partition wrap)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("neg:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    w = Window.orderBy("h", "doc_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        d.withColumn(
            "neg_doc_id",
            F.coalesce(
                F.lead("doc_id").over(w), F.first("doc_id").over(wall)
            ),
        )
        .select("doc_id", "neg_doc_id")
        .orderBy("doc_id")
    )


ORACLE_RING_NEGATIVE_PAIRS = """
WITH ring AS (
  SELECT doc_id, md5('neg:' || doc_id::VARCHAR) AS h FROM documents
)
SELECT doc_id,
       coalesce(
         lead(doc_id) OVER (ORDER BY h, doc_id),
         first_value(doc_id) OVER (
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ) AS neg_doc_id
FROM ring ORDER BY doc_id
"""

QUERIES["ring_negative_pairs"] = q_ring_negative_pairs
ORACLES["ring_negative_pairs"] = ORACLE_RING_NEGATIVE_PAIRS


def q_neyman_allocation(spark, sf_dir):
    """Neyman allocation of a 1000-item labeling budget across language
    strata — annotation spend proportional to stratum size times
    within-stratum variability (n_h * sd_h), the survey-sampling answer
    to 'which languages deserve annotators'. One partial+final agg for
    the strata stats; shares are rounded ratios over the
    vocabulary-sized rollup."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.stddev_pop("n_chars").alias("sd"),
    )
    wall = Window.partitionBy()
    return (
        stats.withColumn("w", F.col("n_docs") * F.col("sd"))
        .withColumn("share", F.col("w") / F.sum("w").over(wall))
        .select(
            "lang",
            "n_docs",
            F.round("sd", 6).alias("sd_chars"),
            F.round("share", 6).alias("alloc_share"),
        )
        .orderBy("lang")
    )


ORACLE_NEYMAN_ALLOCATION = """
WITH stats AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         stddev_pop(n_chars) AS sd
  FROM documents GROUP BY 1
)
SELECT lang, n_docs, round(sd, 6) AS sd_chars,
       round(n_docs * sd / sum(n_docs * sd) OVER (), 6) AS alloc_share
FROM stats ORDER BY lang
"""

QUERIES["neyman_allocation"] = q_neyman_allocation
ORACLES["neyman_allocation"] = ORACLE_NEYMAN_ALLOCATION


def q_survival_curve(spark, sf_dir):
    """Kaplan-Meier time-to-first-purchase with right censoring at the
    corpus horizon — the survival estimator product-limit form, S(t) =
    exp(cumsum(ln(1 - d_t / n_risk_t))), with the at-risk counts as a
    REVERSED cumulative window over the per-duration rollup (no
    per-user scan per time point). Users who never purchase censor at
    the horizon and deflate n_risk without contributing events."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.to_date("ts")).alias("mx"))
    per_user = (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_seen"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.to_date("ts"))
            ).alias("first_purchase"),
            F.first("mx").alias("mx"),
        )
        .select(
            F.when(
                F.col("first_purchase").isNotNull(),
                F.datediff("first_purchase", "first_seen"),
            )
            .otherwise(F.datediff("mx", "first_seen"))
            .cast("bigint")
            .alias("duration_d"),
            F.col("first_purchase").isNotNull().cast("int").alias("event"),
        )
    )
    rolled = per_user.groupBy("duration_d").agg(
        F.sum("event").cast("bigint").alias("d_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_exit"),
    )
    wrisk = Window.orderBy("duration_d").rowsBetween(
        0, Window.unboundedFollowing
    )
    wcum = Window.orderBy("duration_d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    factor = 1 - F.col("d_events") / F.col("n_risk")
    ln_f = F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))
    hit_zero = F.max(F.when(factor <= 0, 1).otherwise(0)).over(wcum)
    return (
        rolled.withColumn("n_risk", F.sum("n_exit").over(wrisk).cast("bigint"))
        .withColumn(
            # a step where every at-risk user converts drives S to
            # exactly 0 from there on; both engines must special-case it
            # (DuckDB raises on ln(0), Spark nulls it)
            "s",
            F.when(hit_zero == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum(ln_f).over(wcum)), 6)
            ),
        )
        .select("duration_d", "n_risk", "d_events", "s")
        .orderBy("duration_d")
    )


ORACLE_SURVIVAL_CURVE = """
WITH per_user AS (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS first_seen,
         min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
           AS first_purchase
  FROM events GROUP BY 1
), durations AS (
  SELECT CASE WHEN first_purchase IS NOT NULL
              THEN date_diff('day', first_seen, first_purchase)
              ELSE date_diff('day', first_seen,
                             (SELECT max(CAST(ts AS DATE)) FROM events)) END
           AS duration_d,
         CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
), rolled AS (
  SELECT CAST(duration_d AS BIGINT) AS duration_d,
         CAST(sum(event) AS BIGINT) AS d_events,
         CAST(count(*) AS BIGINT) AS n_exit
  FROM durations GROUP BY 1
)
SELECT duration_d, n_risk, d_events,
       CASE WHEN max(CASE WHEN 1 - d_events * 1.0 / n_risk <= 0
                          THEN 1 ELSE 0 END)
                 OVER (ORDER BY duration_d ROWS UNBOUNDED PRECEDING) = 1
            THEN 0.0
            ELSE round(exp(sum(CASE WHEN 1 - d_events * 1.0 / n_risk > 0
                                    THEN ln(1 - d_events * 1.0 / n_risk)
                                    ELSE 0 END)
                 OVER (ORDER BY duration_d ROWS UNBOUNDED PRECEDING)), 6)
       END AS s
FROM (
  SELECT duration_d, d_events,
         CAST(sum(n_exit) OVER (ORDER BY duration_d
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS n_risk
  FROM rolled
) ORDER BY duration_d
"""

QUERIES["survival_curve"] = q_survival_curve
ORACLES["survival_curve"] = ORACLE_SURVIVAL_CURVE


# ---------------------------------------------------------------------------
# Batch 7: the four remaining TPC-H shapes (Q2/Q11/Q16/Q20, against a
# supplier-part relation DERIVED from lineitem — the testdata ships no
# partsupp table) plus eleven statistics / curation / API-pattern gates.
# ---------------------------------------------------------------------------


def _derived_partsupp(spark, sf_dir):
    """partsupp analog derived from lineitem: per (partkey, suppkey),
    the min observed unit price as supplycost and the total shipped
    quantity as availqty. One shuffle on the composite key; reused by
    the Q2/Q11/Q16/Q20 shapes below."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_availqty"),
    )


def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): for STANDARD parts of
    size >= 45, the ASIA supplier(s) offering the minimum derived unit
    cost. The classic correlated-min subquery DECORRELATED into a
    per-part min aggregate joined back on equality; part and the
    supplier->nation->region chain are KB-scale broadcasts at any fact
    size, so the only big shuffle is the derived-partsupp groupBy.
    Cost doubles are identical in both engines (same division, same
    inputs), so the equality join is drift-free."""
    ps = _derived_partsupp(spark, sf_dir)
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") >= 45) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    elig = ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey).join(
        F.broadcast(s), ps.ps_suppkey == s.s_suppkey
    )
    minc = elig.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        elig.join(
            minc,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.round("ps_supplycost", 6).alias("cost_per_unit"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


ORACLE_MIN_COST_SUPPLIER = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
), s AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
), elig AS (
  SELECT ps.*, s.s_name, s.n_name
  FROM ps
  JOIN part ON ps_partkey = p_partkey
           AND p_size >= 45 AND p_type = 'STANDARD'
  JOIN s ON ps_suppkey = s_suppkey
), minc AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM elig GROUP BY 1
)
SELECT e.ps_partkey AS p_partkey, e.s_name, e.n_name,
       round(e.ps_supplycost, 6) AS cost_per_unit
FROM elig e JOIN minc m
  ON e.ps_partkey = m.ps_partkey AND e.ps_supplycost = m.min_cost
ORDER BY p_partkey, s_name LIMIT 100
"""

QUERIES["min_cost_supplier"] = q_min_cost_supplier
ORACLES["min_cost_supplier"] = ORACLE_MIN_COST_SUPPLIER


def q_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part inventory value from
    one nation's suppliers, keeping parts above a fraction of the
    nation's total. Value is summed in EXACT integer cents so the
    group-by agg and the global scalar it is compared against are both
    drift-free; the global total rides a single unpartitioned window
    over the parts-sized rollup (bounded by the part vocabulary, never
    the fact table)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .alias("value_cents")
        )
    )
    wall = Window.partitionBy()
    return (
        per_part.withColumn("total", F.sum("value_cents").over(wall))
        .filter(F.col("value_cents") > F.col("total") * 0.001)
        .select(
            "p_partkey",
            F.round(F.col("value_cents") / 100.0, 6).alias("value_usd"),
        )
        .orderBy(F.desc("value_usd"), "p_partkey")
    )


ORACLE_IMPORTANT_STOCK = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
  GROUP BY 1
)
SELECT p_partkey, round(value_cents / 100.0, 6) AS value_usd
FROM (SELECT *, sum(value_cents) OVER () AS total FROM per_part)
WHERE value_cents > total * 0.001
ORDER BY value_usd DESC, p_partkey
"""

QUERIES["important_stock"] = q_important_stock
ORACLES["important_stock"] = ORACLE_IMPORTANT_STOCK


def q_parts_supplier_census(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship census): distinct
    supplier counts per (brand, type, size) bucket over the derived
    supplier-part pairs, excluding one brand, restricting to eight
    sizes, and ANTI-JOINING out suppliers in deficit (negative account
    balance — the testdata has no comment column for Q16's complaint
    filter). Pairs project to two longs before any shuffle; part and
    the exclusion list are broadcasts."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(30)
    )


ORACLE_PARTS_SUPPLIER_CENSUS = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 30
"""

QUERIES["parts_supplier_census"] = q_parts_supplier_census
ORACLES["parts_supplier_census"] = ORACLE_PARTS_SUPPLIER_CENSUS


def q_excess_inventory(spark, sf_dir):
    """TPC-H Q20 shape (excess inventory): EUROPE suppliers holding
    1995 shipments of 'red' parts exceeding half their 1996 demand —
    the nested-aggregate + double-semi-join pattern (who over-stocked
    ahead of realized demand). Per-(part,supplier) year quantities
    aggregate before any join; quantities are integral doubles so the
    sums are exact; the final output is a supplier-vocabulary-sized
    semi join."""
    li = load_table(spark, sf_dir, "lineitem")
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    yr = F.year("l_shipdate")
    per_ps = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .filter(yr.isin(1995, 1996))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(yr == 1995, F.col("l_quantity")).otherwise(0.0))
            .alias("q95"),
            F.sum(F.when(yr == 1996, F.col("l_quantity")).otherwise(0.0))
            .alias("q96"),
        )
        .filter((F.col("q96") > 0) & (F.col("q95") > F.col("q96") * 0.5))
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(
            per_ps.select("l_suppkey").distinct(),
            s.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


ORACLE_EXCESS_INVENTORY = """
WITH per_ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CASE WHEN year(l_shipdate) = 1995 THEN l_quantity ELSE 0 END) AS q95,
         sum(CASE WHEN year(l_shipdate) = 1996 THEN l_quantity ELSE 0 END) AS q96
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
  WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps WHERE q96 > 0 AND q95 > q96 * 0.5)
ORDER BY s_suppkey
"""

QUERIES["excess_inventory"] = q_excess_inventory
ORACLES["excess_inventory"] = ORACLE_EXCESS_INVENTORY


def q_jackknife_lang_quality(spark, sf_dir):
    """Leave-one-stratum-out (jackknife) corpus means: how much each
    language stratum pulls the corpus mean document length — the
    robustness diagnostic run before trusting a per-language curation
    threshold. Sums stay exact BIGINTs until the final division; the
    global sums ride one unpartitioned window over the 5-row language
    rollup."""
    d = load_table(spark, sf_dir, "documents")
    roll = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    wall = Window.partitionBy()
    tot_n = F.sum("n_docs").over(wall)
    tot_s = F.sum("sum_chars").over(wall)
    loo = (tot_s - F.col("sum_chars")) / (tot_n - F.col("n_docs"))
    return (
        roll.select(
            "lang",
            "n_docs",
            F.round(loo, 6).alias("loo_mean_chars"),
            F.round(loo - tot_s / tot_n, 6).alias("influence"),
        )
        .orderBy("lang")
    )


ORACLE_JACKKNIFE_LANG_QUALITY = """
WITH roll AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1
)
SELECT lang, n_docs,
       round((tot_s - sum_chars) * 1.0 / (tot_n - n_docs), 6) AS loo_mean_chars,
       round((tot_s - sum_chars) * 1.0 / (tot_n - n_docs)
             - tot_s * 1.0 / tot_n, 6) AS influence
FROM (SELECT *, sum(n_docs) OVER () AS tot_n, sum(sum_chars) OVER () AS tot_s
      FROM roll)
ORDER BY lang
"""

QUERIES["jackknife_lang_quality"] = q_jackknife_lang_quality
ORACLES["jackknife_lang_quality"] = ORACLE_JACKKNIFE_LANG_QUALITY


def q_trimmed_mean_price(spark, sf_dir):
    """5%-trimmed mean order value per market segment — the outlier-
    robust mean with EXACT integer-rank trimming (row_number over
    (cents, orderkey), drop the bottom and top floor(n*0.05) ranks), so
    which rows are trimmed is bit-deterministic in both engines; cents
    stay BIGINT until the final division. The rank window partitions on
    segment — no global sort."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    ws = Window.partitionBy("segment")
    ranked = cents.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(ws)
    )
    cut = F.floor(F.col("n") * 0.05)
    return (
        ranked.filter((F.col("rn") > cut) & (F.col("rn") <= F.col("n") - cut))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.round(
                F.sum("cents") / (F.count(F.lit(1)) * 100.0), 6
            ).alias("trimmed_mean_usd"),
        )
        .orderBy("segment")
    )


ORACLE_TRIMMED_MEAN_PRICE = """
WITH cents AS (
  SELECT c_mktsegment AS segment, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), ranked AS (
  SELECT segment, cents,
         row_number() OVER (PARTITION BY segment ORDER BY cents, o_orderkey)
           AS rn,
         count(*) OVER (PARTITION BY segment) AS n
  FROM cents
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_kept,
       round(sum(cents) / (count(*) * 100.0), 6) AS trimmed_mean_usd
FROM ranked
WHERE rn > floor(n * 0.05) AND rn <= n - floor(n * 0.05)
GROUP BY 1 ORDER BY 1
"""

QUERIES["trimmed_mean_price"] = q_trimmed_mean_price
ORACLES["trimmed_mean_price"] = ORACLE_TRIMMED_MEAN_PRICE


def q_psi_length_drift(spark, sf_dir):
    """Population Stability Index between the first and second half of
    the corpus (by doc_id) over document-length bands — the standard
    train/serve input-drift metric (PSI > 0.2 = retrain), complementing
    the KS gate's CDF test. Band counts aggregate per half in one
    conditional agg; shares are Laplace-smoothed from exact integers so
    ln never sees zero. The whole computation after the first groupBy
    runs on a <=12-row band rollup."""
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mx"))
    banded = d.crossJoin(F.broadcast(mx)).select(
        F.least(F.floor(F.col("n_chars") / 50), F.lit(10)).cast("bigint")
        .alias("band"),
        (F.col("doc_id") * 2 <= F.col("mx")).alias("is_old"),
    )
    roll = banded.groupBy("band").agg(
        F.sum(F.when(F.col("is_old"), 1).otherwise(0)).cast("bigint")
        .alias("c_old"),
        F.sum(F.when(~F.col("is_old"), 1).otherwise(0)).cast("bigint")
        .alias("c_new"),
    )
    wall = Window.partitionBy()
    n_old, n_new = F.sum("c_old").over(wall), F.sum("c_new").over(wall)
    b = F.count(F.lit(1)).over(wall)
    p = (F.col("c_old") + 1) / (n_old + b)
    q = (F.col("c_new") + 1) / (n_new + b)
    return (
        roll.withColumn("contrib", F.round((p - q) * F.log(p / q), 6))
        .select("band", "c_old", "c_new", "contrib")
        .orderBy("band")
    )


ORACLE_PSI_LENGTH_DRIFT = """
WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
banded AS (
  SELECT least(CAST(floor(n_chars / 50) AS BIGINT), 10) AS band,
         d.doc_id * 2 <= mx.mx AS is_old
  FROM documents d, mx
), roll AS (
  SELECT band,
         CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS c_old,
         CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS c_new
  FROM banded GROUP BY 1
)
SELECT band, c_old, c_new,
       round(((c_old + 1) * 1.0 / (n_old + b) - (c_new + 1) * 1.0 / (n_new + b))
             * ln(((c_old + 1) * 1.0 / (n_old + b))
                  / ((c_new + 1) * 1.0 / (n_new + b))), 6) AS contrib
FROM (SELECT *, sum(c_old) OVER () AS n_old, sum(c_new) OVER () AS n_new,
             count(*) OVER () AS b
      FROM roll)
ORDER BY band
"""

QUERIES["psi_length_drift"] = q_psi_length_drift
ORACLES["psi_length_drift"] = ORACLE_PSI_LENGTH_DRIFT


def q_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman revenue concentration per market segment —
    is this segment's revenue spread across customers or owned by a
    few? Per-customer revenue aggregates to exact cents first; the
    squared-share sum runs over the customer-vocabulary rollup with the
    segment totals as a partitioned window (never a second scan of
    orders)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("cents")
        )
    )
    ws = Window.partitionBy("segment")
    share = F.col("cents") / F.sum("cents").over(ws)
    return (
        per_cust.withColumn("sh2", share * share)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("sh2"), 6).alias("hhi"),
        )
        .orderBy("segment")
    )


ORACLE_HHI_CONCENTRATION = """
WITH per_cust AS (
  SELECT c_mktsegment AS segment, o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(sh2), 6) AS hhi
FROM (SELECT segment,
             (cents * 1.0 / sum(cents) OVER (PARTITION BY segment)) ^ 2 AS sh2
      FROM per_cust)
GROUP BY 1 ORDER BY 1
"""

QUERIES["hhi_concentration"] = q_hhi_concentration
ORACLES["hhi_concentration"] = ORACLE_HHI_CONCENTRATION


def q_autocorr_daily_volume(spark, sf_dir):
    """Lag-1 autocorrelation of daily event volume per stream — the
    'is today predictive of tomorrow' seasonality diagnostic that
    decides whether a forecast beats a constant. One lag window and the
    corr aggregate both run over the (service, day) rollup; consecutive
    ROWS are paired (calendar gaps pair across the gap — documented,
    identical in the oracle)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("service"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy("service").orderBy("day")
    return (
        daily.withColumn("n_next", F.lead("n").over(w))
        .groupBy("service")
        .agg(
            F.count("n_next").cast("bigint").alias("n_pairs"),
            F.round(F.corr("n", "n_next"), 6).alias("autocorr_lag1"),
        )
        .orderBy("service")
    )


ORACLE_AUTOCORR_DAILY_VOLUME = """
WITH daily AS (
  SELECT event_type AS service, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
), paired AS (
  SELECT service, n,
         lead(n) OVER (PARTITION BY service ORDER BY day) AS n_next
  FROM daily
)
SELECT service, CAST(count(n_next) AS BIGINT) AS n_pairs,
       round(corr(n, n_next), 6) AS autocorr_lag1
FROM paired GROUP BY 1 ORDER BY 1
"""

QUERIES["autocorr_daily_volume"] = q_autocorr_daily_volume
ORACLES["autocorr_daily_volume"] = ORACLE_AUTOCORR_DAILY_VOLUME


def q_token_budget_mix(spark, sf_dir):
    """Temperature-weighted multilingual sampling mix: share of a
    training-token budget per language under p^alpha smoothing
    (alpha=0.3, the mT5/XLM-R up-sampling rule for low-resource
    languages). Token counts are exact whitespace-token BIGINTs per
    language; only the final pow/normalize runs in float, over the
    5-row language rollup."""
    d = load_table(spark, sf_dir, "documents")
    roll = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint").alias("n_tokens")
    )
    wall = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(wall)
    w_ = F.pow(p, F.lit(0.3))
    return (
        roll.withColumn("w", w_)
        .withColumn("sample_share", F.round(F.col("w") / F.sum("w").over(wall), 6))
        .withColumn("raw_share", F.round(p, 6))
        .select("lang", "n_tokens", "raw_share", "sample_share")
        .orderBy("lang")
    )


ORACLE_TOKEN_BUDGET_MIX = r"""
WITH roll AS (
  SELECT lang,
         CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY 1
), shares AS (
  SELECT lang, n_tokens,
         n_tokens * 1.0 / sum(n_tokens) OVER () AS p
  FROM roll
)
SELECT lang, n_tokens, round(p, 6) AS raw_share,
       round(p ^ 0.3 / sum(p ^ 0.3) OVER (), 6) AS sample_share
FROM shares ORDER BY lang
"""

QUERIES["token_budget_mix"] = q_token_budget_mix
ORACLES["token_budget_mix"] = ORACLE_TOKEN_BUDGET_MIX


def q_unigram_kl_by_source(spark, sf_dir):
    """Per-source unigram KL divergence from the corpus distribution —
    which ingestion sources are lexically drifted and deserve a look
    before they skew training. The corpus distribution is a vocabulary-
    sized broadcast; each source's divergence sums only over words that
    source actually uses (true KL terms, q>0 guaranteed by
    construction)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
    ).filter(F.length("word") > 0)
    corpus = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_tot")
    )
    wall = Window.partitionBy()
    corpus = corpus.withColumn("p_corpus", F.col("c_tot") / F.sum("c_tot").over(wall))
    per_src = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_sw")
    )
    wsrc = Window.partitionBy("source")
    per_src = per_src.withColumn(
        "p_sw", F.col("c_sw") / F.sum("c_sw").over(wsrc)
    )
    return (
        per_src.join(F.broadcast(corpus.select("word", "p_corpus")), "word")
        .groupBy("source")
        .agg(
            F.sum("c_sw").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("p_sw") * F.log(F.col("p_sw") / F.col("p_corpus"))),
                6,
            ).alias("kl_divergence"),
        )
        .orderBy("source")
    )


ORACLE_UNIGRAM_KL_BY_SOURCE = """
WITH words AS (
  SELECT source, t.word
  FROM documents d,
       LATERAL unnest(string_split_regex(lower(d.text), '[^a-z]+')) AS t(word)
  WHERE len(t.word) > 0
), corpus AS (
  SELECT word, count(*) * 1.0 / sum(count(*)) OVER () AS p_corpus
  FROM words GROUP BY 1
), per_src AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS c_sw,
         count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY source) AS p_sw
  FROM words GROUP BY 1, 2
)
SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_tokens,
       round(sum(p_sw * ln(p_sw / p_corpus)), 6) AS kl_divergence
FROM per_src JOIN corpus USING (word)
GROUP BY 1 ORDER BY 1
"""

QUERIES["unigram_kl_by_source"] = q_unigram_kl_by_source
ORACLES["unigram_kl_by_source"] = ORACLE_UNIGRAM_KL_BY_SOURCE


def q_ngram_novelty_rate(spark, sf_dir):
    """Per-decile 3-gram novelty: as the corpus grows (by doc_id), what
    fraction of each document's word trigrams has never been seen
    before — the marginal-value-of-more-data curve (novelty ~0 means
    the source is mined out). Trigram first-occurrence is one min-agg
    over 16-byte digests (the first-seen trick — no running state);
    per-doc ratios aggregate to a 10-row decile rollup. The word split
    MATERIALIZES as a column before the trigram transform — a lambda
    referencing the raw split() expression re-evaluates the regex split
    per element (no common-subexpression elimination across the lambda
    boundary; measured 6x slower end to end at sf0.1)."""
    from .operators.dedup import fan_out

    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mx"))
    # single-split scan → fan out before the per-row md5 battery
    toks = fan_out(d).select(
        "doc_id", F.split(F.lower("text"), "[^a-z]+").alias("w")
    )
    wc = F.size(F.col("w"))
    grams = F.when(
        wc >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), wc - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("w"), i),
                    F.element_at(F.col("w"), i + 1),
                    F.element_at(F.col("w"), i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_grams = toks.select(
        "doc_id", F.explode(grams).alias("g")
    ).select("doc_id", F.md5("g").alias("gh"))
    first = doc_grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    # Every gram contributes exactly ONE novel occurrence — to the doc
    # that first saw it — so the per-doc novelty count is a count over
    # `first` grouped by first_doc, and the per-doc gram count is a
    # direct aggregation of doc_grams. The old shape instead joined the
    # corpus-sized gram table back against `first` on the digest (a
    # second full shuffle of every gram row) only to re-derive those
    # two counts (guide §2.4: remove shuffles outright). Docs whose
    # every gram was seen before get n_novel = 0 via the left join.
    n_grams_per_doc = doc_grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    n_novel_per_doc = first.groupBy(
        F.col("first_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    per_doc = n_grams_per_doc.join(n_novel_per_doc, "doc_id", "left").select(
        "doc_id", "n_grams",
        F.coalesce(F.col("n_novel"), F.lit(0).cast("bigint")).alias("n_novel"),
    )
    return (
        per_doc.crossJoin(F.broadcast(mx))
        .select(
            F.least(F.lit(9), F.floor(F.col("doc_id") * 10 / (F.col("mx") + 1)))
            .cast("bigint").alias("decile"),
            (F.col("n_novel") / F.col("n_grams")).alias("ratio"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ratio"), 6).alias("avg_novelty"),
        )
        .orderBy("decile")
    )


ORACLE_NGRAM_NOVELTY_RATE = """
WITH arrs AS (
  SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS arr
  FROM documents
), doc_grams AS (
  SELECT DISTINCT doc_id,
         md5(arr[CAST(i AS INT)] || ' ' || arr[CAST(i AS INT) + 1] || ' ' ||
             arr[CAST(i AS INT) + 2]) AS gh
  FROM arrs, LATERAL unnest(range(1, greatest(len(arr) - 1, 1))) AS t(i)
  WHERE len(arr) >= 3
), first AS (
  SELECT gh, min(doc_id) AS first_doc FROM doc_grams GROUP BY 1
), per_doc AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM doc_grams g JOIN first f USING (gh)
  GROUP BY 1
), mx AS (SELECT max(doc_id) AS mx FROM documents)
SELECT least(9, CAST(floor(p.doc_id * 10 / (mx.mx + 1)) AS BIGINT)) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_novel * 1.0 / n_grams), 6) AS avg_novelty
FROM per_doc p, mx
GROUP BY 1 ORDER BY 1
"""

QUERIES["ngram_novelty_rate"] = q_ngram_novelty_rate
ORACLES["ngram_novelty_rate"] = ORACLE_NGRAM_NOVELTY_RATE


def q_wilson_error_rank(spark, sf_dir):
    """Users ranked by Wilson-score LOWER bound of their error-event
    rate — the small-sample-honest ranking (a 2/3 user does not outrank
    a 40/100 user, which a raw-rate sort gets wrong). One partial+final
    agg to the per-user rollup; the closed-form bound is row-local
    float math."""
    e = load_table(spark, sf_dir, "events")
    roll = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint").alias("n_errors"),
    )
    z = F.lit(1.96)
    n, ph = F.col("n_events"), F.col("n_errors") / F.col("n_events")
    lb = (
        ph + z * z / (2 * n)
        - z * F.sqrt((ph * (1 - ph) + z * z / (4 * n)) / n)
    ) / (1 + z * z / n)
    return (
        roll.withColumn("wilson_lb", F.round(lb, 6))
        .withColumn("raw_rate", F.round(ph, 6))
        .select("user_id", "n_events", "n_errors", "raw_rate", "wilson_lb")
        .orderBy(F.desc("wilson_lb"), "user_id")
        .limit(20)
    )


ORACLE_WILSON_ERROR_RANK = """
WITH roll AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
)
SELECT user_id, n_events, n_errors,
       round(ph, 6) AS raw_rate,
       round((ph + 1.96 * 1.96 / (2 * n_events)
              - 1.96 * sqrt((ph * (1 - ph) + 1.96 * 1.96 / (4 * n_events))
                            / n_events))
             / (1 + 1.96 * 1.96 / n_events), 6) AS wilson_lb
FROM (SELECT *, n_errors * 1.0 / n_events AS ph FROM roll)
ORDER BY wilson_lb DESC, user_id LIMIT 20
"""

QUERIES["wilson_error_rank"] = q_wilson_error_rank
ORACLES["wilson_error_rank"] = ORACLE_WILSON_ERROR_RANK


def q_pareto_tail_alpha(spark, sf_dir):
    """Hill estimator of the power-law tail exponent of order values
    per segment (alpha = k / sum(ln(x_i / x_k)) over the top-10% order
    statistics) — quantifying HOW heavy the heavy tail is, where the
    Zipf gate fits word frequencies. Which rows are 'the tail' is an
    exact integer-rank cut (row_number over cents desc), so both
    engines select bit-identical sets before any float math."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("segment").orderBy(F.desc("cents"), "o_orderkey")
    ws = Window.partitionBy("segment")
    kept = (
        cents.withColumn("rn", F.row_number().over(w))
        .withColumn("k", F.floor(F.count(F.lit(1)).over(ws) * 0.1))
        .filter(F.col("rn") <= F.col("k"))
    )
    kept = kept.withColumn("xmin", F.min("cents").over(ws))
    return (
        kept.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_tail"),
            F.round(
                F.count(F.lit(1))
                / F.sum(F.log(F.col("cents") / F.col("xmin"))),
                6,
            ).alias("hill_alpha"),
        )
        .orderBy("segment")
    )


ORACLE_PARETO_TAIL_ALPHA = """
WITH cents AS (
  SELECT c_mktsegment AS segment, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), ranked AS (
  SELECT segment, cents,
         row_number() OVER (
           PARTITION BY segment ORDER BY cents DESC, o_orderkey) AS rn,
         floor(count(*) OVER (PARTITION BY segment) * 0.1) AS k
  FROM cents
), kept AS (
  SELECT segment, cents,
         min(cents) OVER (PARTITION BY segment) AS xmin
  FROM ranked WHERE rn <= k
)
SELECT segment, CAST(count(*) AS BIGINT) AS k_tail,
       round(count(*) / sum(ln(cents * 1.0 / xmin)), 6) AS hill_alpha
FROM kept GROUP BY 1 ORDER BY 1
"""

QUERIES["pareto_tail_alpha"] = q_pareto_tail_alpha
ORACLES["pareto_tail_alpha"] = ORACLE_PARETO_TAIL_ALPHA


def q_keyset_pagination(spark, sf_dir):
    """Keyset (cursor) pagination over orders by (orderdate, orderkey):
    the page AFTER cursor (1997-06-15, 12345) — the at-scale
    replacement for OFFSET, whose cost grows with page depth while a
    keyset predicate pushes to the scan (PushedFilters on the date
    column; min/max stats skip whole row groups of a date-partitioned
    100 TB table). The comparison runs on the RAW timestamp column
    (order dates are midnight-aligned at every SF) so the predicate
    reaches the scan as PushedFilters — wrapping the column in
    to_date() would defeat pushdown."""
    o = load_table(spark, sf_dir, "orders")
    cts = F.lit("1997-06-15 00:00:00").cast("timestamp")
    page = o.filter(
        (F.col("o_orderdate") > cts)
        | ((F.col("o_orderdate") == cts) & (F.col("o_orderkey") > 12345))
    )
    return (
        page.select(
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("order_date"),
            F.round(F.col("o_totalprice") * 100).cast("bigint")
            .alias("price_cents"),
        )
        .orderBy("order_date", "o_orderkey")
        .limit(100)
    )


ORACLE_KEYSET_PAGINATION = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
WHERE CAST(o_orderdate AS DATE) > DATE '1997-06-15'
   OR (CAST(o_orderdate AS DATE) = DATE '1997-06-15' AND o_orderkey > 12345)
ORDER BY order_date, o_orderkey LIMIT 100
"""

QUERIES["keyset_pagination"] = q_keyset_pagination
ORACLES["keyset_pagination"] = ORACLE_KEYSET_PAGINATION
