"""Round-9 staging battery: oracle-gated queries registered AFTER the
round-8 block so earlier rounds' tuned driver prefixes stay intact;
these become fresh evidence once rounds 6-8 are proven.

Same conventions as bench_queries (round(x, 6) floats, BIGINT counts,
explicit tiebreaks, aliases identical on both sides). The engine block
at the end drives storage-layer contracts (snapshot time travel,
manifest stats-pruning, compaction, retention) through the DRIVER's
oracle compare, not just pytest.
"""

from __future__ import annotations

import tempfile as _tempfile

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def q_spearman_daily_corr(spark, sf_dir):
    """Spearman rank correlation between daily order count and daily
    revenue — the monotonic-association check Pearson (corr gate)
    misses under heavy tails. Ranks use the average-rank tie rule via
    rank() + (tie_count-1)/2, integer-derived so both engines agree
    exactly; corr is a ratio statistic over the ~2.4k-row DAILY rollup
    (the fact table aggregates once; no global sort of raw rows)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        ),
    )
    rn = Window.orderBy("n_orders")
    rc = Window.orderBy("cents")
    cn = Window.partitionBy("n_orders")
    cc = Window.partitionBy("cents")
    ranked = daily.select(
        (F.rank().over(rn) + (F.count(F.lit(1)).over(cn) - 1) / 2.0).alias(
            "rx"
        ),
        (F.rank().over(rc) + (F.count(F.lit(1)).over(cc) - 1) / 2.0).alias(
            "ry"
        ),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.corr("rx", "ry"), 6).alias("spearman_rho"),
    )


ORACLE_SPEARMAN_DAILY_CORR = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT rank() OVER (ORDER BY n_orders)
           + (count(*) OVER (PARTITION BY n_orders) - 1) / 2.0 AS rx,
         rank() OVER (ORDER BY cents)
           + (count(*) OVER (PARTITION BY cents) - 1) / 2.0 AS ry
  FROM daily
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       round(corr(rx, ry), 6) AS spearman_rho
FROM ranked
"""

QUERIES["spearman_daily_corr"] = q_spearman_daily_corr
ORACLES["spearman_daily_corr"] = ORACLE_SPEARMAN_DAILY_CORR


def q_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U (rank-sum) test: do 'error' and 'purchase' event
    values come from the same distribution? Computed the 100-TB-safe
    way: ranks NEVER touch rows — group to (value, type) counts, one
    cumulative window over the DISTINCT-value rollup gives every
    value's average rank, and the rank-sum is a weighted fold. Tie
    correction uses the standard sum(t^3 - t) term. Everything is
    integer-exact until the final z division."""
    e = load_table(spark, sf_dir, "events")
    ab = e.filter(F.col("event_type").isin("error", "purchase")).select(
        F.round(F.col("value") * 1000000).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_a"),
    )
    per_v = ab.groupBy("v").agg(
        F.sum("is_a").alias("na_v"),
        F.count(F.lit(1)).alias("t"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "cum_before", F.coalesce(F.sum("t").over(w), F.lit(0))
    ).withColumn("avg_rank", F.col("cum_before") + (F.col("t") + 1) / 2.0)
    return ranked.agg(
        F.sum("na_v").cast("bigint").alias("n_a"),
        (F.sum("t") - F.sum("na_v")).cast("bigint").alias("n_b"),
        F.round(
            F.sum(F.col("na_v") * F.col("avg_rank"))
            - F.sum("na_v") * (F.sum("na_v") + 1) / 2.0,
            6,
        ).alias("u_a"),
        F.round(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), 6)
        .cast("bigint")
        .alias("tie_term"),
    )


ORACLE_MANN_WHITNEY_U = """
WITH ab AS (
  SELECT CAST(round(value * 1000000) AS BIGINT) AS v,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('error', 'purchase')
), per_v AS (
  SELECT v, sum(is_a) AS na_v, count(*) AS t FROM ab GROUP BY 1
), ranked AS (
  SELECT na_v, t,
         coalesce(sum(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (t + 1) / 2.0 AS avg_rank
  FROM per_v
)
SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
       CAST(sum(t) - sum(na_v) AS BIGINT) AS n_b,
       round(sum(na_v * avg_rank) - sum(na_v) * (sum(na_v) + 1) / 2.0, 6)
         AS u_a,
       CAST(round(sum(t * t * t - t), 6) AS BIGINT) AS tie_term
FROM ranked
"""

QUERIES["mann_whitney_u"] = q_mann_whitney_u
ORACLES["mann_whitney_u"] = ORACLE_MANN_WHITNEY_U


def q_welch_t_test(spark, sf_dir):
    """Welch's unequal-variance t-test on document length between two
    sources (src0 vs src1) with the Welch-Satterthwaite degrees of
    freedom — the means complement of the two-proportion z gate. One
    conditional agg pass over integer n_chars; var_samp is the same
    moments formula in both engines."""
    d = load_table(spark, sf_dir, "documents")
    two = d.filter(F.col("source").isin("src0", "src1"))
    agg = two.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("n_chars").alias("m"),
        F.var_samp(F.col("n_chars").cast("double")).alias("s2"),
    )
    a = agg.filter(F.col("source") == "src0").select(
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("s2").alias("s21")
    )
    b = agg.filter(F.col("source") == "src1").select(
        F.col("n").alias("n2"), F.col("m").alias("m2"), F.col("s2").alias("s22")
    )
    j = a.crossJoin(b)
    se2 = F.col("s21") / F.col("n1") + F.col("s22") / F.col("n2")
    df_w = (se2 * se2) / (
        (F.col("s21") / F.col("n1")) * (F.col("s21") / F.col("n1"))
        / (F.col("n1") - 1)
        + (F.col("s22") / F.col("n2")) * (F.col("s22") / F.col("n2"))
        / (F.col("n2") - 1)
    )
    return j.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(F.col("m1"), 6).alias("mean_src0"),
        F.round(F.col("m2"), 6).alias("mean_src1"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(df_w, 6).alias("welch_df"),
    )


ORACLE_WELCH_T_TEST = """
WITH agg AS (
  SELECT source, count(*) AS n, avg(n_chars) AS m,
         var_samp(CAST(n_chars AS DOUBLE)) AS s2
  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1
), j AS (
  SELECT a.n AS n1, a.m AS m1, a.s2 AS s21,
         b.n AS n2, b.m AS m2, b.s2 AS s22
  FROM (SELECT * FROM agg WHERE source = 'src0') a,
       (SELECT * FROM agg WHERE source = 'src1') b
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       round(m1, 6) AS mean_src0, round(m2, 6) AS mean_src1,
       round((m1 - m2) / sqrt(s21 / n1 + s22 / n2), 6) AS t_stat,
       round(pow(s21 / n1 + s22 / n2, 2)
             / (pow(s21 / n1, 2) / (n1 - 1)
                + pow(s22 / n2, 2) / (n2 - 1)), 6) AS welch_df
FROM j
"""

QUERIES["welch_t_test"] = q_welch_t_test
ORACLES["welch_t_test"] = ORACLE_WELCH_T_TEST


def q_ngram_coverage_curve(spark, sf_dir):
    """Vocabulary compression curve per language: the share of total
    token mass covered by the top-10 / top-100 / top-1000 unigrams —
    how far a small vocab goes (the tokenizer-budget read next to the
    Zipf slope). One wordcount shuffle; the ranked fold runs on the
    per-language term rollup with exact integer masses."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "lang",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), "term")
    ranked = tf.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("lang")
        .agg(
            F.sum("freq").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum(F.when(F.col("rk") <= 10, F.col("freq")).otherwise(0))
                / F.sum("freq"),
                6,
            ).alias("top10_share"),
            F.round(
                F.sum(F.when(F.col("rk") <= 100, F.col("freq")).otherwise(0))
                / F.sum("freq"),
                6,
            ).alias("top100_share"),
            F.round(
                F.sum(F.when(F.col("rk") <= 1000, F.col("freq")).otherwise(0))
                / F.sum("freq"),
                6,
            ).alias("top1000_share"),
        )
        .orderBy("lang")
    )


ORACLE_NGRAM_COVERAGE_CURVE = """
WITH tf AS (
  SELECT lang, t.term, count(*) AS freq
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) > 0
  GROUP BY 1, 2
), ranked AS (
  SELECT lang, freq,
         row_number() OVER (PARTITION BY lang
                            ORDER BY freq DESC, term) AS rk
  FROM tf
)
SELECT lang, CAST(sum(freq) AS BIGINT) AS total_tokens,
       round(sum(CASE WHEN rk <= 10 THEN freq ELSE 0 END) * 1.0
             / sum(freq), 6) AS top10_share,
       round(sum(CASE WHEN rk <= 100 THEN freq ELSE 0 END) * 1.0
             / sum(freq), 6) AS top100_share,
       round(sum(CASE WHEN rk <= 1000 THEN freq ELSE 0 END) * 1.0
             / sum(freq), 6) AS top1000_share
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["ngram_coverage_curve"] = q_ngram_coverage_curve
ORACLES["ngram_coverage_curve"] = ORACLE_NGRAM_COVERAGE_CURVE


def q_dwell_time_stats(spark, sf_dir):
    """Dwell time by CURRENT state: how long users sit on each event
    type before their next event — the per-state complement of the
    global inter-arrival histogram. One lead window per user; gap sums
    stay exact integer microseconds until the final division."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn("gap_us", F.lead("us").over(w) - F.col("us"))
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dwells"),
            F.round(
                F.sum("gap_us") / 1000000.0 / F.count(F.lit(1)), 6
            ).alias("avg_dwell_s"),
            F.round(F.max("gap_us") / 1000000.0, 6).alias("max_dwell_s"),
        )
        .orderBy("event_type")
    )


ORACLE_DWELL_TIME_STATS = """
WITH gaps AS (
  SELECT event_type,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
         - epoch_us(ts) AS gap_us
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_dwells,
       round(sum(gap_us) / 1000000.0 / count(*), 6) AS avg_dwell_s,
       round(max(gap_us) / 1000000.0, 6) AS max_dwell_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

QUERIES["dwell_time_stats"] = q_dwell_time_stats
ORACLES["dwell_time_stats"] = ORACLE_DWELL_TIME_STATS


def q_session_position_dropoff(spark, sf_dir):
    """Within-session drop-off curve: how many sessions reach event
    position k (1..10) and the continuation rate k→k+1 — the
    session-internal funnel (the event_funnel gate tracks named steps;
    this tracks depth). Sessionization (30-min gap) plus a position
    row_number, then everything runs on an 11-row rollup."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (
        e.select("user_id", "ts", "event_id")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn(
            "is_start",
            F.when(
                (F.col("us") - F.lag("us").over(w)) > 1800 * 1000000, 1
            )
            .when(F.lag("us").over(w).isNull(), 1)
            .otherwise(0),
        )
        .withColumn("sid", F.sum("is_start").over(w))
    )
    wp = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    pos = flagged.withColumn("k", F.row_number().over(wp)).filter(
        F.col("k") <= 10
    )
    per_k = pos.groupBy("k").agg(F.count(F.lit(1)).alias("n_sessions"))
    wk = Window.orderBy("k")
    return (
        per_k.select(
            F.col("k").cast("bigint").alias("position"),
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.round(
                F.lead("n_sessions").over(wk) / F.col("n_sessions"), 6
            ).alias("continue_rate"),
        )
        .orderBy("position")
    )


ORACLE_SESSION_POSITION_DROPOFF = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > 1800 * 1000000 THEN 1
              WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id,
         sum(is_start) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS sid
  FROM flagged
), pos AS (
  SELECT row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS k
  FROM sess
), per_k AS (
  SELECT k, count(*) AS n_sessions FROM pos WHERE k <= 10 GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS position,
       CAST(n_sessions AS BIGINT) AS n_sessions,
       round(lead(n_sessions) OVER (ORDER BY k) * 1.0 / n_sessions, 6)
         AS continue_rate
FROM per_k ORDER BY position
"""

QUERIES["session_position_dropoff"] = q_session_position_dropoff
ORACLES["session_position_dropoff"] = ORACLE_SESSION_POSITION_DROPOFF


def q_session_type_lift(spark, sf_dir):
    """Event-type co-occurrence lift within sessions: P(A,B in same
    session) / (P(A) * P(B)) for unordered type pairs — the
    market-basket read on behavior (the bigram-PMI gate scores
    ADJACENCY; this scores set co-presence). Sessions dedup to
    (session, type) first, so the pair join fans out over at most
    |types| per session, never events."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn(
            "is_start",
            F.when(
                (F.col("us") - F.lag("us").over(w)) > 1800 * 1000000, 1
            )
            .when(F.lag("us").over(w).isNull(), 1)
            .otherwise(0),
        )
        .withColumn("sid", F.sum("is_start").over(w))
    )
    st = flagged.select(
        F.concat_ws("#", F.col("user_id"), F.col("sid")).alias("skey"),
        "event_type",
    ).distinct()
    totals = st.agg(
        F.countDistinct("skey").cast("double").alias("n_sessions")
    )
    singles = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = st.select("skey", F.col("event_type").alias("type_a"))
    b = st.select("skey", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "skey")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("bigint").alias("n_both"),
            F.round(
                F.col("n_ab") * F.col("n_sessions")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_SESSION_TYPE_LIFT = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > 1800 * 1000000 THEN 1
              WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT event_type,
         CAST(user_id AS VARCHAR) || '#' || CAST(
           sum(is_start) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS VARCHAR) AS skey
  FROM flagged
), st AS (
  SELECT DISTINCT skey, event_type FROM sess
), totals AS (
  SELECT count(DISTINCT skey) AS n_sessions FROM st
), singles AS (
  SELECT event_type, count(*) AS n_t FROM st GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_ab
  FROM st a JOIN st b ON a.skey = b.skey
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_both,
       round(n_ab * 1.0 * (SELECT n_sessions FROM totals)
             / (sa.n_t * sb.n_t), 6) AS lift
FROM pairs
JOIN singles sa ON sa.event_type = type_a
JOIN singles sb ON sb.event_type = type_b
ORDER BY type_a, type_b
"""

QUERIES["session_type_lift"] = q_session_type_lift
ORACLES["session_type_lift"] = ORACLE_SESSION_TYPE_LIFT


def q_emb_centroid_silhouette(spark, sf_dir):
    """Simplified (centroid-based) silhouette per label: a = distance
    to own centroid, b = nearest other centroid, s = (b−a)/max(a,b) —
    the cluster-quality audit next to the confusion matrix. Centroids
    are (label, dim) partial sums; the per-vector scoring joins the
    10×64 centroid table as a broadcast — stored vectors never
    shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "xf"),
    ).withColumn("x", F.col("xf").cast("double"))
    cents = exploded.groupBy(F.col("label").alias("c_label"), "pos").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("c")
    )
    dists = (
        exploded.join(F.broadcast(cents), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d2"))
        .withColumn("d", F.sqrt("d2"))
    )
    own = dists.filter(F.col("label") == F.col("c_label")).select(
        "vec_id", "label", F.col("d").alias("a")
    )
    other = (
        dists.filter(F.col("label") != F.col("c_label"))
        .groupBy("vec_id")
        .agg(F.min("d").alias("b"))
    )
    s = own.join(other, "vec_id").withColumn(
        "s", (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    return (
        s.groupBy(F.col("label").cast("bigint").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.avg("s"), 6).alias("avg_silhouette"),
        )
        .orderBy("label")
    )


ORACLE_EMB_CENTROID_SILHOUETTE = """
WITH exploded AS (
  SELECT vec_id, label,
         unnest(range(len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cents AS (
  SELECT label AS c_label, pos, sum(x) / count(*) AS c
  FROM exploded GROUP BY 1, 2
), dists AS (
  SELECT e.vec_id, e.label, c.c_label,
         sqrt(sum((e.x - c.c) * (e.x - c.c))) AS d
  FROM exploded e JOIN cents c USING (pos)
  GROUP BY 1, 2, 3
), own AS (
  SELECT vec_id, label, d AS a FROM dists WHERE label = c_label
), other AS (
  SELECT vec_id, min(d) AS b FROM dists WHERE label <> c_label
  GROUP BY 1
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg((b - a) / greatest(a, b)), 6) AS avg_silhouette
FROM own JOIN other USING (vec_id)
GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_centroid_silhouette"] = q_emb_centroid_silhouette
ORACLES["emb_centroid_silhouette"] = ORACLE_EMB_CENTROID_SILHOUETTE


def q_trailing_30d_revenue(spark, sf_dir):
    """Trailing-30-day revenue per day via a RANGE window frame over
    epoch days — the SQL surface (RANGE, not ROWS) the rolling gates
    haven't pinned: days can be MISSING, and a ROWS frame would silently
    span more than 30 calendar days across gaps. Integer cents through
    the frame; the window runs over the ~2.4k-row daily rollup."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    epoch_day = (F.unix_timestamp(F.col("d").cast("timestamp")) / 86400).cast(
        "long"
    )
    w = Window.orderBy(epoch_day).rangeBetween(-29, 0)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.round(F.sum("cents").over(w) / 100.0, 6).alias(
                "trailing_30d_usd"
            ),
        )
        .orderBy("day")
    )


ORACLE_TRAILING_30D_REVENUE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       round(sum(cents) OVER (
         ORDER BY CAST(epoch(CAST(d AS TIMESTAMP)) / 86400 AS BIGINT)
         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) / 100.0, 6)
         AS trailing_30d_usd
FROM daily ORDER BY day
"""

QUERIES["trailing_30d_revenue"] = q_trailing_30d_revenue
ORACLES["trailing_30d_revenue"] = ORACLE_TRAILING_30D_REVENUE


def q_month_arithmetic_battery(spark, sf_dir):
    """Calendar-arithmetic parity battery: month-end clamping under
    add-months (Jan 31 + 1 month = Feb 29 on leap years), last_day,
    and quarter-start truncation, over every distinct order month —
    the semantics corner where engines historically disagree. Tiny
    distinct rollup; the point is agreement, not volume."""
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        F.last_day(F.col("o_orderdate")).cast("date").alias("month_end")
    ).distinct()
    return (
        months.select(
            F.date_format("month_end", "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.add_months("month_end", 1), "yyyy-MM-dd").alias(
                "plus_1m"
            ),
            F.date_format(F.add_months("month_end", -13), "yyyy-MM-dd").alias(
                "minus_13m"
            ),
            F.date_format(
                F.date_trunc("quarter", F.col("month_end").cast("timestamp"))
                .cast("date"),
                "yyyy-MM-dd",
            ).alias("quarter_start"),
        )
        .orderBy("month_end")
    )


ORACLE_MONTH_ARITHMETIC_BATTERY = """
WITH months AS (
  SELECT DISTINCT last_day(CAST(o_orderdate AS DATE)) AS month_end
  FROM orders
)
SELECT strftime(month_end, '%Y-%m-%d') AS month_end,
       strftime(CAST(month_end + INTERVAL 1 MONTH AS DATE),
                '%Y-%m-%d') AS plus_1m,
       strftime(CAST(month_end + INTERVAL (-13) MONTH AS DATE),
                '%Y-%m-%d') AS minus_13m,
       strftime(CAST(date_trunc('quarter', month_end) AS DATE),
                '%Y-%m-%d') AS quarter_start
FROM months ORDER BY month_end
"""

QUERIES["month_arithmetic_battery"] = q_month_arithmetic_battery
ORACLES["month_arithmetic_battery"] = ORACLE_MONTH_ARITHMETIC_BATTERY


# ---------------------------------------------------------- engine gates
# Storage-layer contracts driven through the DRIVER's oracle compare.
# Tables build once per process (module cache) in temp dirs; every gate
# is idempotent under re-runs, so bench's min-of-2 loop is safe.

_R9_CACHE: dict = {}


def _events_day_hour(spark, sf_dir, max_day: int | None = None):
    e = load_table(spark, sf_dir, "events").withColumn(
        "date_day", F.date_format("ts", "yyyy-MM-dd")
    ).withColumn("hour", F.lit(0))
    if max_day is not None:
        e = e.filter(F.dayofmonth("ts") <= max_day)
    return e


def _events_versioned_table(spark, sf_dir: str) -> str:
    """Full events committed as TWO manifest versions split on
    event_id parity — the snapshot-history fixture the time-travel and
    stats-pruning gates read (read-only; shared)."""
    key = ("versioned", sf_dir)
    if key not in _R9_CACHE:
        from .storage.manifest import write_batch_manifest

        path = _tempfile.mkdtemp(prefix="sdb-r9-versions-")
        e = _events_day_hour(spark, sf_dir)
        for i in (0, 1):
            write_batch_manifest(
                e.filter(F.col("event_id") % 2 == i), path, "events_r9",
                batch_id=i + 1, partition_cols=("date_day", "hour"),
                stats_cols=("ts",),
            )
        _R9_CACHE[key] = path
    return _R9_CACHE[key]


def q_snapshot_time_travel(spark, sf_dir):
    """Driver gate for snapshot isolation: reading manifest VERSION 1
    of a two-batch table must return exactly the first batch's rows
    (event_id even), long after version 2 committed — time travel as
    the oracle-checked contract, not a pytest pin. The version read
    plans an explicit immutable file list; at 100 TB this is what makes
    a long query immune to concurrent commits."""
    from .storage.manifest import ManifestTable

    path = _events_versioned_table(spark, sf_dir)
    v1 = ManifestTable(path).read(spark, version=1)
    return (
        v1.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_SNAPSHOT_TIME_TRAVEL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE event_id % 2 = 0
GROUP BY 1 ORDER BY 1
"""

QUERIES["snapshot_time_travel"] = q_snapshot_time_travel
ORACLES["snapshot_time_travel"] = ORACLE_SNAPSHOT_TIME_TRAVEL


def q_manifest_time_prune(spark, sf_dir):
    """Driver gate for manifest stats-pruning: a three-day time-window
    query served through ``read(between=...)`` — the manifest drops
    files whose recorded [min, max] ts is disjoint BEFORE Spark plans
    the scan, and the row-level predicate still applies (file stats
    bound files, not rows). The result must equal the oracle's plain
    WHERE; the plan pin asserts files were actually pruned. At 100 TB
    this is the difference between listing the matching days' files
    and planning every file ever committed."""
    import datetime as dt

    from .storage.manifest import ManifestTable

    path = _events_versioned_table(spark, sf_dir)
    lo = dt.datetime(2024, 1, 10)
    hi = dt.datetime(2024, 1, 13) - dt.timedelta(microseconds=1)
    df = ManifestTable(path).read(spark, between=("ts", lo, hi))
    return (
        df.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_MANIFEST_TIME_PRUNE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <= TIMESTAMP '2024-01-12 23:59:59.999999'
GROUP BY 1 ORDER BY 1
"""

QUERIES["manifest_time_prune"] = q_manifest_time_prune
ORACLES["manifest_time_prune"] = ORACLE_MANIFEST_TIME_PRUNE


def _compacted_table(spark, sf_dir: str) -> str:
    """Week-of-events fixture committed as three interleaved batches,
    then every multi-file partition compacted to one file (idempotent:
    re-runs skip single-file partitions)."""
    from .maintenance.jobs import list_hour_partitions, partition_files
    from .storage.manifest import compact_partition_manifest
    from .storage.manifest import write_batch_manifest

    key = ("compact", sf_dir)
    if key not in _R9_CACHE:
        path = _tempfile.mkdtemp(prefix="sdb-r9-compact-")
        e = _events_day_hour(spark, sf_dir, max_day=7)
        for i in range(3):
            write_batch_manifest(
                e.filter(F.col("event_id") % 3 == i), path, "events_r9c",
                batch_id=i + 1, partition_cols=("date_day", "hour"),
                stats_cols=("ts",),
            )
        _R9_CACHE[key] = path
    path = _R9_CACHE[key]
    for day, hour in list_hour_partitions(path):
        if len(partition_files(path, day, hour)) > 1:
            compact_partition_manifest(spark, path, "events_r9c", day, hour)
    return path


def _retained_table(spark, sf_dir: str) -> str:
    """Week-of-events fixture with days 5-7 dropped by the retention
    job (idempotent: re-applying the same keep-set is a no-op)."""
    from .maintenance.jobs import apply_retention, list_hour_partitions
    from .storage.manifest import write_batch_manifest

    key = ("retention", sf_dir)
    if key not in _R9_CACHE:
        path = _tempfile.mkdtemp(prefix="sdb-r9-retain-")
        e = _events_day_hour(spark, sf_dir, max_day=7)
        write_batch_manifest(
            e, path, "events_r9r", batch_id=1,
            partition_cols=("date_day", "hour"), stats_cols=("ts",),
        )
        _R9_CACHE[key] = path
    path = _R9_CACHE[key]
    keep = {
        (day, hour)
        for day, hour in list_hour_partitions(path)
        if day <= "2024-01-04"
    }
    apply_retention(path, keep)
    return path


def q_compaction_equivalence(spark, sf_dir):
    """Driver gate for compaction: a week of events committed as THREE
    interleaved batches (3 files per day partition), every partition
    rewritten to one file under snapshot isolation — and the rollup
    must be byte-identical to the oracle over the raw rows. Re-runs
    skip already-single-file partitions, so the gate is idempotent."""
    from .storage.manifest import ManifestTable

    path = _compacted_table(spark, sf_dir)
    df = ManifestTable(path).read(spark)
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_COMPACTION_EQUIVALENCE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE day(ts) <= 7
GROUP BY 1 ORDER BY 1
"""

QUERIES["compaction_equivalence"] = q_compaction_equivalence
ORACLES["compaction_equivalence"] = ORACLE_COMPACTION_EQUIVALENCE


def q_retention_drop_equivalence(spark, sf_dir):
    """Driver gate for retention: a week-long table with days 5-7
    dropped by the retention job (one snapshot commit removing the
    files — readers on the old snapshot stay whole) must answer
    exactly the oracle's WHERE day <= 4. Idempotent: re-running the
    drop with the same keep-set is a no-op."""
    from .storage.manifest import ManifestTable

    df = ManifestTable(_retained_table(spark, sf_dir)).read(spark)
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_RETENTION_DROP_EQUIVALENCE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE day(ts) <= 4
GROUP BY 1 ORDER BY 1
"""

QUERIES["retention_drop_equivalence"] = q_retention_drop_equivalence
ORACLES["retention_drop_equivalence"] = ORACLE_RETENTION_DROP_EQUIVALENCE


# --------------------------------------------------------------- batch 2
# SQL-surface parity batteries, corpus/relational analytics, and three
# more storage contracts under the driver's oracle compare.


def q_quantile_disc_battery(spark, sf_dir):
    """percentile_cont vs percentile_disc parity per return flag — the
    two ANSI quantile conventions (interpolated vs order-statistic)
    whose off-by-one disagreements are a classic cross-engine bug.
    Quantities quantize to integers so ties resolve identically."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    return (
        q.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY q)"), 6)
            .alias("median_cont"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY q)")
            .cast("bigint")
            .alias("median_disc"),
            F.round(
                F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY q)"), 6
            ).alias("p90_cont"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY q)")
            .cast("bigint")
            .alias("p90_disc"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_QUANTILE_DISC_BATTERY = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(percentile_cont(0.5) WITHIN GROUP
             (ORDER BY CAST(l_quantity AS BIGINT)), 6) AS median_cont,
       CAST(percentile_disc(0.5) WITHIN GROUP
            (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS median_disc,
       round(percentile_cont(0.9) WITHIN GROUP
             (ORDER BY CAST(l_quantity AS BIGINT)), 6) AS p90_cont,
       CAST(percentile_disc(0.9) WITHIN GROUP
            (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS p90_disc
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["quantile_disc_battery"] = q_quantile_disc_battery
ORACLES["quantile_disc_battery"] = ORACLE_QUANTILE_DISC_BATTERY


def q_string_ops_battery(spark, sf_dir):
    """String-function parity battery over distinct part names:
    translate / reverse / repeat / lpad / substring-from-right — the
    scalar surface both engines must agree on byte-for-byte. Tiny
    distinct rollup; the point is agreement, not volume."""
    p = load_table(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("name")).distinct()
    return (
        names.select(
            "name",
            F.translate("name", "aeiou", "AEIOU").alias("vowels_up"),
            F.reverse(F.col("name")).alias("reversed"),
            F.repeat(F.substring("name", 1, 2), 3).alias("rep2x3"),
            F.lpad(F.substring("name", 1, 4), 8, "*").alias("lpad8"),
            F.substring(F.col("name"), -3, 3).alias("last3"),
        )
        .orderBy("name")
    )


ORACLE_STRING_OPS_BATTERY = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT name,
       translate(name, 'aeiou', 'AEIOU') AS vowels_up,
       reverse(name) AS reversed,
       repeat(substring(name, 1, 2), 3) AS rep2x3,
       lpad(substring(name, 1, 4), 8, '*') AS lpad8,
       substring(name, length(name) - 2, 3) AS last3
FROM names ORDER BY name
"""

QUERIES["string_ops_battery"] = q_string_ops_battery
ORACLES["string_ops_battery"] = ORACLE_STRING_OPS_BATTERY


def q_bitwise_battery(spark, sf_dir):
    """Bitwise aggregate parity: bit_and / bit_or / bit_xor over event
    ids per type, plus scalar shifts on the rolled-up values — the
    integer-surface agreement check (hash partitioners and bloom
    filters live on exactly these ops)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.bit_and("event_id").alias("band"),
        F.bit_or("event_id").alias("bor"),
        F.bit_xor("event_id").alias("bxor"),
    )
    return (
        agg.select(
            "event_type",
            F.col("band").cast("bigint").alias("band"),
            F.col("bor").cast("bigint").alias("bor"),
            F.col("bxor").cast("bigint").alias("bxor"),
            F.shiftright(F.col("bxor"), 3).cast("bigint").alias("bxor_shr3"),
            (F.col("bor").bitwiseAND(F.lit(255))).cast("bigint").alias(
                "bor_low8"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_BITWISE_BATTERY = """
WITH agg AS (
  SELECT event_type,
         bit_and(event_id) AS band, bit_or(event_id) AS bor,
         bit_xor(event_id) AS bxor
  FROM events GROUP BY 1
)
SELECT event_type, CAST(band AS BIGINT) AS band,
       CAST(bor AS BIGINT) AS bor, CAST(bxor AS BIGINT) AS bxor,
       CAST(bxor >> 3 AS BIGINT) AS bxor_shr3,
       CAST(bor & 255 AS BIGINT) AS bor_low8
FROM agg ORDER BY event_type
"""

QUERIES["bitwise_battery"] = q_bitwise_battery
ORACLES["bitwise_battery"] = ORACLE_BITWISE_BATTERY


def q_argmax_battery(spark, sf_dir):
    """max_by/min_by (argmax) parity with DETERMINISTIC tie-breaking:
    the ordering key is a fixed-width string composite
    (value-micros # event-id), so lexicographic equals numeric order
    and ties at the extreme value resolve identically in both engines
    — the discipline any argmax on real data needs."""
    e = load_table(spark, sf_dir, "events")
    key = F.concat_ws(
        "#",
        F.lpad(F.round(F.col("value") * 1000000).cast("bigint"), 20, "0"),
        F.lpad(F.col("event_id"), 12, "0"),
    )
    return (
        e.select("event_type", "event_id", "ts", key.alias("k"))
        .groupBy("event_type")
        .agg(
            F.max_by("event_id", F.col("k")).cast("bigint").alias(
                "max_value_event"
            ),
            F.min_by("event_id", F.col("k")).cast("bigint").alias(
                "min_value_event"
            ),
            F.max_by("ts", F.col("k")).alias("max_value_ts"),
        )
        .orderBy("event_type")
    )


ORACLE_ARGMAX_BATTERY = """
WITH keyed AS (
  SELECT event_type, event_id, ts,
         lpad(CAST(CAST(round(value * 1000000) AS BIGINT) AS VARCHAR),
              20, '0')
         || '#' || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
  FROM events
)
SELECT event_type,
       CAST(arg_max(event_id, k) AS BIGINT) AS max_value_event,
       CAST(arg_min(event_id, k) AS BIGINT) AS min_value_event,
       arg_max(ts, k) AS max_value_ts
FROM keyed GROUP BY 1 ORDER BY 1
"""

QUERIES["argmax_battery"] = q_argmax_battery
ORACLES["argmax_battery"] = ORACLE_ARGMAX_BATTERY


def q_lsh_band_tuning_curve(spark, sf_dir):
    """LSH band-count tuning curve: candidate-pair volume at 2 / 4 / 8
    bands over the SAME 8-hash MinHash signatures — the knob you turn
    BEFORE a 100 TB dedup (more bands = higher recall = more pairs to
    verify; this measures the cost side). Signatures compute once; each
    banding is a bucket groupBy with C(n,2) arithmetic — pairs are
    counted, never materialized."""
    from .operators import dedup as dd

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = dd.minhash_signatures(d, "doc_id", "text", n=3, num_hashes=8)
    out = None
    for bands in (2, 4, 8):
        rows_per_band = 8 // bands
        banded = sigs.withColumn(
            "band", F.floor(F.col("h") / rows_per_band)
        )
        bh = banded.groupBy("doc_id", "band").agg(
            F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minhash"))))
            .alias("band_hash")
        )
        buckets = bh.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("sz")
        )
        one = buckets.filter(F.col("sz") > 1).agg(
            F.lit(bands).cast("bigint").alias("bands"),
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
            .cast("bigint")
            .alias("n_candidate_pairs"),
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("bands")


ORACLE_LSH_BAND_TUNING_CURVE = """
WITH tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM tok, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) u(i)
  WHERE len(t) >= 3
), hx AS (SELECT doc_id, shingle, h FROM sh, UNNEST(range(0, 8)) u(h)),
sigs AS (
  SELECT doc_id, h, min(md5(h || ':' || shingle)) AS minhash
  FROM hx GROUP BY 1, 2
), curve AS (
  SELECT b.bands, s.h // (8 // b.bands) AS band, s.doc_id, s.minhash
  FROM sigs s, (VALUES (2), (4), (8)) AS b(bands)
), bh AS (
  SELECT bands, band, doc_id,
         md5(array_to_string(list_sort(list(minhash)), '|')) AS band_hash
  FROM curve GROUP BY 1, 2, 3
), buckets AS (
  SELECT bands, band, band_hash, count(*) AS sz
  FROM bh GROUP BY 1, 2, 3
)
SELECT CAST(bands AS BIGINT) AS bands,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_candidate_pairs
FROM buckets WHERE sz > 1
GROUP BY 1 ORDER BY 1
"""

QUERIES["lsh_band_tuning_curve"] = q_lsh_band_tuning_curve
ORACLES["lsh_band_tuning_curve"] = ORACLE_LSH_BAND_TUNING_CURVE


def q_brand_repeat_rate(spark, sf_dir):
    """Repeat-purchase rate per brand: the share of a brand's customers
    who ordered it in 2+ DISTINCT orders — loyalty vs one-off demand.
    Facts project to three columns before the broadcast part join; the
    (customer, brand) rollup carries exact order counts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cb = (
        li.select("l_orderkey", "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "p_brand")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    return (
        cb.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("repeat_customers"),
            F.round(
                F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("repeat_rate"),
        )
        .orderBy("p_brand")
    )


ORACLE_BRAND_REPEAT_RATE = """
WITH cb AS (
  SELECT o_custkey, p_brand, count(DISTINCT l_orderkey) AS n_orders
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS repeat_customers,
       round(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS repeat_rate
FROM cb GROUP BY 1 ORDER BY 1
"""

QUERIES["brand_repeat_rate"] = q_brand_repeat_rate
ORACLES["brand_repeat_rate"] = ORACLE_BRAND_REPEAT_RATE


def q_nation_trade_balance(spark, sf_dir):
    """Trade-balance matrix collapsed per nation: revenue its suppliers
    ship out (exports) vs revenue its customers buy (imports) and the
    net — the Q7 volume-shipping join reshaped into a balance sheet.
    Supplier and customer dimensions broadcast; cents stay exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    flows = (
        li.select("l_orderkey", "l_suppkey", rev.alias("cents"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("exp_key"),
            F.col("c_nationkey").alias("imp_key"),
        )
        .agg(F.sum("cents").alias("cents"))
    )
    exports = flows.groupBy(F.col("exp_key").alias("nk")).agg(
        F.sum("cents").alias("exp_cents")
    )
    imports = flows.groupBy(F.col("imp_key").alias("nk")).agg(
        F.sum("cents").alias("imp_cents")
    )
    return (
        exports.join(imports, "nk", "full_outer")
        .join(F.broadcast(n), F.col("nk") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.round(F.coalesce("exp_cents", F.lit(0)) / 100.0, 6).alias(
                "exports_usd"
            ),
            F.round(F.coalesce("imp_cents", F.lit(0)) / 100.0, 6).alias(
                "imports_usd"
            ),
            F.round(
                (
                    F.coalesce("exp_cents", F.lit(0))
                    - F.coalesce("imp_cents", F.lit(0))
                )
                / 100.0,
                6,
            ).alias("balance_usd"),
        )
        .orderBy("n_name")
    )


ORACLE_NATION_TRADE_BALANCE = """
WITH flows AS (
  SELECT s_nationkey AS exp_key, c_nationkey AS imp_key,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), exports AS (
  SELECT exp_key AS nk, CAST(sum(cents) AS BIGINT) AS exp_cents
  FROM flows GROUP BY 1
), imports AS (
  SELECT imp_key AS nk, CAST(sum(cents) AS BIGINT) AS imp_cents
  FROM flows GROUP BY 1
)
SELECT n_name,
       round(coalesce(exp_cents, 0) / 100.0, 6) AS exports_usd,
       round(coalesce(imp_cents, 0) / 100.0, 6) AS imports_usd,
       round((coalesce(exp_cents, 0) - coalesce(imp_cents, 0)) / 100.0, 6)
         AS balance_usd
FROM exports FULL OUTER JOIN imports USING (nk)
JOIN nation ON nk = n_nationkey
ORDER BY n_name
"""

QUERIES["nation_trade_balance"] = q_nation_trade_balance
ORACLES["nation_trade_balance"] = ORACLE_NATION_TRADE_BALANCE


def q_value_qq_deciles(spark, sf_dir):
    """QQ table: interpolated deciles of 'error' event values against
    'purchase' values side by side — the distribution-shape compare
    that says WHERE two streams diverge (the KS gate says only how
    much). One percentile-array agg per type over integer-quantized
    values; the decile table is 9 rows."""
    e = load_table(spark, sf_dir, "events")
    probs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    per_type = (
        e.filter(F.col("event_type").isin("error", "purchase"))
        .select(
            "event_type",
            F.round(F.col("value") * 1000000).cast("bigint").alias("v"),
        )
        .groupBy("event_type")
        .agg(F.percentile("v", probs).alias("qs"))
    )
    wide = per_type.select(
        F.posexplode("qs").alias("i", "q"), "event_type"
    ).groupBy((F.col("i") + 1).cast("bigint").alias("decile")).agg(
        F.round(
            F.max(F.when(F.col("event_type") == "error", F.col("q")))
            / 1000000.0,
            6,
        ).alias("error_q"),
        F.round(
            F.max(F.when(F.col("event_type") == "purchase", F.col("q")))
            / 1000000.0,
            6,
        ).alias("purchase_q"),
    )
    return wide.orderBy("decile")


ORACLE_VALUE_QQ_DECILES = """
WITH per_type AS (
  SELECT event_type,
         quantile_cont(CAST(round(value * 1000000) AS BIGINT),
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
  FROM events WHERE event_type IN ('error', 'purchase')
  GROUP BY 1
), ex AS (
  SELECT event_type, unnest(range(1, 10)) AS decile, unnest(qs) AS q
  FROM per_type
)
SELECT CAST(decile AS BIGINT) AS decile,
       round(max(CASE WHEN event_type = 'error' THEN q END)
             / 1000000.0, 6) AS error_q,
       round(max(CASE WHEN event_type = 'purchase' THEN q END)
             / 1000000.0, 6) AS purchase_q
FROM ex GROUP BY 1 ORDER BY 1
"""

QUERIES["value_qq_deciles"] = q_value_qq_deciles
ORACLES["value_qq_deciles"] = ORACLE_VALUE_QQ_DECILES


def q_hot_gc_safety(spark, sf_dir):
    """Driver gate for hot-store GC safety: after flushing and then
    GC-ing the covered hot batches, the hybrid read must STILL equal
    the whole table — gc reclaims only what the watermark covers, and
    the unflushed ack survives both the flush and the sweep."""
    from .storage.hot import HotStore, flush_hot, hybrid_read
    from .storage.manifest import write_batch_manifest

    key = ("hotgc", sf_dir)
    if key not in _R9_CACHE:
        path = _tempfile.mkdtemp(prefix="sdb-r9-hotgc-")
        e = _events_day_hour(spark, sf_dir)
        write_batch_manifest(
            e.filter(F.col("event_id") % 4 < 2), path, "events_r9g",
            batch_id=1, partition_cols=("date_day", "hour"),
            stats_cols=("ts",),
        )
        store = HotStore(path)
        store.ack(e.filter(F.col("event_id") % 4 == 2))
        wm = flush_hot(spark, path, "events_r9g",
                       partition_cols=("date_day", "hour"),
                       stats_cols=("ts",))
        store.ack(e.filter(F.col("event_id") % 4 == 3))  # stays hot
        store.gc(wm)  # reclaims ONLY the flushed sequence
        _R9_CACHE[key] = path
    df = hybrid_read(spark, _R9_CACHE[key])
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_HOT_GC_SAFETY = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["hot_gc_safety"] = q_hot_gc_safety
ORACLES["hot_gc_safety"] = ORACLE_HOT_GC_SAFETY


def q_snapshot_expiry_read_stability(spark, sf_dir):
    """Driver gate for snapshot expiration: expiring history down to
    the latest snapshot (keep_last=1) must not change what the current
    version answers — expiration retires manifests and the files ONLY
    they referenced, never current data. Runs against a two-batch
    table whose batch-1-era files are all still referenced."""
    from .storage.manifest import ManifestTable, write_batch_manifest

    key = ("expiry", sf_dir)
    if key not in _R9_CACHE:
        path = _tempfile.mkdtemp(prefix="sdb-r9-expiry-")
        e = _events_day_hour(spark, sf_dir)
        for i in (0, 1):
            write_batch_manifest(
                e.filter(F.col("event_id") % 2 == i), path, "events_r9e",
                batch_id=i + 1, partition_cols=("date_day", "hour"),
                stats_cols=("ts",),
            )
        _R9_CACHE[key] = path
    path = _R9_CACHE[key]
    mt = ManifestTable(path)
    mt.expire_snapshots(keep_last=1)
    df = mt.read(spark)
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_SNAPSHOT_EXPIRY_READ_STABILITY = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["snapshot_expiry_read_stability"] = q_snapshot_expiry_read_stability
ORACLES["snapshot_expiry_read_stability"] = (
    ORACLE_SNAPSHOT_EXPIRY_READ_STABILITY
)


def q_idempotent_replay_visibility(spark, sf_dir):
    """Driver gate for at-least-once replay: the same batch committed
    TWICE under one lineage id (with different parallelism, as a retry
    would) must count exactly once — the WAL-replay idempotence
    contract, proven by the oracle's whole-table rollup instead of a
    pytest row count."""
    from .storage.manifest import ManifestTable, write_batch_manifest

    key = ("replay", sf_dir)
    if key not in _R9_CACHE:
        path = _tempfile.mkdtemp(prefix="sdb-r9-replay-")
        e = _events_day_hour(spark, sf_dir)
        evens = e.filter(F.col("event_id") % 2 == 0)
        write_batch_manifest(
            evens, path, "events_r9i", batch_id="b1",
            partition_cols=("date_day", "hour"), stats_cols=("ts",),
        )
        # the replay: same lineage id, different file count
        write_batch_manifest(
            evens.repartition(3), path, "events_r9i", batch_id="b1",
            partition_cols=("date_day", "hour"), stats_cols=("ts",),
        )
        write_batch_manifest(
            e.filter(F.col("event_id") % 2 == 1), path, "events_r9i",
            batch_id="b2", partition_cols=("date_day", "hour"),
            stats_cols=("ts",),
        )
        _R9_CACHE[key] = path
    df = ManifestTable(_R9_CACHE[key]).read(spark)
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_IDEMPOTENT_REPLAY_VISIBILITY = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["idempotent_replay_visibility"] = q_idempotent_replay_visibility
ORACLES["idempotent_replay_visibility"] = ORACLE_IDEMPOTENT_REPLAY_VISIBILITY


# --------------------------------------------------------------- batch 3


def q_recency_weighted_activity(spark, sf_dir):
    """Exponential-decay engagement score per user segment: each event
    contributes exp(−age_days/7) relative to the corpus watermark —
    the recency weighting every ranking/retention model starts from.
    The watermark is a 1-row agg broadcast back over the facts; scores
    band to integer deciles so the rollup is tie-stable."""
    e = load_table(spark, sf_dir, "events")
    wm = e.agg(F.max(F.unix_micros("ts")).alias("wm_us"))
    scored = e.crossJoin(F.broadcast(wm)).select(
        "user_id",
        F.exp(
            -(F.col("wm_us") - F.unix_micros("ts"))
            / (7.0 * 86400.0 * 1000000.0)
        ).alias("w"),
    )
    per_user = scored.groupBy("user_id").agg(F.sum("w").alias("score"))
    band = F.least(F.floor(F.col("score")), F.lit(20)).cast("bigint")
    return (
        per_user.groupBy(band.alias("score_band"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("score_band")
    )


ORACLE_RECENCY_WEIGHTED_ACTIVITY = """
WITH wm AS (SELECT max(epoch_us(ts)) AS wm_us FROM events),
per_user AS (
  SELECT user_id,
         sum(exp(-(wm_us - epoch_us(ts))
                 / (7.0 * 86400.0 * 1000000.0))) AS score
  FROM events, wm GROUP BY 1
)
SELECT CAST(least(floor(score), 20) AS BIGINT) AS score_band,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["recency_weighted_activity"] = q_recency_weighted_activity
ORACLES["recency_weighted_activity"] = ORACLE_RECENCY_WEIGHTED_ACTIVITY


def q_customer_trend_mix(spark, sf_dir):
    """Rising vs declining customers per market segment: a per-customer
    regression of order value on order date classifies each customer's
    trend; the segment rollup reports the mix — per-KEY regression then
    re-aggregation, a shape none of the single regr gates pin.
    Customers need 3+ orders for a meaningful slope."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    day = (F.unix_timestamp("o_orderdate") / 86400.0).alias("x")
    per_cust = (
        o.select("o_custkey", day, F.col("o_totalprice").alias("y"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.regr_slope("y", "x").alias("slope"),
        )
        .filter(F.col("n") >= 3)
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.when(F.col("slope") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("rising"),
            F.sum(F.when(F.col("slope") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("declining"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_CUSTOMER_TREND_MIX = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n,
         regr_slope(o_totalprice,
                    epoch(o_orderdate) / 86400.0) AS slope
  FROM orders GROUP BY 1
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN slope > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS rising,
       CAST(sum(CASE WHEN slope < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS declining
FROM per_cust JOIN customer ON o_custkey = c_custkey
WHERE n >= 3
GROUP BY 1 ORDER BY 1
"""

QUERIES["customer_trend_mix"] = q_customer_trend_mix
ORACLES["customer_trend_mix"] = ORACLE_CUSTOMER_TREND_MIX


def q_skewness_report(spark, sf_dir):
    """Distribution-shape report per event type: skewness and excess
    kurtosis computed EXPLICITLY from raw power sums (engines disagree
    on sample-vs-population corrections, so neither built-in is
    trusted) — values quantize to integer micros first, and both
    engines fold the same four raw moments."""
    e = load_table(spark, sf_dir, "events")
    x = (F.round(F.col("value") * 1000000).cast("bigint") / 1000000.0)
    raw = e.select("event_type", x.alias("x")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
    )
    m = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m * m
    m3 = F.col("s3") / F.col("n") - 3 * m * F.col("s2") / F.col("n") + 2 * m * m * m
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m * F.col("s3") / F.col("n")
        + 6 * m * m * F.col("s2") / F.col("n")
        - 3 * m * m * m * m
    )
    return raw.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness_pop"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis_pop"),
    ).orderBy("event_type")


ORACLE_SKEWNESS_REPORT = """
WITH raw AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS s1, sum(x * x) AS s2,
         sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
  FROM (SELECT event_type,
               CAST(round(value * 1000000) AS BIGINT) / 1000000.0 AS x
        FROM events)
  GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((s3 / n - 3 * (s1 / n) * s2 / n + 2 * pow(s1 / n, 3))
             / pow(s2 / n - pow(s1 / n, 2), 1.5), 6) AS skewness_pop,
       round((s4 / n - 4 * (s1 / n) * s3 / n
              + 6 * pow(s1 / n, 2) * s2 / n - 3 * pow(s1 / n, 4))
             / pow(s2 / n - pow(s1 / n, 2), 2) - 3.0, 6)
         AS excess_kurtosis_pop
FROM raw ORDER BY event_type
"""

QUERIES["skewness_report"] = q_skewness_report
ORACLES["skewness_report"] = ORACLE_SKEWNESS_REPORT


def q_anova_f_component(spark, sf_dir):
    """One-way ANOVA F statistic of the first embedding component
    across labels — do the clusters even separate on this axis before
    you trust a distance index? (The vectors are unit-normalized, so
    norms are degenerate; a coordinate projection is the honest
    response variable.) The scalar is a per-vector element read —
    vectors never shuffle; SSB/SSW derive from per-label
    count/sum/sumsq."""
    e = load_table(spark, sf_dir, "embeddings")
    comp0 = F.element_at("embedding", 1).cast("double")
    per_label = e.select(F.col("label"), comp0.alias("v")).groupBy(
        "label"
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    tot = per_label.agg(
        F.sum("n").alias("N"),
        F.sum("s").alias("S"),
        F.sum(F.col("ss")).alias("SS"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("group_sq"),
    )
    ssb = F.col("group_sq") - F.col("S") * F.col("S") / F.col("N")
    ssw = F.col("SS") - F.col("group_sq")
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("N") - F.col("k")))
    return tot.select(
        F.col("N").cast("bigint").alias("n_vectors"),
        F.col("k").cast("bigint").alias("n_labels"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(fstat, 6).alias("f_stat"),
    )


ORACLE_ANOVA_F_COMPONENT = """
WITH norms AS (
  SELECT label, CAST(embedding[1] AS DOUBLE) AS v
  FROM embeddings
), per_label AS (
  SELECT label, CAST(count(*) AS DOUBLE) AS n, sum(v) AS s,
         sum(v * v) AS ss
  FROM norms GROUP BY 1
), tot AS (
  SELECT sum(n) AS N, sum(s) AS S, sum(ss) AS SS,
         CAST(count(*) AS DOUBLE) AS k,
         sum(s * s / n) AS group_sq
  FROM per_label
)
SELECT CAST(N AS BIGINT) AS n_vectors, CAST(k AS BIGINT) AS n_labels,
       round(group_sq - S * S / N, 6) AS ss_between,
       round(SS - group_sq, 6) AS ss_within,
       round(((group_sq - S * S / N) / (k - 1))
             / ((SS - group_sq) / (N - k)), 6) AS f_stat
FROM tot
"""

QUERIES["anova_f_component"] = q_anova_f_component
ORACLES["anova_f_component"] = ORACLE_ANOVA_F_COMPONENT


def q_skyline_orders(spark, sf_dir):
    """Skyline (Pareto frontier) of orders on (price ASC, date DESC):
    orders no other order beats on BOTH cheapness and recency — the
    multi-objective shortlist operator. One running-max window over
    the price ordering (with full deterministic tiebreaks) instead of
    the naive all-pairs dominance join."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = o.select(
        "o_orderkey",
        cents.alias("cents"),
        F.unix_timestamp("o_orderdate").alias("ep"),
    )
    w = (
        Window.orderBy("cents", F.desc("ep"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = base.withColumn("best_ep", F.max("ep").over(w)).filter(
        F.col("best_ep").isNull() | (F.col("ep") > F.col("best_ep"))
    )
    return sky.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.round(F.col("cents") / 100.0, 6).alias("price_usd"),
        F.to_date(F.to_timestamp(F.col("ep"))).cast("string").alias(
            "order_date"
        ),
    ).orderBy("o_orderkey")


ORACLE_SKYLINE_ORDERS = """
WITH base AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         epoch(o_orderdate) AS ep
  FROM orders
), sky AS (
  SELECT o_orderkey, cents, ep,
         max(ep) OVER (ORDER BY cents, ep DESC, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS best_ep
  FROM base
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       round(cents / 100.0, 6) AS price_usd,
       strftime(CAST(to_timestamp(ep) AS DATE), '%Y-%m-%d') AS order_date
FROM sky WHERE best_ep IS NULL OR ep > best_ep
ORDER BY o_orderkey
"""

QUERIES["skyline_orders"] = q_skyline_orders
ORACLES["skyline_orders"] = ORACLE_SKYLINE_ORDERS


def q_manifest_stats_report(spark, sf_dir):
    """Driver gate for the manifest's per-file column statistics: the
    [min, max] ts the committing writer recorded from parquet footers,
    rolled up per day, must equal the oracle's real min/max per day.
    This is the load-bearing metadata — stats-pruning and the TopK
    tail scan are only correct if these bounds are honest."""
    from .storage.manifest import ManifestTable

    path = _events_versioned_table(spark, sf_dir)
    man = ManifestTable(path).load_manifest()
    rows = []
    for rel, stats in man.get("stats", {}).items():
        rng = stats.get("ts")
        if rng is None:
            continue
        day = rel.split("date_day=", 1)[1].split("/", 1)[0]
        rows.append((day, int(rng[0]), int(rng[1])))
    df = spark.createDataFrame(rows, "day string, lo long, hi long")
    return (
        df.groupBy("day")
        .agg(
            F.timestamp_micros(F.min("lo")).alias("min_ts"),
            F.timestamp_micros(F.max("hi")).alias("max_ts"),
        )
        .orderBy("day")
    )


ORACLE_MANIFEST_STATS_REPORT = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       min(ts) AS min_ts, max(ts) AS max_ts
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["manifest_stats_report"] = q_manifest_stats_report
ORACLES["manifest_stats_report"] = ORACLE_MANIFEST_STATS_REPORT


def q_tenant_isolation_scan(spark, sf_dir):
    """Driver gate for tenant routing: two tenants' events tables under
    one base (acme = even ids, globex = odd), and the acme-scoped
    catalog read must answer EXACTLY acme's subset — the multi-tenancy
    path (tenant → dataset → table directory) proven by the oracle,
    not by trusting the path join."""
    from .catalog import optional_table, signal_table_path
    from .storage.manifest import write_batch_manifest

    key = ("tenants", sf_dir)
    if key not in _R9_CACHE:
        base = _tempfile.mkdtemp(prefix="sdb-r9-tenants-")
        e = _events_day_hour(spark, sf_dir)
        for tenant, parity in (("acme", 0), ("globex", 1)):
            write_batch_manifest(
                e.filter(F.col("event_id") % 2 == parity),
                signal_table_path(base, tenant, "prod", "events_iso"),
                "events_iso", batch_id=1,
                partition_cols=("date_day", "hour"), stats_cols=("ts",),
            )
        _R9_CACHE[key] = base
    df = optional_table(spark, _R9_CACHE[key], "acme", "prod", "events_iso")
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_TENANT_ISOLATION_SCAN = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE event_id % 2 = 0
GROUP BY 1 ORDER BY 1
"""

QUERIES["tenant_isolation_scan"] = q_tenant_isolation_scan
ORACLES["tenant_isolation_scan"] = ORACLE_TENANT_ISOLATION_SCAN


def q_hot_only_first_run(spark, sf_dir):
    """Driver gate for the first-run experience: a table with hot acks
    and NO committed snapshot yet serves hot-only — a new tenant's
    data is queryable before the first flush creates the cold table
    (the reference's unflushed-data-visibility proposal names exactly
    this case)."""
    from .storage.hot import HotStore, hybrid_read

    key = ("hotonly", sf_dir)
    if key not in _R9_CACHE:
        path = _tempfile.mkdtemp(prefix="sdb-r9-hotonly-")
        e = _events_day_hour(spark, sf_dir)
        store = HotStore(path)
        store.ack(e.filter(F.col("event_id") % 10 == 0))
        store.ack(e.filter(F.col("event_id") % 10 == 5))
        _R9_CACHE[key] = path
    df = hybrid_read(spark, _R9_CACHE[key])
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_HOT_ONLY_FIRST_RUN = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE event_id % 5 = 0
GROUP BY 1 ORDER BY 1
"""

QUERIES["hot_only_first_run"] = q_hot_only_first_run
ORACLES["hot_only_first_run"] = ORACLE_HOT_ONLY_FIRST_RUN


# --------------------------------------------------------------- batch 4


def q_theil_sen_daily_trend(spark, sf_dir):
    """Theil-Sen robust trend of 1997's daily revenue: the MEDIAN of
    all pairwise day-to-day slopes — immune to the outlier days that
    drag least-squares around. The pair join runs over ONE YEAR of the
    DAILY rollup (365 days → ~66k pairs; the full multi-year domain
    would put millions of slopes under a single exact-median group —
    the classic quadratic trap Theil-Sen invites), broadcast on one
    side; slopes are exact-cents over integer day gaps."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1997
    )
    daily = o.groupBy(
        (F.unix_timestamp(F.to_date("o_orderdate").cast("timestamp")) / 86400)
        .cast("long")
        .alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    a = daily.select(F.col("d").alias("da"), F.col("cents").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("cents").alias("cb"))
    pairs = a.join(F.broadcast(b), F.col("da") < F.col("db")).select(
        ((F.col("cb") - F.col("ca")) / (F.col("db") - F.col("da"))).alias(
            "slope"
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.percentile("slope", F.lit(0.5)) / 100.0, 6).alias(
            "sen_slope_usd_per_day"
        ),
    )


ORACLE_THEIL_SEN_DAILY_TREND = """
WITH daily AS (
  SELECT CAST(epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) / 86400
              AS BIGINT) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
), pairs AS (
  SELECT (b.cents - a.cents) * 1.0 / (b.d - a.d) AS slope
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(slope, 0.5) / 100.0, 6)
         AS sen_slope_usd_per_day
FROM pairs
"""

QUERIES["theil_sen_daily_trend"] = q_theil_sen_daily_trend
ORACLES["theil_sen_daily_trend"] = ORACLE_THEIL_SEN_DAILY_TREND


def q_runs_test_randomness(spark, sf_dir):
    """Wald-Wolfowitz runs test per event type: is the above/below-
    median sequence of values random in time, or does it streak? The
    per-type median joins back as a broadcast; runs count with one lag
    window; expectation and variance are the closed-form n1/n2
    formulas. Ties at the median count as below (documented
    convention, applied identically in both engines)."""
    e = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 1000000).cast("bigint")
    base = e.select("event_type", "ts", "event_id", v.alias("v"))
    med = base.groupBy("event_type").agg(
        F.percentile("v", F.lit(0.5)).alias("med")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    signed = (
        base.join(F.broadcast(med), "event_type")
        .withColumn("hi", (F.col("v") > F.col("med")).cast("int"))
        .withColumn(
            "new_run",
            F.when(
                F.lag("hi").over(w).isNull()
                | (F.lag("hi").over(w) != F.col("hi")),
                1,
            ).otherwise(0),
        )
    )
    agg = signed.groupBy("event_type").agg(
        F.sum("new_run").cast("double").alias("runs"),
        F.sum("hi").cast("double").alias("n1"),
        F.sum(1 - F.col("hi")).cast("double").alias("n2"),
    )
    n = F.col("n1") + F.col("n2")
    er = 1 + 2 * F.col("n1") * F.col("n2") / n
    vr = (
        2 * F.col("n1") * F.col("n2")
        * (2 * F.col("n1") * F.col("n2") - n)
        / (n * n * (n - 1))
    )
    return agg.select(
        "event_type",
        F.col("runs").cast("bigint").alias("runs"),
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        F.round((F.col("runs") - er) / F.sqrt(vr), 6).alias("z"),
    ).orderBy("event_type")


ORACLE_RUNS_TEST_RANDOMNESS = """
WITH base AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v
  FROM events
), med AS (
  SELECT event_type, quantile_cont(v, 0.5) AS med FROM base GROUP BY 1
), signed AS (
  SELECT b.event_type,
         CASE WHEN b.v > m.med THEN 1 ELSE 0 END AS hi,
         b.ts, b.event_id
  FROM base b JOIN med m USING (event_type)
), runs AS (
  SELECT event_type, hi,
         CASE WHEN lag(hi) OVER w IS NULL
                   OR lag(hi) OVER w <> hi THEN 1 ELSE 0 END AS new_run
  FROM signed
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), agg AS (
  SELECT event_type,
         CAST(sum(new_run) AS DOUBLE) AS runs,
         CAST(sum(hi) AS DOUBLE) AS n1,
         CAST(sum(1 - hi) AS DOUBLE) AS n2
  FROM runs GROUP BY 1
)
SELECT event_type, CAST(runs AS BIGINT) AS runs,
       CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
       round((runs - (1 + 2 * n1 * n2 / (n1 + n2)))
             / sqrt(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))
                    / (pow(n1 + n2, 2) * (n1 + n2 - 1))), 6) AS z
FROM agg ORDER BY event_type
"""

QUERIES["runs_test_randomness"] = q_runs_test_randomness
ORACLES["runs_test_randomness"] = ORACLE_RUNS_TEST_RANDOMNESS


def q_chi2_keyness_terms(spark, sf_dir):
    """Keyness: the top-10 terms most OVER-represented in each language
    vs the rest of the corpus by 2x2 chi-square — the corpus-linguistics
    ranking TF-IDF isn't (TF-IDF rewards rarity; keyness rewards
    statistical surprise). One wordcount shuffle; the 2x2 cells are
    integer-exact and the rank runs per language on the term rollup."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "lang",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    lang_tot = tf.groupBy("lang").agg(F.sum("a").alias("lt"))
    term_tot = tf.groupBy("term").agg(F.sum("a").alias("tt"))
    corpus = tf.agg(F.sum("a").alias("N"))
    cells = (
        tf.join(F.broadcast(lang_tot), "lang")
        .join(term_tot, "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "lang",
            "term",
            F.col("a").cast("double").alias("a"),
            (F.col("lt") - F.col("a")).cast("double").alias("b"),
            (F.col("tt") - F.col("a")).cast("double").alias("c"),
            (F.col("N") - F.col("lt") - F.col("tt") + F.col("a"))
            .cast("double")
            .alias("dd"),
            F.col("N").cast("double").alias("N"),
        )
    )
    chi2 = (
        F.col("N")
        * F.pow(F.col("a") * F.col("dd") - F.col("b") * F.col("c"), 2)
        / (
            (F.col("a") + F.col("b"))
            * (F.col("c") + F.col("dd"))
            * (F.col("a") + F.col("c"))
            * (F.col("b") + F.col("dd"))
        )
    )
    scored = cells.filter(
        F.col("a") * F.col("dd") > F.col("b") * F.col("c")  # over-represented
    ).select("lang", "term", F.round(chi2, 6).alias("chi2"))
    w = Window.partitionBy("lang").orderBy(F.desc("chi2"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", F.col("rk").cast("bigint").alias("rk"), "term", "chi2")
        .orderBy("lang", "rk")
    )


ORACLE_CHI2_KEYNESS_TERMS = """
WITH tf AS (
  SELECT lang, t.term, count(*) AS a
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) > 0
  GROUP BY 1, 2
), lang_tot AS (SELECT lang, sum(a) AS lt FROM tf GROUP BY 1),
term_tot AS (SELECT term, sum(a) AS tt FROM tf GROUP BY 1),
corpus AS (SELECT sum(a) AS N FROM tf),
cells AS (
  SELECT tf.lang, tf.term,
         CAST(a AS DOUBLE) AS a,
         CAST(lt - a AS DOUBLE) AS b,
         CAST(tt - a AS DOUBLE) AS c,
         CAST(N - lt - tt + a AS DOUBLE) AS dd,
         CAST(N AS DOUBLE) AS N
  FROM tf JOIN lang_tot USING (lang) JOIN term_tot USING (term), corpus
), scored AS (
  SELECT lang, term,
         round(N * pow(a * dd - b * c, 2)
               / ((a + b) * (c + dd) * (a + c) * (b + dd)), 6) AS chi2
  FROM cells WHERE a * dd > b * c
), ranked AS (
  SELECT lang, term, chi2,
         row_number() OVER (PARTITION BY lang
                            ORDER BY chi2 DESC, term) AS rk
  FROM scored
)
SELECT lang, CAST(rk AS BIGINT) AS rk, term, chi2
FROM ranked WHERE rk <= 10 ORDER BY lang, rk
"""

QUERIES["chi2_keyness_terms"] = q_chi2_keyness_terms
ORACLES["chi2_keyness_terms"] = ORACLE_CHI2_KEYNESS_TERMS


def q_llr_collocations(spark, sf_dir):
    """Dunning log-likelihood-ratio collocations: the top-15 adjacent
    word pairs that co-occur far beyond chance — the standard
    collocation measure that, unlike PMI, doesn't explode on rare
    pairs. The token array materializes ONCE per doc before the bigram
    zip (lambda-capture discipline); LLR's xlogx cells are exact
    integers until the log."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
        ).alias("t")
    ).filter(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg")
    )
    parts = bigrams.select(
        "bg",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    # c1/c2/N are exact integer sums OF k11 (count of bigrams with that
    # first/second word = Σ k11 over the matching rows), so every
    # downstream table derives from the ONE vocabulary-sized bigram
    # aggregate. The former shape re-aggregated `parts` four times —
    # four full tokenize+explode passes over the corpus, which plan
    # canonicalization cannot deduplicate (each copy prunes different
    # columns). The eager localCheckpoint materializes k11 once inside
    # the query's own execution (the repo's bounded-intermediate
    # pattern, cf. cosine_near_dup_pairs) so the corpus is read and
    # tokenized exactly once (r12, guide §1.2/§2.2).
    k11 = parts.groupBy("bg", "w1", "w2").agg(
        F.count(F.lit(1)).alias("k11")
    ).localCheckpoint()
    c1 = k11.groupBy("w1").agg(F.sum("k11").alias("c1"))
    c2 = k11.groupBy("w2").agg(F.sum("k11").alias("c2"))
    tot = k11.agg(F.sum("k11").alias("N"))

    def xlx(k):
        return F.when(k > 0, k * F.log(k)).otherwise(F.lit(0.0))

    cells = (
        k11.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.col("k11").cast("double").alias("k11"),
            (F.col("c1") - F.col("k11")).cast("double").alias("k12"),
            (F.col("c2") - F.col("k11")).cast("double").alias("k21"),
            (F.col("N") - F.col("c1") - F.col("c2") + F.col("k11"))
            .cast("double")
            .alias("k22"),
            F.col("N").cast("double").alias("N"),
        )
    )
    llr = 2 * (
        xlx(F.col("k11")) + xlx(F.col("k12")) + xlx(F.col("k21"))
        + xlx(F.col("k22")) + xlx(F.col("N"))
        - xlx(F.col("k11") + F.col("k12"))
        - xlx(F.col("k21") + F.col("k22"))
        - xlx(F.col("k11") + F.col("k21"))
        - xlx(F.col("k12") + F.col("k22"))
    )
    scored = cells.select("bg", F.round(llr, 6).alias("llr"))
    # top-15 via global sort-limit (TakeOrdered at scale), THEN rank the
    # 15 survivors — the former rank-then-filter windowed the entire
    # bigram vocabulary through one partition (r12, guide §2.5); the
    # (llr DESC, bg) total order makes the two forms identical
    top = scored.orderBy(F.desc("llr"), "bg").limit(15)
    w = Window.orderBy(F.desc("llr"), "bg")
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select(F.col("rk").cast("bigint").alias("rk"), "bg", "llr")
        .orderBy("rk")
    )


ORACLE_LLR_COLLOCATIONS = """
WITH tok AS (
  SELECT string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                      ' ') AS t
  FROM documents
), bg AS (
  SELECT t[i] || ' ' || t[i + 1] AS bg, t[i] AS w1, t[i + 1] AS w2
  FROM tok, UNNEST(range(1, greatest(len(t), 1))) u(i)
  WHERE len(t) >= 2 AND i < len(t)
), k AS (
  SELECT bg, w1, w2, count(*) AS k11 FROM bg GROUP BY 1, 2, 3
), c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
c2 AS (SELECT w2, count(*) AS c2 FROM bg GROUP BY 1),
tot AS (SELECT count(*) AS N FROM bg),
cells AS (
  SELECT bg, CAST(k11 AS DOUBLE) AS k11,
         CAST(c1 - k11 AS DOUBLE) AS k12,
         CAST(c2 - k11 AS DOUBLE) AS k21,
         CAST(N - c1 - c2 + k11 AS DOUBLE) AS k22,
         CAST(N AS DOUBLE) AS N
  FROM k JOIN c1 USING (w1) JOIN c2 USING (w2), tot
), scored AS (
  SELECT bg,
         round(2 * (
           (CASE WHEN k11 > 0 THEN k11 * ln(k11) ELSE 0 END)
           + (CASE WHEN k12 > 0 THEN k12 * ln(k12) ELSE 0 END)
           + (CASE WHEN k21 > 0 THEN k21 * ln(k21) ELSE 0 END)
           + (CASE WHEN k22 > 0 THEN k22 * ln(k22) ELSE 0 END)
           + N * ln(N)
           - (k11 + k12) * ln(k11 + k12)
           - (k21 + k22) * ln(k21 + k22)
           - (k11 + k21) * ln(k11 + k21)
           - (k12 + k22) * ln(k12 + k22)), 6) AS llr
  FROM cells
), ranked AS (
  SELECT bg, llr, row_number() OVER (ORDER BY llr DESC, bg) AS rk
  FROM scored
)
SELECT CAST(rk AS BIGINT) AS rk, bg, llr FROM ranked
WHERE rk <= 15 ORDER BY rk
"""

QUERIES["llr_collocations"] = q_llr_collocations
ORACLES["llr_collocations"] = ORACLE_LLR_COLLOCATIONS


def q_mean_battery(spark, sf_dir):
    """Pythagorean-means battery per event type over positive values:
    arithmetic, geometric (exp-mean-log), harmonic (n over reciprocal
    sum) — the three rate-vs-level conventions a latency pipeline must
    not mix up. One agg pass; the log/reciprocal folds are identical
    IEEE expressions in both engines."""
    e = load_table(spark, sf_dir, "events")
    pos = e.filter(F.col("value") > 0).select(
        "event_type", F.col("value").alias("v")
    )
    return (
        pos.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("v"), 6).alias("mean_arith"),
            F.round(F.exp(F.avg(F.log("v"))), 6).alias("mean_geom"),
            F.round(F.count(F.lit(1)) / F.sum(1.0 / F.col("v")), 6).alias(
                "mean_harm"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_MEAN_BATTERY = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 6) AS mean_arith,
       round(exp(avg(ln(value))), 6) AS mean_geom,
       round(count(*) / sum(1.0 / value), 6) AS mean_harm
FROM events WHERE value > 0
GROUP BY 1 ORDER BY 1
"""

QUERIES["mean_battery"] = q_mean_battery
ORACLES["mean_battery"] = ORACLE_MEAN_BATTERY


def q_null_semantics_battery(spark, sf_dir):
    """NULL-semantics parity battery: COUNT(*) vs COUNT(col), null-
    skipping avg, coalesce fallbacks, and null-keyed grouping (every
    7th value nulled deterministically) — the three-valued-logic
    corners engines must agree on before any other result can be
    trusted."""
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 7 != 0, F.col("value"))
    base = e.select(
        F.when(F.col("event_id") % 3 == 0, None)
        .otherwise(F.col("event_type"))
        .alias("k"),
        v.alias("v"),
    )
    return (
        base.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("v").cast("bigint").alias("n_nonnull"),
            F.round(F.avg("v"), 6).alias("avg_skipnull"),
            F.sum(F.round(F.coalesce(F.col("v"), F.lit(-1.0)) * 100).cast("bigint"))
            .alias("sum_coalesce_cents"),
        )
        .orderBy(F.col("k").asc_nulls_first())
    )


ORACLE_NULL_SEMANTICS_BATTERY = """
WITH base AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS k,
         CASE WHEN event_id % 7 <> 0 THEN value END AS v
  FROM events
)
SELECT k, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(v) AS BIGINT) AS n_nonnull,
       round(avg(v), 6) AS avg_skipnull,
       CAST(sum(CAST(round(coalesce(v, -1.0) * 100) AS BIGINT)) AS BIGINT)
         AS sum_coalesce_cents
FROM base GROUP BY 1 ORDER BY k NULLS FIRST
"""

QUERIES["null_semantics_battery"] = q_null_semantics_battery
ORACLES["null_semantics_battery"] = ORACLE_NULL_SEMANTICS_BATTERY


def q_intdiv_mod_battery(spark, sf_dir):
    """Integer division and modulo on NEGATIVE operands — truncating
    div, floor div, C-style %, and always-positive pmod, pinned over
    every residue in [-5, 5]. The corner where engines (and languages)
    classically diverge; each output uses the construction both
    engines define identically."""
    e = load_table(spark, sf_dir, "events")
    a = (F.col("event_id") % 11 - 5).cast("bigint")
    vals = e.select(a.alias("a")).distinct()
    return (
        vals.select(
            "a",
            F.expr("div(a, 3)").cast("bigint").alias("div_trunc"),
            F.floor(F.col("a") / 3.0).cast("bigint").alias("div_floor"),
            (F.col("a") % 3).cast("bigint").alias("mod_c"),
            F.pmod(F.col("a"), F.lit(3)).cast("bigint").alias("mod_pos"),
        )
        .orderBy("a")
    )


ORACLE_INTDIV_MOD_BATTERY = """
WITH vals AS (
  SELECT DISTINCT CAST(event_id % 11 - 5 AS BIGINT) AS a FROM events
)
SELECT a,
       CAST(trunc(a / 3.0) AS BIGINT) AS div_trunc,
       CAST(floor(a / 3.0) AS BIGINT) AS div_floor,
       CAST(a % 3 AS BIGINT) AS mod_c,
       CAST(((a % 3) + 3) % 3 AS BIGINT) AS mod_pos
FROM vals ORDER BY a
"""

QUERIES["intdiv_mod_battery"] = q_intdiv_mod_battery
ORACLES["intdiv_mod_battery"] = ORACLE_INTDIV_MOD_BATTERY


def q_compaction_stats_pruning(spark, sf_dir):
    """Composition gate: stats-pruned time-window reads must still be
    correct AFTER compaction — the rewriter re-records each replacement
    file's [min, max] from its parquet footer, so read(between=) on
    the compacted table prunes against HONEST bounds. Catches the
    compactor that forgets to refresh stats."""
    import datetime as dt

    from .storage.manifest import ManifestTable

    path = _compacted_table(spark, sf_dir)
    lo = dt.datetime(2024, 1, 2)
    hi = dt.datetime(2024, 1, 4) - dt.timedelta(microseconds=1)
    df = ManifestTable(path).read(spark, between=("ts", lo, hi))
    return (
        df.filter(F.col("ts").between(F.lit(lo), F.lit(hi)))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_COMPACTION_STATS_PRUNING = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
  AND ts <= TIMESTAMP '2024-01-03 23:59:59.999999'
GROUP BY 1 ORDER BY 1
"""

QUERIES["compaction_stats_pruning"] = q_compaction_stats_pruning
ORACLES["compaction_stats_pruning"] = ORACLE_COMPACTION_STATS_PRUNING


def q_retention_tail_topk(spark, sf_dir):
    """Composition gate: the stats-ordered TopK tail scan over a table
    retention has already trimmed — the newest-100 multiset must come
    from the KEPT days only (a tail scan that still surfaced dropped
    partitions' rows would be reading files outside the snapshot)."""
    from .storage.manifest import ManifestTable

    path = _retained_table(spark, sf_dir)
    df, _files = ManifestTable(path).read_recent_topk(spark, "ts", 100)
    return (
        df.groupBy("ts")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy("ts")
    )


ORACLE_RETENTION_TAIL_TOPK = """
SELECT ts, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT ts FROM events WHERE day(ts) <= 4
      ORDER BY ts DESC LIMIT 100)
GROUP BY 1 ORDER BY 1
"""

QUERIES["retention_tail_topk"] = q_retention_tail_topk
ORACLES["retention_tail_topk"] = ORACLE_RETENTION_TAIL_TOPK


def q_partition_filter_scan(spark, sf_dir):
    """Hive-style partition pruning on a manifest read: filtering on
    the date_day partition column must answer one day exactly (and the
    plan pin asserts PartitionFilters engaged — the directory value,
    not row data, does the pruning)."""
    from .storage.manifest import ManifestTable

    path = _events_versioned_table(spark, sf_dir)
    df = ManifestTable(path).read(spark)
    return (
        df.filter(F.col("date_day") == "2024-01-05")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_PARTITION_FILTER_SCAN = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-05'
GROUP BY 1 ORDER BY 1
"""

QUERIES["partition_filter_scan"] = q_partition_filter_scan
ORACLES["partition_filter_scan"] = ORACLE_PARTITION_FILTER_SCAN


# --------------------------------------------------------------- batch 5


def q_streaming_ingest_visibility(spark, sf_dir):
    """Driver gate for the STREAMING ingest path end-to-end: events
    replayed through readStream (file source, 2 files per trigger) →
    foreachBatch → manifest-committed batches with checkpointing, then
    the table must answer the oracle's whole-corpus rollup — the
    WAL→exactly-once-sink contract proven by result equality, not by a
    pytest row count. availableNow drains the backlog deterministically
    once per process."""
    from .storage.manifest import ManifestTable, write_batch_manifest

    key = ("streaming", sf_dir)
    if key not in _R9_CACHE:
        src = _tempfile.mkdtemp(prefix="sdb-r9-streamsrc-")
        table = _tempfile.mkdtemp(prefix="sdb-r9-streamtbl-")
        ckpt = _tempfile.mkdtemp(prefix="sdb-r9-streamckpt-")
        e = _events_day_hour(spark, sf_dir)
        e.repartition(4).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema

        def sink(bdf, bid):
            write_batch_manifest(
                bdf, table, "events_r9s", batch_id=bid,
                partition_cols=("date_day", "hour"), stats_cols=("ts",),
            )

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _R9_CACHE[key] = table
    df = ManifestTable(_R9_CACHE[key]).read(spark)
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_STREAMING_INGEST_VISIBILITY = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["streaming_ingest_visibility"] = q_streaming_ingest_visibility
ORACLES["streaming_ingest_visibility"] = ORACLE_STREAMING_INGEST_VISIBILITY


def q_simpson_diversity(spark, sf_dir):
    """Simpson diversity per source: 1 − Σp² over the term distribution
    plus the effective vocabulary size 1/Σp² — the concentration-side
    complement of the entropy gate (Simpson weights dominant terms;
    entropy weights the tail). Exact integer term counts; one division
    at the end."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tf.groupBy("source").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    sump2 = F.col("ss") / (F.col("n") * F.col("n"))
    return agg.select(
        "source",
        "vocab",
        F.round(1 - sump2, 6).alias("simpson_diversity"),
        F.round(1 / sump2, 6).alias("effective_vocab"),
    ).orderBy("source")


ORACLE_SIMPSON_DIVERSITY = """
WITH tf AS (
  SELECT source, t.term, count(*) AS c
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) > 0
  GROUP BY 1, 2
), agg AS (
  SELECT source, sum(c) AS n, sum(c * c) AS ss,
         CAST(count(*) AS BIGINT) AS vocab
  FROM tf GROUP BY 1
)
SELECT source, vocab,
       round(1 - ss * 1.0 / (n * n), 6) AS simpson_diversity,
       round((n * n) * 1.0 / ss, 6) AS effective_vocab
FROM agg ORDER BY source
"""

QUERIES["simpson_diversity"] = q_simpson_diversity
ORACLES["simpson_diversity"] = ORACLE_SIMPSON_DIVERSITY


def q_sla_attainment_by_priority(spark, sf_dir):
    """Fulfillment SLA attainment per order priority: the share of
    orders whose LAST lineitem shipped within 90 days — max-per-order
    then a priority rollup, the order-level (not line-level) view the
    ship-lag histogram can't answer. Day arithmetic is integer."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    last_ship = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    lag_days = F.datediff(
        F.to_date("last_ship"), F.to_date("o_orderdate")
    )
    return (
        o.join(last_ship, o.o_orderkey == last_ship.l_orderkey)
        .select("o_orderpriority", lag_days.alias("lag"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.when(F.col("lag") <= 90, 1).otherwise(0))
            .cast("bigint")
            .alias("within_sla"),
            F.round(
                F.sum(F.when(F.col("lag") <= 90, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("attainment"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_SLA_ATTAINMENT_BY_PRIORITY = """
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1
), lagd AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(last_ship AS DATE)) AS lag
  FROM orders JOIN last_ship ON o_orderkey = l_orderkey
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN lag <= 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS within_sla,
       round(sum(CASE WHEN lag <= 90 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS attainment
FROM lagd GROUP BY 1 ORDER BY 1
"""

QUERIES["sla_attainment_by_priority"] = q_sla_attainment_by_priority
ORACLES["sla_attainment_by_priority"] = ORACLE_SLA_ATTAINMENT_BY_PRIORITY


def q_revenue_milestone_days(spark, sf_dir):
    """Revenue milestone calendar per nation: the first day cumulative
    revenue crossed 25% / 50% / 75% of the nation's final total — the
    pacing read (which markets front-load). One cumulative window over
    the (nation, day) rollup, milestones as conditional mins; exact
    cents so crossings are unambiguous."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    w = Window.partitionBy("n_name").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("n_name")
    cum = daily.select(
        "n_name",
        "d",
        F.sum("cents").over(w).alias("cum"),
        F.sum("cents").over(tot).alias("total"),
    )
    day_s = F.date_format("d", "yyyy-MM-dd")
    return (
        cum.groupBy("n_name")
        .agg(
            F.min(F.when(F.col("cum") * 4 >= F.col("total"), day_s)).alias(
                "day_25pct"
            ),
            F.min(F.when(F.col("cum") * 2 >= F.col("total"), day_s)).alias(
                "day_50pct"
            ),
            F.min(F.when(F.col("cum") * 4 >= F.col("total") * 3, day_s)).alias(
                "day_75pct"
            ),
        )
        .orderBy("n_name")
    )


ORACLE_REVENUE_MILESTONE_DAYS = """
WITH daily AS (
  SELECT n_name, CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), cum AS (
  SELECT n_name, d,
         sum(cents) OVER (PARTITION BY n_name ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cents) OVER (PARTITION BY n_name) AS total
  FROM daily
)
SELECT n_name,
       min(CASE WHEN cum * 4 >= total THEN strftime(d, '%Y-%m-%d') END)
         AS day_25pct,
       min(CASE WHEN cum * 2 >= total THEN strftime(d, '%Y-%m-%d') END)
         AS day_50pct,
       min(CASE WHEN cum * 4 >= total * 3 THEN strftime(d, '%Y-%m-%d') END)
         AS day_75pct
FROM cum GROUP BY 1 ORDER BY 1
"""

QUERIES["revenue_milestone_days"] = q_revenue_milestone_days
ORACLES["revenue_milestone_days"] = ORACLE_REVENUE_MILESTONE_DAYS


def q_emb_dim_correlation_top(spark, sf_dir):
    """Most-correlated embedding dimension pairs (top 10 by |corr|) —
    redundancy detection before PQ subspace splits (correlated dims in
    one subquantizer waste codebook bits). The (dim, dim) moment matrix
    comes from a posexplode self-join keyed on vec_id; corr is a ratio
    statistic over exact per-pair folds."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", "i", F.col("xf").cast("double").alias("x"))
    a = ex.select("vec_id", F.col("i").alias("di"), F.col("x").alias("xi"))
    b = ex.select("vec_id", F.col("i").alias("dj"), F.col("x").alias("xj"))
    pairs = a.join(b, "vec_id").filter(F.col("di") < F.col("dj"))
    corr = pairs.groupBy("di", "dj").agg(
        F.round(F.corr("xi", "xj"), 6).alias("corr")
    )
    w = Window.orderBy(F.desc(F.abs(F.col("corr"))), "di", "dj")
    return (
        corr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("rk").cast("bigint").alias("rk"),
            F.col("di").cast("bigint").alias("dim_a"),
            F.col("dj").cast("bigint").alias("dim_b"),
            "corr",
        )
        .orderBy("rk")
    )


ORACLE_EMB_DIM_CORRELATION_TOP = """
WITH ex AS (
  SELECT vec_id, unnest(range(len(embedding))) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), pairs AS (
  SELECT a.i AS di, b.i AS dj, a.x AS xi, b.x AS xj
  FROM ex a JOIN ex b USING (vec_id)
  WHERE a.i < b.i
), c AS (
  SELECT di, dj, round(corr(xi, xj), 6) AS corr
  FROM pairs GROUP BY 1, 2
), ranked AS (
  SELECT di, dj, corr,
         row_number() OVER (ORDER BY abs(corr) DESC, di, dj) AS rk
  FROM c
)
SELECT CAST(rk AS BIGINT) AS rk, CAST(di AS BIGINT) AS dim_a,
       CAST(dj AS BIGINT) AS dim_b, corr
FROM ranked WHERE rk <= 10 ORDER BY rk
"""

QUERIES["emb_dim_correlation_top"] = q_emb_dim_correlation_top
ORACLES["emb_dim_correlation_top"] = ORACLE_EMB_DIM_CORRELATION_TOP


def q_price_size_monotonicity(spark, sf_dir):
    """Pricing-curve QA per brand: is average retail price monotone in
    part size? Reports the correlation-free violation count — adjacent
    size steps where the average price DROPS — plus the curve span.
    One rollup, one lag window over ≤50 sizes per brand; exact cents."""
    p = load_table(spark, sf_dir, "part")
    curve = p.groupBy("p_brand", "p_size").agg(
        (
            F.sum(F.round(F.col("p_retailprice") * 100).cast("bigint"))
            / F.count(F.lit(1))
        ).alias("avg_cents"),
    )
    w = Window.partitionBy("p_brand").orderBy("p_size")
    stepped = curve.withColumn("prev", F.lag("avg_cents").over(w))
    return (
        stepped.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sizes"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("avg_cents") < F.col("prev")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("drops"),
        )
        .orderBy("p_brand")
    )


ORACLE_PRICE_SIZE_MONOTONICITY = """
WITH curve AS (
  SELECT p_brand, p_size,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)) * 1.0
           / count(*) AS avg_cents
  FROM part GROUP BY 1, 2
), stepped AS (
  SELECT p_brand, avg_cents,
         lag(avg_cents) OVER (PARTITION BY p_brand
                              ORDER BY p_size) AS prev
  FROM curve
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_sizes,
       CAST(sum(CASE WHEN prev IS NOT NULL AND avg_cents < prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS drops
FROM stepped GROUP BY 1 ORDER BY 1
"""

QUERIES["price_size_monotonicity"] = q_price_size_monotonicity
ORACLES["price_size_monotonicity"] = ORACLE_PRICE_SIZE_MONOTONICITY


def q_weekday_profile_distance(spark, sf_dir):
    """Mix-divergence per event type: L1 distance between the type's
    weekday activity profile and the GLOBAL weekday profile — which
    streams follow their own calendar. Two rollups and one broadcast
    join on the 7-row profile; shares are exact counts over counts."""
    e = load_table(spark, sf_dir, "events")
    base = e.select("event_type", F.dayofweek("ts").alias("dow"))
    per = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot_t = per.groupBy("event_type").agg(F.sum("c").alias("nt"))
    glob = base.groupBy("dow").agg(F.count(F.lit(1)).alias("g"))
    gtot = base.agg(F.count(F.lit(1)).alias("N"))
    joined = (
        per.join(F.broadcast(tot_t), "event_type")
        .join(F.broadcast(glob), "dow")
        .crossJoin(F.broadcast(gtot))
    )
    l1_term = F.abs(
        F.col("c") / F.col("nt") - F.col("g") / F.col("N")
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.max("nt").cast("bigint").alias("n_events"),
            F.round(F.sum(l1_term), 6).alias("l1_distance"),
        )
        .orderBy("event_type")
    )


ORACLE_WEEKDAY_PROFILE_DISTANCE = """
WITH base AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow FROM events
), per AS (
  SELECT event_type, dow, count(*) AS c FROM base GROUP BY 1, 2
), tot_t AS (SELECT event_type, sum(c) AS nt FROM per GROUP BY 1),
gdow AS (SELECT dow, count(*) AS g FROM base GROUP BY 1),
gtot AS (SELECT count(*) AS N FROM base)
SELECT event_type, CAST(max(nt) AS BIGINT) AS n_events,
       round(sum(abs(c * 1.0 / nt - g * 1.0 / N)), 6) AS l1_distance
FROM per JOIN tot_t USING (event_type) JOIN gdow USING (dow), gtot
GROUP BY 1 ORDER BY 1
"""

QUERIES["weekday_profile_distance"] = q_weekday_profile_distance
ORACLES["weekday_profile_distance"] = ORACLE_WEEKDAY_PROFILE_DISTANCE
