"""Round-8 staging battery: oracle-gated queries registered AFTER the
round-7 block so earlier rounds' tuned driver prefixes stay intact;
these become fresh evidence once rounds 6-7 are proven.

Same conventions as bench_queries (round(x, 6) floats, BIGINT counts,
explicit tiebreaks, aliases identical on both sides).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def q_customer_ltv_cohort(spark, sf_dir):
    """Customer-lifetime-value cohort triangle: acquisition quarter ×
    quarters-since-acquisition × revenue — the LTV matrix every growth
    team reads. Acquisition quarter is a per-customer min-agg (one
    shuffle on custkey), the triangle is one exact-cents rollup; ages
    are integer quarter arithmetic so both engines bucket identically."""
    o = load_table(spark, sf_dir, "orders")
    qtr = (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).cast("bigint")
    with_q = o.select(
        "o_custkey",
        qtr.alias("q"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    first_q = with_q.groupBy("o_custkey").agg(F.min("q").alias("cohort_q"))
    return (
        with_q.join(first_q, "o_custkey")
        .groupBy(
            "cohort_q", (F.col("q") - F.col("cohort_q")).alias("age_quarters")
        )
        .agg(
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 6).alias("revenue_usd"),
        )
        .orderBy("cohort_q", "age_quarters")
    )


ORACLE_CUSTOMER_LTV_COHORT = """
WITH with_q AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS BIGINT) AS q,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), first_q AS (
  SELECT o_custkey, min(q) AS cohort_q FROM with_q GROUP BY 1
)
SELECT cohort_q, q - cohort_q AS age_quarters,
       CAST(count(DISTINCT w.o_custkey) AS BIGINT) AS n_customers,
       round(sum(cents) / 100.0, 6) AS revenue_usd
FROM with_q w JOIN first_q f USING (o_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["customer_ltv_cohort"] = q_customer_ltv_cohort
ORACLES["customer_ltv_cohort"] = ORACLE_CUSTOMER_LTV_COHORT


def q_percent_of_total_window(spark, sf_dir):
    """Two-level contribution analysis: each nation's share of its
    region's revenue AND the region's share of global revenue — the BI
    percent-of-total drilldown, as two stacked windows over one
    nation-sized rollup (the fact table aggregates exactly once; both
    ratios are divisions of exact cents)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )
    roll = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("cents")
        )
    )
    wreg = Window.partitionBy("r_name")
    wall = Window.partitionBy()
    return (
        roll.select(
            "r_name",
            "n_name",
            F.round(F.col("cents") / 100.0, 6).alias("revenue_usd"),
            F.round(F.col("cents") / F.sum("cents").over(wreg), 6)
            .alias("share_of_region"),
            F.round(
                F.sum("cents").over(wreg) / F.sum("cents").over(wall), 6
            ).alias("region_share_of_global"),
        )
        .orderBy("r_name", "n_name")
    )


ORACLE_PERCENT_OF_TOTAL_WINDOW = """
WITH roll AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name,
       round(cents / 100.0, 6) AS revenue_usd,
       round(cents * 1.0 / sum(cents) OVER (PARTITION BY r_name), 6)
         AS share_of_region,
       round(sum(cents) OVER (PARTITION BY r_name) * 1.0
             / sum(cents) OVER (), 6) AS region_share_of_global
FROM roll ORDER BY r_name, n_name
"""

QUERIES["percent_of_total_window"] = q_percent_of_total_window
ORACLES["percent_of_total_window"] = ORACLE_PERCENT_OF_TOTAL_WINDOW


def q_robust_scaler_stats(spark, sf_dir):
    """Robust-scaler fit per stream: EXACT median and IQR of event
    values via integer-rank selection (the outlier-immune alternative
    to the z-score gate's mean/sd) — medians as the average of the two
    middle ranks so odd/even group sizes bucket identically in both
    engines, quartiles as the rank-ceil(p*n) order statistic (the
    classic type-1 estimator, pure integer math). Values quantize to
    integer cents BEFORE ranking so ties resolve identically."""
    e = load_table(spark, sf_dir, "events")
    vals = e.select(
        F.col("event_type").alias("service"),
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("service").orderBy("v")
    ws = Window.partitionBy("service")
    ranked = vals.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(ws)
    )
    n, rn = F.col("n"), F.col("rn")
    is_mid = (rn == F.floor((n + 1) / 2)) | (rn == F.ceil((n + 1) / 2))
    is_q1 = rn == F.ceil(n * 0.25)
    is_q3 = rn == F.ceil(n * 0.75)
    return (
        ranked.filter(is_mid | is_q1 | is_q3)
        .groupBy("service")
        .agg(
            F.max("n").alias("n_events"),
            F.round(F.avg(F.when(is_mid, F.col("v"))) / 100.0, 6)
            .alias("median_value"),
            F.round(
                (
                    F.max(F.when(is_q3, F.col("v")))
                    - F.min(F.when(is_q1, F.col("v")))
                ) / 100.0,
                6,
            ).alias("iqr"),
        )
        .orderBy("service")
    )


ORACLE_ROBUST_SCALER_STATS = """
WITH vals AS (
  SELECT event_type AS service,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), ranked AS (
  SELECT service, v,
         row_number() OVER (PARTITION BY service ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY service) AS n
  FROM vals
)
SELECT service, CAST(max(n) AS BIGINT) AS n_events,
       round(avg(CASE WHEN rn IN (floor((n + 1) / 2), ceil((n + 1) / 2))
                      THEN v END) / 100.0, 6) AS median_value,
       round((max(CASE WHEN rn = ceil(n * 0.75) THEN v END)
              - min(CASE WHEN rn = ceil(n * 0.25) THEN v END)) / 100.0, 6)
         AS iqr
FROM ranked
WHERE rn IN (floor((n + 1) / 2), ceil((n + 1) / 2),
             ceil(n * 0.25), ceil(n * 0.75))
GROUP BY 1 ORDER BY 1
"""

QUERIES["robust_scaler_stats"] = q_robust_scaler_stats
ORACLES["robust_scaler_stats"] = ORACLE_ROBUST_SCALER_STATS


def q_dup_cluster_size_histogram(spark, sf_dir):
    """Exact-duplicate cluster-size distribution: how much of the
    corpus sits in singletons vs 2x vs 4x+ clusters — the corpus-health
    histogram read before choosing a dedup budget. Text projects to
    md5 digests (one 16-byte-keyed shuffle), cluster sizes roll up to a
    log2-banded vocabulary, and the doc shares are exact integer
    ratios."""
    d = load_table(spark, sf_dir, "documents")
    clusters = d.select(F.md5("text").alias("digest")).groupBy("digest").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    banded = clusters.select(
        F.pow(F.lit(2.0), F.floor(F.log2("sz"))).cast("bigint").alias("size_band"),
        "sz",
    )
    wall = Window.partitionBy()
    return (
        banded.groupBy("size_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("n_docs"),
        )
        .withColumn(
            "doc_share",
            F.round(F.col("n_docs") / F.sum("n_docs").over(wall), 6),
        )
        .orderBy("size_band")
    )


ORACLE_DUP_CLUSTER_SIZE_HISTOGRAM = """
WITH clusters AS (
  SELECT md5(text) AS digest, CAST(count(*) AS BIGINT) AS sz
  FROM documents GROUP BY 1
), banded AS (
  SELECT CAST(2 ** floor(log2(sz)) AS BIGINT) AS size_band, sz FROM clusters
)
SELECT size_band, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       round(sum(sz) * 1.0 / sum(sum(sz)) OVER (), 6) AS doc_share
FROM banded GROUP BY 1 ORDER BY 1
"""

QUERIES["dup_cluster_size_histogram"] = q_dup_cluster_size_histogram
ORACLES["dup_cluster_size_histogram"] = ORACLE_DUP_CLUSTER_SIZE_HISTOGRAM


def q_rolling_distinct_users(spark, sf_dir):
    """DAU and rolling 7-day distinct users (stickiness = DAU/WAU7) —
    rolling COUNT DISTINCT, which no window frame can express without
    unbounded state, via the contribution-explode trick: each (user,
    active day) pair fans out to the <=7 window-end days it counts
    toward, then one exact distinct per day. The explode factor is the
    window length (a constant), so the shuffle is 7x the per-day user
    vocabulary — not 7x the event stream."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("mn"), F.max(F.to_date("ts")).alias("mx")
    )
    contrib = (
        ud.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            "day",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.least(F.date_add(F.col("day"), 6), F.col("mx")),
                )
            ).alias("win_end"),
        )
    )
    wau = contrib.groupBy("win_end").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau7")
    )
    dau = ud.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    return (
        dau.join(wau, dau.day == wau.win_end)
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau7",
            F.round(F.col("dau") / F.col("wau7"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


ORACLE_ROLLING_DISTINCT_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), bounds AS (
  SELECT max(CAST(ts AS DATE)) AS mx FROM events
), contrib AS (
  SELECT ud.user_id, ud.day, t.win_end
  FROM ud, bounds,
       LATERAL unnest(generate_series(
         ud.day, least(ud.day + INTERVAL 6 DAY, bounds.mx),
         INTERVAL 1 DAY)) AS t(win_end)
), wau AS (
  SELECT CAST(win_end AS DATE) AS win_end,
         CAST(count(DISTINCT user_id) AS BIGINT) AS wau7
  FROM contrib GROUP BY 1
), dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM ud GROUP BY 1
)
SELECT CAST(dau.day AS VARCHAR) AS day, dau, wau7,
       round(dau * 1.0 / wau7, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.win_end
ORDER BY day
"""

QUERIES["rolling_distinct_users"] = q_rolling_distinct_users
ORACLES["rolling_distinct_users"] = ORACLE_ROLLING_DISTINCT_USERS


def q_emb_centroid_shift(spark, sf_dir):
    """Embedding drift monitor: per-label centroid L2 shift between the
    first and second half of the corpus (by vec_id) — did the meaning
    of a class move between two snapshots. One posexplode to (label,
    dim, value) with CONDITIONAL sums for both halves in a single
    partial+final agg (the halves never materialize separately, vectors
    shuffle only as per-dimension partial sums), then the distance
    folds over the (labels x dims)-sized rollup."""
    e = load_table(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id").alias("mx"))
    exploded = (
        e.crossJoin(F.broadcast(mx))
        .select(
            "label",
            (F.col("vec_id") * 2 <= F.col("mx")).alias("is_old"),
            F.posexplode("embedding").alias("pos", "x"),
        )
    )
    per_dim = exploded.groupBy("label", "pos").agg(
        F.sum(F.when(F.col("is_old"), F.col("x")).otherwise(0.0)).alias("s_old"),
        F.count(F.when(F.col("is_old"), 1)).cast("bigint").alias("n_old"),
        F.sum(F.when(~F.col("is_old"), F.col("x")).otherwise(0.0)).alias("s_new"),
        F.count(F.when(~F.col("is_old"), 1)).cast("bigint").alias("n_new"),
    )
    d = F.col("s_old") / F.col("n_old") - F.col("s_new") / F.col("n_new")
    return (
        per_dim.withColumn("d2", d * d)
        .groupBy("label")
        .agg(
            F.max("n_old").alias("n_old"),
            F.max("n_new").alias("n_new"),
            F.round(F.sqrt(F.sum("d2")), 6).alias("centroid_shift_l2"),
        )
        .orderBy("label")
    )


ORACLE_EMB_CENTROID_SHIFT = """
WITH mx AS (SELECT max(vec_id) AS mx FROM embeddings),
exploded AS (
  -- parallel unnest zips positionally (DuckDB has no WITH ORDINALITY)
  SELECT label, e.vec_id * 2 <= mx.mx AS is_old,
         unnest(range(len(e.embedding))) AS pos,
         CAST(unnest(e.embedding) AS DOUBLE) AS x
  FROM embeddings e, mx
), per_dim AS (
  SELECT label, pos,
         sum(CASE WHEN is_old THEN x ELSE 0 END) AS s_old,
         CAST(count(CASE WHEN is_old THEN 1 END) AS BIGINT) AS n_old,
         sum(CASE WHEN NOT is_old THEN x ELSE 0 END) AS s_new,
         CAST(count(CASE WHEN NOT is_old THEN 1 END) AS BIGINT) AS n_new
  FROM exploded GROUP BY 1, 2
)
SELECT label, CAST(max(n_old) AS BIGINT) AS n_old,
       CAST(max(n_new) AS BIGINT) AS n_new,
       round(sqrt(sum((s_old / n_old - s_new / n_new)
                      * (s_old / n_old - s_new / n_new))), 6)
         AS centroid_shift_l2
FROM per_dim GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_centroid_shift"] = q_emb_centroid_shift
ORACLES["emb_centroid_shift"] = ORACLE_EMB_CENTROID_SHIFT


def q_longest_activity_streak(spark, sf_dir):
    """Longest run of consecutive active DAYS per user (gaps-and-islands
    on the calendar): the engagement-streak leaderboard. Distinct
    (user, day) first (one shuffle), then the classic day - dense-rank
    island key — consecutive days share a key with zero self-joins; top
    20 by (streak, user) is deterministic."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = ud.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        F.min("day").alias("start_day"),
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), "start_day"
    )
    return (
        streaks.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "streak_days",
            F.col("start_day").cast("string").alias("start_day"),
        )
        .orderBy(F.desc("streak_days"), "user_id")
        .limit(20)
    )


ORACLE_LONGEST_ACTIVITY_STREAK = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), islands AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY day) AS INT) AS grp
  FROM ud
), streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_days,
         min(day) AS start_day
  FROM islands GROUP BY 1, 2
)
SELECT user_id, streak_days, CAST(start_day AS VARCHAR) AS start_day
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY streak_days DESC, start_day) AS rk
      FROM streaks)
WHERE rk = 1
ORDER BY streak_days DESC, user_id LIMIT 20
"""

QUERIES["longest_activity_streak"] = q_longest_activity_streak
ORACLES["longest_activity_streak"] = ORACLE_LONGEST_ACTIVITY_STREAK


def q_top_k_movers(spark, sf_dir):
    """Week-over-week rank volatility: products whose revenue RANK moved
    most between the last two full weeks — the merchandising 'movers'
    report. Two weekly exact-cents rollups rank independently (windows
    over part-vocabulary rollups), one join on partkey, top 15 by
    absolute rank delta with deterministic tiebreaks."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    wk = F.weekofyear("o_orderdate")
    yr = F.year("o_orderdate")
    weekly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter((yr == 1997) & wk.isin(10, 11))
        .groupBy(wk.alias("wk"), "l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .alias("cents")
        )
    )
    w = Window.partitionBy("wk").orderBy(F.desc("cents"), "l_partkey")
    ranked = weekly.withColumn("rnk", F.row_number().over(w).cast("bigint"))
    a = ranked.filter(F.col("wk") == 10).select(
        "l_partkey", F.col("rnk").alias("rank_w1")
    )
    b = ranked.filter(F.col("wk") == 11).select(
        "l_partkey", F.col("rnk").alias("rank_w2")
    )
    return (
        a.join(b, "l_partkey")
        .select(
            "l_partkey",
            "rank_w1",
            "rank_w2",
            (F.col("rank_w1") - F.col("rank_w2")).alias("rank_gain"),
        )
        .orderBy(F.desc(F.abs(F.col("rank_gain"))), "l_partkey")
        .limit(15)
    )


ORACLE_TOP_K_MOVERS = """
WITH weekly AS (
  SELECT weekofyear(o_orderdate) AS wk, l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1997 AND weekofyear(o_orderdate) IN (10, 11)
  GROUP BY 1, 2
), ranked AS (
  SELECT wk, l_partkey,
         CAST(row_number() OVER (
           PARTITION BY wk ORDER BY cents DESC, l_partkey) AS BIGINT) AS rnk
  FROM weekly
)
SELECT a.l_partkey, a.rnk AS rank_w1, b.rnk AS rank_w2,
       a.rnk - b.rnk AS rank_gain
FROM ranked a JOIN ranked b USING (l_partkey)
WHERE a.wk = 10 AND b.wk = 11
ORDER BY abs(a.rnk - b.rnk) DESC, a.l_partkey LIMIT 15
"""

QUERIES["top_k_movers"] = q_top_k_movers
ORACLES["top_k_movers"] = ORACLE_TOP_K_MOVERS


def q_abandonment_by_hour(spark, sf_dir):
    """Hour-of-day session abandonment: share of 30-minute-gap sessions
    containing a view but NO purchase, bucketed by the session's start
    hour — where in the day the funnel leaks. Sessionization is the
    portable lag-gap-cumsum idiom; the verdicts are one boolean agg per
    session; the final rollup is 24 rows of exact integer ratios."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (
        F.col("ts").cast("double")
        - F.lag(F.col("ts").cast("double")).over(w)
    )
    sess = (
        e.select("user_id", "ts", "event_type")
        .withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                Window.partitionBy("user_id").orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.hour(F.min("ts")).cast("bigint").alias("start_hour"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("saw"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("bought"),
    )
    return (
        per_sess.filter(F.col("saw") == 1)
        .groupBy("start_hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(1 - F.col("bought")).cast("bigint").alias("n_abandoned"),
            F.round(F.sum(1 - F.col("bought")) / F.count(F.lit(1)), 6)
            .alias("abandon_rate"),
        )
        .orderBy("start_hour")
    )


ORACLE_ABANDONMENT_BY_HOUR = """
WITH gaps AS (
  SELECT user_id, ts, event_type,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts, event_type,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
           AS sess_id
  FROM gaps
), per_sess AS (
  SELECT user_id, sess_id,
         CAST(hour(min(ts)) AS BIGINT) AS start_hour,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
  FROM sess GROUP BY 1, 2
)
SELECT start_hour, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(1 - bought) AS BIGINT) AS n_abandoned,
       round(sum(1 - bought) * 1.0 / count(*), 6) AS abandon_rate
FROM per_sess WHERE saw = 1
GROUP BY 1 ORDER BY 1
"""

QUERIES["abandonment_by_hour"] = q_abandonment_by_hour
ORACLES["abandonment_by_hour"] = ORACLE_ABANDONMENT_BY_HOUR


def q_user_entropy_bands(spark, sf_dir):
    """Behavioral-diversity segmentation: per-user Shannon entropy of
    the event-type distribution, banded to one decimal — single-track
    users (entropy ~0) vs omnivores (~log2(5)). Counts stay exact
    integers through both rollups; ln only touches the per-user
    vocabulary-sized rows; the band key is exact integer deci-bits."""
    e = load_table(spark, sf_dir, "events")
    per_ut = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wu = Window.partitionBy("user_id")
    p = F.col("c") / F.sum("c").over(wu)
    per_user = (
        per_ut.withColumn("term", -p * F.log2(p))
        .groupBy("user_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.sum("term").alias("entropy"),
        )
    )
    band = F.floor(F.col("entropy") * 10).cast("bigint")
    return (
        per_user.groupBy(band.alias("entropy_band_decibits"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("entropy_band_decibits")
    )


ORACLE_USER_ENTROPY_BANDS = """
WITH per_ut AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), per_user AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
         sum(-(c * 1.0 / tot) * log2(c * 1.0 / tot)) AS entropy
  FROM (SELECT *, sum(c) OVER (PARTITION BY user_id) AS tot FROM per_ut)
  GROUP BY 1
)
SELECT CAST(floor(entropy * 10) AS BIGINT) AS entropy_band_decibits,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["user_entropy_bands"] = q_user_entropy_bands
ORACLES["user_entropy_bands"] = ORACLE_USER_ENTROPY_BANDS


def q_peak_to_median_load(spark, sf_dir):
    """Capacity-planning headroom: per stream, the peak hourly event
    count over the EXACT median hourly count (rank-selected, odd/even
    handled identically in both engines) — how bursty is this service
    relative to its typical hour. Everything after the hourly rollup is
    window math over a few hundred rows per stream."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.col("event_type").alias("service"),
        F.date_trunc("hour", F.col("ts")).alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("service").orderBy("n", "hr")
    ws = Window.partitionBy("service")
    ranked = hourly.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(ws)
    )
    n, rn = F.col("cnt"), F.col("rn")
    is_mid = (rn == F.floor((n + 1) / 2)) | (rn == F.ceil((n + 1) / 2))
    return (
        ranked.groupBy("service")
        .agg(
            F.max("cnt").alias("n_hours"),
            F.max("n").alias("peak_hourly"),
            F.round(F.avg(F.when(is_mid, F.col("n"))), 6).alias("median_hourly"),
            F.round(
                F.max("n") / F.avg(F.when(is_mid, F.col("n"))), 6
            ).alias("peak_to_median"),
        )
        .orderBy("service")
    )


ORACLE_PEAK_TO_MEDIAN_LOAD = """
WITH hourly AS (
  SELECT event_type AS service, date_trunc('hour', ts) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT service, hr, n,
         row_number() OVER (PARTITION BY service ORDER BY n, hr) AS rn,
         count(*) OVER (PARTITION BY service) AS cnt
  FROM hourly
)
SELECT service, CAST(max(cnt) AS BIGINT) AS n_hours,
       CAST(max(n) AS BIGINT) AS peak_hourly,
       round(avg(CASE WHEN rn IN (floor((cnt + 1) / 2), ceil((cnt + 1) / 2))
                      THEN n END), 6) AS median_hourly,
       round(max(n) * 1.0
             / avg(CASE WHEN rn IN (floor((cnt + 1) / 2),
                                    ceil((cnt + 1) / 2)) THEN n END), 6)
         AS peak_to_median
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["peak_to_median_load"] = q_peak_to_median_load
ORACLES["peak_to_median_load"] = ORACLE_PEAK_TO_MEDIAN_LOAD


def q_locf_gap_fill(spark, sf_dir):
    """Last-observation-carried-forward over a dense daily spine: each
    (service, day) cell carries that day's closing event value, or the
    most recent earlier day's when the day is empty — the standard
    timeseries imputation the null-filling gap gate stops short of.
    The spine is generated-days x stream vocabulary (KB-scale); LOCF is
    one last(ignoreNulls) window per stream; the fact table aggregates
    once."""
    e = load_table(spark, sf_dir, "events")
    daily_last = (
        e.groupBy(
            F.col("event_type").alias("service"), F.to_date("ts").alias("day")
        )
        .agg(
            F.max_by(F.round(F.col("value"), 6), F.col("ts")).alias("close_value")
        )
    )
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("mn"), F.max(F.to_date("ts")).alias("mx")
    )
    days = bounds.select(F.explode(F.sequence("mn", "mx")).alias("day"))
    services = e.select(F.col("event_type").alias("service")).distinct()
    spine = days.crossJoin(F.broadcast(services))
    w = Window.partitionBy("service").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(daily_last, ["service", "day"], "left")
        .withColumn(
            "filled_value", F.last("close_value", ignorenulls=True).over(w)
        )
        .select(
            "service",
            F.col("day").cast("string").alias("day"),
            F.col("close_value").isNull().cast("int").cast("bigint")
            .alias("was_gap"),
            F.round("filled_value", 6).alias("filled_value"),
        )
        .orderBy("service", "day")
    )


ORACLE_LOCF_GAP_FILL = """
WITH daily_last AS (
  SELECT event_type AS service, CAST(ts AS DATE) AS day,
         round(max_by(value, ts), 6) AS close_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(CAST(ts AS DATE)) AS mn, max(CAST(ts AS DATE)) AS mx FROM events
), days AS (
  SELECT CAST(t.day AS DATE) AS day
  FROM bounds, LATERAL unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS t(day)
), spine AS (
  SELECT s.service, d.day
  FROM days d CROSS JOIN (SELECT DISTINCT event_type AS service FROM events) s
)
SELECT sp.service, CAST(sp.day AS VARCHAR) AS day,
       CAST(CASE WHEN dl.close_value IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS was_gap,
       round(last_value(dl.close_value IGNORE NULLS) OVER (
         PARTITION BY sp.service ORDER BY sp.day
         ROWS UNBOUNDED PRECEDING), 6) AS filled_value
FROM spine sp LEFT JOIN daily_last dl
  ON sp.service = dl.service AND sp.day = dl.day
ORDER BY sp.service, sp.day
"""

QUERIES["locf_gap_fill"] = q_locf_gap_fill
ORACLES["locf_gap_fill"] = ORACLE_LOCF_GAP_FILL


def q_returns_share_matrix(spark, sf_dir):
    """Returns exposure matrix: share of shipped quantity RETURNED per
    (ship quarter, brand) — the merchandising quality read. One fact
    rollup with a conditional exact-quantity sum; brand rides a
    broadcast; shares are integral-double ratios (quantities are whole
    numbers, so the sums are exact at any scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qtr = (F.year("l_shipdate") * 4 + F.quarter("l_shipdate") - 1).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(F.year("l_shipdate") == 1997)
        .groupBy(qtr.alias("ship_q"), "p_brand")
        .agg(
            F.sum("l_quantity").cast("bigint").alias("qty_shipped"),
            F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
                  .otherwise(0.0)).cast("bigint").alias("qty_returned"),
        )
        .withColumn(
            "return_share",
            F.round(F.col("qty_returned") / F.col("qty_shipped"), 6),
        )
        .orderBy("ship_q", "p_brand")
    )


ORACLE_RETURNS_SHARE_MATRIX = """
SELECT CAST(year(l_shipdate) * 4 + quarter(l_shipdate) - 1 AS BIGINT)
         AS ship_q,
       p_brand,
       CAST(sum(l_quantity) AS BIGINT) AS qty_shipped,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
            AS BIGINT) AS qty_returned,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
             / sum(l_quantity), 6) AS return_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE year(l_shipdate) = 1997
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["returns_share_matrix"] = q_returns_share_matrix
ORACLES["returns_share_matrix"] = ORACLE_RETURNS_SHARE_MATRIX


def q_holiday_diff_in_diff(spark, sf_dir):
    """Difference-in-differences revenue estimate: ASIA customers
    (treatment) vs everyone else, before vs after 1998-01-01 — the
    causal-inference workhorse as one conditional exact-cents rollup
    per market segment (four sums in a single agg pass; the fact table
    never scans twice). Normalized to per-order means so group-size
    imbalance cancels; the DiD is (T_post - T_pre) - (C_post -
    C_pre)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", (F.col("r_name") == "ASIA").alias("treated")
    )
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "treated",
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
            .alias("post"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )

    def mean_if(t, p):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        return F.sum(F.when(cond, F.col("cents")).otherwise(0)) / F.sum(
            F.when(cond, 1).otherwise(0)
        )

    return (
        base.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                (
                    (mean_if(True, True) - mean_if(True, False))
                    - (mean_if(False, True) - mean_if(False, False))
                ) / 100.0,
                6,
            ).alias("did_usd"),
        )
        .orderBy("segment")
    )


ORACLE_HOLIDAY_DIFF_IN_DIFF = """
WITH base AS (
  SELECT c_mktsegment AS segment,
         r_name = 'ASIA' AS treated,
         o_orderdate >= TIMESTAMP '1998-01-01' AS post,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
       round(((sum(CASE WHEN treated AND post THEN cents ELSE 0 END) * 1.0
               / sum(CASE WHEN treated AND post THEN 1 ELSE 0 END)
               - sum(CASE WHEN treated AND NOT post THEN cents ELSE 0 END) * 1.0
               / sum(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END))
              - (sum(CASE WHEN NOT treated AND post THEN cents ELSE 0 END) * 1.0
                 / sum(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END)
                 - sum(CASE WHEN NOT treated AND NOT post THEN cents ELSE 0 END) * 1.0
                   / sum(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END)))
             / 100.0, 6) AS did_usd
FROM base GROUP BY 1 ORDER BY 1
"""

QUERIES["holiday_diff_in_diff"] = q_holiday_diff_in_diff
ORACLES["holiday_diff_in_diff"] = ORACLE_HOLIDAY_DIFF_IN_DIFF


def q_ab_test_two_proportion(spark, sf_dir):
    """Two-proportion z-test over a deterministic user split (user_id
    parity as the assignment hash): did arm B convert (>=1 purchase)
    more than arm A — the experimentation readout. One per-user verdict
    agg, one 2-row arm rollup, then the closed-form pooled z; every
    input to the float math is an exact integer count."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("converted")
    )
    arms = per_user.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    wall = Window.partitionBy()
    n, x = F.col("n_users"), F.col("n_converted")
    n_tot = F.sum("n_users").over(wall)
    x_tot = F.sum("n_converted").over(wall)
    p_pool = x_tot / n_tot
    # signed deviation of THIS arm's rate from the pooled rate, in
    # pooled-standard-error units (symmetric across arms)
    se = F.sqrt(p_pool * (1 - p_pool) * (1 / n + 1 / (n_tot - n)))
    # a degenerate pool (everyone or no one converted) has zero pooled
    # variance: no evidence either way -> z = 0 in BOTH engines (ANSI
    # Spark would otherwise throw on the 0-division)
    z = F.when(
        (x_tot == 0) | (x_tot == n_tot), F.lit(0.0)
    ).otherwise((x / n - (x_tot - x) / (n_tot - n)) / se)
    return (
        arms.select(
            "arm",
            "n_users",
            "n_converted",
            F.round(x / n, 6).alias("conv_rate"),
            F.round(z, 6).alias("z_vs_other"),
        )
        .orderBy("arm")
    )


ORACLE_AB_TEST_TWO_PROPORTION = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1
), arms AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY 1
)
SELECT arm, n_users, n_converted,
       round(n_converted * 1.0 / n_users, 6) AS conv_rate,
       CASE WHEN x_tot = 0 OR x_tot = n_tot THEN 0.0
            ELSE round((n_converted * 1.0 / n_users
              - (x_tot - n_converted) * 1.0 / (n_tot - n_users))
             / sqrt((x_tot * 1.0 / n_tot) * (1 - x_tot * 1.0 / n_tot)
                    * (1.0 / n_users + 1.0 / (n_tot - n_users))), 6)
       END AS z_vs_other
FROM (SELECT *, sum(n_users) OVER () AS n_tot,
             sum(n_converted) OVER () AS x_tot
      FROM arms)
ORDER BY arm
"""

QUERIES["ab_test_two_proportion"] = q_ab_test_two_proportion
ORACLES["ab_test_two_proportion"] = ORACLE_AB_TEST_TWO_PROPORTION


def q_lead_lag_correlation(spark, sf_dir):
    """Lead-lag cross-correlation between streams: corr of service A's
    daily volume against service B's volume k days LATER (k = 0..3) —
    does an error spike foreshadow signup drops. The daily rollup
    self-joins on the shifted calendar key (vocabulary-sized, never the
    event stream); output is the service-pair x lag matrix."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("svc"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    lags = spark.range(4).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(
        F.col("svc").alias("svc_a"), F.col("day").alias("day_a"),
        F.col("n").alias("n_a"),
    ).crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("svc").alias("svc_b"), F.col("day").alias("day_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, F.date_add(F.col("day_a"), F.col("lag")) == F.col("day_b"))
        .filter(F.col("svc_a") < F.col("svc_b"))
        .groupBy("svc_a", "svc_b", F.col("lag").cast("bigint").alias("lag_days"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.corr("n_a", "n_b"), 6).alias("xcorr"),
        )
        .orderBy("svc_a", "svc_b", "lag_days")
    )


ORACLE_LEAD_LAG_CORRELATION = """
WITH daily AS (
  SELECT event_type AS svc, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.svc AS svc_a, b.svc AS svc_b, CAST(l.lag AS BIGINT) AS lag_days,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(a.n, b.n), 6) AS xcorr
FROM daily a
CROSS JOIN (SELECT unnest(range(4)) AS lag) l
JOIN daily b ON a.day + CAST(l.lag AS INT) = b.day AND a.svc < b.svc
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

QUERIES["lead_lag_correlation"] = q_lead_lag_correlation
ORACLES["lead_lag_correlation"] = ORACLE_LEAD_LAG_CORRELATION


def q_weekly_revenue_waterfall(spark, sf_dir):
    """Weekly purchase-revenue waterfall: each week's revenue decomposed
    into new users, retained users' growth/shrinkage, and churned
    users' loss — the SaaS MRR-bridge shape on the event stream. Per
    (user, week) exact cents roll up first; the week-over-week user
    ledger is one FULL OUTER self-join on the shifted week key
    (user-vocabulary-sized); the waterfall is a 5-way conditional sum."""
    e = load_table(spark, sf_dir, "events")
    wk = F.weekofyear("ts").cast("bigint")
    per_uw = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", wk.alias("wk"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
        )
    )
    cur = per_uw.select("user_id", "wk", F.col("cents").alias("c_cur"))
    prv = per_uw.select(
        "user_id", (F.col("wk") + 1).alias("wk"), F.col("cents").alias("c_prv")
    )
    ledger = cur.join(prv, ["user_id", "wk"], "full_outer")
    first_wk = per_uw.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    ledger = ledger.join(first_wk, "user_id")
    new_c = F.when(F.col("wk") == F.col("wk0"), F.col("c_cur")).otherwise(0)
    churn_c = F.when(F.col("c_cur").isNull(), -F.col("c_prv")).otherwise(0)
    expan = F.when(
        F.col("c_cur").isNotNull() & F.col("c_prv").isNotNull()
        & (F.col("wk") > F.col("wk0")),
        F.col("c_cur") - F.col("c_prv"),
    ).otherwise(0)
    resur = F.when(
        F.col("c_cur").isNotNull() & F.col("c_prv").isNull()
        & (F.col("wk") > F.col("wk0")),
        F.col("c_cur"),
    ).otherwise(0)
    return (
        ledger.groupBy("wk")
        .agg(
            F.round(F.sum(new_c) / 100.0, 6).alias("new_usd"),
            F.round(F.sum(expan) / 100.0, 6).alias("net_expansion_usd"),
            F.round(F.sum(resur) / 100.0, 6).alias("resurrected_usd"),
            F.round(F.sum(churn_c) / 100.0, 6).alias("churned_usd"),
        )
        .orderBy("wk")
    )


ORACLE_WEEKLY_REVENUE_WATERFALL = """
WITH per_uw AS (
  SELECT user_id, CAST(weekofyear(ts) AS BIGINT) AS wk,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
), ledger AS (
  SELECT coalesce(c.user_id, p.user_id) AS user_id,
         coalesce(c.wk, p.wk) AS wk,
         c.cents AS c_cur, p.cents AS c_prv
  FROM per_uw c
  FULL OUTER JOIN (SELECT user_id, wk + 1 AS wk, cents FROM per_uw) p
    ON c.user_id = p.user_id AND c.wk = p.wk
), first_wk AS (
  SELECT user_id, min(wk) AS wk0 FROM per_uw GROUP BY 1
)
SELECT wk,
       round(sum(CASE WHEN wk = wk0 THEN c_cur ELSE 0 END) / 100.0, 6)
         AS new_usd,
       round(sum(CASE WHEN c_cur IS NOT NULL AND c_prv IS NOT NULL
                      AND wk > wk0 THEN c_cur - c_prv ELSE 0 END) / 100.0, 6)
         AS net_expansion_usd,
       round(sum(CASE WHEN c_cur IS NOT NULL AND c_prv IS NULL
                      AND wk > wk0 THEN c_cur ELSE 0 END) / 100.0, 6)
         AS resurrected_usd,
       round(sum(CASE WHEN c_cur IS NULL THEN -c_prv ELSE 0 END) / 100.0, 6)
         AS churned_usd
FROM ledger JOIN first_wk USING (user_id)
GROUP BY 1 ORDER BY 1
"""

QUERIES["weekly_revenue_waterfall"] = q_weekly_revenue_waterfall
ORACLES["weekly_revenue_waterfall"] = ORACLE_WEEKLY_REVENUE_WATERFALL


def q_percent_rank_bands(spark, sf_dir):
    """percent_rank calibration bands: documents scored by length
    percentile WITHIN their language ((rank-1)/(n-1), the engine-
    portable definition), banded to deciles — the normalized-score
    distribution check before cross-language thresholds. Window over
    the lang partition; the tie-break on doc_id makes the rank
    bit-deterministic."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    pr = F.percent_rank().over(w)
    band = F.least(F.lit(9), F.floor(pr * 10)).cast("bigint")
    return (
        d.select("lang", band.alias("pr_decile"))
        .groupBy("lang", "pr_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang", "pr_decile")
    )


ORACLE_PERCENT_RANK_BANDS = """
WITH pr AS (
  SELECT lang,
         least(9, CAST(floor(percent_rank() OVER (
           PARTITION BY lang ORDER BY n_chars, doc_id) * 10) AS BIGINT))
           AS pr_decile
  FROM documents
)
SELECT lang, pr_decile, CAST(count(*) AS BIGINT) AS n_docs
FROM pr GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["percent_rank_bands"] = q_percent_rank_bands
ORACLES["percent_rank_bands"] = ORACLE_PERCENT_RANK_BANDS


def q_linear_attribution(spark, sf_dir):
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's touches (view/click) EARLIER IN THE SAME
    30-minute session — the complement of the last-touch gate. Touch
    counting is one conditional window per purchase row (running count
    over the session); credit per event type is exact cents divided by
    an integer."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (
        F.col("ts").cast("double")
        - F.lag(F.col("ts").cast("double")).over(w)
    )
    sess = (
        e.select("user_id", "ts", "event_type", "value")
        .withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, -1
    )
    is_touch = F.col("event_type").isin("view", "click")
    purchases = (
        sess.withColumn(
            "n_touches",
            F.sum(F.when(is_touch, 1).otherwise(0)).over(ws),
        )
        .filter((F.col("event_type") == "purchase") & (F.col("n_touches") > 0))
        .select(
            "user_id", "sess_id", "ts",
            (F.round(F.col("value") * 100).cast("bigint")
             / F.col("n_touches")).alias("credit_cents"),
        )
    )
    touches = sess.filter(is_touch).select(
        "user_id", "sess_id",
        F.col("ts").alias("touch_ts"), F.col("event_type").alias("touch_type"),
    )
    return (
        purchases.join(touches, ["user_id", "sess_id"])
        .filter(F.col("touch_ts") < F.col("ts"))
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.round(F.sum("credit_cents") / 100.0, 6).alias("attributed_usd"),
        )
        .orderBy("touch_type")
    )


ORACLE_LINEAR_ATTRIBUTION = """
WITH gaps AS (
  SELECT user_id, ts, event_type, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts, event_type, value,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING)
           AS sess_id
  FROM gaps
), purchases AS (
  SELECT user_id, sess_id, ts,
         CAST(round(value * 100) AS BIGINT) * 1.0 / n_touches
           AS credit_cents
  FROM (SELECT *, sum(CASE WHEN event_type IN ('view', 'click')
                           THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id, sess_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS n_touches
        FROM sess)
  WHERE event_type = 'purchase' AND n_touches > 0
), touches AS (
  SELECT user_id, sess_id, ts AS touch_ts, event_type AS touch_type
  FROM sess WHERE event_type IN ('view', 'click')
)
SELECT touch_type, CAST(count(*) AS BIGINT) AS n_credits,
       round(sum(credit_cents) / 100.0, 6) AS attributed_usd
FROM purchases p JOIN touches t USING (user_id, sess_id)
WHERE t.touch_ts < p.ts
GROUP BY 1 ORDER BY 1
"""

QUERIES["linear_attribution"] = q_linear_attribution
ORACLES["linear_attribution"] = ORACLE_LINEAR_ATTRIBUTION


def q_key_skew_profile(spark, sf_dir):
    """Shuffle-skew profiler: the distribution of per-key row counts for
    the lineitem order key, log2-banded — the diagnostic read BEFORE
    choosing a join strategy at 100 TB (a hot band at 2^20 means salting
    or AQE skew-join; a flat profile means plain hash partitioning is
    fine). One count per key, one band rollup; exact integers
    throughout."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_per_key")
    )
    band = F.pow(F.lit(2.0), F.floor(F.log2("rows_per_key"))).cast("bigint")
    wall = Window.partitionBy()
    return (
        per_key.groupBy(band.alias("rows_band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("rows_per_key").cast("bigint").alias("n_rows"),
        )
        .withColumn(
            "row_share", F.round(F.col("n_rows") / F.sum("n_rows").over(wall), 6)
        )
        .orderBy("rows_band")
    )


ORACLE_KEY_SKEW_PROFILE = """
WITH per_key AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS rows_per_key
  FROM lineitem GROUP BY 1
)
SELECT CAST(2 ** floor(log2(rows_per_key)) AS BIGINT) AS rows_band,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(rows_per_key) AS BIGINT) AS n_rows,
       round(sum(rows_per_key) * 1.0 / sum(sum(rows_per_key)) OVER (), 6)
         AS row_share
FROM per_key GROUP BY 1 ORDER BY 1
"""

QUERIES["key_skew_profile"] = q_key_skew_profile
ORACLES["key_skew_profile"] = ORACLE_KEY_SKEW_PROFILE


def q_freshness_report(spark, sf_dir):
    """Per-stream data-freshness report: last event time and minutes of
    staleness against the corpus watermark — the first panel of every
    ingest-health dashboard. One agg per stream plus a broadcast 1-row
    watermark; staleness is exact epoch arithmetic."""
    e = load_table(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("wm"))
    per_svc = e.groupBy(F.col("event_type").alias("service")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    return (
        per_svc.crossJoin(F.broadcast(wm))
        .select(
            "service",
            "n_events",
            F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            F.round(
                (F.col("wm").cast("double") - F.col("last_ts").cast("double"))
                / 60.0,
                6,
            ).alias("minutes_stale"),
        )
        .orderBy("service")
    )


ORACLE_FRESHNESS_REPORT = """
WITH wm AS (SELECT max(ts) AS wm FROM events)
SELECT event_type AS service, CAST(count(*) AS BIGINT) AS n_events,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
       round((epoch(wm.wm) - epoch(max(ts))) / 60.0, 6) AS minutes_stale
FROM events, wm
GROUP BY 1, wm.wm ORDER BY 1
"""

QUERIES["freshness_report"] = q_freshness_report
ORACLES["freshness_report"] = ORACLE_FRESHNESS_REPORT


def q_minhash_error_bands(spark, sf_dir):
    """Sketch-accuracy audit: |MinHash-64 estimate − exact Jaccard|
    error distribution over document pairs sharing their md5 digest
    PREFIX (a cheap deterministic candidate blocking both engines
    replay identically) — the measured answer to 'how much do I trust
    the sketch'. Signatures are min(md5(h:shingle)) per (doc, h); the
    estimate is matching components / 64; errors band at 0.05. The
    audit runs on a FIXED deterministic 800-doc sample (doc_id bound):
    sketch-error distributions converge with a few hundred pairs, and
    the fixed sample keeps the audit's cost SF-invariant — an accuracy
    check should not scan the corpus it audits."""
    from .operators.dedup import fan_out

    # the 800-doc sample arrives as one input split: without a fan-out
    # every md5 below runs on a single core (guide §2.5 input skew)
    d = fan_out(load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 800))
    base = d.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    n3 = F.size(toks) - 2
    shing = F.when(
        n3 >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n3, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = base.select(
        "doc_id", F.explode(F.array_distinct(shing)).alias("shingle")
    )
    # deterministic UNIFORM pair blocking on a doc-id hash ring: ~3
    # docs per 2-hex block -> a few pairs per block, bounded at any
    # corpus size (the audit wants a reproducible pair sample across
    # the similarity spectrum, not near-dup candidates — content
    # blocking would hot-spot on the corpus's shared boilerplate)
    blocks = sh.select("doc_id").distinct().select(
        "doc_id",
        F.substring(F.md5(F.concat(F.lit("pair:"), F.col("doc_id").cast("string"))), 1, 2)
        .alias("blk"),
    )
    pairs = (
        blocks.alias("a")
        .join(blocks.alias("b"), (F.col("a.blk") == F.col("b.blk"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    # exact jaccard over the candidate pairs
    sa = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a").join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    exact = (
        inter.join(sizes.select(F.col("doc_id").alias("id_a"),
                                F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"),
                           F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("n_inter")
             / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")))
            .alias("exact_j"),
        )
    )
    # minhash-64 signatures as ONE map-only array fold per document:
    # sig[h] = min over shingles of md5(h:shingle), computed with a
    # nested transform + array_min over the doc's own (materialized)
    # shingle array. Same md5 inputs, same min — bit-identical to the
    # old explode(0..63) → md5 → groupBy(doc,h) min, but with zero
    # shuffle: the old shape shuffled |shingles|x64 digest rows to
    # aggregate them, then joined pairs against the signature table
    # TWICE at 64x row multiplication. The signature table is one row
    # per doc (bounded by the fixed 800-doc sample), so both joins
    # broadcast and the match count folds over zip_with in the same
    # stage (optimization guide §2.3-2.4: aggregate before you shuffle,
    # remove exchanges outright).
    sharr = base.select(
        "doc_id", F.array_distinct(shing).alias("_sharr")
    ).filter(F.size("_sharr") >= 1)
    arr = F.col("_sharr")
    sig = sharr.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda h: F.array_min(
                F.transform(arr, lambda s: F.md5(F.concat_ws(":", h, s)))
            ),
        ).alias("sig"),
    )
    est = (
        pairs.join(
            F.broadcast(sig.select(F.col("doc_id").alias("id_a"),
                                   F.col("sig").alias("sig_a"))), "id_a")
        .join(
            F.broadcast(sig.select(F.col("doc_id").alias("id_b"),
                                   F.col("sig").alias("sig_b"))), "id_b")
        .select(
            "id_a", "id_b",
            (F.size(
                F.filter(
                    F.zip_with(
                        F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y
                    ),
                    lambda m: m,
                )
            ) / 64.0).alias("est_j"),
        )
    )
    err = exact.join(est, ["id_a", "id_b"]).select(
        (F.floor(F.abs(F.col("est_j") - F.col("exact_j")) * 20).cast("bigint"))
        .alias("err_band_5pct")
    )
    return (
        err.groupBy("err_band_5pct")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("err_band_5pct")
    )


ORACLE_MINHASH_ERROR_BANDS = r"""
WITH base AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
           AS toks
  FROM documents WHERE doc_id < 800
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[CAST(i AS INT):CAST(i AS INT) + 2], ' ')
           AS shingle
  FROM base, LATERAL unnest(range(1, greatest(len(toks) - 1, 1))) AS t(i)
  WHERE len(toks) >= 3
), blocks AS (
  SELECT DISTINCT doc_id,
         substr(md5('pair:' || doc_id::VARCHAR), 1, 2) AS blk
  FROM sh
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.doc_id < b.doc_id
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1
), inter AS (
  SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
), exact AS (
  SELECT i.id_a, i.id_b,
         i.n_inter * 1.0 / (za.sz + zb.sz - i.n_inter) AS exact_j
  FROM inter i
  JOIN sizes za ON za.doc_id = i.id_a
  JOIN sizes zb ON zb.doc_id = i.id_b
), sig AS (
  SELECT doc_id, t.h, min(md5(t.h || ':' || shingle)) AS mh
  FROM sh, LATERAL unnest(range(64)) AS t(h)
  GROUP BY 1, 2
), est AS (
  SELECT p.id_a, p.id_b,
         sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 64.0 AS est_j
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.id_a
  JOIN sig sb ON sb.doc_id = p.id_b AND sb.h = sa.h
  GROUP BY 1, 2
)
SELECT CAST(floor(abs(est_j - exact_j) * 20) AS BIGINT) AS err_band_5pct,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM exact JOIN est USING (id_a, id_b)
GROUP BY 1 ORDER BY 1
"""

QUERIES["minhash_error_bands"] = q_minhash_error_bands
ORACLES["minhash_error_bands"] = ORACLE_MINHASH_ERROR_BANDS


def q_ann_recall_at_k(spark, sf_dir):
    """ANN quality audit: recall@5 of the IVF index against the
    brute-force ground truth, per query — the measured answer to 'what
    does probing 2 of 8 cells cost in recall'. Composes the two
    existing oracle-gated operators; the overlap is one semi-join on
    (query, neighbor)."""
    from .operators import similarity as sim

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    truth = sim.cosine_topk(e, queries, "vec_id", "embedding", k=5, dims=64)
    approx = sim.ivf_ann_topk(
        e, queries, "vec_id", "embedding", k=5, n_cells=8, nprobe=2
    )
    hits = truth.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    n_hit = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    base = truth.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_truth")
    )
    return (
        base.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "k_truth",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / F.col("k_truth"), 6)
            .alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


ORACLE_ANN_RECALL_AT_K = """
WITH norms AS (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
  GROUP BY vec_id
),
bpairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(q.embedding[d.d]::DOUBLE * c.embedding[d.d]::DOUBLE) AS dot
  FROM embeddings q, embeddings c, UNNEST(range(1, 65)) d(d)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                      neighbor_id ASC) AS rk
    FROM bpairs
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms nc ON nc.vec_id = neighbor_id
  ) WHERE rk <= 5
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell, embedding AS cv
  FROM embeddings ORDER BY vec_id LIMIT 8
),
cnorms AS (
  SELECT cell, sqrt(sum(x * x)) AS nrm
  FROM (SELECT cell, unnest(cv)::DOUBLE AS x FROM cents)
  GROUP BY cell
),
cscores AS (
  SELECT e.vec_id, c.cell,
         round(sum(e.embedding[d.d]::DOUBLE * c.cv[d.d]::DOUBLE)
               / (n.nrm * cn.nrm), 6) AS score
  FROM embeddings e
  JOIN norms n ON n.vec_id = e.vec_id, cents c
  JOIN cnorms cn ON cn.cell = c.cell, UNNEST(range(1, 65)) d(d)
  GROUP BY e.vec_id, c.cell, n.nrm, cn.nrm
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell ASC) AS rk
    FROM cscores
  ) WHERE rk = 1
),
probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell ASC) AS rk
    FROM cscores WHERE vec_id < 10
  ) WHERE rk <= 2
),
apairs AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         sum(eq.embedding[d.d]::DOUBLE * ec.embedding[d.d]::DOUBLE) AS dot
  FROM probes p
  JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN embeddings eq ON eq.vec_id = p.query_id
  JOIN embeddings ec ON ec.vec_id = a.vec_id
  , UNNEST(range(1, 65)) d(d)
  GROUP BY 1, 2
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                      neighbor_id ASC) AS rk
    FROM apairs
    JOIN norms nq ON nq.vec_id = query_id
    JOIN norms nc ON nc.vec_id = neighbor_id
  ) WHERE rk <= 5
)
SELECT t.query_id,
       CAST(count(*) AS BIGINT) AS k_truth,
       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS recall_at_5
FROM truth t
LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY 1 ORDER BY 1
"""

QUERIES["ann_recall_at_k"] = q_ann_recall_at_k
ORACLES["ann_recall_at_k"] = ORACLE_ANN_RECALL_AT_K


def q_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval for a fixed 3-term query over the document
    corpus (k1=1.2, b=0.75) — the sparse-retrieval baseline every
    hybrid-search stack keeps next to its ANN index. Term frequencies
    and document lengths are exact integers; idf/score float math is
    per-row identical in both engines; top 15 with a doc_id
    tiebreak."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).filter(F.length("w") > 0)
    dlen = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    stats = dlen.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms = ["data", "spark", "query"]
    tf = (
        words.filter(F.col("w").isin(*terms))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dlen, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    tfn = (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        F.round(F.sum(idf * tfn), 6).alias("bm25"),
    )
    return (
        per_doc.orderBy(F.desc("bm25"), "doc_id")
        .limit(15)
        .select("doc_id", "n_terms_hit", "bm25")
    )


ORACLE_BM25_TOPK = """
WITH words AS (
  SELECT doc_id, t.w
  FROM documents d,
       LATERAL unnest(string_split_regex(lower(d.text), '[^a-z]+')) AS t(w)
  WHERE len(t.w) > 0
), dlen AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM words GROUP BY 1
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dlen
), tf AS (
  SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
  FROM words WHERE w IN ('data', 'spark', 'query')
  GROUP BY 1, 2
), df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
       round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
                 * (tf * 2.2)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl * 1.0 / avgdl))), 6)
         AS bm25
FROM tf JOIN df USING (term) JOIN dlen USING (doc_id), stats
GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 15
"""

QUERIES["bm25_topk"] = q_bm25_topk
ORACLES["bm25_topk"] = ORACLE_BM25_TOPK


def q_new_vs_returning_mix(spark, sf_dir):
    """Daily new-vs-returning user mix: events split by whether the
    user was first seen that calendar day — the acquisition/retention
    mix panel. First-seen is one min-agg on user_id (the first-seen
    trick, no running state); the daily split is one conditional
    rollup of exact integers."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day"))
    first_day = days.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        days.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0))
            .cast("bigint").alias("new_user_events"),
            F.sum(F.when(F.col("day") != F.col("d0"), 1).otherwise(0))
            .cast("bigint").alias("returning_events"),
            F.round(
                F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("new_share"),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "new_user_events", "returning_events", "new_share",
        )
        .orderBy("day")
    )


ORACLE_NEW_VS_RETURNING_MIX = """
WITH days AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
), first_day AS (
  SELECT user_id, min(day) AS d0 FROM days GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(sum(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT)
         AS new_user_events,
       CAST(sum(CASE WHEN day <> d0 THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_events,
       round(sum(CASE WHEN day = d0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS new_share
FROM days JOIN first_day USING (user_id)
GROUP BY 1 ORDER BY 1
"""

QUERIES["new_vs_returning_mix"] = q_new_vs_returning_mix
ORACLES["new_vs_returning_mix"] = ORACLE_NEW_VS_RETURNING_MIX


def q_power_user_curve(spark, sf_dir):
    """The power-user curve: how many users were active on exactly N
    distinct days of the window — the engagement-frequency histogram
    whose right-heaviness separates habit products from drive-by ones.
    One distinct, one per-user count, one histogram rollup; all exact
    integers."""
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.select("user_id", F.to_date("ts").alias("day")).distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_days"))
    )
    wall = Window.partitionBy()
    return (
        per_user.groupBy("active_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .withColumn(
            "user_share",
            F.round(F.col("n_users") / F.sum("n_users").over(wall), 6),
        )
        .orderBy("active_days")
    )


ORACLE_POWER_USER_CURVE = """
WITH per_user AS (
  SELECT user_id, CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
           AS active_days
  FROM events GROUP BY 1
)
SELECT active_days, CAST(count(*) AS BIGINT) AS n_users,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS user_share
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["power_user_curve"] = q_power_user_curve
ORACLES["power_user_curve"] = ORACLE_POWER_USER_CURVE


def q_cr4_concentration(spark, sf_dir):
    """Four-firm concentration ratio per region: the revenue share of
    each region's four largest customers — the antitrust-style CR4
    complement to the HHI gate. Per-customer exact cents roll up once;
    the top-4 cut is a rank window over the customer-vocabulary
    rollup."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .alias("cents")
        )
    )
    w = Window.partitionBy("r_name").orderBy(F.desc("cents"), "o_custkey")
    ws = Window.partitionBy("r_name")
    return (
        per_cust.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("cents").over(ws))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                F.sum(F.when(F.col("rk") <= 4, F.col("cents")).otherwise(0))
                / F.max("total"),
                6,
            ).alias("cr4"),
        )
        .orderBy("r_name")
    )


ORACLE_CR4_CONCENTRATION = """
WITH per_cust AS (
  SELECT r_name, o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
), ranked AS (
  SELECT r_name, cents,
         row_number() OVER (
           PARTITION BY r_name ORDER BY cents DESC, o_custkey) AS rk,
         sum(cents) OVER (PARTITION BY r_name) AS total
  FROM per_cust
)
SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(CASE WHEN rk <= 4 THEN cents ELSE 0 END) * 1.0
             / max(total), 6) AS cr4
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["cr4_concentration"] = q_cr4_concentration
ORACLES["cr4_concentration"] = ORACLE_CR4_CONCENTRATION


def q_seasonal_trend_decomposition(spark, sf_dir):
    """Additive seasonal decomposition of daily volume per stream:
    trend = 7-day CENTERED moving average, seasonal = the stream's
    mean weekday deviation from trend, residual = the rest — the
    classic STL-lite every capacity forecast starts from. Three
    stacked windows over the daily rollup; interior days only (the
    centered window needs 3 days each side), weekday keyed identically
    in both engines via dayofweek."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type").alias("service"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    wc = Window.partitionBy("service").orderBy("day").rowsBetween(-3, 3)
    with_trend = daily.withColumn("n_win", F.count(F.lit(1)).over(wc)) \
        .withColumn("trend", F.avg("n").over(wc)) \
        .filter(F.col("n_win") == 7)
    wd = F.dayofweek("day").cast("bigint")
    wsd = Window.partitionBy("service", wd)
    out = (
        with_trend.withColumn("dev", F.col("n") - F.col("trend"))
        .withColumn("seasonal", F.avg("dev").over(wsd))
        .select(
            "service",
            F.col("day").cast("string").alias("day"),
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(F.col("n") - F.col("trend") - F.col("seasonal"), 6)
            .alias("residual"),
        )
        .orderBy("service", "day")
    )
    return out


ORACLE_SEASONAL_TREND_DECOMPOSITION = """
WITH daily AS (
  SELECT event_type AS service, CAST(ts AS DATE) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
), with_trend AS (
  SELECT service, day, n,
         count(*) OVER w AS n_win,
         avg(n) OVER w AS trend
  FROM daily
  WINDOW w AS (PARTITION BY service ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), interior AS (
  SELECT * FROM with_trend WHERE n_win = 7
)
SELECT service, CAST(day AS VARCHAR) AS day,
       round(trend, 6) AS trend,
       round(avg(n - trend) OVER (
         PARTITION BY service, dayofweek(day)), 6) AS seasonal,
       round(n - trend - avg(n - trend) OVER (
         PARTITION BY service, dayofweek(day)), 6) AS residual
FROM interior ORDER BY service, day
"""

QUERIES["seasonal_trend_decomposition"] = q_seasonal_trend_decomposition
ORACLES["seasonal_trend_decomposition"] = ORACLE_SEASONAL_TREND_DECOMPOSITION


def q_ship_lag_distribution(spark, sf_dir):
    """Order-to-ship lag histogram: days between order placement and
    each line's ship date, banded weekly — the fulfillment-SLA
    distribution. One fact-to-fact join on the order key (both sides
    pre-projected to two columns) and one exact-integer band rollup."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    wall = Window.partitionBy()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.floor(lag / 7).cast("bigint").alias("lag_weeks"))
        .groupBy("lag_weeks")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
        .withColumn(
            "share", F.round(F.col("n_lines") / F.sum("n_lines").over(wall), 6)
        )
        .orderBy("lag_weeks")
    )


ORACLE_SHIP_LAG_DISTRIBUTION = """
SELECT CAST(floor(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) / 7) AS BIGINT)
         AS lag_weeks,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["ship_lag_distribution"] = q_ship_lag_distribution
ORACLES["ship_lag_distribution"] = ORACLE_SHIP_LAG_DISTRIBUTION


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Weighted (TF-IDF) document-similarity audit over a deterministic
    hash-ring pair sample — the sparse-weighted complement of the
    Jaccard and MinHash gates (rare shared terms count more than
    stopwords). Term vectors stay (doc, term-hash, weight) longs and
    doubles; the sampled pairs join both docs' vectors on the term key;
    output is the cosine-band histogram."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 800)
    words = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).filter(F.length("w") > 0)
    tf = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    df_ = tf.groupBy("w").agg(F.countDistinct("doc_id").cast("bigint").alias("df"))
    wts = (
        tf.join(F.broadcast(df_), "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "w",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("wt"),
        )
    )
    norms = wts.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    blocks = d.select(
        "doc_id",
        F.substring(
            F.md5(F.concat(F.lit("tfidf:"), F.col("doc_id").cast("string"))), 1, 2
        ).alias("blk"),
    )
    pairs = (
        blocks.alias("a")
        .join(blocks.alias("b"), (F.col("a.blk") == F.col("b.blk"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    dots = (
        pairs.join(wts.select(F.col("doc_id").alias("id_a"), "w",
                              F.col("wt").alias("wa")), "id_a")
        .join(wts.select(F.col("doc_id").alias("id_b"), F.col("w").alias("w"),
                         F.col("wt").alias("wb")), ["id_b", "w"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = (
        dots.join(norms.select(F.col("doc_id").alias("id_a"),
                               F.col("nrm").alias("na")), "id_a")
        .join(norms.select(F.col("doc_id").alias("id_b"),
                           F.col("nrm").alias("nb")), "id_b")
        .select(
            F.floor(F.col("dot") / (F.col("na") * F.col("nb")) * 10)
            .cast("bigint").alias("cos_band")
        )
    )
    return (
        cos.groupBy("cos_band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("cos_band")
    )


ORACLE_TFIDF_COSINE_PAIRS = """
WITH d AS (SELECT * FROM documents WHERE doc_id < 800),
words AS (
  SELECT doc_id, t.w
  FROM d, LATERAL unnest(string_split_regex(lower(d.text), '[^a-z]+')) AS t(w)
  WHERE len(t.w) > 0
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY 1, 2
), dfreq AS (
  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY 1
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
wts AS (
  SELECT doc_id, w, tf * ln(n_docs * 1.0 / df) AS wt
  FROM tf JOIN dfreq USING (w), nd
), norms AS (
  SELECT doc_id, sqrt(sum(wt * wt)) AS nrm FROM wts GROUP BY 1
), blocks AS (
  SELECT doc_id, substr(md5('tfidf:' || doc_id::VARCHAR), 1, 2) AS blk FROM d
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.doc_id < b.doc_id
), dots AS (
  SELECT p.id_a, p.id_b, sum(wa.wt * wb.wt) AS dot
  FROM pairs p
  JOIN wts wa ON wa.doc_id = p.id_a
  JOIN wts wb ON wb.doc_id = p.id_b AND wb.w = wa.w
  GROUP BY 1, 2
)
SELECT CAST(floor(dot / (na.nrm * nb.nrm) * 10) AS BIGINT) AS cos_band,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM dots
JOIN norms na ON na.doc_id = id_a
JOIN norms nb ON nb.doc_id = id_b
GROUP BY 1 ORDER BY 1
"""

QUERIES["tfidf_cosine_pairs"] = q_tfidf_cosine_pairs
ORACLES["tfidf_cosine_pairs"] = ORACLE_TFIDF_COSINE_PAIRS


def q_centroid_confusion_matrix(spark, sf_dir):
    """Label-noise detector: confusion matrix of each vector's tagged
    label vs its nearest label CENTROID (cosine) — off-diagonal mass is
    candidate mislabeling. Centroids are (label, dim) partial sums (one
    pass, vectors never shuffle whole); assignment scores every vector
    against the 10-row centroid table broadcast; ties break on label
    asc."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select("label", "vec_id", F.posexplode("embedding").alias("pos", "x"))
    cents = exploded.groupBy("label", "pos").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("c")
    )
    cnorm = cents.groupBy(F.col("label").alias("c_label")).agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn")
    )
    cvec = cents.select(F.col("label").alias("c_label"), "pos", "c")
    vnorm = exploded.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("vn")
    )
    dots = (
        exploded.join(F.broadcast(cvec), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum(F.col("x") * F.col("c")).alias("dot"))
    )
    scored = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "c_label")
        .select(
            "vec_id", "label", "c_label",
            F.round(F.col("dot") / (F.col("vn") * F.col("cn")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "c_label")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy(
            F.col("label").cast("bigint").alias("true_label"),
            F.col("c_label").cast("bigint").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy("true_label", "pred_label")
    )


ORACLE_CENTROID_CONFUSION_MATRIX = """
WITH exploded AS (
  SELECT label, vec_id,
         unnest(range(len(embedding))) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cents AS (
  SELECT label AS c_label, pos, sum(x) / count(*) AS c
  FROM exploded GROUP BY 1, 2
), cnorm AS (
  SELECT c_label, sqrt(sum(c * c)) AS cn FROM cents GROUP BY 1
), vnorm AS (
  SELECT vec_id, sqrt(sum(x * x)) AS vn FROM exploded GROUP BY 1
), dots AS (
  SELECT e.vec_id, e.label, c.c_label, sum(e.x * c.c) AS dot
  FROM exploded e JOIN cents c USING (pos)
  GROUP BY 1, 2, 3
), scored AS (
  SELECT d.vec_id, d.label, d.c_label,
         round(d.dot / (v.vn * n.cn), 6) AS cos
  FROM dots d JOIN vnorm v USING (vec_id) JOIN cnorm n USING (c_label)
), best AS (
  SELECT vec_id, label, c_label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, c_label) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT CAST(label AS BIGINT) AS true_label,
       CAST(c_label AS BIGINT) AS pred_label,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM best GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["centroid_confusion_matrix"] = q_centroid_confusion_matrix
ORACLES["centroid_confusion_matrix"] = ORACLE_CENTROID_CONFUSION_MATRIX


def q_emb_dim_variance_scree(spark, sf_dir):
    """Embedding scree table: per-dimension variance share and the
    cumulative share in descending-variance order — how many of the 64
    dimensions carry the signal (the PCA-lite read before quantizing or
    truncating an index). One (dim)-keyed variance agg; everything
    after runs on a 64-row table."""
    e = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy(F.col("pos").cast("bigint").alias("dim"))
        .agg(F.var_pop("x").alias("var"))
    )
    wall = Window.partitionBy()
    word = Window.orderBy(F.desc("var"), "dim").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_dim.withColumn("share", F.col("var") / F.sum("var").over(wall))
        .withColumn("cum_share", F.sum("share").over(word))
        .withColumn(
            "var_rank",
            F.row_number().over(Window.orderBy(F.desc("var"), "dim"))
            .cast("bigint"),
        )
        .select(
            "dim", "var_rank",
            F.round("share", 6).alias("share"),
            F.round("cum_share", 6).alias("cum_share"),
        )
        .orderBy("var_rank")
    )


ORACLE_EMB_DIM_VARIANCE_SCREE = """
WITH per_dim AS (
  SELECT CAST(pos AS BIGINT) AS dim, var_pop(x) AS var
  FROM (SELECT unnest(range(len(embedding))) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings)
  GROUP BY 1
), shares AS (
  SELECT dim, var, var / sum(var) OVER () AS share FROM per_dim
)
SELECT dim,
       CAST(row_number() OVER (ORDER BY var DESC, dim) AS BIGINT) AS var_rank,
       round(share, 6) AS share,
       round(sum(share) OVER (
         ORDER BY var DESC, dim ROWS UNBOUNDED PRECEDING), 6) AS cum_share
FROM shares ORDER BY var_rank
"""

QUERIES["emb_dim_variance_scree"] = q_emb_dim_variance_scree
ORACLES["emb_dim_variance_scree"] = ORACLE_EMB_DIM_VARIANCE_SCREE


def q_load_average_rates(spark, sf_dir):
    """Load-average triple per stream: events/minute over the trailing
    1h, 6h, and 24h windows ending at the corpus watermark — the
    1/5/15-style saturation read. One conditional agg per stream
    against a broadcast watermark; rates are exact counts over fixed
    divisors."""
    e = load_table(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("wm"))
    base = e.crossJoin(F.broadcast(wm)).select(
        F.col("event_type").alias("service"),
        (F.col("wm").cast("double") - F.col("ts").cast("double")).alias("age_s"),
    )

    def rate(hours):
        return F.round(
            F.sum(F.when(F.col("age_s") < hours * 3600, 1).otherwise(0))
            / (hours * 60.0),
            6,
        )

    return (
        base.groupBy("service")
        .agg(
            rate(1).alias("rate_1h_per_min"),
            rate(6).alias("rate_6h_per_min"),
            rate(24).alias("rate_24h_per_min"),
        )
        .orderBy("service")
    )


ORACLE_LOAD_AVERAGE_RATES = """
WITH wm AS (SELECT max(ts) AS wm FROM events)
SELECT event_type AS service,
       round(sum(CASE WHEN epoch(wm.wm) - epoch(ts) < 3600
                      THEN 1 ELSE 0 END) / 60.0, 6) AS rate_1h_per_min,
       round(sum(CASE WHEN epoch(wm.wm) - epoch(ts) < 21600
                      THEN 1 ELSE 0 END) / 360.0, 6) AS rate_6h_per_min,
       round(sum(CASE WHEN epoch(wm.wm) - epoch(ts) < 86400
                      THEN 1 ELSE 0 END) / 1440.0, 6) AS rate_24h_per_min
FROM events, wm
GROUP BY 1 ORDER BY 1
"""

QUERIES["load_average_rates"] = q_load_average_rates
ORACLES["load_average_rates"] = ORACLE_LOAD_AVERAGE_RATES


def q_median_order_gap(spark, sf_dir):
    """Purchase-cycle analysis: the EXACT median days between a
    customer's consecutive orders, per market segment — the reorder
    cadence that sizes retention campaigns. Gaps come from one lag
    window per customer; the median is integer-rank selected over the
    per-segment gap rollup (odd/even identical in both engines)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("prev_d", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_d").isNotNull())
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.to_date("o_orderdate"), F.to_date("prev_d"))
            .cast("bigint").alias("gap_d"),
            "o_orderkey",
        )
    )
    wr = Window.partitionBy("segment").orderBy("gap_d", "o_orderkey")
    ws = Window.partitionBy("segment")
    ranked = gaps.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(ws)
    )
    n, rn = F.col("n"), F.col("rn")
    is_mid = (rn == F.floor((n + 1) / 2)) | (rn == F.ceil((n + 1) / 2))
    return (
        ranked.filter(is_mid)
        .groupBy("segment")
        .agg(
            F.max("n").alias("n_gaps"),
            F.round(F.avg("gap_d"), 6).alias("median_gap_days"),
        )
        .orderBy("segment")
    )


ORACLE_MEDIAN_ORDER_GAP = """
WITH gaps AS (
  SELECT c_mktsegment AS segment,
         CAST(date_diff('day',
              CAST(lag(o_orderdate) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS DATE),
              CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_d,
         o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
), nn AS (
  SELECT * FROM gaps WHERE gap_d IS NOT NULL
), ranked AS (
  SELECT segment, gap_d,
         row_number() OVER (PARTITION BY segment ORDER BY gap_d, o_orderkey)
           AS rn,
         count(*) OVER (PARTITION BY segment) AS n
  FROM nn
)
SELECT segment, CAST(max(n) AS BIGINT) AS n_gaps,
       round(avg(gap_d), 6) AS median_gap_days
FROM ranked
WHERE rn IN (floor((n + 1) / 2), ceil((n + 1) / 2))
GROUP BY 1 ORDER BY 1
"""

QUERIES["median_order_gap"] = q_median_order_gap
ORACLES["median_order_gap"] = ORACLE_MEDIAN_ORDER_GAP


def q_error_burst_streaks(spark, sf_dir):
    """Longest error BURST per user: the maximum run of consecutive
    error events in each user's event sequence (gaps-and-islands on the
    sequence index, not the calendar) — the flappiest-session
    leaderboard. Two windows per user over the raw stream, then a
    bounded top-20; tiebreak on (user, burst start)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "ts", "event_id", "event_type").withColumn(
        "rn", F.row_number().over(w)
    )
    errs = seq.filter(F.col("event_type") == "error").withColumn(
        "ern",
        F.row_number().over(Window.partitionBy("user_id").orderBy("rn")),
    )
    streaks = (
        errs.withColumn("grp", F.col("rn") - F.col("ern"))
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("burst_len"),
            F.min("ts").alias("start_ts"),
        )
    )
    w2 = Window.partitionBy("user_id").orderBy(F.desc("burst_len"), "start_ts")
    return (
        streaks.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") == 1)
        .select(
            "user_id", "burst_len",
            F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("burst_start"),
        )
        .orderBy(F.desc("burst_len"), "user_id")
        .limit(20)
    )


ORACLE_ERROR_BURST_STREAKS = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), errs AS (
  SELECT user_id, ts, rn,
         row_number() OVER (PARTITION BY user_id ORDER BY rn) AS ern
  FROM seq WHERE event_type = 'error'
), streaks AS (
  SELECT user_id, rn - ern AS grp,
         CAST(count(*) AS BIGINT) AS burst_len,
         min(ts) AS start_ts
  FROM errs GROUP BY 1, 2
)
SELECT user_id, burst_len,
       strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS burst_start
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY burst_len DESC, start_ts) AS rk
      FROM streaks)
WHERE rk = 1
ORDER BY burst_len DESC, user_id LIMIT 20
"""

QUERIES["error_burst_streaks"] = q_error_burst_streaks
ORACLES["error_burst_streaks"] = ORACLE_ERROR_BURST_STREAKS


def q_priority_mix_shift(spark, sf_dir):
    """Order-priority mix shift: each priority's share of orders per
    quarter and the share's delta vs the previous quarter (lag over the
    priority x quarter rollup) — the leading indicator mix dashboards
    watch. Exact integer shares; one rollup, two windows over it."""
    o = load_table(spark, sf_dir, "orders")
    qtr = (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).cast("bigint")
    roll = o.groupBy(qtr.alias("q"), "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wq = Window.partitionBy("q")
    share = F.col("n") / F.sum("n").over(wq)
    wp = Window.partitionBy("o_orderpriority").orderBy("q")
    return (
        roll.withColumn("share", share)
        .withColumn("prev_share", F.lag("share").over(wp))
        .select(
            "q",
            "o_orderpriority",
            "n",
            F.round("share", 6).alias("share"),
            F.round(F.col("share") - F.col("prev_share"), 6)
            .alias("share_delta"),
        )
        .orderBy("q", "o_orderpriority")
    )


ORACLE_PRIORITY_MIX_SHIFT = """
WITH roll AS (
  SELECT CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS BIGINT)
           AS q,
         o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), shares AS (
  SELECT q, o_orderpriority, n,
         n * 1.0 / sum(n) OVER (PARTITION BY q) AS share
  FROM roll
)
SELECT q, o_orderpriority, n, round(share, 6) AS share,
       round(share - lag(share) OVER (
         PARTITION BY o_orderpriority ORDER BY q), 6) AS share_delta
FROM shares ORDER BY q, o_orderpriority
"""

QUERIES["priority_mix_shift"] = q_priority_mix_shift
ORACLES["priority_mix_shift"] = ORACLE_PRIORITY_MIX_SHIFT


def q_realized_vs_retail_margin(spark, sf_dir):
    """Discount-depth report: realized unit price (extendedprice /
    quantity, after-discount) vs the part's retail price, per brand —
    where list price and street price diverge. Per-line ratios are
    identical doubles in both engines; the brand rollup averages them
    with an exact line count."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.avg(unit / F.col("p_retailprice")), 6)
            .alias("avg_realized_over_retail"),
        )
        .orderBy("p_brand")
    )


ORACLE_REALIZED_VS_RETAIL_MARGIN = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
       round(avg((l_extendedprice / l_quantity) / p_retailprice), 6)
         AS avg_realized_over_retail
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["realized_vs_retail_margin"] = q_realized_vs_retail_margin
ORACLES["realized_vs_retail_margin"] = ORACLE_REALIZED_VS_RETAIL_MARGIN


# --------------------------------------------------------------- batch 8
# Two engine-chokepoint gates (the stats-ordered TopK tail scan and the
# hot/cold visibility union get ORACLE-verified results, not just pytest
# pins) plus eleven analytics shapes.

import tempfile as _tempfile

_MANIFEST_CACHE: dict = {}


def _events_tail_table(spark, sf_dir: str) -> str:
    """Build (once per process per sf_dir) a manifest-committed copy of
    the events table, one file per event day with per-file [min, max]
    ts stats — the storage shape the stats-ordered TopK tail scan
    reads. Temp-dir resident; dropped with the process."""
    key = ("tail", sf_dir)
    if key not in _MANIFEST_CACHE:
        from .storage.manifest import write_batch_manifest

        path = _tempfile.mkdtemp(prefix="sdb-tailscan-")
        e = load_table(spark, sf_dir, "events").withColumn(
            "date_day", F.date_format("ts", "yyyy-MM-dd")
        )
        write_batch_manifest(
            e.repartition("date_day"), path, "events_tail", batch_id=1,
            partition_cols=("date_day",), stats_cols=("ts",),
        )
        _MANIFEST_CACHE[key] = path
    return _MANIFEST_CACHE[key]


def q_logql_backward_topk(spark, sf_dir):
    """Driver gate for the stats-ordered TopK tail scan
    (ManifestTable.read_recent_topk — the loki_query_range backward
    fast path): the early-stopping wave reader's top-200 TIMESTAMP
    MULTISET must equal the full scan's, which the oracle computes as a
    plain ORDER BY ts DESC LIMIT 200. The multiset of top-n timestamps
    is order-statistic-determined (unique regardless of how ties at the
    boundary resolve), so grouping the result by ts makes the compare
    tiebreak-proof. At 100 TB this is the shape that reads 1-2 recent
    files instead of the table."""
    from .storage.manifest import ManifestTable

    path = _events_tail_table(spark, sf_dir)
    df, _files_read = ManifestTable(path).read_recent_topk(spark, "ts", 200)
    return (
        df.groupBy("ts")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy("ts")
    )


ORACLE_LOGQL_BACKWARD_TOPK = """
SELECT ts, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT ts FROM events ORDER BY ts DESC LIMIT 200)
GROUP BY 1 ORDER BY 1
"""

QUERIES["logql_backward_topk"] = q_logql_backward_topk
ORACLES["logql_backward_topk"] = ORACLE_LOGQL_BACKWARD_TOPK


def q_hot_cold_visibility(spark, sf_dir):
    """Driver gate for unflushed-data visibility (storage/hot.py): the
    events table is split three ways — 60% manifest-committed cold, 20%
    acked hot THEN flushed (so the watermark must drop the hot copies),
    20% acked hot and left unflushed — and the hybrid hot/cold union
    must reproduce the WHOLE table's per-type rollup exactly once: no
    duplication across the flush boundary, no omission of unflushed
    acks. Value sums quantize to integer cents pre-agg so the compare
    is exact under any partitioning."""
    from .storage.hot import HotStore, flush_hot, hybrid_read
    from .storage.manifest import write_batch_manifest

    key = ("hotcold", sf_dir)
    if key not in _MANIFEST_CACHE:
        path = _tempfile.mkdtemp(prefix="sdb-hotcold-")
        e = load_table(spark, sf_dir, "events").withColumn(
            "date_day", F.date_format("ts", "yyyy-MM-dd")
        )
        write_batch_manifest(
            e.filter(F.col("event_id") % 5 < 3), path, "events_hc",
            batch_id=1, partition_cols=("date_day",), stats_cols=("ts",),
        )
        store = HotStore(path)
        store.ack(e.filter(F.col("event_id") % 5 == 3))
        flush_hot(spark, path, "events_hc", partition_cols=("date_day",),
                  stats_cols=("ts",))
        store.ack(e.filter(F.col("event_id") % 5 == 4))
        _MANIFEST_CACHE[key] = path
    df = hybrid_read(spark, _MANIFEST_CACHE[key])
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


ORACLE_HOT_COLD_VISIBILITY = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["hot_cold_visibility"] = q_hot_cold_visibility
ORACLES["hot_cold_visibility"] = ORACLE_HOT_COLD_VISIBILITY


def q_event_interarrival_histogram(spark, sf_dir):
    """Per-user inter-arrival-time histogram on a log2 scale — the
    burstiness fingerprint (Poisson traffic is one hump; humans are
    heavy-tailed). One window per user (lag over ts with event_id
    tiebreak), then a tiny bucket rollup; gap sums stay exact integer
    microseconds until the single final division."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select("user_id", "ts", "event_id")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    bucket = F.floor(F.log2(F.col("gap_us") / 1000000.0 + 1.0)).cast("bigint")
    return (
        gaps.groupBy(bucket.alias("log2_gap_s"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(
                F.sum("gap_us") / 1000000.0 / F.count(F.lit(1)), 6
            ).alias("avg_gap_s"),
        )
        .orderBy("log2_gap_s")
    )


ORACLE_EVENT_INTERARRIVAL_HISTOGRAM = """
WITH gaps AS (
  SELECT epoch_us(ts)
         - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT CAST(floor(log2(gap_us / 1000000.0 + 1.0)) AS BIGINT)
         AS log2_gap_s,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(sum(gap_us) / 1000000.0 / count(*), 6) AS avg_gap_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

QUERIES["event_interarrival_histogram"] = q_event_interarrival_histogram
ORACLES["event_interarrival_histogram"] = ORACLE_EVENT_INTERARRIVAL_HISTOGRAM


def q_doc_word_stats(spark, sf_dir):
    """Word-length profile per source: docs, total words, and average
    word length — the quick tokenizer-cost predictor (long-word corpora
    cost more BPE merges per byte). Words and word-chars derive from
    integer space counts (words = spaces + 1 on single-space text), so
    everything is exact until the one final division; map-only over
    documents, the text column never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    spaces = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit(" "))
    )
    per_doc = d.select(
        "source",
        "n_chars",
        (spaces + 1).alias("words"),
        (F.col("n_chars") - spaces).alias("word_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("words").cast("bigint").alias("n_words"),
            F.round(F.sum("word_chars") / F.sum("words"), 6).alias(
                "avg_word_chars"
            ),
        )
        .orderBy("source")
    )


ORACLE_DOC_WORD_STATS = """
WITH per_doc AS (
  SELECT source, n_chars,
         length(text) - length(replace(text, ' ', '')) AS spaces
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(spaces + 1) AS BIGINT) AS n_words,
       round(sum(n_chars - spaces) * 1.0 / sum(spaces + 1), 6)
         AS avg_word_chars
FROM per_doc GROUP BY 1 ORDER BY 1
"""

QUERIES["doc_word_stats"] = q_doc_word_stats
ORACLES["doc_word_stats"] = ORACLE_DOC_WORD_STATS


def q_discount_elasticity(spark, sf_dir):
    """Quantity-vs-discount linear fit per return flag (regr_slope /
    intercept / r²) — does a deeper discount actually move volume?
    Pure JVM-side regression aggregates (one map-side-combinable
    shuffle on a 3-value key); the same moments DuckDB's regr_*
    computes."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.col("l_quantity").cast("double")
    x = F.col("l_discount").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.regr_slope(y, x), 6).alias("qty_per_discount"),
            F.round(F.regr_intercept(y, x), 6).alias("base_qty"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_DISCOUNT_ELASTICITY = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
       round(regr_slope(l_quantity, l_discount), 6) AS qty_per_discount,
       round(regr_intercept(l_quantity, l_discount), 6) AS base_qty,
       round(regr_r2(l_quantity, l_discount), 6) AS r2
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["discount_elasticity"] = q_discount_elasticity
ORACLES["discount_elasticity"] = ORACLE_DISCOUNT_ELASTICITY


def q_text_hapax_ratio(spark, sf_dir):
    """Hapax-legomena share per source — the fraction of vocabulary
    seen exactly once, corpus linguistics' quick health check (too low
    = boilerplate/duplication, too high = OCR noise). One wordcount
    shuffle on hashed (source, term); the ratio reduce is vocab-sized."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") > 0)
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        tf.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("hapax"),
            F.round(
                F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )


ORACLE_TEXT_HAPAX_RATIO = """
WITH tf AS (
  SELECT source, t.term, count(*) AS freq
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) > 0
  GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       round(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS hapax_ratio
FROM tf GROUP BY 1 ORDER BY 1
"""

QUERIES["text_hapax_ratio"] = q_text_hapax_ratio
ORACLES["text_hapax_ratio"] = ORACLE_TEXT_HAPAX_RATIO


def q_bipartite_degree_distribution(spark, sf_dir):
    """Degree distribution of the part↔supplier bipartite graph implied
    by lineitem: how many distinct suppliers ship each part, then the
    histogram of that degree — the graph-shape profile that predicts
    join fan-out. Distinct-pair projection, one exact countDistinct per
    part, then a degree-sized rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    deg = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.groupBy("deg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("deg")
        .select(F.col("deg").cast("bigint").alias("deg"), "n_parts")
    )


ORACLE_BIPARTITE_DEGREE_DISTRIBUTION = """
WITH deg AS (
  SELECT l_partkey, count(*) AS deg
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
  GROUP BY 1
)
SELECT CAST(deg AS BIGINT) AS deg, CAST(count(*) AS BIGINT) AS n_parts
FROM deg GROUP BY 1 ORDER BY 1
"""

QUERIES["bipartite_degree_distribution"] = q_bipartite_degree_distribution
ORACLES["bipartite_degree_distribution"] = ORACLE_BIPARTITE_DEGREE_DISTRIBUTION


def q_revenue_drawdown(spark, sf_dir):
    """Max drawdown of daily order revenue per month — the finance
    lens on demand dips: running peak (unbounded-preceding window over
    the DAILY rollup, ~2.4k rows, never the fact table) minus the day,
    maxed per month. Cents stay integer-exact through the window."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.withColumn(
        "drawdown_cents", F.max("cents").over(w) - F.col("cents")
    )
    return (
        dd.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.round(F.max("drawdown_cents") / 100.0, 6).alias(
                "max_drawdown_usd"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .orderBy("month")
    )


ORACLE_REVENUE_DRAWDOWN = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), dd AS (
  SELECT d, max(cents) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cents
           AS drawdown_cents
  FROM daily
)
SELECT strftime(d, '%Y-%m') AS month,
       round(max(drawdown_cents) / 100.0, 6) AS max_drawdown_usd,
       CAST(count(*) AS BIGINT) AS n_days
FROM dd GROUP BY 1 ORDER BY 1
"""

QUERIES["revenue_drawdown"] = q_revenue_drawdown
ORACLES["revenue_drawdown"] = ORACLE_REVENUE_DRAWDOWN


def q_transition_entropy(spark, sf_dir):
    """Shannon entropy of each event type's NEXT-event distribution —
    how predictable the flow out of each state is (0 = deterministic
    funnel step, ln(k) = uniform chaos). Extends the Markov transition
    matrix with an entropy reduce; transition counts are exact and the
    entropy sums over at most |event_type| terms per row."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    cnt = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = Window.partitionBy("event_type")
    p = F.col("cnt") / F.sum("cnt").over(tot)
    per_edge = cnt.select(
        "event_type", F.col("cnt"), (-p * F.log(p)).alias("term")
    )
    return (
        per_edge.groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_transitions"),
            F.round(F.sum("term"), 6).alias("entropy_nats"),
        )
        .orderBy("event_type")
    )


ORACLE_TRANSITION_ENTROPY = """
WITH pairs AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), cnt AS (
  SELECT event_type, next_type, count(*) AS cnt
  FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2
), withp AS (
  SELECT event_type, cnt,
         cnt * 1.0 / sum(cnt) OVER (PARTITION BY event_type) AS p
  FROM cnt
)
SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_transitions,
       round(sum(-p * ln(p)), 6) AS entropy_nats
FROM withp GROUP BY 1 ORDER BY 1
"""

QUERIES["transition_entropy"] = q_transition_entropy
ORACLES["transition_entropy"] = ORACLE_TRANSITION_ENTROPY


def q_unit_price_dispersion(spark, sf_dir):
    """Unit-price dispersion per brand: each part's realized unit-price
    spread (max − min of extendedprice/quantity across its lineitems),
    averaged over the brand's parts — where pricing discipline is loose.
    Per-line unit prices are identical IEEE doubles in both engines;
    the two-level agg never moves the fact table twice."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    spread = (
        li.select("l_partkey", unit.alias("unit"))
        .groupBy("l_partkey")
        .agg((F.max("unit") - F.min("unit")).alias("spread"))
    )
    return (
        spread.join(F.broadcast(p), spread.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.avg("spread"), 6).alias("avg_unit_price_spread"),
        )
        .orderBy("p_brand")
    )


ORACLE_UNIT_PRICE_DISPERSION = """
WITH spread AS (
  SELECT l_partkey,
         max(l_extendedprice / l_quantity)
         - min(l_extendedprice / l_quantity) AS spread
  FROM lineitem GROUP BY 1
)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       round(avg(spread), 6) AS avg_unit_price_spread
FROM spread JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["unit_price_dispersion"] = q_unit_price_dispersion
ORACLES["unit_price_dispersion"] = ORACLE_UNIT_PRICE_DISPERSION


def q_nation_rank_shift(spark, sf_dir):
    """Year-over-year league table: each nation's revenue rank in 1996
    vs 1997 and the rank delta — who moved, not just who grew (the
    yoy_revenue gate reports values; ranks expose reordering). Ranks
    derive from exact cents with a name tiebreak, so they are
    deterministic in both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.filter(F.year("o_orderdate").isin(1996, 1997))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("y"), "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    w = Window.partitionBy("y").orderBy(F.desc("cents"), "n_name")
    ranked = rev.withColumn("rnk", F.rank().over(w))
    return (
        ranked.groupBy("n_name")
        .agg(
            F.max(F.when(F.col("y") == 1996, F.col("rnk")))
            .cast("bigint")
            .alias("rank_1996"),
            F.max(F.when(F.col("y") == 1997, F.col("rnk")))
            .cast("bigint")
            .alias("rank_1997"),
        )
        .filter(
            F.col("rank_1996").isNotNull() & F.col("rank_1997").isNotNull()
        )
        .select(
            "n_name",
            "rank_1996",
            "rank_1997",
            (F.col("rank_1996") - F.col("rank_1997")).alias("rank_gain"),
        )
        .orderBy("n_name")
    )


ORACLE_NATION_RANK_SHIFT = """
WITH rev AS (
  SELECT year(o_orderdate) AS y, n_name,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2
), ranked AS (
  SELECT y, n_name,
         rank() OVER (PARTITION BY y ORDER BY cents DESC, n_name) AS rnk
  FROM rev
), pivoted AS (
  SELECT n_name,
         CAST(max(CASE WHEN y = 1996 THEN rnk END) AS BIGINT) AS rank_1996,
         CAST(max(CASE WHEN y = 1997 THEN rnk END) AS BIGINT) AS rank_1997
  FROM ranked GROUP BY 1
)
SELECT n_name, rank_1996, rank_1997,
       rank_1996 - rank_1997 AS rank_gain
FROM pivoted
WHERE rank_1996 IS NOT NULL AND rank_1997 IS NOT NULL
ORDER BY n_name
"""

QUERIES["nation_rank_shift"] = q_nation_rank_shift
ORACLES["nation_rank_shift"] = ORACLE_NATION_RANK_SHIFT


def q_order_size_histogram(spark, sf_dir):
    """Order-size profile: lineitems-per-order histogram with the
    average order value per size — basket-size economics (the
    customer_order_distribution gate counts ORDERS per customer; this
    counts LINES per order). Exact cents; two map-side-combinable
    shuffles, orderkey then size."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        ).alias("cents"),
    )
    return (
        per_order.groupBy(F.col("n_lines").cast("bigint").alias("n_lines"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("cents") / F.count(F.lit(1)) / 100.0, 6).alias(
                "avg_order_usd"
            ),
        )
        .orderBy("n_lines")
    )


ORACLE_ORDER_SIZE_HISTOGRAM = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS n_lines,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
)
SELECT CAST(n_lines AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(cents) * 1.0 / count(*) / 100.0, 6) AS avg_order_usd
FROM per_order GROUP BY 1 ORDER BY 1
"""

QUERIES["order_size_histogram"] = q_order_size_histogram
ORACLES["order_size_histogram"] = ORACLE_ORDER_SIZE_HISTOGRAM


def q_session_bounce_rate(spark, sf_dir):
    """Bounce rate by session entry type: 30-minute-gap sessionization,
    then the share of single-event sessions per ENTRY event type — the
    landing-page diagnostic. The session-start flag row IS the entry
    event, so no argmin gymnastics; two windows per user plus a
    session-key agg, all exact counts."""
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
    per_sess = flagged.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("is_start") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
    )
    return (
        per_sess.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("bounces"),
            F.round(
                F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("bounce_rate"),
        )
        .orderBy("entry_type")
    )


ORACLE_SESSION_BOUNCE_RATE = """
WITH flagged AS (
  SELECT user_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > 1800 * 1000000 THEN 1
              WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              ELSE 0 END AS is_start,
         ts, event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_type, is_start,
         sum(is_start) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS sid
  FROM flagged
), per_sess AS (
  SELECT user_id, sid, count(*) AS n_events,
         max(CASE WHEN is_start = 1 THEN event_type END) AS entry_type
  FROM sess GROUP BY 1, 2
)
SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS bounces,
       round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS bounce_rate
FROM per_sess GROUP BY 1 ORDER BY 1
"""

QUERIES["session_bounce_rate"] = q_session_bounce_rate
ORACLES["session_bounce_rate"] = ORACLE_SESSION_BOUNCE_RATE
