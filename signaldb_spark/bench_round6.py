"""Round-6 staging battery: oracle-gated queries registered AFTER every
other module so they sort past the current never-driver-verified block
— the driver's 50-query prefix this round stays exactly the backlog it
was tuned to prove, and these become fresh evidence next round.

Same conventions as bench_queries (epoch-second buckets, round(x, 6)
floats, BIGINT counts, explicit tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _logs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.col("props").alias("body"),
    )


def q_logql_volume_range(spark, sf_dir):
    """/loki/api/v1/index/volume_range (lowering.index_volume_range):
    per-stream ingested bytes as a daily series."""
    from .logql.lowering import index_volume_range

    return index_volume_range(_logs_view(spark, sf_dir), 86400)


ORACLE_LOGQL_VOLUME_RANGE = """
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       event_type AS service_name,
       CAST(sum(octet_length(CAST(props AS BLOB))) AS BIGINT) AS volume_bytes
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["logql_volume_range"] = q_logql_volume_range
ORACLES["logql_volume_range"] = ORACLE_LOGQL_VOLUME_RANGE


def q_markov_transitions(spark, sf_dir):
    """Per-user event-type transition matrix (the product-analytics
    'user flow' panel): lead() over each user's ordered stream, then
    one (from, to) count with the row-share of each from-state. One
    window on user_id + one tiny agg."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    totals = Window.partitionBy("from_type")
    return (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("transitions"))
        .withColumn(
            "probability",
            F.round(F.col("transitions") / F.sum("transitions").over(totals), 6),
        )
        .orderBy("from_type", "to_type")
    )


ORACLE_MARKOV_TRANSITIONS = """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), counted AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS transitions
  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, transitions,
       round(transitions / sum(transitions) OVER (PARTITION BY from_type), 6)
         AS probability
FROM counted ORDER BY 1, 2
"""

QUERIES["markov_transitions"] = q_markov_transitions
ORACLES["markov_transitions"] = ORACLE_MARKOV_TRANSITIONS


def q_session_funnel(spark, sf_dir):
    """Funnel WITHIN a session: per (user, 30-min session), did a click
    follow a signup and a purchase follow that click — counts per stage
    over all sessions. Sessionization is gaps-and-islands (a new
    session starts after a >30min gap), so the whole operator is two
    windows on user_id + per-session mins; the oracle replays identical
    gaps-and-islands SQL."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = e.select(
        "user_id", "ts", "event_type", "event_id",
        F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .over(w).alias("session_id"),
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts"),
    )
    c = (
        sess.join(per, ["user_id", "session_id"])
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("s_ts")))
        .groupBy("user_id", "session_id").agg(F.min("ts").alias("c_ts"))
    )
    p = (
        sess.join(c, ["user_id", "session_id"])
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")))
        .groupBy("user_id", "session_id").agg(F.min("ts").alias("p_ts"))
    )
    return (
        per.filter(F.col("s_ts").isNotNull())
        .join(c, ["user_id", "session_id"], "left")
        .join(p, ["user_id", "session_id"], "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sessions_signup"),
            F.count("c_ts").cast("long").alias("sessions_click"),
            F.count("p_ts").cast("long").alias("sessions_purchase"),
        )
    )


ORACLE_SESSION_FUNNEL = """
WITH marked AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS session_id
  FROM marked
), per AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
  FROM sess GROUP BY 1, 2
), c AS (
  SELECT s.user_id, s.session_id, min(s.ts) AS c_ts
  FROM sess s JOIN per USING (user_id, session_id)
  WHERE s.event_type = 'click' AND s.ts > per.s_ts GROUP BY 1, 2
), p AS (
  SELECT s.user_id, s.session_id, min(s.ts) AS p_ts
  FROM sess s JOIN c USING (user_id, session_id)
  WHERE s.event_type = 'purchase' AND s.ts > c.c_ts GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS sessions_signup,
       CAST(count(c.c_ts) AS BIGINT) AS sessions_click,
       CAST(count(p.p_ts) AS BIGINT) AS sessions_purchase
FROM per LEFT JOIN c USING (user_id, session_id)
LEFT JOIN p USING (user_id, session_id)
WHERE per.s_ts IS NOT NULL
"""

QUERIES["session_funnel"] = q_session_funnel
ORACLES["session_funnel"] = ORACLE_SESSION_FUNNEL


def q_time_in_state(spark, sf_dir):
    """Per event_type, total seconds users spent 'in' that state (each
    event holds its state until the user's next event — LOCF, the dual
    of time_weighted_avg's interval weighting); last event per user
    carries no interval. One lead() window + one agg."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur_us = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    return (
        e.select(F.col("event_type").alias("state"), dur_us.alias("dur_us"))
        .filter(F.col("dur_us").isNotNull())
        .groupBy("state")
        .agg(
            # exact integer-microsecond sum, one division at the end —
            # summing fractional seconds is order-sensitive at sf0.1
            F.round(F.sum("dur_us") / 1e6, 6).alias("total_seconds"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .orderBy("state")
    )


ORACLE_TIME_IN_STATE = """
WITH d AS (
  SELECT event_type AS state,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          - epoch_us(ts) AS dur_us
  FROM events
)
SELECT state, round(sum(dur_us) / 1e6, 6) AS total_seconds,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM d WHERE dur_us IS NOT NULL GROUP BY 1 ORDER BY 1
"""

QUERIES["time_in_state"] = q_time_in_state
ORACLES["time_in_state"] = ORACLE_TIME_IN_STATE


def q_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the nearest
    PRECEDING non-purchase event's type (the 'channel'), within 7 days
    — purchases with no touch attribute to 'direct'. The as-of union
    trick carries the channel; one shuffle on user_id."""
    from .operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
    )
    touches = (
        e.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("channel"))
    )
    out = asof_join(
        purchases, touches, ["user_id"], tolerance_seconds=7 * 86400,
        direction="backward", right_prefix="t_",
    )
    return (
        out.groupBy(F.coalesce(F.col("t_channel"), F.lit("direct")).alias("channel"))
        .agg(F.count(F.lit(1)).cast("long").alias("purchases"))
        .orderBy("channel")
    )


ORACLE_LAST_TOUCH_ATTRIBUTION = """
WITH purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id, ts, max(event_type) AS channel
  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2
), matched AS (
  SELECT p.event_id,
         CASE WHEN t.ts >= p.ts - INTERVAL 7 DAY THEN t.channel END AS channel
  FROM purchases p ASOF LEFT JOIN touches t
    ON p.user_id = t.user_id AND p.ts >= t.ts
)
SELECT coalesce(channel, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS purchases
FROM matched GROUP BY 1 ORDER BY 1
"""

QUERIES["last_touch_attribution"] = q_last_touch_attribution
ORACLES["last_touch_attribution"] = ORACLE_LAST_TOUCH_ATTRIBUTION


def q_suppliers_sole_blame(spark, sf_dir):
    """TPC-H Q21 shape on the available columns: suppliers whose item
    was the ONLY returned line in a multi-supplier order (EXISTS a
    second supplier in the order, NOT EXISTS another supplier's
    returned line). Both correlated quantifiers become aggregated
    per-order counts joined back — no correlated re-scan, two shuffles
    on the order key."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_order = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    blamed = (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey").distinct()
    )
    return (
        blamed.join(F.broadcast(s), blamed["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


ORACLE_SUPPLIERS_SOLE_BLAME = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
           AS n_ret_supp
  FROM lineitem GROUP BY 1
), blamed AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN per_order p USING (l_orderkey)
  WHERE l.l_returnflag = 'R' AND p.n_supp >= 2 AND p.n_ret_supp = 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
GROUP BY 1 ORDER BY numwait DESC, s_name
"""

QUERIES["suppliers_sole_blame"] = q_suppliers_sole_blame
ORACLES["suppliers_sole_blame"] = ORACLE_SUPPLIERS_SOLE_BLAME


def q_idle_customer_balance(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average positive balance
    and NO completed ('F') orders, grouped by nation. The scalar avg
    rides a broadcast cross join; the NOT EXISTS is a left-anti join on
    the order key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.filter(F.col("o_orderstatus") == "F")
               .select("o_custkey").distinct(),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


ORACLE_IDLE_CUSTOMER_BALANCE = """
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 6) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY 1 ORDER BY 1
"""

QUERIES["idle_customer_balance"] = q_idle_customer_balance
ORACLES["idle_customer_balance"] = ORACLE_IDLE_CUSTOMER_BALANCE


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) whose 1996-H1 revenue equals the
    maximum over all suppliers — revenue view + scalar max subquery,
    both one aggregation; the max broadcast-joins back."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(F.col("l_shipdate").between("1996-01-01", "1996-06-30"))
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
  FROM lineitem
  WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-06-30'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""

QUERIES["top_supplier"] = q_top_supplier
ORACLES["top_supplier"] = ORACLE_TOP_SUPPLIER


def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: average yearly revenue that would be lost by
    dropping small orders — lineitems with quantity below 20% of their
    part's average quantity. The correlated per-part avg becomes one
    partial+final agg broadcast back onto the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        l.join(F.broadcast(per_part), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        # exact cents summed, ONE double division at the end — a 4e8
        # double sum is order-sensitive in its last ulp at sf0.1
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                / 700.0, 6,
            ).alias("avg_yearly")
        )
    )


ORACLE_SMALL_QUANTITY_REVENUE = """
SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 700.0, 6)
  AS avg_yearly
FROM lineitem l
WHERE l_quantity < (
  SELECT 0.2 * avg(l_quantity) FROM lineitem i WHERE i.l_partkey = l.l_partkey
)
"""

QUERIES["small_quantity_revenue"] = q_small_quantity_revenue
ORACLES["small_quantity_revenue"] = ORACLE_SMALL_QUANTITY_REVENUE


def q_service_gap_analysis(spark, sf_dir):
    """Heartbeat-loss detection: per stream, the largest gap between
    consecutive events and the count of gaps over 30 minutes — the
    'did this service go quiet' panel. One lead() window per stream +
    one agg."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gap = (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")) / 1e6
    return (
        e.select(F.col("event_type").alias("service"), gap.alias("gap_s"))
        .filter(F.col("gap_s").isNotNull())
        .groupBy("service")
        .agg(
            F.round(F.max("gap_s"), 6).alias("max_gap_s"),
            F.sum((F.col("gap_s") > 1800).cast("long")).cast("long").alias("gaps_over_30m"),
        )
        .orderBy("service")
    )


ORACLE_SERVICE_GAP_ANALYSIS = """
WITH g AS (
  SELECT event_type AS service,
         (lead(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)
          - epoch_us(ts)) / 1e6 AS gap_s
  FROM events
)
SELECT service, round(max(gap_s), 6) AS max_gap_s,
       CAST(sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END) AS BIGINT)
         AS gaps_over_30m
FROM g WHERE gap_s IS NOT NULL GROUP BY 1 ORDER BY 1
"""

QUERIES["service_gap_analysis"] = q_service_gap_analysis
ORACLES["service_gap_analysis"] = ORACLE_SERVICE_GAP_ANALYSIS


def q_percentile_bands(spark, sf_dir):
    """Latency-band panel: exact interpolated p50/p90/p99 of the value
    per stream in ONE sorted-collect aggregation (three quantiles read
    the same per-group sorted array — no triple shuffle)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("event_type").alias("service"))
        .agg(F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("_p"))
        .select(
            "service",
            F.round(F.col("_p")[0], 6).alias("p50"),
            F.round(F.col("_p")[1], 6).alias("p90"),
            F.round(F.col("_p")[2], 6).alias("p99"),
        )
        .orderBy("service")
    )


ORACLE_PERCENTILE_BANDS = """
SELECT event_type AS service,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["percentile_bands"] = q_percentile_bands
ORACLES["percentile_bands"] = ORACLE_PERCENTILE_BANDS


def q_anomaly_mad_events(spark, sf_dir):
    """Robust (median/MAD) anomaly flags on hourly counts — the outlier
    detector that survives the outliers skewing the baseline, the
    robust dual of zscore_anomaly. Hourly partial-agg first; medians
    via two windows over the tiny per-series rollup."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("bucket"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("event_type")
    med = F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cnt)").over(w)
    dev = hourly.withColumn("_med", med).withColumn(
        "_adev", F.abs(F.col("cnt") - F.col("_med"))
    )
    w2 = Window.partitionBy("event_type")
    mad = F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY _adev)").over(w2)
    # a constant series has MAD 0 — no scale to score against; NULL out
    # (ANSI division would error, DuckDB would emit inf)
    score = F.when(
        F.col("_mad") > 0,
        (F.col("cnt") - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")),
    )
    return (
        dev.withColumn("_mad", mad)
        .select(
            "bucket", "event_type", "cnt",
            F.round(score, 6).alias("robust_z"),
            (F.abs(score) > 3.5).alias("is_anomaly"),
        )
    )


ORACLE_ANOMALY_MAD = """
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), med AS (
  SELECT *, median(cnt) OVER (PARTITION BY event_type) AS _med FROM hourly
), dev AS (
  SELECT *, abs(cnt - _med) AS _adev FROM med
), mads AS (
  SELECT *, median(_adev) OVER (PARTITION BY event_type) AS _mad FROM dev
)
SELECT bucket, event_type, cnt,
       round(CASE WHEN _mad > 0 THEN (cnt - _med) / (1.4826 * _mad) END, 6)
         AS robust_z,
       abs(CASE WHEN _mad > 0 THEN (cnt - _med) / (1.4826 * _mad) END) > 3.5
         AS is_anomaly
FROM mads
"""

QUERIES["anomaly_mad_events"] = q_anomaly_mad_events
ORACLES["anomaly_mad_events"] = ORACLE_ANOMALY_MAD


def q_weekday_seasonality(spark, sf_dir):
    """Seasonal baseline: average hourly event count per (day-of-week,
    hour-of-day) cell per stream — the weekly-pattern heatmap anomaly
    baselines subtract. Two partial-agg groupBys, both tiny."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("bucket"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    t = F.timestamp_seconds(F.col("bucket"))
    # ISO day-of-week 1=Mon..7=Sun on both engines
    return (
        hourly.groupBy(
            "event_type",
            F.dayofweek(t).alias("_dow_sun1"),
            F.hour(t).cast("long").alias("hour_of_day"),
        )
        .agg(
            F.round(F.avg("cnt"), 6).alias("avg_hourly_events"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
        .select(
            "event_type",
            (((F.col("_dow_sun1") + 5) % 7) + 1).cast("long").alias("iso_dow"),
            "hour_of_day", "avg_hourly_events", "n_cells",
        )
        .orderBy("event_type", "iso_dow", "hour_of_day")
    )


ORACLE_WEEKDAY_SEASONALITY = """
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(isodow(to_timestamp(bucket)) AS BIGINT) AS iso_dow,
       CAST(hour(to_timestamp(bucket)) AS BIGINT) AS hour_of_day,
       round(avg(cnt), 6) AS avg_hourly_events,
       CAST(count(*) AS BIGINT) AS n_cells
FROM hourly GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

QUERIES["weekday_seasonality"] = q_weekday_seasonality
ORACLES["weekday_seasonality"] = ORACLE_WEEKDAY_SEASONALITY


def _logs_ctx(spark, sf_dir):
    from .logql.lowering import LowerCtx

    e = load_table(spark, sf_dir, "events")
    logs = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit(None).cast("string").alias("severity_text"),
        F.lit(None).cast("string").alias("label_namespace"),
        F.col("props").alias("body"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias(
            "log_attributes"
        ),
    )
    return LowerCtx(spark, logs, "2024-01-01 00:00:00", "2024-02-01 00:00:00", 86400)


def q_logql_bytes_rate(spark, sf_dir):
    """LogQL ``bytes_rate`` (bytes/second over the range) through the
    full parse->lower path."""
    from .logql.lowering import query_metric

    out = query_metric(
        _logs_ctx(spark, sf_dir),
        'sum by (service) (bytes_rate({service=~".+"}[1d]))',
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_LOGQL_BYTES_RATE = """
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       event_type AS service_name,
       round(sum(octet_length(CAST(props AS BLOB))) / 86400.0, 6) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["logql_bytes_rate"] = q_logql_bytes_rate
ORACLES["logql_bytes_rate"] = ORACLE_LOGQL_BYTES_RATE


def q_promql_quantile_by(spark, sf_dir):
    """PromQL OUTER ``quantile(0.9, ...) by (...)`` aggregation across
    series (distinct from quantile_over_time's within-series reduce)."""
    from .promql.lowering import PromCtx, query_range

    e = load_table(spark, sf_dir, "events")
    gauge = e.select(
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("u"), (F.col("user_id") % 20).cast("string")).alias(
            "service_name"
        ),
        F.col("event_type").alias("metric_name"),
        F.col("value"),
    )
    ctx = PromCtx(spark, gauge, None, None,
                  "2024-01-01 00:00:00", "2024-02-01 00:00:00", 86400)
    out = query_range(ctx, 'quantile by (metric_name) (0.9, purchase)')
    return out.select(
        "bucket", "metric_name", F.round("value", 6).alias("value")
    )


ORACLE_PROMQL_QUANTILE_BY = """
WITH latest AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         'purchase' AS metric_name,
         concat('u', user_id % 20) AS series,
         max_by(value, ts) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 3
)
SELECT bucket, metric_name, round(quantile_cont(value, 0.9), 6) AS value
FROM latest GROUP BY 1, 2
"""

QUERIES["promql_quantile_by"] = q_promql_quantile_by
ORACLES["promql_quantile_by"] = ORACLE_PROMQL_QUANTILE_BY


def q_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: the distribution of customers by order count
    (including zero-order customers via the left join) — custdist. One
    outer join + two partial-agg groupBys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_CUSTOMER_ORDER_DISTRIBUTION = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""

QUERIES["customer_order_distribution"] = q_customer_order_distribution
ORACLES["customer_order_distribution"] = ORACLE_CUSTOMER_ORDER_DISTRIBUTION


def q_priority_exists_check(spark, sf_dir):
    """TPC-H Q4 shape: orders counted per priority when at least one
    lineitem shipped after mid-1996 EXISTS — the semi-join count."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    keep = l.filter(F.col("l_shipdate") >= "1996-07-01").select("l_orderkey").distinct()
    return (
        o.join(keep, o["o_orderkey"] == keep["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_PRIORITY_EXISTS_CHECK = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate >= '1996-07-01'
)
GROUP BY 1 ORDER BY 1
"""

QUERIES["priority_exists_check"] = q_priority_exists_check
ORACLES["priority_exists_check"] = ORACLE_PRIORITY_EXISTS_CHECK


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the canonical scan-only filter aggregate —
    discount-band revenue over one ship year; the whole plan is one
    pushed-down scan + partial/final sum."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6)
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


ORACLE_FORECAST_REVENUE = """
SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""

QUERIES["forecast_revenue"] = q_forecast_revenue
ORACLES["forecast_revenue"] = ORACLE_FORECAST_REVENUE


def q_concurrent_sessions(spark, sf_dir):
    """Max concurrent user sessions per day — the classic interval
    sweep: each session (gaps-and-islands, 30-min timeout) emits a +1
    at its start and a -1 after its end; a running sum ordered by time
    gives instantaneous concurrency, maxed per day. Windows only — no
    interval self-join. The sweep input is 2 rows per SESSION (orders
    of magnitude below event volume); the unpartitioned running sum is
    the same global-cumsum shape as pack_sequences — at 100 TB it
    range-partitions on t with per-partition partials + a driver-side
    offset cumsum over the tiny partition totals."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        e.select(
            "user_id", "ts", "event_id",
            F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
            .over(w).alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    deltas = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("d"))
    )
    # starts before ends at the same instant: d DESC makes a session
    # that starts exactly when another ends count as overlapping
    sweep = Window.orderBy(F.col("t"), F.col("d").desc())
    conc = deltas.withColumn("conc", F.sum("d").over(sweep))
    return (
        conc.groupBy(F.to_date("t").alias("day"))
        .agg(F.max("conc").cast("long").alias("max_concurrent"))
        .orderBy("day")
    )


ORACLE_CONCURRENT_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS session_id,
         ts
  FROM marked
), spans AS (
  SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
  FROM sess GROUP BY 1, 2
), deltas AS (
  SELECT s_start AS t, 1 AS d FROM spans
  UNION ALL SELECT s_end, -1 FROM spans
), sweep AS (
  SELECT t, sum(d) OVER (ORDER BY t, d DESC) AS conc FROM deltas
)
SELECT CAST(t AS DATE) AS day, CAST(max(conc) AS BIGINT) AS max_concurrent
FROM sweep GROUP BY 1 ORDER BY 1
"""

QUERIES["concurrent_sessions"] = q_concurrent_sessions
ORACLES["concurrent_sessions"] = ORACLE_CONCURRENT_SESSIONS


def q_user_activity_percentiles(spark, sf_dir):
    """Events-per-user distribution percentiles — the fan-out profile
    that sizes per-key state everywhere else. Partial-agg per user,
    then one exact-percentile fold over the tiny per-user rollup."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("users"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99"),
        F.max("n").cast("long").alias("max_events"),
    )


ORACLE_USER_ACTIVITY_PERCENTILES = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS users,
       round(quantile_cont(n, 0.5), 6) AS p50,
       round(quantile_cont(n, 0.99), 6) AS p99,
       CAST(max(n) AS BIGINT) AS max_events
FROM per_user
"""

QUERIES["user_activity_percentiles"] = q_user_activity_percentiles
ORACLES["user_activity_percentiles"] = ORACLE_USER_ACTIVITY_PERCENTILES


def q_value_histogram(spark, sf_dir):
    """Power-of-two value histogram per stream (the heatmap shape
    trace_metrics_histogram uses, on the events value): the log2 bucket
    of a positive value via the integer bit length of its ceil —
    integer-exact on both engines."""
    e = load_table(spark, sf_dir, "events")
    nonneg = e.filter(F.col("value") > 0)
    le_exp = F.expr("CAST(ceil(log2(ceil(value))) AS BIGINT)")
    return (
        nonneg.groupBy(
            F.col("event_type").alias("service"),
            F.greatest(le_exp, F.lit(0).cast("bigint")).alias("le_exp"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .orderBy("service", "le_exp")
    )


ORACLE_VALUE_HISTOGRAM = """
SELECT event_type AS service,
       greatest(CAST(ceil(log2(ceil(value))) AS BIGINT), 0) AS le_exp,
       CAST(count(*) AS BIGINT) AS count
FROM events WHERE value > 0
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["value_histogram"] = q_value_histogram
ORACLES["value_histogram"] = ORACLE_VALUE_HISTOGRAM


# ---------------------------------------------------- SQL-surface battery
# Grouping-set / pivot / ranking / regression surfaces a reference user
# exercising the SQL endpoint (src/router SQL passthrough) would expect
# from any warehouse engine — each lowered to the native Catalyst
# operator (Expand for rollup/cube, PivotFirst, WindowExec) rather than
# a union-of-groupbys, so at 100 TB one shuffle serves every grouping set.


def q_rollup_revenue(spark, sf_dir):
    """GROUP BY ROLLUP(region, nation) over customer order revenue —
    region subtotals and the grand total ride the SAME single shuffle
    via Catalyst's Expand, not one groupBy per level."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            # exact cents, not a rounded double sum: at sf0.1 the 1e9
            # double sum differs in its last ulp with summation order
            F.sum(cents).cast("long").alias("revenue_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation"),
            "revenue_cents",
            "n_orders",
        )
        .orderBy("region", "nation")
    )


ORACLE_ROLLUP_REVENUE = """
SELECT coalesce(r_name, '(all)') AS region,
       coalesce(n_name, '(all)') AS nation,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY 1, 2
"""

QUERIES["rollup_revenue"] = q_rollup_revenue
ORACLES["rollup_revenue"] = ORACLE_ROLLUP_REVENUE


def q_cube_priority_status(spark, sf_dir):
    """GROUP BY CUBE(priority, status): all four grouping sets from one
    Expand + one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            # exact cents (see rollup_revenue)
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long").alias("revenue_cents"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "n_orders",
            "revenue_cents",
        )
        .orderBy("priority", "status")
    )


ORACLE_CUBE_PRIORITY_STATUS = """
SELECT coalesce(o_orderpriority, '(all)') AS priority,
       coalesce(o_orderstatus, '(all)') AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY 1, 2
"""

QUERIES["cube_priority_status"] = q_cube_priority_status
ORACLES["cube_priority_status"] = ORACLE_CUBE_PRIORITY_STATUS


def q_pivot_status_count(spark, sf_dir):
    """Status-by-priority PIVOT with an explicit value list — Catalyst
    lowers to a single-pass PivotFirst agg (no per-column scan), and the
    explicit list keeps the schema static so the plan never needs the
    distinct-values pre-query that breaks pipelining at scale."""
    o = load_table(spark, sf_dir, "orders")
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pv.select(
        F.col("o_orderpriority").alias("priority"),
        F.coalesce("F", F.lit(0)).cast("bigint").alias("cnt_f"),
        F.coalesce("O", F.lit(0)).cast("bigint").alias("cnt_o"),
        F.coalesce("P", F.lit(0)).cast("bigint").alias("cnt_p"),
    ).orderBy("priority")


ORACLE_PIVOT_STATUS_COUNT = """
SELECT o_orderpriority AS priority,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS cnt_f,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS cnt_o,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS cnt_p
FROM orders GROUP BY 1 ORDER BY 1
"""

QUERIES["pivot_status_count"] = q_pivot_status_count
ORACLES["pivot_status_count"] = ORACLE_PIVOT_STATUS_COUNT


def q_ntile_customer_quartiles(spark, sf_dir):
    """NTILE(4) balance quartiles per market segment (unique c_custkey
    tiebreak makes tile assignment deterministic), then one rollup agg
    per (segment, quartile) — the window shuffles on segment only."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.min("c_acctbal"), 6).alias("min_bal"),
            F.round(F.max("c_acctbal"), 6).alias("max_bal"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"), "quartile",
            "n_customers", "min_bal", "max_bal",
        )
        .orderBy("segment", "quartile")
    )


ORACLE_NTILE_CUSTOMER_QUARTILES = """
WITH t AS (
  SELECT c_mktsegment, c_acctbal,
         ntile(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
SELECT c_mktsegment AS segment, quartile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(min(c_acctbal), 6) AS min_bal,
       round(max(c_acctbal), 6) AS max_bal
FROM t GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ntile_customer_quartiles"] = q_ntile_customer_quartiles
ORACLES["ntile_customer_quartiles"] = ORACLE_NTILE_CUSTOMER_QUARTILES


def q_price_band_cheapest(spark, sf_dir):
    """cume_dist price bands: the cheapest 5% of parts within each
    brand (ties share a cume_dist, so the band edge is value-determined,
    not row-order-determined)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    return (
        p.withColumn("cd", F.cume_dist().over(w))
        .filter(F.col("cd") <= 0.05)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").alias("partkey"),
            F.round("p_retailprice", 6).alias("price"),
        )
        .orderBy("brand", "partkey")
    )


ORACLE_PRICE_BAND_CHEAPEST = """
WITH t AS (
  SELECT p_brand, p_partkey, p_retailprice,
         cume_dist() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS cd
  FROM part
)
SELECT p_brand AS brand, p_partkey AS partkey,
       round(p_retailprice, 6) AS price
FROM t WHERE cd <= 0.05 ORDER BY 1, 2
"""

QUERIES["price_band_cheapest"] = q_price_band_cheapest
ORACLES["price_band_cheapest"] = ORACLE_PRICE_BAND_CHEAPEST


def q_corr_quantity_price(spark, sf_dir):
    """Correlation / least-squares battery per return flag — corr,
    regr_slope, regr_r2 are all ratio statistics, so engine-order float
    drift cancels; one partial+final agg, no window."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        )
        .orderBy("flag")
    )


ORACLE_CORR_QUANTITY_PRICE = """
SELECT l_returnflag AS flag,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["corr_quantity_price"] = q_corr_quantity_price
ORACLES["corr_quantity_price"] = ORACLE_CORR_QUANTITY_PRICE


def q_region_nation_list(spark, sf_dir):
    """listagg/string_agg parity: sorted comma-joined nation list per
    region — collect_list sorted IN-ROW (array_sort) so the agg itself
    stays order-insensitive and shuffle-safe."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        )
        .orderBy("region")
    )


ORACLE_REGION_NATION_LIST = """
SELECT r_name AS region,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(count(*) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["region_nation_list"] = q_region_nation_list
ORACLES["region_nation_list"] = ORACLE_REGION_NATION_LIST


def q_orders_above_segment_avg(spark, sf_dir):
    """Decorrelated scalar subquery: orders beating their customer
    segment's average order value — the per-segment avg is a 5-row agg
    broadcast back onto the fact scan (DuckDB writes it correlated; the
    Spark plan is the decorrelation every optimizer targets)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    seg_avg = oc.groupBy("c_mktsegment").agg(F.avg("o_totalprice").alias("seg_avg"))
    return (
        oc.join(F.broadcast(seg_avg), "c_mktsegment")
        .filter(F.col("o_totalprice") > F.col("seg_avg"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_above"),
            F.round(F.sum("o_totalprice"), 6).alias("above_revenue"),
        )
        .orderBy("segment")
    )


ORACLE_ORDERS_ABOVE_SEGMENT_AVG = """
WITH oc AS (
  SELECT o_totalprice, c_mktsegment
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_above,
       round(sum(o_totalprice), 6) AS above_revenue
FROM oc o
WHERE o_totalprice > (
  SELECT avg(o_totalprice) FROM oc i WHERE i.c_mktsegment = o.c_mktsegment
)
GROUP BY 1 ORDER BY 1
"""

QUERIES["orders_above_segment_avg"] = q_orders_above_segment_avg
ORACLES["orders_above_segment_avg"] = ORACLE_ORDERS_ABOVE_SEGMENT_AVG


# ------------------------------------------- global-join + SRE analytics


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3 suppliers' yearly share of PROMO-part
    revenue sold to EUROPE customers. Five dimension joins — every one
    broadcast (all dims are KB-scale even at 100 TB fact size); the
    share is a ratio, so engine-order float drift cancels."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cust_eur = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("c_custkey")
    )
    supp_nat = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("s_nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")),
               l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_eur), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("s_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


ORACLE_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["market_share"] = q_market_share
ORACLES["market_share"] = ORACLE_MARKET_SHARE


def q_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (sans partsupp): PROMO-part profit per supplier
    nation per year — positive-sum aggregation (round-6-stable), dims
    broadcast, fact shuffles once on the grouping key."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    supp_nat = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    return (
        l.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")),
               l.l_partkey == p.p_partkey)
        .join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp_nat), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("profit")
        )
        .orderBy("nation", "o_year")
    )


ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["product_profit"] = q_product_profit
ORACLES["product_profit"] = ORACLE_PRODUCT_PROFIT


def q_yoy_revenue(spark, sf_dir):
    """Year-over-year revenue growth: the lag/pct-change window runs on
    the EXACT per-year cents rollup (a handful of rows), so the derived
    ratio is bit-identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        # exact cents (see rollup_revenue): the per-year 5e9 double sum
        # is order-sensitive in its last ulp at sf0.1
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("revenue_cents")
    )
    w = Window.orderBy("o_year")
    return (
        yearly.withColumn("prev_revenue_cents",
                          F.lag("revenue_cents").over(w))
        .withColumn(
            "yoy_pct",
            F.round(
                (F.col("revenue_cents") - F.col("prev_revenue_cents"))
                / F.col("prev_revenue_cents"), 6,
            ),
        )
        .orderBy("o_year")
    )


ORACLE_YOY_REVENUE = """
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT o_year, revenue_cents,
       lag(revenue_cents) OVER (ORDER BY o_year) AS prev_revenue_cents,
       round((revenue_cents - lag(revenue_cents) OVER (ORDER BY o_year))
             / CAST(lag(revenue_cents) OVER (ORDER BY o_year) AS DOUBLE), 6)
         AS yoy_pct
FROM yearly ORDER BY o_year
"""

QUERIES["yoy_revenue"] = q_yoy_revenue
ORACLES["yoy_revenue"] = ORACLE_YOY_REVENUE


def q_apdex_score(spark, sf_dir):
    """Apdex (satisfied ≤ 10, tolerating ≤ 40) per event stream from the
    value column as latency — one map-side conditional fold, integer
    counts divided once at the end."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("event_type").alias("service"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("value") <= 10, 1).otherwise(0))
            .cast("bigint").alias("satisfied"),
            F.sum(F.when((F.col("value") > 10) & (F.col("value") <= 40), 1)
                  .otherwise(0)).cast("bigint").alias("tolerating"),
        )
        .withColumn(
            "apdex",
            F.round(
                (F.col("satisfied") + F.col("tolerating") / 2.0) / F.col("n"), 6
            ),
        )
        .orderBy("service")
    )


ORACLE_APDEX_SCORE = """
SELECT event_type AS service,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (value <= 10) AS BIGINT) AS satisfied,
       CAST(count(*) FILTER (value > 10 AND value <= 40) AS BIGINT) AS tolerating,
       round((count(*) FILTER (value <= 10)
              + count(*) FILTER (value > 10 AND value <= 40) / 2.0)
             / count(*), 6) AS apdex
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["apdex_score"] = q_apdex_score
ORACLES["apdex_score"] = ORACLE_APDEX_SCORE


def q_sli_error_budget(spark, sf_dir):
    """Daily SLI error ratio plus the cumulative ratio-to-date — the
    cumulative window runs over the DAILY rollup (integer counts), so
    the running division is exact and the raw stream never enters the
    window state."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint").alias("errors"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("err_ratio", F.round(F.col("errors") / F.col("total"), 6))
        .withColumn(
            "cum_err_ratio",
            F.round(F.sum("errors").over(w) / F.sum("total").over(w), 6),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            "total", "errors", "err_ratio", "cum_err_ratio",
        )
        .orderBy("day")
    )


ORACLE_SLI_ERROR_BUDGET = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS total,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS errors
  FROM events GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day, total, errors,
       round(errors * 1.0 / total, 6) AS err_ratio,
       round(sum(errors) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) * 1.0
             / sum(total) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING),
             6) AS cum_err_ratio
FROM daily ORDER BY day
"""

QUERIES["sli_error_budget"] = q_sli_error_budget
ORACLES["sli_error_budget"] = ORACLE_SLI_ERROR_BUDGET


# --------------------------------------- corpus + embedding diagnostics


def q_dup_rate_by_source(spark, sf_dir):
    """Exact-duplicate rate per corpus source: documents project to
    16-byte md5 digests before the shuffle (text never shuffles), then
    one count-distinct per source."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", F.md5("text").alias("digest"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("digest").cast("bigint").alias("n_unique"),
        )
        .withColumn(
            "dup_rate",
            F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6),
        )
        .orderBy("source")
    )


ORACLE_DUP_RATE_BY_SOURCE = """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 6) AS dup_rate
FROM documents GROUP BY 1 ORDER BY 1
"""

QUERIES["dup_rate_by_source"] = q_dup_rate_by_source
ORACLES["dup_rate_by_source"] = ORACLE_DUP_RATE_BY_SOURCE


def q_embedding_norm_stats(spark, sf_dir):
    """Per-label L2-norm distribution: the norm is a ROW-LOCAL in-order
    fold over the vector (bit-identical across engines), aggregated with
    one partial+final agg — an index-health diagnostic that reads only
    (embedding, label)."""
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    return (
        e.select("label", F.sqrt(sq).alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


ORACLE_EMBEDDING_NORM_STATS = """
WITH t AS (
  SELECT label,
         sqrt(list_sum(list_transform(
             embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(norm), 6) AS avg_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM t GROUP BY 1 ORDER BY 1
"""

QUERIES["embedding_norm_stats"] = q_embedding_norm_stats
ORACLES["embedding_norm_stats"] = ORACLE_EMBEDDING_NORM_STATS


def q_slo_multiwindow_burn(spark, sf_dir):
    """Google-SRE multiwindow burn-rate alert: hours where BOTH the 1h
    error ratio and the trailing-6h ratio burn past 2× a 5% objective.
    Both windows run over the hourly rollup — the raw stream is reduced
    once, then a 6-row sliding frame does the long-window ratio."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint").alias("errors"),
    )
    w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    burn = 2 * 0.05
    return (
        hourly.withColumn("ratio_1h", F.col("errors") / F.col("total"))
        .withColumn("ratio_6h", F.sum("errors").over(w6) / F.sum("total").over(w6))
        .filter((F.col("ratio_1h") > burn) & (F.col("ratio_6h") > burn))
        .select(
            F.col("hour").cast("string").alias("hour"),
            F.round("ratio_1h", 6).alias("ratio_1h"),
            F.round("ratio_6h", 6).alias("ratio_6h"),
        )
        .orderBy("hour")
    )


ORACLE_SLO_MULTIWINDOW_BURN = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS total,
         CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS errors
  FROM events GROUP BY 1
), r AS (
  SELECT hour,
         errors * 1.0 / total AS ratio_1h,
         sum(errors) OVER (ORDER BY hour ROWS 5 PRECEDING) * 1.0
           / sum(total) OVER (ORDER BY hour ROWS 5 PRECEDING) AS ratio_6h
  FROM hourly
)
SELECT CAST(hour AS VARCHAR) AS hour,
       round(ratio_1h, 6) AS ratio_1h,
       round(ratio_6h, 6) AS ratio_6h
FROM r WHERE ratio_1h > 0.1 AND ratio_6h > 0.1 ORDER BY hour
"""

QUERIES["slo_multiwindow_burn"] = q_slo_multiwindow_burn
ORACLES["slo_multiwindow_burn"] = ORACLE_SLO_MULTIWINDOW_BURN


def q_zipf_slope(spark, sf_dir):
    """Zipf's-law fit per language: regr_slope of ln(freq) on ln(rank)
    over the top-200 terms (row_number with term tiebreak). Term counts
    are one groupBy; the regression runs on a 200-row-per-lang rollup."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("lang", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), "term")
    ranked = tf.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 200)
    return (
        ranked.groupBy("lang")
        .agg(
            F.round(
                F.regr_slope(F.log(F.col("freq").cast("double")),
                             F.log(F.col("rank").cast("double"))), 6
            ).alias("zipf_slope"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy("lang")
    )


ORACLE_ZIPF_SLOPE = """
WITH tf AS (
  SELECT lang, t.term, CAST(count(*) AS BIGINT) AS freq
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) > 0
  GROUP BY 1, 2
), ranked AS (
  SELECT lang, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, term) AS rank
  FROM tf
)
SELECT lang,
       round(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 6)
         AS zipf_slope,
       CAST(count(*) AS BIGINT) AS n_terms
FROM ranked WHERE rank <= 200 GROUP BY 1 ORDER BY 1
"""

QUERIES["zipf_slope"] = q_zipf_slope
ORACLES["zipf_slope"] = ORACLE_ZIPF_SLOPE


def q_fano_factor(spark, sf_dir):
    """Burstiness (Fano factor, variance-to-mean of hourly counts) per
    stream — Poisson arrivals sit at 1.0, bursty streams above. Two
    stacked partial+final aggs; the dispersion ratio's float drift
    cancels."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.col("event_type").alias("service"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    return (
        hourly.groupBy("service")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.round(F.var_samp("cnt") / F.avg("cnt"), 6).alias("fano"),
        )
        .orderBy("service")
    )


ORACLE_FANO_FACTOR = """
WITH hourly AS (
  SELECT event_type AS service, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT service, CAST(count(*) AS BIGINT) AS n_hours,
       round(var_samp(cnt) / avg(cnt), 6) AS fano
FROM hourly GROUP BY 1 ORDER BY 1
"""

QUERIES["fano_factor"] = q_fano_factor
ORACLES["fano_factor"] = ORACLE_FANO_FACTOR


# ------------------------------------ round-6 prefix completion (11 more)
# With these the round-6 driver prefix is 50/50 never-sampled queries —
# zero re-proof slots wasted.


def q_array_ops_battery(spark, sf_dir):
    """Higher-order array-function battery over embeddings: filter/
    exists/aggregate/zip_with all run INSIDE codegen on the row's own
    array — map-only, no shuffle until the final 10-row agg."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    pos_cnt = F.size(F.filter(vec, lambda x: x > 0))
    has_big = F.exists(vec, lambda x: x > F.lit(0.9))
    sq_sum = F.aggregate(
        vec, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    rev_dot = F.aggregate(
        F.zip_with(vec, F.reverse(vec),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        e.select("label", pos_cnt.alias("pos"), has_big.alias("big"),
                 sq_sum.alias("sq"), rev_dot.alias("rd"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("pos"), 6).alias("avg_positive"),
            F.sum(F.col("big").cast("int")).cast("bigint").alias("n_with_big"),
            F.round(F.avg(F.sqrt("sq")), 6).alias("avg_norm"),
            F.round(F.avg("rd"), 6).alias("avg_rev_dot"),
        )
        .orderBy("label")
    )


ORACLE_ARRAY_OPS_BATTERY = """
WITH t AS (
  SELECT label,
         len(list_filter(embedding, x -> x > 0)) AS pos,
         len(list_filter(embedding, x -> x > 0.9)) > 0 AS big,
         list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq,
         list_sum(list_transform(
             list_zip(embedding, list_reverse(embedding)),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS rd
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(pos), 6) AS avg_positive,
       CAST(sum(CASE WHEN big THEN 1 ELSE 0 END) AS BIGINT) AS n_with_big,
       round(avg(sqrt(sq)), 6) AS avg_norm,
       round(avg(rd), 6) AS avg_rev_dot
FROM t GROUP BY 1 ORDER BY 1
"""

QUERIES["array_ops_battery"] = q_array_ops_battery
ORACLES["array_ops_battery"] = ORACLE_ARRAY_OPS_BATTERY


def q_json_extract_battery(spark, sf_dir):
    """JSON scalar extraction in the hot path: get_json_object stays in
    codegen (no UDF); typed cast + agg per stream."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy(F.col("event_type").alias("service"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("service")
    )


ORACLE_JSON_EXTRACT_BATTERY = """
WITH t AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type AS service,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_with_k,
       round(avg(k), 6) AS avg_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM t GROUP BY 1 ORDER BY 1
"""

QUERIES["json_extract_battery"] = q_json_extract_battery
ORACLES["json_extract_battery"] = ORACLE_JSON_EXTRACT_BATTERY


def q_fuzzy_prefix_pairs(spark, sf_dir):
    """Edit-distance near-dup: candidate pairs BAND on a cheap blocking
    key (first 12 chars) so levenshtein runs only within buckets — the
    all-pairs blowup is bounded by the largest block, never the corpus.
    Scores the 40-char prefixes; keeps distance <= 8."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("prefix"),
        F.substring("text", 1, 12).alias("block"),
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
            .cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= 8)
        .orderBy("doc_a", "doc_b")
    )


ORACLE_FUZZY_PREFIX_PAIRS = """
WITH d AS (
  SELECT doc_id, substring(text, 1, 40) AS prefix,
         substring(text, 1, 12) AS block
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS dist
FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 8
ORDER BY 1, 2
"""

QUERIES["fuzzy_prefix_pairs"] = q_fuzzy_prefix_pairs
ORACLES["fuzzy_prefix_pairs"] = ORACLE_FUZZY_PREFIX_PAIRS


def q_funnel_conversion_time(spark, sf_dir):
    """Time-to-convert: per user the FIRST signup and the first purchase
    after it; p50/p90 of the conversion lag in seconds. Two per-user
    min-aggs + one tiny percentile pass — the raw stream reduces before
    any ordering."""
    e = load_table(spark, sf_dir, "events")
    signup = e.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    # cast-to-double keeps the fractional microseconds (unix_timestamp
    # truncates to whole seconds; DuckDB epoch() does not)
    lag_s = (F.col("purchase_ts").cast("double")
             - F.col("signup_ts").cast("double"))
    return purch.select(lag_s.alias("lag_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.percentile("lag_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("lag_s", F.lit(0.9)), 6).alias("p90_s"),
    )


ORACLE_FUNNEL_CONVERSION_TIME = """
WITH signup AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1
), conv AS (
  SELECT e.user_id, s.signup_ts, min(e.ts) AS purchase_ts
  FROM events e JOIN signup s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(epoch(purchase_ts) - epoch(signup_ts), 0.5), 6) AS p50_s,
       round(quantile_cont(epoch(purchase_ts) - epoch(signup_ts), 0.9), 6) AS p90_s
FROM conv
"""

QUERIES["funnel_conversion_time"] = q_funnel_conversion_time
ORACLES["funnel_conversion_time"] = ORACLE_FUNNEL_CONVERSION_TIME


def q_cumulative_unique_users(spark, sf_dir):
    """Growth analytics: daily NEW users + the running unique-user
    total. Exact running distinct without window state: a user counts on
    their FIRST-SEEN day (one per-user min), then a cumsum over the tiny
    daily rollup."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("total_users",
                         F.sum("new_users").over(w).cast("bigint"))
        .select(F.col("day").cast("string").alias("day"),
                "new_users", "total_users")
        .orderBy("day")
    )


ORACLE_CUMULATIVE_UNIQUE_USERS = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS day
  FROM events GROUP BY 1
), daily AS (
  SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM first_seen GROUP BY 1
)
SELECT CAST(day AS VARCHAR) AS day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS total_users
FROM daily ORDER BY day
"""

QUERIES["cumulative_unique_users"] = q_cumulative_unique_users
ORACLES["cumulative_unique_users"] = ORACLE_CUMULATIVE_UNIQUE_USERS


def q_pareto_revenue(spark, sf_dir):
    """Pareto/ABC analysis: per market segment, how many customers cover
    80% of revenue. Rank customers by revenue inside the segment, take
    the running share, count rows where the PREVIOUS cumulative share is
    still under 0.8 (so the crossing customer is included)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("rev"), "c_custkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("c_mktsegment")
    ranked = per_cust.withColumn(
        "cum_share", F.sum("rev").over(w) / F.sum("rev").over(tot)
    ).withColumn("share", F.col("rev") / F.sum("rev").over(tot))
    return (
        ranked.filter((F.col("cum_share") - F.col("share")) < 0.8)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_top_customers"),
            F.round(F.max("cum_share"), 6).alias("share_covered"),
        )
        .orderBy("segment")
    )


ORACLE_PARETO_REVENUE = """
WITH per_cust AS (
  SELECT c_mktsegment, c_custkey, sum(o_totalprice) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, rev,
         sum(rev) OVER (PARTITION BY c_mktsegment
                        ORDER BY rev DESC, c_custkey
                        ROWS UNBOUNDED PRECEDING)
           / sum(rev) OVER (PARTITION BY c_mktsegment) AS cum_share,
         rev / sum(rev) OVER (PARTITION BY c_mktsegment) AS share
  FROM per_cust
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_top_customers,
       round(max(cum_share), 6) AS share_covered
FROM ranked WHERE cum_share - share < 0.8
GROUP BY 1 ORDER BY 1
"""

QUERIES["pareto_revenue"] = q_pareto_revenue
ORACLES["pareto_revenue"] = ORACLE_PARETO_REVENUE


def q_weighted_median_price(spark, sf_dir):
    """Quantity-weighted median price per return flag: the price where
    the running quantity crosses half the total — EXACT, via two-phase
    band-then-refine. Prices are near-unique, so a naive per-flag
    cumulative window would sort the whole table in as many partitions
    as there are flags; instead phase 1 cumulates over ~1k price BANDS
    (a partial+final agg plus a tiny window) to locate the crossing
    band + the quantity carried into it, and phase 2 re-scans ONLY that
    band's rows for the exact crossing price. The banding never changes
    the answer — it partitions the same cumulative domain."""
    l = load_table(spark, sf_dir, "lineitem")
    band = (F.floor(F.col("l_extendedprice") / 100)).cast("bigint")
    by_band = l.groupBy(
        F.col("l_returnflag"), band.alias("band")
    ).agg(F.sum("l_quantity").alias("qty"))
    w = Window.partitionBy("l_returnflag").orderBy("band") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("l_returnflag")
    crossing = (
        by_band.withColumn("cum", F.sum("qty").over(w))
        .withColumn("half", F.sum("qty").over(tot) / 2)
        .filter(F.col("cum") >= F.col("half"))
        .groupBy("l_returnflag")
        .agg(
            F.min_by(F.struct("band", "cum", "qty", "half"), "band").alias("x")
        )
        .select(
            F.col("l_returnflag").alias("flag_c"),
            F.col("x.band").alias("band_c"),
            (F.col("x.cum") - F.col("x.qty")).alias("carried"),
            F.col("x.half").alias("half"),
        )
    )
    within = (
        l.join(F.broadcast(crossing),
               (F.col("l_returnflag") == F.col("flag_c"))
               & (band == F.col("band_c")))
        .groupBy("l_returnflag", "l_extendedprice", "carried", "half")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w2 = Window.partitionBy("l_returnflag").orderBy("l_extendedprice") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (
        within.withColumn("cum", F.col("carried") + F.sum("qty").over(w2))
        .filter(F.col("cum") >= F.col("half"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.round(F.min("l_extendedprice"), 6).alias("weighted_median_price"))
        .orderBy("flag")
    )


ORACLE_WEIGHTED_MEDIAN_PRICE = """
WITH by_price AS (
  SELECT l_returnflag, l_extendedprice, sum(l_quantity) AS qty
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, l_extendedprice,
         sum(qty) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(qty) OVER (PARTITION BY l_returnflag) / 2 AS half
  FROM by_price
)
SELECT l_returnflag AS flag,
       round(min(l_extendedprice), 6) AS weighted_median_price
FROM cum WHERE cum >= half GROUP BY 1 ORDER BY 1
"""

QUERIES["weighted_median_price"] = q_weighted_median_price
ORACLES["weighted_median_price"] = ORACLE_WEIGHTED_MEDIAN_PRICE


def q_dense_rank_spenders(spark, sf_dir):
    """dense_rank over revenue BANDS (rounded to 1000s, so ties are
    real): the top-3 bands per segment with the customer count at each
    band — dense ranks don't skip after ties, unlike rank()."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg((F.floor(F.sum("o_totalprice") / 1000) * 1000)
             .cast("bigint").alias("rev_band"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("rev_band"))
    return (
        per_cust.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .groupBy(F.col("c_mktsegment").alias("segment"),
                 F.col("rnk").cast("bigint").alias("rnk"))
        .agg(
            F.max("rev_band").alias("rev_band"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        )
        .orderBy("segment", "rnk")
    )


ORACLE_DENSE_RANK_SPENDERS = """
WITH per_cust AS (
  SELECT c_mktsegment, c_custkey,
         CAST(floor(sum(o_totalprice) / 1000) * 1000 AS BIGINT) AS rev_band
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2
), ranked AS (
  SELECT c_mktsegment, rev_band,
         dense_rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY rev_band DESC) AS rnk
  FROM per_cust
)
SELECT c_mktsegment AS segment, CAST(rnk AS BIGINT) AS rnk,
       max(rev_band) AS rev_band,
       CAST(count(*) AS BIGINT) AS n_customers
FROM ranked WHERE rnk <= 3 GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["dense_rank_spenders"] = q_dense_rank_spenders
ORACLES["dense_rank_spenders"] = ORACLE_DENSE_RANK_SPENDERS


def q_session_duration_stats(spark, sf_dir):
    """Session-duration distribution: gaps-and-islands sessionization
    (30-min gap) per user, then duration percentiles + events/session
    over the small per-session rollup."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = (F.col("ts").cast("double")
           - F.lag(F.col("ts").cast("double")).over(w))
    marked = e.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        (F.max(F.col("ts").cast("double"))
         - F.min(F.col("ts").cast("double"))).alias("dur_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return per_sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(F.percentile("dur_s", F.lit(0.5)), 6).alias("p50_dur_s"),
        F.round(F.percentile("dur_s", F.lit(0.9)), 6).alias("p90_dur_s"),
        F.round(F.avg("n_events"), 6).alias("avg_events"),
    )


ORACLE_SESSION_DURATION_STATS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
), per_sess AS (
  SELECT user_id, sess_id,
         max(epoch(ts)) - min(epoch(ts)) AS dur_s,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       round(quantile_cont(dur_s, 0.5), 6) AS p50_dur_s,
       round(quantile_cont(dur_s, 0.9), 6) AS p90_dur_s,
       round(avg(n_events), 6) AS avg_events
FROM per_sess
"""

QUERIES["session_duration_stats"] = q_session_duration_stats
ORACLES["session_duration_stats"] = ORACLE_SESSION_DURATION_STATS


def q_mode_value_per_group(spark, sf_dir):
    """Statistical mode with an EXPLICIT tiebreak (smallest value wins)
    — mode() builtins leave ties engine-defined, so both sides spell the
    same counts → row_number pipeline."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    counts = (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), "k")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("event_type").alias("service"),
                F.col("k").alias("mode_k"), "cnt")
        .orderBy("service")
    )


ORACLE_MODE_VALUE_PER_GROUP = """
WITH counts AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
  GROUP BY 1, 2
), ranked AS (
  SELECT event_type, k, cnt,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cnt DESC, k) AS rn
  FROM counts
)
SELECT event_type AS service, k AS mode_k, cnt
FROM ranked WHERE rn = 1 ORDER BY 1
"""

QUERIES["mode_value_per_group"] = q_mode_value_per_group
ORACLES["mode_value_per_group"] = ORACLE_MODE_VALUE_PER_GROUP


def q_behavior_cohorts(spark, sf_dir):
    """Behavior cohorts: users grouped by their SET of event types
    (sorted set-agg as the cohort signature) — output is bounded by the
    number of distinct type combinations, not users."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",")
        .alias("types")
    )
    return (
        per_user.groupBy("types")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("types")
    )


ORACLE_BEHAVIOR_COHORTS = """
WITH per_user AS (
  SELECT user_id,
         string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types
  FROM events GROUP BY 1
)
SELECT types, CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["behavior_cohorts"] = q_behavior_cohorts
ORACLES["behavior_cohorts"] = ORACLE_BEHAVIOR_COHORTS
