"""Driver-gate queries for the streaming-capable operators, evaluated
in their batch form over the events table: sessionization (native
session_window) and Prometheus-``for`` alert state (the
applyInPandasWithState operator's batch twin). The oracles express the
same semantics as SQL gaps-and-islands, so the custom stateful logic
itself sits under the cross-engine gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .streaming.sessions import alert_for_state, assemble_trace_sessions


def q_event_sessions(spark, sf_dir):
    """User sessionization with a 30-minute inactivity gap — the same
    session_window machinery the streaming trace assembler uses
    (assemble_trace_sessions), keyed by user instead of trace."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("session"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("session.start").alias("session_start"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


# gaps-and-islands: a new session starts when the gap from the previous
# event of the same user exceeds 30 minutes
ORACLE_EVENT_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
FROM islands GROUP BY user_id, sid
"""


def q_alert_for(spark, sf_dir):
    """Prometheus ``for:``-duration alert state over hourly event-count
    series per event_type (alert_for_state batch twin): breach when the
    hourly count exceeds the threshold; firing once the breach holds
    two hours."""
    e = load_table(spark, sf_dir, "events")
    series = (
        e.groupBy(
            F.col("event_type").alias("series_key"),
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )
    out = alert_for_state(series, threshold=40.0, for_duration="2 hours")
    return out.select("series_key", "bucket", "value", "state", "active_since")


ORACLE_ALERT_FOR = """
WITH series AS (
  SELECT event_type AS series_key, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
),
marked AS (
  SELECT series_key, bucket, value, value > 40.0 AS breach,
         CASE WHEN (value > 40.0) <> coalesce(
                lag(value > 40.0) OVER (PARTITION BY series_key ORDER BY bucket),
                NOT (value > 40.0))
              THEN 1 ELSE 0 END AS flip
  FROM series
),
runs AS (
  SELECT series_key, bucket, value, breach,
         sum(flip) OVER (PARTITION BY series_key ORDER BY bucket
                         ROWS UNBOUNDED PRECEDING) AS run_id
  FROM marked
),
stated AS (
  SELECT series_key, bucket, value, breach,
         min(bucket) OVER (PARTITION BY series_key, run_id) AS run_start
  FROM runs
)
SELECT series_key, bucket, value,
       CASE WHEN NOT breach THEN 'inactive'
            WHEN epoch(bucket) - epoch(run_start) >= 7200 THEN 'firing'
            ELSE 'pending' END AS state,
       CASE WHEN breach THEN run_start END AS active_since
FROM stated
"""


QUERIES = {
    "event_sessions": q_event_sessions,
    "alert_for": q_alert_for,
}

ORACLES = {
    "event_sessions": ORACLE_EVENT_SESSIONS,
    "alert_for": ORACLE_ALERT_FOR,
}


def q_asof_join(spark, sf_dir):
    """Backward as-of join (temporal.asof_join): each purchase event gets
    the user's nearest click at-or-before it, within a 3-day tolerance.
    One shuffle on user_id via the union/window trick — no range-join
    pair blowup; DuckDB's native ASOF JOIN is the oracle."""
    from .operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(
        purchases, clicks, ["user_id"], tolerance_seconds=3 * 86400,
        direction="backward", right_prefix="click_",
    )
    return out.select(
        "user_id", "ts", F.round("purchase_value", 6).alias("purchase_value"),
        F.col("click_ts"), F.round("click_click_value", 6).alias("click_value"),
    )


ORACLE_ASOF_JOIN = """
WITH purchases AS (
  SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), matched AS (
  SELECT p.user_id, p.ts, p.purchase_value, c.ts AS click_ts, c.click_value
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT user_id, ts, round(purchase_value, 6) AS purchase_value,
       CASE WHEN click_ts >= ts - INTERVAL 3 DAY THEN click_ts END AS click_ts,
       CASE WHEN click_ts >= ts - INTERVAL 3 DAY THEN round(click_value, 6) END AS click_value
FROM matched
"""

QUERIES["asof_join"] = q_asof_join
ORACLES["asof_join"] = ORACLE_ASOF_JOIN


def q_asof_forward(spark, sf_dir):
    """Forward as-of (conversion attribution): each click gets the
    user's NEXT purchase at-or-after it, within 7 days
    (temporal.asof_join direction='forward'). The oracle states the
    semantics declaratively (min-ts qualifying purchase per click) —
    structurally unlike the union/window implementation, so it checks
    the semantics, not the plan."""
    from .operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("click_value"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("purchase_value"))
    )
    out = asof_join(
        clicks, purchases, ["user_id"], tolerance_seconds=7 * 86400,
        direction="forward", right_prefix="conv_",
    )
    return out.select(
        "user_id", "ts", "click_value", F.col("conv_ts"),
        F.col("conv_purchase_value").alias("conv_value"),
    )


ORACLE_ASOF_FORWARD = """
WITH clicks AS (
  SELECT user_id, ts, round(max(value), 6) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), purchases AS (
  SELECT user_id, ts, round(max(value), 6) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), matched AS (
  SELECT c.user_id, c.ts, c.click_value,
         min_by(p.ts, p.ts) AS conv_ts,
         min_by(p.purchase_value, p.ts) AS conv_value
  FROM clicks c LEFT JOIN purchases p
    ON p.user_id = c.user_id AND p.ts >= c.ts
  GROUP BY c.user_id, c.ts, c.click_value
)
SELECT user_id, ts, click_value,
       CASE WHEN conv_ts <= ts + INTERVAL 7 DAY THEN conv_ts END AS conv_ts,
       CASE WHEN conv_ts <= ts + INTERVAL 7 DAY THEN conv_value END AS conv_value
FROM matched
"""

QUERIES["asof_forward"] = q_asof_forward
ORACLES["asof_forward"] = ORACLE_ASOF_FORWARD


def q_asof_join_sliced(spark, sf_dir):
    """The skew-proof time-sliced as-of variant (slice_seconds=2 days)
    under the SAME oracle as asof_join — the scale path must produce
    bit-identical output to the single-window form."""
    from .operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(
        purchases, clicks, ["user_id"], tolerance_seconds=3 * 86400,
        direction="backward", right_prefix="click_", slice_seconds=2 * 86400,
    )
    return out.select(
        "user_id", "ts", F.round("purchase_value", 6).alias("purchase_value"),
        F.col("click_ts"), F.round("click_click_value", 6).alias("click_value"),
    )


QUERIES["asof_join_sliced"] = q_asof_join_sliced
ORACLES["asof_join_sliced"] = ORACLE_ASOF_JOIN


def q_interval_join(spark, sf_dir):
    """Batch interval join (temporal.interval_join): for each purchase,
    all of the same user's clicks in the preceding day, rolled up per
    purchase-day. Bucketed equi-join — one shuffle per side, no
    nested-loop range join."""
    from .operators.temporal import interval_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("c_id")
    )
    j = interval_join(
        purchases, clicks, ["user_id"], "ts", "r_ts",
        before_seconds=86400, after_seconds=0,
    )
    return (
        j.groupBy(
            (F.floor(F.col("ts").cast("double") / 86400) * 86400)
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.count_distinct("p_id").alias("matched_purchases"),
        )
        .orderBy("bucket")
    )


ORACLE_INTERVAL_JOIN = """
WITH p AS (
  SELECT user_id, ts, event_id AS p_id FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts AS r_ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.ts, p.p_id FROM p JOIN c
    ON p.user_id = c.user_id
   AND epoch(c.r_ts) >= epoch(p.ts) - 86400
   AND epoch(c.r_ts) <= epoch(p.ts)
)
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS pairs,
       CAST(count(DISTINCT p_id) AS BIGINT) AS matched_purchases
FROM j GROUP BY 1 ORDER BY 1
"""

QUERIES["interval_join"] = q_interval_join
ORACLES["interval_join"] = ORACLE_INTERVAL_JOIN


def q_event_funnel(spark, sf_dir):
    """Ordered funnel conversion (signup -> first click AFTER signup ->
    first purchase AFTER that click), the product-analytics primitive
    every event pipeline ships (beyond the reference's endpoint set).

    Three per-user min-aggregations chained by ts-after joins — each
    stage shuffles only (user_id, one timestamp), partial-agg friendly;
    no window over the raw event stream."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("s_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("users_signup"),
            F.count("c_ts").cast("long").alias("users_click"),
            F.count("p_ts").cast("long").alias("users_purchase"),
        )
    )


ORACLE_EVENT_FUNNEL = """
WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s.s_ts GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS users_signup,
       CAST(count(c.c_ts) AS BIGINT) AS users_click,
       CAST(count(p.p_ts) AS BIGINT) AS users_purchase
FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""

QUERIES["event_funnel"] = q_event_funnel
ORACLES["event_funnel"] = ORACLE_EVENT_FUNNEL


def q_user_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day as a day offset — the training-data /
    product dual of the funnel. Two partial-agg passes + one join on
    user_id; the matrix is (days x days), tiny."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    act = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("users"))
        .orderBy("cohort_day", "day_offset")
    )


ORACLE_USER_RETENTION = """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
), a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["user_retention"] = q_user_retention
ORACLES["user_retention"] = ORACLE_USER_RETENTION


def q_asof_nearest(spark, sf_dir):
    """direction='nearest' as-of (temporal.asof_nearest — pandas
    merge_asof parity): each purchase gets the CLOSER of the last click
    at-or-before and the first click after, tie preferring backward,
    within a 1-day tolerance. Both frames ride one window pass — still
    a single shuffle on user_id."""
    from .operators.temporal import asof_nearest

    e = load_table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_nearest(
        purchases, clicks, ["user_id"], tolerance_seconds=86400,
        right_prefix="click_",
    )
    return out.select(
        "user_id", "ts", F.round("purchase_value", 6).alias("purchase_value"),
        F.col("click_ts"), F.round("click_click_value", 6).alias("click_value"),
    )


ORACLE_ASOF_NEAREST = """
WITH purchases AS (
  SELECT user_id, ts, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), b AS (
  SELECT p.user_id, p.ts, p.purchase_value, c.ts AS b_ts, c.click_value AS b_v
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
), f AS (
  SELECT p.user_id, p.ts, c.ts AS f_ts, c.click_value AS f_v
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts <= c.ts
), picked AS (
  SELECT b.user_id, b.ts, b.purchase_value,
         CASE WHEN b.b_ts IS NULL THEN f.f_ts
              WHEN f.f_ts IS NULL THEN b.b_ts
              WHEN epoch_us(f.f_ts) - epoch_us(b.ts)
                   < epoch_us(b.ts) - epoch_us(b.b_ts) THEN f.f_ts
              ELSE b.b_ts END AS click_ts,
         CASE WHEN b.b_ts IS NULL THEN f.f_v
              WHEN f.f_ts IS NULL THEN b.b_v
              WHEN epoch_us(f.f_ts) - epoch_us(b.ts)
                   < epoch_us(b.ts) - epoch_us(b.b_ts) THEN f.f_v
              ELSE b.b_v END AS click_value
  FROM b JOIN f ON f.user_id = b.user_id AND f.ts = b.ts
)
SELECT user_id, ts, round(purchase_value, 6) AS purchase_value,
       CASE WHEN abs(epoch_us(click_ts) - epoch_us(ts)) <= 86400000000
            THEN click_ts END AS click_ts,
       CASE WHEN abs(epoch_us(click_ts) - epoch_us(ts)) <= 86400000000
            THEN round(click_value, 6) END AS click_value
FROM picked
"""

QUERIES["asof_nearest"] = q_asof_nearest
ORACLES["asof_nearest"] = ORACLE_ASOF_NEAREST


def q_event_rolling_window(spark, sf_dir):
    """Per-event trailing-1h activity count per user — a RANGE window
    frame on epoch micros (not rows), the time-based frame Spark
    executes natively; one shuffle on user_id."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id", "user_id", "ts",
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing_1h"),
    )


ORACLE_EVENT_ROLLING = """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_trailing_1h
FROM events
"""

QUERIES["event_rolling_window"] = q_event_rolling_window
ORACLES["event_rolling_window"] = ORACLE_EVENT_ROLLING
