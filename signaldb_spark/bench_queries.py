"""The driver-gate query battery: every SURVEY §2 operator expressed over
the benchmark tables, each paired with an ANSI-SQL oracle for DuckDB.

Each query function takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching oracle string computes the same result (same column NAMES and
types — the driver sorts columns by name and hash-compares values).

Conventions for cross-engine determinism:
- time buckets are epoch-seconds longs: ``floor(epoch/step)*step``
  (date_bin semantics, origin = unix epoch — SURVEY §2.4);
- every float output is ``round(x, 6)`` on BOTH sides;
- every ranking/limit has an explicit total tiebreak order;
- counts are int64 on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import timeseries as ts
from .operators import vector_ops as vo

DAY = 86400
R6 = lambda c: F.round(c, 6)

# epoch range of the events table (2024-01-01 .. 2024-01-31), used for
# absent()/spine queries — fixed, not data-dependent, like a user query.
EVENTS_START = 1704067200  # 2024-01-01T00:00:00Z
EVENTS_END = 1706659200    # 2024-01-31T00:00:00Z


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


_BUCKET_SQL = "CAST(floor(epoch(ts) / {step}) * {step} AS BIGINT)"


def _bsql(step=DAY):
    return _BUCKET_SQL.format(step=step)


# ---------------------------------------------------------------------------
# flagship: TPC-H Q1-style pricing summary (scan → filter → agg; the
# generic relational surface the reference gets from DataFusion SQL)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _lineitem(spark, sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            R6(F.sum("l_quantity")).alias("sum_qty"),
            R6(F.sum("l_extendedprice")).alias("sum_base_price"),
            R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            R6(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            R6(F.avg("l_quantity")).alias("avg_qty"),
            R6(F.avg("l_extendedprice")).alias("avg_price"),
            R6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# time-series battery over events (ts, user_id, event_type, value, props)


def q_count_over_time(spark, sf_dir):
    """LogQL count_over_time: bucketed count per series (logs.rs:278-309)."""
    return ts.count_over_time(_events(spark, sf_dir), "ts", DAY, ["event_type"])


ORACLE_COUNT_OVER_TIME = f"""
SELECT {_bsql()} AS bucket, event_type, CAST(count(*) AS DOUBLE) AS value
FROM events GROUP BY 1, 2
"""


def q_rate(spark, sf_dir):
    """LogQL rate = count / range-seconds."""
    m = ts.rate(_events(spark, sf_dir), "ts", DAY, ["event_type"])
    return m.withColumn("value", R6(F.col("value")))


ORACLE_RATE = f"""
SELECT {_bsql()} AS bucket, event_type,
       round(count(*) / {DAY}.0, 6) AS value
FROM events GROUP BY 1, 2
"""


def q_bytes_over_time(spark, sf_dir):
    """bytes_over_time: sum(character_length(body)) (logs.rs:704) — body
    stand-in is the props JSON payload."""
    return ts.bytes_over_time(_events(spark, sf_dir), "ts", DAY, ["event_type"], body_col="props")


ORACLE_BYTES_OVER_TIME = f"""
SELECT {_bsql()} AS bucket, event_type,
       CAST(sum(length(props)) AS DOUBLE) AS value
FROM events GROUP BY 1, 2
"""


def q_unwrap_aggs(spark, sf_dir):
    """Unwrap aggregates sum/avg/min/max_over_time in one pass
    (logs.rs:705-708)."""
    e = _events(spark, sf_dir)
    return (
        ts.with_bucket(e, "ts", DAY)
        .groupBy("bucket", "event_type")
        .agg(
            R6(F.sum("value")).alias("sum_v"),
            R6(F.avg("value")).alias("avg_v"),
            R6(F.min("value")).alias("min_v"),
            R6(F.max("value")).alias("max_v"),
        )
    )


ORACLE_UNWRAP_AGGS = f"""
SELECT {_bsql()} AS bucket, event_type,
       round(sum(value), 6) AS sum_v, round(avg(value), 6) AS avg_v,
       round(min(value), 6) AS min_v, round(max(value), 6) AS max_v
FROM events GROUP BY 1, 2
"""


def q_quantile_over_time(spark, sf_dir):
    """quantile_over_time(0.9, ...) — exact interpolating percentile
    (quantile_cont semantics; reference uses approx_percentile_cont,
    logs.rs:709-711 — we are strictly more accurate)."""
    m = ts.quantile_over_time(_events(spark, sf_dir), "ts", DAY, ["event_type"], "value", 0.9)
    return m.withColumn("value", R6(F.col("value")))


ORACLE_QUANTILE_OVER_TIME = f"""
SELECT {_bsql()} AS bucket, event_type,
       round(quantile_cont(value, 0.9), 6) AS value
FROM events GROUP BY 1, 2
"""


def q_stddev_stdvar(spark, sf_dir):
    """stddev/stdvar_over_time — population, as Prometheus (logs.rs:712)."""
    e = _events(spark, sf_dir)
    return (
        ts.with_bucket(e, "ts", DAY)
        .groupBy("bucket", "event_type")
        .agg(
            R6(F.stddev_pop("value")).alias("stddev_v"),
            R6(F.var_pop("value")).alias("stdvar_v"),
        )
    )


ORACLE_STDDEV_STDVAR = f"""
SELECT {_bsql()} AS bucket, event_type,
       round(stddev_pop(value), 6) AS stddev_v,
       round(var_pop(value), 6) AS stdvar_v
FROM events GROUP BY 1, 2
"""


def q_first_last_over_time(spark, sf_dir):
    """first/last_over_time via min_by/max_by ordered by (ts, value) —
    explicit tiebreak for determinism (logs.rs:715-722)."""
    e = _events(spark, sf_dir)
    return (
        ts.with_bucket(e, "ts", DAY)
        .groupBy("bucket", "event_type")
        .agg(
            F.min_by("value", "ts").alias("first_v"),
            F.max_by("value", "ts").alias("last_v"),
        )
    )


ORACLE_FIRST_LAST = f"""
SELECT {_bsql()} AS bucket, event_type,
       min_by(value, ts) AS first_v,
       max_by(value, ts) AS last_v
FROM events GROUP BY 1, 2
"""


def q_outer_agg(spark, sf_dir):
    """Two-pass aggregation: per-(bucket, event_type, user_id) count,
    then avg across series keeping event_type — the LogQL outer vector
    agg (logql_metric.rs:81-95; logs.rs:311-326)."""
    inner = ts.count_over_time(_events(spark, sf_dir), "ts", DAY, ["event_type", "user_id"])
    outer = ts.outer_aggregate(inner, ["event_type"], "avg")
    return outer.withColumn("value", R6(F.col("value")))


ORACLE_OUTER_AGG = f"""
WITH inner_m AS (
  SELECT {_bsql()} AS bucket, event_type, user_id,
         CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2, 3
)
SELECT bucket, event_type, round(avg(value), 6) AS value
FROM inner_m GROUP BY bucket, event_type
"""


def q_increase(spark, sf_dir):
    """PromQL increase: last - first per (bucket, series), no reset
    correction (metrics.rs:1004-1027)."""
    m = ts.increase(_events(spark, sf_dir), "ts", DAY, ["event_type"], "value")
    return m.withColumn("value", R6(F.col("value")))


ORACLE_INCREASE = f"""
SELECT {_bsql()} AS bucket, event_type,
       round(max_by(value, ts) - min_by(value, ts), 6) AS value
FROM events GROUP BY 1, 2
"""


def q_irate(spark, sf_dir):
    """PromQL irate: last two samples per (bucket, series)
    (metrics.rs:979-1003) — Window lag, in-engine."""
    m = ts.irate(_events(spark, sf_dir), "ts", DAY, ["event_type"], "value")
    return m.withColumn("value", R6(F.col("value")))


ORACLE_IRATE = f"""
WITH b AS (
  SELECT {_bsql()} AS bucket, event_type, ts, value,
         lag(value) OVER w AS prev_v, lag(ts) OVER w AS prev_t,
         row_number() OVER (PARTITION BY {_bsql()}, event_type ORDER BY ts DESC) AS rn
  FROM events
  WINDOW w AS (PARTITION BY {_bsql()}, event_type ORDER BY ts)
)
SELECT bucket, event_type,
       -- epoch_us matches the engine's µs-at-rest precision; raw
       -- epoch() keeps ns and drifts at the 1e-7 level on small dt
       round((value - prev_v) / ((epoch_us(ts) - epoch_us(prev_t)) / 1e6), 6) AS value
FROM b WHERE rn = 1 AND prev_v IS NOT NULL
"""


def q_deriv(spark, sf_dir):
    """PromQL deriv: per-series regression slope vs epoch seconds
    (metrics.rs:967-977)."""
    m = ts.deriv(_events(spark, sf_dir), "ts", DAY, ["event_type"], "value")
    return m.withColumn("value", R6(F.col("value")))


ORACLE_DERIV = f"""
SELECT {_bsql()} AS bucket, event_type,
       round(regr_slope(value, epoch(ts)), 6) AS value
FROM events GROUP BY 1, 2
"""


def q_resets_changes(spark, sf_dir):
    """PromQL resets + changes per bucket (metrics.rs:1279-1440)."""
    e = _events(spark, sf_dir)
    r = ts.resets(e, "ts", DAY, ["event_type"], "value").withColumnRenamed("value", "resets_v")
    c = ts.resets(e, "ts", DAY, ["event_type"], "value", changes_mode=True).withColumnRenamed(
        "value", "changes_v"
    )
    return r.join(c, ["bucket", "event_type"])


ORACLE_RESETS_CHANGES = f"""
WITH b AS (
  SELECT {_bsql()} AS bucket, event_type, value,
         lag(value) OVER (PARTITION BY {_bsql()}, event_type ORDER BY ts) AS prev
  FROM events
)
SELECT bucket, event_type,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END) AS DOUBLE) AS resets_v,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value <> prev THEN 1 ELSE 0 END) AS DOUBLE) AS changes_v
FROM b GROUP BY bucket, event_type
"""


def q_absent(spark, sf_dir):
    """absent(): 1 per empty step bucket over the query range —
    generated spine anti-joined against data (metrics.rs:660-742)."""
    e = _events(spark, sf_dir).filter(F.col("event_type") == "no_such_type")
    m = ts.count_over_time(e, "ts", DAY, [])
    spine = ts.bucket_spine(spark, EVENTS_START, EVENTS_END, DAY)
    return ts.absent(m, spine)


ORACLE_ABSENT = f"""
WITH spine AS (
  SELECT {EVENTS_START} + {DAY} * i AS bucket
  FROM range(0, ({EVENTS_END} - {EVENTS_START}) // {DAY} + 1) t(i)
), present AS (
  SELECT DISTINCT {_bsql()} AS bucket FROM events WHERE event_type = 'no_such_type'
)
SELECT s.bucket, 1.0 AS value
FROM spine s LEFT JOIN present p ON s.bucket = p.bucket
WHERE p.bucket IS NULL
"""


def q_topk_per_bucket(spark, sf_dir):
    """topk(3) series within each time bucket — Window row_number, value
    desc with series-label tiebreak (apply_topk, logs.rs:1305-1364)."""
    inner = ts.count_over_time(_events(spark, sf_dir), "ts", DAY, ["user_id"])
    return ts.topk_per_bucket(inner, 3, ["user_id"])


ORACLE_TOPK = f"""
WITH m AS (
  SELECT {_bsql()} AS bucket, user_id, CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
), r AS (
  SELECT bucket, user_id, value,
         row_number() OVER (PARTITION BY bucket ORDER BY value DESC, user_id ASC) AS rk
  FROM m
)
SELECT bucket, user_id, value FROM r WHERE rk <= 3
"""


def q_bottomk_per_bucket(spark, sf_dir):
    inner = ts.count_over_time(_events(spark, sf_dir), "ts", DAY, ["user_id"])
    return ts.topk_per_bucket(inner, 3, ["user_id"], bottom=True)


ORACLE_BOTTOMK = f"""
WITH m AS (
  SELECT {_bsql()} AS bucket, user_id, CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
), r AS (
  SELECT bucket, user_id, value,
         row_number() OVER (PARTITION BY bucket ORDER BY value ASC, user_id ASC) AS rk
  FROM m
)
SELECT bucket, user_id, value FROM r WHERE rk <= 3
"""


def q_vector_ratio(spark, sf_dir):
    """Vector arithmetic a / b: two matrices inner-joined on (bucket)
    (join_binary logs.rs:988-1015; eval_binary metrics.rs:415-530)."""
    e = _events(spark, sf_dir)
    purchases = ts.count_over_time(e.filter(F.col("event_type") == "purchase"), "ts", DAY, [])
    errors = ts.count_over_time(e.filter(F.col("event_type") == "error"), "ts", DAY, [])
    out = vo.vector_arith(purchases, errors, "/", ["bucket"])
    return out.withColumn("value", R6(F.col("value")))


ORACLE_VECTOR_RATIO = f"""
WITH p AS (
  SELECT {_bsql()} AS bucket, CAST(count(*) AS DOUBLE) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), e AS (
  SELECT {_bsql()} AS bucket, CAST(count(*) AS DOUBLE) AS v
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT p.bucket, round(p.v / e.v, 6) AS value
FROM p JOIN e ON p.bucket = e.bucket
"""


def q_vector_compare(spark, sf_dir):
    """Vector comparison a > b: join + filter left (join_compare,
    logs.rs:1016-1046)."""
    e = _events(spark, sf_dir)
    purchases = ts.count_over_time(e.filter(F.col("event_type") == "purchase"), "ts", DAY, [])
    errors = ts.count_over_time(e.filter(F.col("event_type") == "error"), "ts", DAY, [])
    return vo.vector_compare(purchases, errors, ">", ["bucket"])


ORACLE_VECTOR_COMPARE = f"""
WITH p AS (
  SELECT {_bsql()} AS bucket, CAST(count(*) AS DOUBLE) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), e AS (
  SELECT {_bsql()} AS bucket, CAST(count(*) AS DOUBLE) AS v
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT p.bucket, p.v AS value
FROM p JOIN e ON p.bucket = e.bucket
WHERE p.v > e.v
"""


def q_logical_unless(spark, sf_dir):
    """and/unless set semantics: semi/anti joins on (bucket, labels)
    (join_logical, logs.rs:1050-1095). Users active in purchases UNLESS
    they also erred in the same bucket."""
    e = _events(spark, sf_dir)
    p = ts.count_over_time(e.filter(F.col("event_type") == "purchase"), "ts", DAY, ["user_id"])
    r = ts.count_over_time(e.filter(F.col("event_type") == "error"), "ts", DAY, ["user_id"])
    return vo.vector_logical(p, r, "unless", ["bucket", "user_id"])


ORACLE_LOGICAL_UNLESS = f"""
WITH p AS (
  SELECT {_bsql()} AS bucket, user_id, CAST(count(*) AS DOUBLE) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), r AS (
  SELECT {_bsql()} AS bucket, user_id FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT p.bucket, p.user_id, p.value FROM p
ANTI JOIN r ON p.bucket = r.bucket AND p.user_id = r.user_id
"""


def q_logical_and(spark, sf_dir):
    e = _events(spark, sf_dir)
    p = ts.count_over_time(e.filter(F.col("event_type") == "purchase"), "ts", DAY, ["user_id"])
    r = ts.count_over_time(e.filter(F.col("event_type") == "error"), "ts", DAY, ["user_id"])
    return vo.vector_logical(p, r, "and", ["bucket", "user_id"])


ORACLE_LOGICAL_AND = f"""
WITH p AS (
  SELECT {_bsql()} AS bucket, user_id, CAST(count(*) AS DOUBLE) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), r AS (
  SELECT {_bsql()} AS bucket, user_id FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT p.bucket, p.user_id, p.value FROM p
SEMI JOIN r ON p.bucket = r.bucket AND p.user_id = r.user_id
"""


def q_count_values(spark, sf_dir):
    """count_values: count series per distinct (rounded) value per bucket
    (metrics.rs:1910-1949)."""
    e = _events(spark, sf_dir)
    m = e.select(ts.bucket("ts", DAY).alias("bucket"), F.round(F.col("value"), -1).alias("value"))
    return ts.count_values(m)


ORACLE_COUNT_VALUES = f"""
SELECT {_bsql()} AS bucket, round(value, -1) AS value,
       CAST(count(*) AS DOUBLE) AS count
FROM events GROUP BY 1, 2
"""


def q_scalar_value_ops(spark, sf_dir):
    """PromQL ValueOps chain: clamp(sqrt(abs(v)), 2, 9) and scalar
    arithmetic v*2+1 (metrics.rs:2471-2543; logs.rs:743-757)."""
    m = ts.increase(_events(spark, sf_dir), "ts", DAY, ["event_type"], "value")
    m = vo.apply_value_op(m, "abs")
    m = vo.apply_value_op(m, "sqrt")
    m = vo.apply_value_op(m, "clamp", 2.0, 9.0)
    m = vo.scalar_arith(m, "*", 2.0)
    m = vo.scalar_arith(m, "+", 1.0)
    return m.withColumn("value", R6(F.col("value")))


ORACLE_SCALAR_VALUE_OPS = f"""
WITH m AS (
  SELECT {_bsql()} AS bucket, event_type,
         max_by(value, ts) - min_by(value, ts) AS value
  FROM events GROUP BY 1, 2
)
SELECT bucket, event_type,
       round(least(greatest(sqrt(abs(value)), 2.0), 9.0) * 2.0 + 1.0, 6) AS value
FROM m
"""


def q_label_replace(spark, sf_dir):
    """label_replace: anchored regex capture into a new label column
    (apply_label_replace, logs.rs:1096-1188)."""
    m = ts.count_over_time(_events(spark, sf_dir), "ts", DAY, ["event_type"])
    return vo.label_replace(m, "kind", "$1!", "event_type", "(pur|err).*")


ORACLE_LABEL_REPLACE = f"""
WITH m AS (
  SELECT {_bsql()} AS bucket, event_type, CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
)
SELECT bucket, event_type, value,
       CASE WHEN regexp_full_match(event_type, '(?:(pur|err).*)')
            THEN nullif(regexp_replace(event_type, '^(?:(pur|err).*)$', '\\1!'), '')
            ELSE NULL END AS kind
FROM m
"""


def q_calendar(spark, sf_dir):
    """Calendar extraction functions (metrics.rs:1991-2045): hour-of-day
    and ISO day-of-week profile of event volume."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.hour("ts").cast("long").alias("hod"),
            (((F.dayofweek("ts") + 5) % 7) + 1).cast("long").alias("isodow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_CALENDAR = """
SELECT CAST(hour(ts) AS BIGINT) AS hod, CAST(isodow(ts) AS BIGINT) AS isodow,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_sliding_subquery(spark, sf_dir):
    """PromQL subquery sliding reduce: daily buckets re-aggregated over a
    trailing 3-day window at 1-day resolution (eval_subquery,
    metrics.rs:829-908) — spine band-join, in-engine."""
    inner = ts.count_over_time(_events(spark, sf_dir), "ts", DAY, [])
    spine = ts.bucket_spine(spark, EVENTS_START, EVENTS_END, DAY)
    out = ts.sliding_reduce(inner, spine, 3 * DAY, "sum")
    return out.withColumn("value", R6(F.col("value")))


ORACLE_SLIDING_SUBQUERY = f"""
WITH inner_m AS (
  SELECT {_bsql()} AS bucket, CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1
), spine AS (
  SELECT {EVENTS_START} + {DAY} * i AS bucket
  FROM range(0, ({EVENTS_END} - {EVENTS_START}) // {DAY} + 1) t(i)
)
SELECT s.bucket, round(sum(m.value), 6) AS value
FROM spine s JOIN inner_m m
  ON m.bucket > s.bucket - {3 * DAY} AND m.bucket <= s.bucket
GROUP BY s.bucket
"""


# ---------------------------------------------------------------------------
# registry

QUERIES = {
    "pricing_summary": q_pricing_summary,
    "count_over_time": q_count_over_time,
    "rate": q_rate,
    "bytes_over_time": q_bytes_over_time,
    "unwrap_aggs": q_unwrap_aggs,
    "quantile_over_time": q_quantile_over_time,
    "stddev_stdvar": q_stddev_stdvar,
    "first_last_over_time": q_first_last_over_time,
    "outer_agg": q_outer_agg,
    "increase": q_increase,
    "irate": q_irate,
    "deriv": q_deriv,
    "resets_changes": q_resets_changes,
    "absent": q_absent,
    "topk_per_bucket": q_topk_per_bucket,
    "bottomk_per_bucket": q_bottomk_per_bucket,
    "vector_ratio": q_vector_ratio,
    "vector_compare": q_vector_compare,
    "logical_unless": q_logical_unless,
    "logical_and": q_logical_and,
    "count_values": q_count_values,
    "scalar_value_ops": q_scalar_value_ops,
    "label_replace": q_label_replace,
    "calendar": q_calendar,
    "sliding_subquery": q_sliding_subquery,
}

ORACLES = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "count_over_time": ORACLE_COUNT_OVER_TIME,
    "rate": ORACLE_RATE,
    "bytes_over_time": ORACLE_BYTES_OVER_TIME,
    "unwrap_aggs": ORACLE_UNWRAP_AGGS,
    "quantile_over_time": ORACLE_QUANTILE_OVER_TIME,
    "stddev_stdvar": ORACLE_STDDEV_STDVAR,
    "first_last_over_time": ORACLE_FIRST_LAST,
    "outer_agg": ORACLE_OUTER_AGG,
    "increase": ORACLE_INCREASE,
    "irate": ORACLE_IRATE,
    "deriv": ORACLE_DERIV,
    "resets_changes": ORACLE_RESETS_CHANGES,
    "absent": ORACLE_ABSENT,
    "topk_per_bucket": ORACLE_TOPK,
    "bottomk_per_bucket": ORACLE_BOTTOMK,
    "vector_ratio": ORACLE_VECTOR_RATIO,
    "vector_compare": ORACLE_VECTOR_COMPARE,
    "logical_unless": ORACLE_LOGICAL_UNLESS,
    "logical_and": ORACLE_LOGICAL_AND,
    "count_values": ORACLE_COUNT_VALUES,
    "scalar_value_ops": ORACLE_SCALAR_VALUE_OPS,
    "label_replace": ORACLE_LABEL_REPLACE,
    "calendar": ORACLE_CALENDAR,
    "sliding_subquery": ORACLE_SLIDING_SUBQUERY,
}


def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score anomaly flags: each hourly count scored
    against its own series' mean/stddev (the static baseline behind
    every 'unusual traffic' alert). One partial-agg groupBy to hourly
    counts, then a window over the tiny per-series rollup — the raw
    stream never enters the window."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long").alias("bucket"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("event_type")
    mean, sd = F.avg("cnt").over(w), F.stddev_pop("cnt").over(w)
    z = (F.col("cnt") - mean) / sd
    return hourly.select(
        "bucket", "event_type", "cnt",
        F.round(z, 6).alias("zscore"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


ORACLE_ZSCORE_ANOMALY = """
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
         event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT bucket, event_type, cnt,
       round((cnt - avg(cnt) OVER (PARTITION BY event_type))
             / stddev_pop(cnt) OVER (PARTITION BY event_type), 6) AS zscore,
       abs((cnt - avg(cnt) OVER (PARTITION BY event_type))
           / stddev_pop(cnt) OVER (PARTITION BY event_type)) > 2.0 AS is_anomaly
FROM hourly
"""

QUERIES["zscore_anomaly"] = q_zscore_anomaly
ORACLES["zscore_anomaly"] = ORACLE_ZSCORE_ANOMALY


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series: each sample weighted by its
    holding time until the next sample (the gauge-average TimescaleDB
    calls time_weight 'LOCF'); the final sample carries no interval.
    One window (lead) + one agg, both on the series key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros("ts")).over(w)
    dur = (nxt - F.unix_micros("ts")).cast("double")
    return (
        e.select("event_type", "ts", "event_id", "value", dur.alias("dur"))
        .filter(F.col("dur").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur")) / F.sum("dur"), 6
            ).alias("twa"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .orderBy("event_type")
    )


ORACLE_TIME_WEIGHTED_AVG = """
WITH d AS (
  SELECT event_type, value,
         CAST(lead(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)
              - epoch_us(ts) AS DOUBLE) AS dur
  FROM events
)
SELECT event_type, round(sum(value * dur) / sum(dur), 6) AS twa,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM d WHERE dur IS NOT NULL GROUP BY 1 ORDER BY 1
"""

QUERIES["time_weighted_avg"] = q_time_weighted_avg
ORACLES["time_weighted_avg"] = ORACLE_TIME_WEIGHTED_AVG
