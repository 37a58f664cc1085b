"""Driver-gate queries through the FULL PromQL pipeline (parse → lower →
execute) over a metrics-shaped view of the events table, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .promql.lowering import PromCtx, query_range

START, END = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
DAY = 86400
_BUCKET = "CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)"


def _metrics_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit("events_value").alias("metric_name"),
        F.col("value"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias("attributes"),
    )


def _ctx(spark, sf_dir):
    return PromCtx(spark, _metrics_view(spark, sf_dir), None, None, START, END, DAY)


def q_promql_last(spark, sf_dir):
    out = query_range(_ctx(spark, sf_dir), "events_value")
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_LAST = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round(max_by(value, ts), 6) AS value
FROM events GROUP BY 1, 2
"""


def q_promql_sum_rate(spark, sf_dir):
    out = query_range(
        _ctx(spark, sf_dir), "sum by (service_name) (rate(events_value[1d]))"
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_SUM_RATE = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round((max_by(value, ts) - min_by(value, ts)) / 86400.0, 6) AS value
FROM events GROUP BY 1, 2
"""


def q_promql_topk_avg(spark, sf_dir):
    out = query_range(
        _ctx(spark, sf_dir), "topk(2, avg by (service_name) (avg_over_time(events_value[1d])))"
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_TOPK_AVG = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         avg(value) AS value
  FROM events GROUP BY 1, 2
), r AS (
  SELECT bucket, service_name, round(value, 6) AS value,
         row_number() OVER (PARTITION BY bucket ORDER BY value DESC, service_name ASC) AS rk
  FROM m
)
SELECT bucket, service_name, value FROM r WHERE rk <= 2
"""


def q_promql_clamp_compare(spark, sf_dir):
    out = query_range(
        _ctx(spark, sf_dir),
        "clamp(max by (service_name) (max_over_time(events_value[1d])), 50, 150) > bool 100",
    )
    return out.select("bucket", "service_name", "value")


ORACLE_PROMQL_CLAMP_COMPARE = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name, max(value) AS value
  FROM events GROUP BY 1, 2
)
SELECT bucket, service_name,
       CASE WHEN least(greatest(value, 50.0), 150.0) > 100.0 THEN 1.0 ELSE 0.0 END AS value
FROM m
"""


def q_promql_attr_matcher(spark, sf_dir):
    """Attribute-map matcher + negation with absent semantics:
    {user!="1"} matches rows whose attribute is absent or != '1'."""
    out = query_range(
        _ctx(spark, sf_dir),
        'sum by (service_name) (count_over_time(events_value{user!="1"}[1d]))',
    )
    return out.select("bucket", "service_name", "value")


ORACLE_PROMQL_ATTR_MATCHER = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       CAST(count(*) AS DOUBLE) AS value
FROM events
WHERE user_id IS NULL OR CAST(user_id AS VARCHAR) <> '1'
GROUP BY 1, 2
"""


QUERIES = {
    "promql_last": q_promql_last,
    "promql_sum_rate": q_promql_sum_rate,
    "promql_topk_avg": q_promql_topk_avg,
    "promql_clamp_compare": q_promql_clamp_compare,
    "promql_attr_matcher": q_promql_attr_matcher,
}

ORACLES = {
    "promql_last": ORACLE_PROMQL_LAST,
    "promql_sum_rate": ORACLE_PROMQL_SUM_RATE,
    "promql_topk_avg": ORACLE_PROMQL_TOPK_AVG,
    "promql_clamp_compare": ORACLE_PROMQL_CLAMP_COMPARE,
    "promql_attr_matcher": ORACLE_PROMQL_ATTR_MATCHER,
}


def _daily_hist(spark, sf_dir):
    """Daily histograms built from raw event samples, bounds 25/50/100/150."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    counts = F.array(
        F.sum(F.when(v <= 25, 1).otherwise(0)),
        F.sum(F.when((v > 25) & (v <= 50), 1).otherwise(0)),
        F.sum(F.when((v > 50) & (v <= 100), 1).otherwise(0)),
        F.sum(F.when((v > 100) & (v <= 150), 1).otherwise(0)),
        F.sum(F.when(v > 150, 1).otherwise(0)),
    )
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("timestamp"))
        .agg(counts.cast("array<double>").alias("bucket_counts"))
        .select(
            "timestamp",
            F.lit("events").alias("service_name"),
            F.lit("latency").alias("metric_name"),
            "bucket_counts",
            F.array(F.lit(25.0), F.lit(50.0), F.lit(100.0), F.lit(150.0)).alias(
                "explicit_bounds"
            ),
        )
    )


def q_promql_histogram_quantile(spark, sf_dir):
    """histogram_quantile(0.9) end-to-end: daily histograms built from
    raw samples (bounds 25/50/100/150), then the engine's posexplode +
    cumulative-window interpolation (metrics.rs:1061-1278, 2363-2418).
    """
    from .promql.ast import VectorSelector
    from .promql.lowering import lower_histogram_quantile

    hist = _daily_hist(spark, sf_dir)
    ctx = PromCtx(spark, None, None, hist, START, END, DAY)
    out = lower_histogram_quantile(ctx, 0.9, VectorSelector("latency"), rate_mode=False)
    return out.select("bucket", F.round("value", 6).alias("value"))


ORACLE_PROMQL_HISTOGRAM_QUANTILE = f"""
WITH h AS (
  SELECT {_BUCKET} AS bucket,
         sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)::DOUBLE AS c1,
         sum(CASE WHEN value > 25 AND value <= 50 THEN 1 ELSE 0 END)::DOUBLE AS c2,
         sum(CASE WHEN value > 50 AND value <= 100 THEN 1 ELSE 0 END)::DOUBLE AS c3,
         sum(CASE WHEN value > 100 AND value <= 150 THEN 1 ELSE 0 END)::DOUBLE AS c4,
         sum(CASE WHEN value > 150 THEN 1 ELSE 0 END)::DOUBLE AS c5
  FROM events GROUP BY 1
),
r AS (SELECT *, 0.9 * (c1 + c2 + c3 + c4 + c5) AS rank FROM h
      WHERE c1 + c2 + c3 + c4 + c5 > 0)
SELECT bucket,
       round(CASE
         WHEN c1 >= rank THEN 0 + (25 - 0) * (rank - 0) / c1
         WHEN c1 + c2 >= rank THEN 25 + (50 - 25) * (rank - c1) / c2
         WHEN c1 + c2 + c3 >= rank THEN 50 + (100 - 50) * (rank - c1 - c2) / c3
         WHEN c1 + c2 + c3 + c4 >= rank THEN 100 + (150 - 100) * (rank - c1 - c2 - c3) / c4
         ELSE 150
       END, 6) AS value
FROM r
"""

QUERIES["promql_histogram_quantile"] = q_promql_histogram_quantile
ORACLES["promql_histogram_quantile"] = ORACLE_PROMQL_HISTOGRAM_QUANTILE


def q_promql_histogram_fraction(spark, sf_dir):
    """histogram_fraction(30, 120, latency): fraction of observations in
    (30, 120] via cumulative interpolation at both endpoints
    (metrics.rs:2420-2454), over the same daily histograms as
    promql_histogram_quantile."""
    from .promql.ast import VectorSelector
    from .promql.lowering import lower_histogram_fraction

    hist = _daily_hist(spark, sf_dir)
    ctx = PromCtx(spark, None, None, hist, START, END, DAY)
    out = lower_histogram_fraction(ctx, 30.0, 120.0, VectorSelector("latency"))
    return out.select("bucket", F.round("value", 6).alias("value"))


# cum(30)  = c1 + c2 * (30-25)/(50-25); cum(120) = c1 + c2 + c3 + c4 * (120-100)/(150-100)
ORACLE_PROMQL_HISTOGRAM_FRACTION = f"""
WITH h AS (
  SELECT {_BUCKET} AS bucket,
         sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)::DOUBLE AS c1,
         sum(CASE WHEN value > 25 AND value <= 50 THEN 1 ELSE 0 END)::DOUBLE AS c2,
         sum(CASE WHEN value > 50 AND value <= 100 THEN 1 ELSE 0 END)::DOUBLE AS c3,
         sum(CASE WHEN value > 100 AND value <= 150 THEN 1 ELSE 0 END)::DOUBLE AS c4,
         sum(CASE WHEN value > 150 THEN 1 ELSE 0 END)::DOUBLE AS c5
  FROM events GROUP BY 1
)
SELECT bucket,
       round(((c1 + c2 + c3 + c4 * 0.4) - (c1 + c2 * 0.2))
             / (c1 + c2 + c3 + c4 + c5), 6) AS value
FROM h
WHERE c1 + c2 + c3 + c4 + c5 > 0
"""

QUERIES["promql_histogram_fraction"] = q_promql_histogram_fraction
ORACLES["promql_histogram_fraction"] = ORACLE_PROMQL_HISTOGRAM_FRACTION


def q_promql_predict_linear(spark, sf_dir):
    """predict_linear(v[1d], 600) through the full pipeline: per-series
    least-squares extrapolation 600s past each bucket's end
    (operators/timeseries.predict_linear; beyond-reference — the
    reference's sequence functions stop at resets/changes,
    promql.rs:1303-1307)."""
    out = query_range(_ctx(spark, sf_dir), "predict_linear(events_value[1d], 600)")
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


# x is centered on the bucket start on both sides: intercept at epoch-sized
# abscissae would amplify slope rounding and break 6-decimal parity.
ORACLE_PROMQL_PREDICT_LINEAR = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         epoch(ts) - floor(epoch(ts) / 86400) * 86400 AS x,
         CAST(value AS DOUBLE) AS v
  FROM events
)
SELECT bucket, service_name,
       round(regr_intercept(v, x) + regr_slope(v, x) * 87000.0, 6) AS value
FROM m GROUP BY bucket, service_name
"""


def q_promql_holt_winters(spark, sf_dir):
    """holt_winters(v[1d], 0.5, 0.5): sequential level/trend smoothing as
    an F.aggregate fold (operators/timeseries.holt_winters); the oracle
    replays the identical recurrence with a recursive CTE. Factors 0.5
    are exactly representable so both engines run bit-identical IEEE
    sequences."""
    out = query_range(_ctx(spark, sf_dir), "holt_winters(events_value[1d], 0.5, 0.5)")
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_HOLT_WINTERS = f"""
WITH RECURSIVE base AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CAST(value AS DOUBLE) AS v, epoch_us(ts) AS tus
  FROM events
), pts AS (
  SELECT bucket, service_name, v,
         row_number() OVER (PARTITION BY bucket, service_name ORDER BY tus, v) AS rn,
         count(*) OVER (PARTITION BY bucket, service_name) AS n
  FROM base
), hw AS (
  SELECT bucket, service_name, n, 1 AS i,
         CAST(0.0 AS DOUBLE) AS s0, v AS s1, CAST(0.0 AS DOUBLE) AS b
  FROM pts WHERE rn = 1
  UNION ALL
  SELECT h.bucket, h.service_name, h.n, h.i + 1,
         h.s1,
         0.5 * p.v + 0.5 * (h.s1 +
           CASE WHEN h.i = 1 THEN p.v - h.s1
                ELSE 0.5 * (h.s1 - h.s0) + 0.5 * h.b END),
         CASE WHEN h.i = 1 THEN p.v - h.s1
              ELSE 0.5 * (h.s1 - h.s0) + 0.5 * h.b END
  FROM hw h JOIN pts p
    ON p.bucket = h.bucket AND p.service_name = h.service_name AND p.rn = h.i + 1
)
SELECT bucket, service_name, round(s1, 6) AS value
FROM hw WHERE i = n AND n >= 2
"""

QUERIES["promql_predict_linear"] = q_promql_predict_linear
QUERIES["promql_holt_winters"] = q_promql_holt_winters
ORACLES["promql_predict_linear"] = ORACLE_PROMQL_PREDICT_LINEAR
ORACLES["promql_holt_winters"] = ORACLE_PROMQL_HOLT_WINTERS


def _daily_hist_count_sum(spark, sf_dir):
    """Histogram-table view carrying the stored count/sum columns
    (storage-layout.md metrics_histogram; schema_transform.rs histogram
    flattener keeps count+sum alongside bucket_counts)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("timestamp"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("count"),
            F.sum("value").cast("double").alias("sum"),
        )
        .select(
            "timestamp",
            F.lit("events").alias("service_name"),
            F.lit("latency").alias("metric_name"),
            "count",
            "sum",
        )
    )


def q_promql_histogram_count_sum(spark, sf_dir):
    """histogram_count + histogram_sum through the full pipeline
    (metrics.rs:1225-1277 scalar path): last stored count/sum per
    bucket, joined into one row per bucket."""
    hist = _daily_hist_count_sum(spark, sf_dir)
    ctx = PromCtx(spark, None, None, hist, START, END, DAY)
    c = query_range(ctx, "histogram_count(latency)").select(
        "bucket", F.col("value").alias("cnt")
    )
    s = query_range(ctx, "histogram_sum(latency)").select(
        "bucket", F.round("value", 6).alias("sm")
    )
    return c.join(s, "bucket")


ORACLE_PROMQL_HISTOGRAM_COUNT_SUM = f"""
SELECT {_BUCKET} AS bucket,
       CAST(count(*) AS DOUBLE) AS cnt,
       round(CAST(sum(value) AS DOUBLE), 6) AS sm
FROM events GROUP BY 1
"""

QUERIES["promql_histogram_count_sum"] = q_promql_histogram_count_sum
ORACLES["promql_histogram_count_sum"] = ORACLE_PROMQL_HISTOGRAM_COUNT_SUM


def q_promql_labels(spark, sf_dir):
    """/api/v1/labels: well-known __name__/job plus every attribute key
    in the window (discovery.prom_labels; metrics.rs:1489-1529)."""
    from .promql.discovery import prom_labels

    return prom_labels(_ctx(spark, sf_dir))


# the metrics view carries exactly one attribute key ('user', present on
# every row because create_map materializes the key even for null values)
ORACLE_PROMQL_LABELS = """
SELECT '__name__' AS label UNION ALL SELECT 'job' UNION ALL SELECT 'user'
"""


def q_promql_label_values(spark, sf_dir):
    """/api/v1/label/user/values: distinct non-empty attribute values,
    sorted, capped (discovery.prom_label_values; metrics.rs:1531-1598)."""
    from .promql.discovery import prom_label_values

    return prom_label_values(_ctx(spark, sf_dir), "user")


ORACLE_PROMQL_LABEL_VALUES = """
SELECT DISTINCT CAST(user_id AS VARCHAR) AS value
FROM events
WHERE user_id IS NOT NULL AND CAST(user_id AS VARCHAR) <> ''
ORDER BY value LIMIT 1000
"""


def q_promql_series(spark, sf_dir):
    """/api/v1/series for events_value{user!="1"}: distinct
    (__name__, job) identities (discovery.prom_series;
    metrics.rs:1599-1646), with the reference's absent-matching
    negation semantics on the attribute matcher."""
    from .promql.discovery import prom_series

    return prom_series(_ctx(spark, sf_dir), 'events_value{user!="1"}')


ORACLE_PROMQL_SERIES = """
SELECT DISTINCT 'events_value' AS "__name__", event_type AS job
FROM events
WHERE (user_id IS NULL OR CAST(user_id AS VARCHAR) <> '1')
  AND event_type IS NOT NULL AND event_type <> ''
ORDER BY 1, 2 LIMIT 1000
"""

QUERIES["promql_labels"] = q_promql_labels
QUERIES["promql_label_values"] = q_promql_label_values
QUERIES["promql_series"] = q_promql_series
ORACLES["promql_labels"] = ORACLE_PROMQL_LABELS
ORACLES["promql_label_values"] = ORACLE_PROMQL_LABEL_VALUES
ORACLES["promql_series"] = ORACLE_PROMQL_SERIES


SPLIT = "2024-01-16 00:00:00"


def q_metrics_rollup_avg(spark, sf_dir):
    """Downsampled long-range read: hourly rollup rows answer
    [START, SPLIT), raw samples answer [SPLIT, END), merged per-day via
    the mergeable count/sum stats — bit-for-equal to aggregating raw
    everywhere because the split lands on a bucket boundary
    (maintenance/rollup.py; beyond-reference continuous aggregate)."""
    from .maintenance.rollup import hybrid_stats, rollup_metrics

    raw = _metrics_view(spark, sf_dir)
    rollup = rollup_metrics(raw.filter(F.col("timestamp") < SPLIT), 3600)
    out = hybrid_stats(raw, rollup, START, END, SPLIT, DAY, 3600)
    # roll series up to service level: sums of counts/sums stay exact
    return (
        out.groupBy("bucket", "service_name")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.round(F.sum("vsum") / F.sum("cnt"), 6).alias("vavg"),
            F.round(F.min("vmin"), 6).alias("vmin"),
            F.round(F.max("vmax"), 6).alias("vmax"),
        )
    )


ORACLE_METRICS_ROLLUP_AVG = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       CAST(count(*) AS BIGINT) AS cnt,
       round(avg(value), 6) AS vavg,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events
WHERE ts >= '2024-01-01' AND ts < '2024-02-01'
GROUP BY 1, 2
"""

QUERIES["metrics_rollup_avg"] = q_metrics_rollup_avg
ORACLES["metrics_rollup_avg"] = ORACLE_METRICS_ROLLUP_AVG


def q_promql_mad(spark, sf_dir):
    """mad_over_time(v[1d]) — median absolute deviation per series per
    bucket (timeseries.mad_over_time): one shuffle; both medians are
    sorted-array expressions over the collected window, interpolated
    exactly like DuckDB's median."""
    out = query_range(_ctx(spark, sf_dir), "mad_over_time(events_value[1d])")
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_MAD = f"""
WITH base AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CAST(value AS DOUBLE) AS v
  FROM events
), med AS (
  SELECT bucket, service_name, median(v) AS m
  FROM base GROUP BY 1, 2
)
SELECT b.bucket, b.service_name, round(median(abs(b.v - m.m)), 6) AS value
FROM base b JOIN med m USING (bucket, service_name)
GROUP BY b.bucket, b.service_name
"""

QUERIES["promql_mad"] = q_promql_mad
ORACLES["promql_mad"] = ORACLE_PROMQL_MAD


def q_exphist_quantile(spark, sf_dir):
    """p90 from OTLP exponential (native) histograms
    (exphist.exphist_quantile) — beyond the reference, which stores
    exp-histograms but cannot query them. The gate synthesizes at-rest
    datapoints (scale 0, zero-threshold 1.0) from events: bucket index
    for integer w = floor(value) is derived from length(bin(w)) —
    integer-exact in both engines, no libm log — and the dense
    positive_bucket_counts array + offset is assembled exactly as the
    ingest flattener lays it out (sources/otlp.py:607-633)."""
    from .operators.exphist import exphist_quantile
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    b = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    v = F.col("value")
    w = F.floor(v).cast("long")
    L = F.length(F.bin(w))
    pow2 = w.bitwiseAND(w - 1) == 0
    i = F.when(pow2, L - 2).otherwise(L - 1).cast("int")
    rows = ev.select(
        b.alias("bucket"),
        F.col("event_type").alias("service_name"),
        (v < 1).alias("_zero"),
        F.when(v >= 1, i).alias("i"),
    )
    pos = (
        rows.filter(~F.col("_zero"))
        .groupBy("bucket", "service_name", "i")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dense = pos.groupBy("bucket", "service_name").agg(
        F.min("i").alias("positive_offset"),
        F.max("i").alias("_mx"),
        F.map_from_entries(F.collect_list(F.struct("i", "c"))).alias("_m"),
    )
    counts = F.transform(
        F.sequence(F.col("positive_offset"), F.col("_mx")),
        lambda k: F.coalesce(F.element_at(F.col("_m"), k), F.lit(0)).cast("long"),
    )
    zeros = rows.groupBy("bucket", "service_name").agg(
        F.sum(F.col("_zero").cast("long")).alias("zero_count")
    )
    atrest = zeros.join(dense, ["bucket", "service_name"], "left").select(
        "bucket", "service_name", F.lit(0).alias("scale"), "zero_count",
        "positive_offset", counts.alias("positive_bucket_counts"),
    )
    out = exphist_quantile(atrest, 0.9, ["bucket", "service_name"])
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_EXPHIST_QUANTILE = f"""
WITH base AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CASE WHEN value < 1 THEN NULL ELSE CAST(floor(value) AS BIGINT) END AS w
  FROM events
), idxed AS (
  SELECT bucket, service_name,
         CASE WHEN w IS NULL THEN NULL
              WHEN (w & (w - 1)) = 0 THEN length(bin(w)) - 2
              ELSE length(bin(w)) - 1 END AS i
  FROM base
), zeros AS (
  SELECT bucket, service_name,
         CAST(count(*) FILTER (WHERE i IS NULL) AS DOUBLE) AS z,
         CAST(count(*) AS DOUBLE) AS total
  FROM idxed GROUP BY 1, 2
), cnts AS (
  SELECT bucket, service_name, i, CAST(count(*) AS DOUBLE) AS c
  FROM idxed WHERE i IS NOT NULL GROUP BY 1, 2, 3
), cum AS (
  SELECT bucket, service_name, i, c,
         sum(c) OVER (PARTITION BY bucket, service_name ORDER BY i) AS cum
  FROM cnts
), pick AS (
  SELECT z.bucket, z.service_name,
         min_by(m.i, m.i) AS pi, min_by(m.c, m.i) AS pc, min_by(m.cum, m.i) AS pcum
  FROM zeros z JOIN cum m USING (bucket, service_name)
  WHERE z.z + m.cum >= 0.9 * z.total
  GROUP BY 1, 2
)
SELECT z.bucket, z.service_name,
  round(CASE WHEN z.total <= 0 THEN NULL
             WHEN 0.9 * z.total <= z.z THEN 0.0
             ELSE power(2.0, p.pi)
                  + (power(2.0, p.pi + 1) - power(2.0, p.pi))
                    * (0.9 * z.total - (z.z + p.pcum - p.pc)) / p.pc END, 6) AS value
FROM zeros z LEFT JOIN pick p USING (bucket, service_name)
"""

QUERIES["exphist_quantile"] = q_exphist_quantile
ORACLES["exphist_quantile"] = ORACLE_EXPHIST_QUANTILE


def q_summary_quantile(spark, sf_dir):
    """Summary-metric read-back (summary.summary_quantile) — the
    reference stores summary datapoints but can't query them. The gate
    synthesizes per-series anchors [(0, min), (0.5, median), (1, max)]
    from events (identically in the oracle) and reads back p75: linear
    interpolation between the 0.5 and 1.0 anchors."""
    from .operators.summary import summary_quantile
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    b = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    dp = (
        ev.select(b.alias("bucket"), F.col("event_type").alias("service_name"),
                  "ts", F.col("value").cast("double").alias("v"))
        .groupBy("bucket", "service_name")
        .agg(
            F.max("ts").alias("timestamp"),
            F.array(
                F.struct(F.lit(0.0).alias("quantile"), F.min("v").alias("value")),
                F.struct(F.lit(0.5).alias("quantile"),
                         F.percentile("v", F.lit(0.5)).alias("value")),
                F.struct(F.lit(1.0).alias("quantile"), F.max("v").alias("value")),
            ).alias("quantile_values"),
        )
    )
    out = summary_quantile(dp, 0.75, ["bucket", "service_name"])
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_SUMMARY_QUANTILE = f"""
WITH anchors AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         min(value) AS v0, median(value) AS v50, max(value) AS v100
  FROM events GROUP BY 1, 2
)
SELECT bucket, service_name,
       round(v50 + (v100 - v50) * (0.75 - 0.5) / (1.0 - 0.5), 6) AS value
FROM anchors
"""

QUERIES["summary_quantile"] = q_summary_quantile
ORACLES["summary_quantile"] = ORACLE_SUMMARY_QUANTILE


def q_label_stats(spark, sf_dir):
    """/prometheus/api/v1/label_stats read-back (jobs.attribute_stats,
    exact mode): per-attribute presence + cardinality + presence ratio.
    The view plants one always-present key and one conditional key so
    the ratio differs per key."""
    from .maintenance.jobs import attribute_stats
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    view = ev.select(
        F.map_filter(
            F.create_map(
                F.lit("user"), F.col("user_id").cast("string"),
                F.lit("hot"), F.when(F.col("value") > 100, F.lit("y")),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("attributes")
    )
    return attribute_stats(view, "attributes", exact=True).orderBy("key")


ORACLE_LABEL_STATS = """
WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events)
SELECT 'hot' AS key, CAST(count(*) AS BIGINT) AS presence,
       CAST(1 AS BIGINT) AS cardinality,
       round(count(*) / (SELECT CAST(total AS DOUBLE) FROM t), 6) AS presence_ratio
FROM events WHERE value > 100
UNION ALL
SELECT 'user', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT CAST(user_id AS VARCHAR)) AS BIGINT),
       round(count(*) / (SELECT CAST(total AS DOUBLE) FROM t), 6)
FROM events WHERE user_id IS NOT NULL
ORDER BY key
"""

QUERIES["label_stats"] = q_label_stats
ORACLES["label_stats"] = ORACLE_LABEL_STATS


def q_recording_rule_eval(spark, sf_dir):
    """Recording-rule evaluation (rules.evaluate_rule): a PromQL
    aggregation reshaped into the metrics_gauge at-rest layout under the
    recorded name — the pure evaluate+reshape half of record_rule (the
    idempotent append half is e2e-tested)."""
    from .promql.rules import evaluate_rule

    out = evaluate_rule(
        _ctx(spark, sf_dir), "sum by (service_name) (events_value)", "svc:events:sum"
    )
    return out.select(
        "timestamp", "service_name", "metric_name",
        F.round("value", 6).alias("value"), "date_day", "hour",
    )


ORACLE_RECORDING_RULE_EVAL = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         max_by(value, ts) AS value
  FROM events GROUP BY 1, 2
)
SELECT CAST(to_timestamp(bucket) AS TIMESTAMP) AS timestamp, service_name,
       'svc:events:sum' AS metric_name, round(value, 6) AS value,
       CAST(CAST(to_timestamp(bucket) AS TIMESTAMP) AS DATE) AS date_day,
       CAST(hour(CAST(to_timestamp(bucket) AS TIMESTAMP)) AS INT) AS hour
FROM m
"""

QUERIES["recording_rule_eval"] = q_recording_rule_eval
ORACLES["recording_rule_eval"] = ORACLE_RECORDING_RULE_EVAL


def q_exphist_quantile_signed(spark, sf_dir):
    """Median over a SIGNED exponential histogram (negative buckets +
    zero bucket + positive buckets): observations w = floor(value) - 250
    put roughly half the mass below zero, so the φ=0.5 walk exercises
    the negative side and the zero-gap short-circuit. Bucket indexes are
    the integer-exact length(bin(|w|)) construction; the at-rest rows
    carry BOTH dense sides exactly as the ingest flattener lays them
    out."""
    from .operators.exphist import exphist_quantile
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    b = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    w = (F.floor("value") - 250).cast("long")
    aw = F.abs(w)
    L = F.length(F.bin(aw))
    pow2 = aw.bitwiseAND(aw - 1) == 0
    i = F.when(pow2, L - 2).otherwise(L - 1).cast("int")
    rows = ev.select(
        b.alias("bucket"),
        F.col("event_type").alias("service_name"),
        (w == 0).alias("_zero"),
        F.when(w > 0, F.lit(1)).when(w < 0, F.lit(-1)).alias("side"),
        F.when(w != 0, i).alias("i"),
    )

    # Both signed sides share the |w|-keyed index domain, so ONE
    # (bucket, service, i) aggregation with per-side conditional counts
    # replaces the two side-filtered _dense passes and one of the two
    # left joins (r12: 2 scans → 1). Null offsets propagate through
    # sequence/transform exactly like the former left-join nulls.
    pos = (
        rows.filter(F.col("side").isNotNull())
        .groupBy("bucket", "service_name", "i")
        .agg(
            F.count(F.when(F.col("side") == 1, 1)).alias("c_p"),
            F.count(F.when(F.col("side") == -1, 1)).alias("c_n"),
        )
    )
    d = pos.groupBy("bucket", "service_name").agg(
        F.min(F.when(F.col("c_p") > 0, F.col("i"))).alias("_p_off"),
        F.max(F.when(F.col("c_p") > 0, F.col("i"))).alias("_p_mx"),
        F.min(F.when(F.col("c_n") > 0, F.col("i"))).alias("_n_off"),
        F.max(F.when(F.col("c_n") > 0, F.col("i"))).alias("_n_mx"),
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("i").alias("k"),
                    F.struct(
                        F.col("c_p").alias("p"), F.col("c_n").alias("n")
                    ).alias("v"),
                )
            )
        ).alias("_m"),
    )

    def _counts(off, mx, field):
        return F.transform(
            F.sequence(off, mx),
            lambda k: F.coalesce(
                F.element_at(F.col("_m"), k)[field], F.lit(0)
            ).cast("long"),
        )

    sides = d.select(
        "bucket", "service_name",
        "_p_off", _counts(F.col("_p_off"), F.col("_p_mx"), "p").alias("_p_counts"),
        "_n_off", _counts(F.col("_n_off"), F.col("_n_mx"), "n").alias("_n_counts"),
    )
    zeros = rows.groupBy("bucket", "service_name").agg(
        F.sum(F.col("_zero").cast("long")).alias("zero_count")
    )
    atrest = (
        zeros.join(sides, ["bucket", "service_name"], "left")
        .select(
            "bucket", "service_name", F.lit(0).alias("scale"), "zero_count",
            F.col("_p_off").alias("positive_offset"),
            F.col("_p_counts").alias("positive_bucket_counts"),
            F.col("_n_off").alias("negative_offset"),
            F.col("_n_counts").alias("negative_bucket_counts"),
        )
    )
    out = exphist_quantile(atrest, 0.5, ["bucket", "service_name"])
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_EXPHIST_SIGNED = f"""
WITH base AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CAST(floor(value) AS BIGINT) - 250 AS w
  FROM events
), idxed AS (
  SELECT bucket, service_name,
         CASE WHEN w > 0 THEN 1 WHEN w < 0 THEN -1 ELSE 0 END AS side,
         CASE WHEN w = 0 THEN NULL
              WHEN (abs(w) & (abs(w) - 1)) = 0 THEN length(bin(abs(w))) - 2
              ELSE length(bin(abs(w))) - 1 END AS i
  FROM base
), tot AS (
  SELECT bucket, service_name,
         CAST(count(*) FILTER (WHERE side = 0) AS DOUBLE) AS z,
         CAST(count(*) FILTER (WHERE side = -1) AS DOUBLE) AS neg_total,
         CAST(count(*) AS DOUBLE) AS total
  FROM idxed GROUP BY 1, 2
), cnts AS (
  SELECT bucket, service_name, side, i, CAST(count(*) AS DOUBLE) AS c
  FROM idxed WHERE side != 0 GROUP BY 1, 2, 3, 4
), ncum AS (
  SELECT bucket, service_name, i, c,
         sum(c) OVER (PARTITION BY bucket, service_name ORDER BY i DESC) AS cum
  FROM cnts WHERE side = -1
), pcum AS (
  SELECT bucket, service_name, i, c,
         sum(c) OVER (PARTITION BY bucket, service_name ORDER BY i) AS cum
  FROM cnts WHERE side = 1
), npick AS (
  SELECT t.bucket, t.service_name,
         max_by(n.i, n.i) AS pi, max_by(n.c, n.i) AS pc, max_by(n.cum, n.i) AS pcum
  FROM tot t JOIN ncum n USING (bucket, service_name)
  WHERE n.cum >= 0.5 * t.total
  GROUP BY 1, 2
), ppick AS (
  SELECT t.bucket, t.service_name,
         min_by(p.i, p.i) AS pi, min_by(p.c, p.i) AS pc, min_by(p.cum, p.i) AS pcum
  FROM tot t JOIN pcum p USING (bucket, service_name)
  WHERE t.neg_total + t.z + p.cum >= 0.5 * t.total
  GROUP BY 1, 2
)
SELECT t.bucket, t.service_name,
  round(CASE
    WHEN t.total <= 0 THEN NULL
    WHEN 0.5 * t.total <= t.neg_total THEN
      -power(2.0, n.pi + 1)
      + (power(2.0, n.pi + 1) - power(2.0, n.pi))
        * (0.5 * t.total - (n.pcum - n.pc)) / n.pc
    WHEN 0.5 * t.total <= t.neg_total + t.z THEN 0.0
    ELSE power(2.0, p.pi)
         + (power(2.0, p.pi + 1) - power(2.0, p.pi))
           * (0.5 * t.total - (t.neg_total + t.z + p.pcum - p.pc)) / p.pc
  END, 6) AS value
FROM tot t
LEFT JOIN npick n USING (bucket, service_name)
LEFT JOIN ppick p USING (bucket, service_name)
"""

QUERIES["exphist_quantile_signed"] = q_exphist_quantile_signed
ORACLES["exphist_quantile_signed"] = ORACLE_EXPHIST_SIGNED


def q_histogram_le_series(spark, sf_dir):
    """Histogram → cumulative le-series export
    (lowering.histogram_to_le_series) over the synthesized daily
    histograms — the Grafana-heatmap / m_bucket form."""
    from .promql.lowering import histogram_to_le_series

    out = histogram_to_le_series(_daily_hist(spark, sf_dir), DAY)
    return out.select("bucket", "service_name", "metric_name", "le",
                      F.round("value", 6).alias("value"))


ORACLE_HISTOGRAM_LE_SERIES = f"""
WITH h AS (
  SELECT {_BUCKET} AS bucket,
         sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)::DOUBLE AS c1,
         sum(CASE WHEN value > 25 AND value <= 50 THEN 1 ELSE 0 END)::DOUBLE AS c2,
         sum(CASE WHEN value > 50 AND value <= 100 THEN 1 ELSE 0 END)::DOUBLE AS c3,
         sum(CASE WHEN value > 100 AND value <= 150 THEN 1 ELSE 0 END)::DOUBLE AS c4,
         sum(CASE WHEN value > 150 THEN 1 ELSE 0 END)::DOUBLE AS c5
  FROM events GROUP BY 1
)
SELECT bucket, 'events' AS service_name, 'latency' AS metric_name, le,
       round(value, 6) AS value
FROM (
  SELECT bucket, '25.0' AS le, c1 AS value FROM h
  UNION ALL SELECT bucket, '50.0', c1 + c2 FROM h
  UNION ALL SELECT bucket, '100.0', c1 + c2 + c3 FROM h
  UNION ALL SELECT bucket, '150.0', c1 + c2 + c3 + c4 FROM h
  UNION ALL SELECT bucket, '+Inf', c1 + c2 + c3 + c4 + c5 FROM h
)
"""

QUERIES["histogram_le_series"] = q_histogram_le_series
ORACLES["histogram_le_series"] = ORACLE_HISTOGRAM_LE_SERIES


def q_slo_burn_rate(spark, sf_dir):
    """Multiwindow SLO burn rate (timeseries.burn_rate): error events
    against a 99.7% SLO, day (short) vs week (long) windows; pages where
    both burns exceed 1x budget."""
    from .operators.timeseries import burn_rate
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return burn_rate(
        ev, "ts", F.col("event_type") == "error",
        short_step=86400, long_step=7 * 86400, slo_target=0.997,
    )


ORACLE_SLO_BURN_RATE = """
WITH s AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           / CAST(count(*) AS DOUBLE) / (1.0 - 0.997) AS burn_short
  FROM events GROUP BY 1
), l AS (
  SELECT CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT) AS lb,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           / CAST(count(*) AS DOUBLE) / (1.0 - 0.997) AS burn_long
  FROM events GROUP BY 1
)
SELECT s.bucket, round(s.burn_short, 6) AS burn_short,
       round(l.burn_long, 6) AS burn_long,
       CAST(s.burn_short > 1.0 AND l.burn_long > 1.0 AS INT) AS alerting
FROM s JOIN l ON l.lb = CAST(floor(s.bucket / 604800.0) * 604800 AS BIGINT)
"""

QUERIES["slo_burn_rate"] = q_slo_burn_rate
ORACLES["slo_burn_rate"] = ORACLE_SLO_BURN_RATE


def q_query_exemplars(spark, sf_dir):
    """Exemplar read-back (lowering.query_exemplars): at-rest gauge rows
    synthesized from events, one exemplar per point in the exact
    _exemplars_json blob shape; the oracle produces the parsed rows from
    the source directly, so the JSON round-trip itself is under test."""
    from .promql.lowering import query_exemplars
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    blob = F.to_json(
        F.array(
            F.struct(
                (F.unix_micros("ts") * 1000).alias("time_unix_nano"),
                F.col("value").cast("double").alias("value"),
                F.lpad(F.hex(F.col("event_id")), 32, "0").alias("trace_id"),
                F.lpad(F.hex(F.col("event_id")), 16, "0").alias("span_id"),
            )
        )
    )
    atrest = ev.select(
        F.lit("events_value").alias("metric_name"),
        F.col("event_type").alias("service_name"),
        blob.alias("exemplars"),
    )
    out = query_exemplars(atrest)
    return out.select(
        "metric_name", "service_name", "time_unix_nano",
        F.round("value", 6).alias("value"), "trace_id", "span_id",
    )


ORACLE_QUERY_EXEMPLARS = """
SELECT 'events_value' AS metric_name, event_type AS service_name,
       epoch_us(ts) * 1000 AS time_unix_nano,
       round(value, 6) AS value,
       lpad(upper(to_hex(event_id)), 32, '0') AS trace_id,
       lpad(upper(to_hex(event_id)), 16, '0') AS span_id
FROM events
"""

QUERIES["query_exemplars"] = q_query_exemplars
ORACLES["query_exemplars"] = ORACLE_QUERY_EXEMPLARS


def q_promql_hq_exemplars(spark, sf_dir):
    """Exemplar-aware histogram_quantile (the Grafana "show exemplars"
    toggle): the 0.9-quantile series from the daily histograms joined,
    per bucket, with the 3 exemplars whose observed value is closest to
    the quantile estimate (lowering.histogram_quantile_exemplars —
    beyond-reference: exemplars are stored but never joined back)."""
    from .catalog import load_table
    from .promql.ast import VectorSelector
    from .promql.lowering import histogram_quantile_exemplars, query_exemplars

    hist = _daily_hist(spark, sf_dir)
    ctx = PromCtx(spark, None, None, hist, START, END, DAY)
    ev = load_table(spark, sf_dir, "events")
    blob = F.to_json(
        F.array(
            F.struct(
                (F.unix_micros("ts") * 1000).alias("time_unix_nano"),
                F.col("value").cast("double").alias("value"),
                F.lpad(F.hex(F.col("event_id")), 32, "0").alias("trace_id"),
                F.lpad(F.hex(F.col("event_id")), 16, "0").alias("span_id"),
            )
        )
    )
    atrest = ev.select(
        F.lit("latency").alias("metric_name"),
        F.lit("events").alias("service_name"),
        blob.alias("exemplars"),
    )
    ex = query_exemplars(atrest)
    out = histogram_quantile_exemplars(
        ctx, 0.9, VectorSelector("latency"), ex, k=3, step_seconds=DAY
    )
    # single-series fixture: pin the gate's historical 5-column shape
    # (the operator itself now carries series identity for multi-series
    # selectors)
    return out.select("bucket", "value", "trace_id", "exemplar_value", "rk")


ORACLE_PROMQL_HQ_EXEMPLARS = f"""
WITH h AS (
  SELECT {_BUCKET} AS bucket,
         sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)::DOUBLE AS c1,
         sum(CASE WHEN value > 25 AND value <= 50 THEN 1 ELSE 0 END)::DOUBLE AS c2,
         sum(CASE WHEN value > 50 AND value <= 100 THEN 1 ELSE 0 END)::DOUBLE AS c3,
         sum(CASE WHEN value > 100 AND value <= 150 THEN 1 ELSE 0 END)::DOUBLE AS c4,
         sum(CASE WHEN value > 150 THEN 1 ELSE 0 END)::DOUBLE AS c5
  FROM events GROUP BY 1
),
r AS (SELECT *, 0.9 * (c1 + c2 + c3 + c4 + c5) AS rank FROM h
      WHERE c1 + c2 + c3 + c4 + c5 > 0),
hq AS (
  SELECT bucket,
         round(CASE
           WHEN c1 >= rank THEN 0 + (25 - 0) * (rank - 0) / c1
           WHEN c1 + c2 >= rank THEN 25 + (50 - 25) * (rank - c1) / c2
           WHEN c1 + c2 + c3 >= rank THEN 50 + (100 - 50) * (rank - c1 - c2) / c3
           WHEN c1 + c2 + c3 + c4 >= rank THEN 100 + (150 - 100) * (rank - c1 - c2 - c3) / c4
           ELSE 150
         END, 6) AS value
  FROM r
),
ex AS (
  SELECT {_BUCKET} AS bucket,
         CAST(value AS DOUBLE) AS exemplar_value,
         lpad(upper(to_hex(event_id)), 32, '0') AS trace_id
  FROM events
),
j AS (
  SELECT hq.bucket, hq.value, ex.trace_id, ex.exemplar_value,
         row_number() OVER (
           PARTITION BY hq.bucket
           ORDER BY abs(ex.exemplar_value - hq.value), ex.trace_id
         ) AS rk
  FROM hq JOIN ex ON hq.bucket = ex.bucket
)
SELECT bucket, value, trace_id, exemplar_value, CAST(rk AS INT) AS rk
FROM j WHERE rk <= 3
"""

QUERIES["promql_hq_exemplars"] = q_promql_hq_exemplars
ORACLES["promql_hq_exemplars"] = ORACLE_PROMQL_HQ_EXEMPLARS


def q_promql_offset(spark, sf_dir):
    """offset modifier end-to-end: the scan window shifts back one day,
    bucket labels stay unshifted (promql.rs:216-218 semantics)."""
    out = query_range(
        _ctx(spark, sf_dir),
        "sum by (service_name) (max_over_time(events_value[1d] offset 1d))",
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_OFFSET = """
WITH m AS (
  SELECT ts + INTERVAL 1 DAY AS ts2, event_type AS service_name, value
  FROM events
  WHERE ts + INTERVAL 1 DAY
        BETWEEN '2024-01-01 00:00:00' AND '2024-02-01 00:00:00'
)
SELECT CAST(floor(epoch(ts2) / 86400) * 86400 AS BIGINT) AS bucket,
       service_name, round(max(value), 6) AS value
FROM m GROUP BY 1, 2
"""

QUERIES["promql_offset"] = q_promql_offset
ORACLES["promql_offset"] = ORACLE_PROMQL_OFFSET


def q_promql_at_pin(spark, sf_dir):
    """@ modifier end-to-end: the range evaluates at the pinned instant
    (2024-01-15) and the per-series latest value replicates across every
    output step (eval_at, metrics.rs:744-827)."""
    out = query_range(
        _ctx(spark, sf_dir),
        "max_over_time(events_value[1d] @ 1705276800)",
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_AT_PIN = """
WITH w AS (
  SELECT event_type AS service_name, value,
         CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS b
  FROM events
  WHERE ts BETWEEN '2024-01-14 00:00:00' AND '2024-01-15 00:00:00'
),
perb AS (SELECT service_name, b, max(value) AS v FROM w GROUP BY 1, 2),
pinned AS (SELECT service_name, max_by(v, b) AS value FROM perb GROUP BY 1),
spine AS (
  SELECT CAST(UNNEST(range(1704067200, 1706745601, 86400)) AS BIGINT) AS bucket
)
SELECT s.bucket, p.service_name, round(p.value, 6) AS value
FROM spine s, pinned p
"""

QUERIES["promql_at_pin"] = q_promql_at_pin
ORACLES["promql_at_pin"] = ORACLE_PROMQL_AT_PIN


def q_promql_timestamp(spark, sf_dir):
    """timestamp(v): each series' value becomes its sample bucket epoch
    (metrics.rs timestamp eval)."""
    out = query_range(_ctx(spark, sf_dir), "timestamp(events_value)")
    return out.select("bucket", "service_name", "value")


ORACLE_PROMQL_TIMESTAMP = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       CAST({_BUCKET} AS DOUBLE) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["promql_timestamp"] = q_promql_timestamp
ORACLES["promql_timestamp"] = ORACLE_PROMQL_TIMESTAMP


def q_promql_time_vector(spark, sf_dir):
    """vector(1) + time(): spine synthesis and the scalar time series
    through the binop join path."""
    out = query_range(_ctx(spark, sf_dir), "vector(1) + time()")
    return out.select("bucket", "value")


ORACLE_PROMQL_TIME_VECTOR = """
SELECT CAST(b AS BIGINT) AS bucket, CAST(b AS DOUBLE) + 1.0 AS value
FROM UNNEST(range(1704067200, 1706745601, 86400)) u(b)
"""

QUERIES["promql_time_vector"] = q_promql_time_vector
ORACLES["promql_time_vector"] = ORACLE_PROMQL_TIME_VECTOR


def q_metrics_rollup_cascade(spark, sf_dir):
    """Downsample cascade (rollup.rollup_cascade): raw → hourly rollup →
    daily tier, exact against direct daily aggregation because the
    mergeable stats compose associatively."""
    from .maintenance.rollup import rollup_cascade, rollup_metrics

    raw = _metrics_view(spark, sf_dir)
    hourly = rollup_metrics(raw, 3600)
    daily = rollup_cascade(hourly, 86400)
    return (
        daily.groupBy("bucket", "service_name")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.round(F.sum("vsum") / F.sum("cnt"), 6).alias("vavg"),
            F.round(F.min("vmin"), 6).alias("vmin"),
            F.round(F.max("vmax"), 6).alias("vmax"),
        )
    )


ORACLE_METRICS_ROLLUP_CASCADE = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       CAST(count(*) AS BIGINT) AS cnt,
       round(avg(value), 6) AS vavg,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY 1, 2
"""

QUERIES["metrics_rollup_cascade"] = q_metrics_rollup_cascade
ORACLES["metrics_rollup_cascade"] = ORACLE_METRICS_ROLLUP_CASCADE


def q_promql_trig(spark, sf_dir):
    """Trig battery + the atan2 binary operator + deg():
    deg(atan(sin(cos(m))) atan2 100) through the full pipeline —
    every step JVM-side (VALUE_OPS / ARITH), one scan, one shuffle."""
    out = query_range(
        _ctx(spark, sf_dir),
        "deg(atan(sin(cos(avg by (service_name) (avg_over_time(events_value[1d])))))"
        " atan2 100)",
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_TRIG = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round(degrees(atan2(atan(sin(cos(avg(value)))), 100.0)), 6) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["promql_trig"] = q_promql_trig
ORACLES["promql_trig"] = ORACLE_PROMQL_TRIG


def q_promql_mod_pi(spark, sf_dir):
    """Go-style %% (truncated remainder, sign of dividend — math.Mod, NOT
    pmod) on negative dividends, plus the pi() spine series through the
    vector+vector binop join."""
    out = query_range(
        _ctx(spark, sf_dir),
        "(avg by (service_name) (avg_over_time(events_value[1d])) - 100) % 7 + pi()",
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_MOD_PI = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round(mod(avg(value) - 100.0, 7.0) + pi(), 6) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["promql_mod_pi"] = q_promql_mod_pi
ORACLES["promql_mod_pi"] = ORACLE_PROMQL_MOD_PI


def q_promql_ts_of(spark, sf_dir):
    """ts_of_max_over_time (Prometheus 3.x experimental): epoch seconds
    of the max sample per series per step; Prometheus's >= scan makes
    ties resolve to the LATEST occurrence — pinned here via the
    (value, ts) struct max."""
    out = query_range(_ctx(spark, sf_dir), "ts_of_max_over_time(events_value[1d])")
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_TS_OF = f"""
SELECT bucket, service_name, round(tsv, 6) AS value FROM (
  SELECT {_BUCKET} AS bucket, event_type AS service_name, epoch(ts) AS tsv,
         row_number() OVER (
           PARTITION BY {_BUCKET}, event_type
           ORDER BY value DESC, ts DESC
         ) AS rk
  FROM events
) WHERE rk = 1
"""

QUERIES["promql_ts_of"] = q_promql_ts_of
ORACLES["promql_ts_of"] = ORACLE_PROMQL_TS_OF


def q_promql_first_over_time(spark, sf_dir):
    """first_over_time (Prometheus 3.x experimental): earliest sample
    per series per step, equal-timestamp ties to the smaller value."""
    out = query_range(_ctx(spark, sf_dir), "first_over_time(events_value[1d])")
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_FIRST_OVER_TIME = f"""
SELECT bucket, service_name, round(v, 6) AS value FROM (
  SELECT {_BUCKET} AS bucket, event_type AS service_name, value AS v,
         row_number() OVER (
           PARTITION BY {_BUCKET}, event_type
           ORDER BY ts ASC, value ASC
         ) AS rk
  FROM events
) WHERE rk = 1
"""

QUERIES["promql_first_over_time"] = q_promql_first_over_time
ORACLES["promql_first_over_time"] = ORACLE_PROMQL_FIRST_OVER_TIME


def q_promql_limitk(spark, sf_dir):
    """limitk (experimental aggregation): keep 3 of the services per
    bucket, selected by the deterministic md5 series key (Prometheus
    samples arbitrarily; the hash makes the sample value-unbiased AND
    cross-engine replayable)."""
    out = query_range(
        _ctx(spark, sf_dir),
        "limitk(3, avg by (service_name) (avg_over_time(events_value[1d])))",
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


# ordering by the first 8 md5 hex nibbles as a string == ordering by the
# engine's 32-bit integer key (fixed-width lowercase hex)
ORACLE_PROMQL_LIMITK = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name, avg(value) AS value
  FROM events GROUP BY 1, 2
), r AS (
  SELECT bucket, service_name, round(value, 6) AS value,
         row_number() OVER (
           PARTITION BY bucket
           ORDER BY substr(md5(service_name), 1, 8) ASC, service_name ASC
         ) AS rk
  FROM m
)
SELECT bucket, service_name, value FROM r WHERE rk <= 3
"""

QUERIES["promql_limitk"] = q_promql_limitk
ORACLES["promql_limitk"] = ORACLE_PROMQL_LIMITK


def _limit_ratio_oracle() -> str:
    space = 16 ** 8
    cut = int(0.4 * space)
    nib = "(strpos('0123456789abcdef', substr(m, {p}, 1)) - 1)"
    key = " + ".join(f"{nib.format(p=p)} * {16 ** (8 - p)}" for p in range(1, 9))
    return f"""
WITH a AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name, avg(value) AS value,
         substr(md5(event_type), 1, 8) AS m
  FROM events GROUP BY 1, 2, md5(event_type)
)
SELECT bucket, service_name, round(value, 6) AS value
FROM a WHERE CAST({key} AS BIGINT) < {cut}
"""


def q_promql_limit_ratio(spark, sf_dir):
    """limit_ratio (experimental): deterministic hash-split of the series
    set — keep series whose 32-bit md5 key falls under 0.4·2^32. Pure
    map filter (no window, no shuffle beyond the inner agg); the
    complement pairing limit_ratio(r) ∪ limit_ratio(r-1) == all is
    pinned in tests."""
    out = query_range(
        _ctx(spark, sf_dir),
        "limit_ratio(0.4, avg by (service_name) (avg_over_time(events_value[1d])))",
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_LIMIT_RATIO = _limit_ratio_oracle()

QUERIES["promql_limit_ratio"] = q_promql_limit_ratio
ORACLES["promql_limit_ratio"] = ORACLE_PROMQL_LIMIT_RATIO


def q_promql_hist_stddev(spark, sf_dir):
    """histogram_stddev over explicit-bounds histograms (beyond
    reference AND beyond Prometheus, which defines it for native
    histograms only): bucket-midpoint moment estimator, in-row array
    folds, one shuffle, zero explode. Midpoints for bounds
    25/50/100/150: 12.5, 37.5, 75, 125, clamp 150."""
    hist = _daily_hist(spark, sf_dir)
    ctx = PromCtx(spark, None, None, hist, START, END, DAY)
    out = query_range(ctx, "histogram_stddev(latency)")
    return out.select("bucket", F.round("value", 6).alias("value"))


ORACLE_PROMQL_HIST_STDDEV = f"""
WITH h AS (
  SELECT {_BUCKET} AS bucket,
         sum(CASE WHEN value <= 25 THEN 1 ELSE 0 END)::DOUBLE AS c1,
         sum(CASE WHEN value > 25 AND value <= 50 THEN 1 ELSE 0 END)::DOUBLE AS c2,
         sum(CASE WHEN value > 50 AND value <= 100 THEN 1 ELSE 0 END)::DOUBLE AS c3,
         sum(CASE WHEN value > 100 AND value <= 150 THEN 1 ELSE 0 END)::DOUBLE AS c4,
         sum(CASE WHEN value > 150 THEN 1 ELSE 0 END)::DOUBLE AS c5
  FROM events GROUP BY 1
), m AS (
  SELECT bucket, c1 + c2 + c3 + c4 + c5 AS total,
         c1*12.5 + c2*37.5 + c3*75.0 + c4*125.0 + c5*150.0 AS s1,
         c1*12.5*12.5 + c2*37.5*37.5 + c3*75.0*75.0
           + c4*125.0*125.0 + c5*150.0*150.0 AS s2
  FROM h WHERE c1 + c2 + c3 + c4 + c5 > 0
)
SELECT bucket,
       round(sqrt(greatest(s2/total - (s1/total)*(s1/total), 0.0)), 6) AS value
FROM m
"""

QUERIES["promql_hist_stddev"] = q_promql_hist_stddev
ORACLES["promql_hist_stddev"] = ORACLE_PROMQL_HIST_STDDEV


def q_promql_hist_avg(spark, sf_dir):
    """histogram_avg: exact stored sum/count of the latest datapoint per
    step (Prometheus 2.44+; the reference stores both columns but has no
    reader)."""
    hist = _daily_hist_count_sum(spark, sf_dir)
    ctx = PromCtx(spark, None, None, hist, START, END, DAY)
    out = query_range(ctx, "histogram_avg(latency)")
    return out.select("bucket", F.round("value", 6).alias("value"))


ORACLE_PROMQL_HIST_AVG = f"""
SELECT {_BUCKET} AS bucket, round(sum(value) / count(*), 6) AS value
FROM events GROUP BY 1
"""

QUERIES["promql_hist_avg"] = q_promql_hist_avg
ORACLES["promql_hist_avg"] = ORACLE_PROMQL_HIST_AVG


def q_exphist_rate_quantile(spark, sf_dir):
    """histogram_quantile(0.9, rate(exp_hist[1d])) over CUMULATIVE
    exponential histograms (exphist.exphist_rate_quantile) — the
    Prometheus native-histogram rate path the reference cannot serve.
    Per (day, service) the gate synthesizes two cumulative datapoints —
    morning-only counts at 00:00 and the full day at 23:00 — so the
    last−first delta is exactly the afternoon distribution; the oracle
    walks that afternoon CDF directly."""
    from .operators.exphist import exphist_rate_quantile
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    b = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    v = F.col("value")
    w = F.floor(v).cast("long")
    L = F.length(F.bin(w))
    pow2 = w.bitwiseAND(w - 1) == 0
    i = F.when(pow2, L - 2).otherwise(L - 1).cast("int")
    rows = ev.select(
        b.alias("bucket"),
        F.col("event_type").alias("service_name"),
        (v < 1).alias("_zero"),
        F.when(v >= 1, i).alias("i"),
        (F.hour("ts") < 12).alias("_half"),
    )

    # ONE pass densifies BOTH cumulative snapshots: the full-day counts
    # and the morning-only (first) counts are conditional aggregates of
    # the same (bucket, service, i) cells, so the former two _dense
    # passes (two scans + four aggregations) and the full-groups anchor
    # join collapse into a single grouped pipeline keyed on the full-day
    # group set (r12: 2 scans → 1, the anchor join disappears).
    pos = (
        rows.filter(~F.col("_zero") & F.col("i").isNotNull())
        .groupBy("bucket", "service_name", "i")
        .agg(
            F.count(F.lit(1)).alias("c_full"),
            F.sum(F.col("_half").cast("long")).alias("c_half"),
        )
    )
    d = pos.groupBy("bucket", "service_name").agg(
        F.min("i").alias("_off_f"),
        F.max("i").alias("_mx_f"),
        F.min(F.when(F.col("c_half") > 0, F.col("i"))).alias("_off_h"),
        F.max(F.when(F.col("c_half") > 0, F.col("i"))).alias("_mx_h"),
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("i").alias("k"),
                    F.struct(
                        F.col("c_full").alias("f"), F.col("c_half").alias("h")
                    ).alias("v"),
                )
            )
        ).alias("_m"),
    )

    def _counts(off, mx, field):
        return F.transform(
            F.sequence(off, mx),
            lambda k: F.coalesce(
                F.element_at(F.col("_m"), k)[field], F.lit(0)
            ).cast("long"),
        )

    z = rows.groupBy("bucket", "service_name").agg(
        F.sum(F.col("_zero").cast("long")).alias("_z_f"),
        F.sum(F.when(F.col("_half"), F.col("_zero").cast("long"))).alias("_z_h"),
    )
    merged = z.join(d, ["bucket", "service_name"], "left")
    empty = F.array().cast("array<long>")
    # the full-day groups anchor both snapshots: a morning with zero
    # events still yields a (first=empty, last=full) pair via the null
    # half-side coalesces, not a single-sample step
    first = merged.select(
        "bucket", "service_name", F.lit(0).alias("scale"),
        F.coalesce("_z_h", F.lit(0)).alias("zero_count"),
        F.coalesce("_off_h", F.lit(0)).alias("positive_offset"),
        F.coalesce(
            _counts(F.col("_off_h"), F.col("_mx_h"), "h"), empty
        ).alias("positive_bucket_counts"),
    ).withColumn("timestamp", F.timestamp_seconds(F.col("bucket")))
    last = merged.select(
        "bucket", "service_name", F.lit(0).alias("scale"),
        F.col("_z_f").alias("zero_count"),
        F.coalesce("_off_f", F.lit(0)).alias("positive_offset"),
        F.coalesce(
            _counts(F.col("_off_f"), F.col("_mx_f"), "f"), empty
        ).alias("positive_bucket_counts"),
    ).withColumn(
        "timestamp", F.timestamp_seconds(F.col("bucket") + 82800)
    )
    dp = first.unionByName(last).drop("bucket")
    out = exphist_rate_quantile(
        dp, 0.9, ["service_name"], ts_col="timestamp", step_seconds=86400,
        neg_offset_col=None, neg_counts_col=None,
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_EXPHIST_RATE_QUANTILE = f"""
WITH base AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CASE WHEN value < 1 THEN NULL ELSE CAST(floor(value) AS BIGINT) END AS w
  FROM events WHERE hour(ts) >= 12
), idxed AS (
  SELECT bucket, service_name,
         CASE WHEN w IS NULL THEN NULL
              WHEN (w & (w - 1)) = 0 THEN length(bin(w)) - 2
              ELSE length(bin(w)) - 1 END AS i
  FROM base
), zeros AS (
  SELECT bucket, service_name,
         CAST(count(*) FILTER (WHERE i IS NULL) AS DOUBLE) AS z,
         CAST(count(*) AS DOUBLE) AS total
  FROM idxed GROUP BY 1, 2
), cnts AS (
  SELECT bucket, service_name, i, CAST(count(*) AS DOUBLE) AS c
  FROM idxed WHERE i IS NOT NULL GROUP BY 1, 2, 3
), cum AS (
  SELECT bucket, service_name, i, c,
         sum(c) OVER (PARTITION BY bucket, service_name ORDER BY i) AS cum
  FROM cnts
), pick AS (
  SELECT z.bucket, z.service_name,
         min_by(m.i, m.i) AS pi, min_by(m.c, m.i) AS pc, min_by(m.cum, m.i) AS pcum
  FROM zeros z JOIN cum m USING (bucket, service_name)
  WHERE z.z + m.cum >= 0.9 * z.total
  GROUP BY 1, 2
), vals AS (
  SELECT z.bucket, z.service_name,
    round(CASE WHEN z.total <= 0 THEN NULL
               WHEN 0.9 * z.total <= z.z THEN 0.0
               ELSE power(2.0, p.pi)
                    + (power(2.0, p.pi + 1) - power(2.0, p.pi))
                      * (0.9 * z.total - (z.z + p.pcum - p.pc)) / p.pc END, 6) AS value
  FROM zeros z LEFT JOIN pick p USING (bucket, service_name)
)
SELECT bucket, service_name, value FROM vals WHERE value IS NOT NULL
"""

QUERIES["exphist_rate_quantile"] = q_exphist_rate_quantile
ORACLES["exphist_rate_quantile"] = ORACLE_EXPHIST_RATE_QUANTILE


def q_promql_native_quantile(spark, sf_dir):
    """histogram_quantile(0.9, latency) routed through the FULL PromQL
    pipeline to the exponential-histogram table (PromCtx.exphist) — the
    Prometheus native-histogram UX where one query text serves both
    histogram kinds; the reference stores exp-histograms but cannot
    query them at all."""
    from .catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    b = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    v = F.col("value")
    w = F.floor(v).cast("long")
    L = F.length(F.bin(w))
    pow2 = w.bitwiseAND(w - 1) == 0
    i = F.when(pow2, L - 2).otherwise(L - 1).cast("int")
    rows = ev.select(
        b.alias("b"),
        F.col("event_type").alias("service_name"),
        (v < 1).alias("_zero"),
        F.when(v >= 1, i).alias("i"),
    )
    pos = (
        rows.filter(~F.col("_zero") & F.col("i").isNotNull())
        .groupBy("b", "service_name", "i")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dense = pos.groupBy("b", "service_name").agg(
        F.min("i").alias("positive_offset"),
        F.max("i").alias("_mx"),
        F.map_from_entries(F.collect_list(F.struct("i", "c"))).alias("_m"),
    )
    counts = F.transform(
        F.sequence(F.col("positive_offset"), F.col("_mx")),
        lambda k: F.coalesce(F.element_at(F.col("_m"), k), F.lit(0)).cast("long"),
    )
    zeros = rows.groupBy("b", "service_name").agg(
        F.sum(F.col("_zero").cast("long")).alias("zero_count")
    )
    exphist = zeros.join(dense, ["b", "service_name"], "left").select(
        F.timestamp_seconds(F.col("b")).alias("timestamp"),
        F.lit("latency").alias("metric_name"),
        "service_name",
        F.lit(0).alias("scale"),
        "zero_count",
        F.coalesce("positive_offset", F.lit(0)).alias("positive_offset"),
        F.coalesce(counts, F.array().cast("array<long>")).alias(
            "positive_bucket_counts"
        ),
    )
    ctx = PromCtx(spark, None, None, None, START, END, DAY, exphist=exphist)
    out = query_range(ctx, "histogram_quantile(0.9, latency)")
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_PROMQL_NATIVE_QUANTILE = f"""
WITH base AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CASE WHEN value < 1 THEN NULL ELSE CAST(floor(value) AS BIGINT) END AS w
  FROM events
), idxed AS (
  SELECT bucket, service_name,
         CASE WHEN w IS NULL THEN NULL
              WHEN (w & (w - 1)) = 0 THEN length(bin(w)) - 2
              ELSE length(bin(w)) - 1 END AS i
  FROM base
), zeros AS (
  SELECT bucket, service_name,
         CAST(count(*) FILTER (WHERE i IS NULL) AS DOUBLE) AS z,
         CAST(count(*) AS DOUBLE) AS total
  FROM idxed GROUP BY 1, 2
), cnts AS (
  SELECT bucket, service_name, i, CAST(count(*) AS DOUBLE) AS c
  FROM idxed WHERE i IS NOT NULL GROUP BY 1, 2, 3
), cum AS (
  SELECT bucket, service_name, i, c,
         sum(c) OVER (PARTITION BY bucket, service_name ORDER BY i) AS cum
  FROM cnts
), pick AS (
  SELECT z.bucket, z.service_name,
         min_by(m.i, m.i) AS pi, min_by(m.c, m.i) AS pc, min_by(m.cum, m.i) AS pcum
  FROM zeros z JOIN cum m USING (bucket, service_name)
  WHERE z.z + m.cum >= 0.9 * z.total
  GROUP BY 1, 2
)
SELECT z.bucket, z.service_name,
  round(CASE WHEN z.total <= 0 THEN NULL
             WHEN 0.9 * z.total <= z.z THEN 0.0
             ELSE power(2.0, p.pi)
                  + (power(2.0, p.pi + 1) - power(2.0, p.pi))
                    * (0.9 * z.total - (z.z + p.pcum - p.pc)) / p.pc END, 6) AS value
FROM zeros z LEFT JOIN pick p USING (bucket, service_name)
"""

QUERIES["promql_native_quantile"] = q_promql_native_quantile
ORACLES["promql_native_quantile"] = ORACLE_PROMQL_NATIVE_QUANTILE


def q_promql_metadata(spark, sf_dir):
    """Prometheus /api/v1/metadata (discovery.metric_metadata): metric →
    type derived from WHICH signal table the metric lands in — the
    store is the metadata source, no sidecar to drift."""
    from .promql.discovery import metric_metadata

    gauge = _metrics_view(spark, sf_dir)
    msum = gauge.withColumn("metric_name", F.lit("events_total"))
    hist = _daily_hist(spark, sf_dir)
    return metric_metadata(
        spark,
        {"metrics_gauge": gauge, "metrics_sum": msum, "metrics_histogram": hist},
    )


ORACLE_PROMQL_METADATA = """
SELECT * FROM (VALUES
  ('events_total', 'counter'), ('events_value', 'gauge'), ('latency', 'histogram')
) t(metric, type) ORDER BY metric, type
"""

QUERIES["promql_metadata"] = q_promql_metadata
ORACLES["promql_metadata"] = ORACLE_PROMQL_METADATA


def q_promql_tsdb_status(spark, sf_dir):
    """/api/v1/status/tsdb analog (discovery.tsdb_status): distinct
    series per metric, top-N — the cardinality-explosion hunt. The view
    synthesizes 3 metrics whose series are (metric, service) pairs."""
    from .promql.discovery import tsdb_status

    e = load_table(spark, sf_dir, "events")
    gauge = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.concat(F.lit("m"), (F.col("user_id") % 3).cast("string")).alias("metric_name"),
        F.col("value"),
    )
    ctx = PromCtx(spark, gauge, None, None, START, END, DAY)
    return tsdb_status(ctx, top_n=10)


ORACLE_PROMQL_TSDB_STATUS = """
SELECT metric, series_count FROM (
  SELECT 'm' || CAST(user_id % 3 AS VARCHAR) AS metric,
         count(DISTINCT event_type) AS series_count
  FROM events GROUP BY 1
) ORDER BY series_count DESC, metric ASC LIMIT 10
"""

QUERIES["promql_tsdb_status"] = q_promql_tsdb_status
ORACLES["promql_tsdb_status"] = ORACLE_PROMQL_TSDB_STATUS


def q_promql_alert_state(spark, sf_dir):
    """Batch alert-rule evaluation (rules.alert_rule): pending vs
    firing from consecutive-run length over the condition's result
    vector (for: 2d at 1d step → firing from the 3rd consecutive
    bucket; threshold near the median so runs break and re-form) — the rule-file backtest path."""
    from .promql.rules import alert_rule

    ctx = _ctx(spark, sf_dir)
    out = alert_rule(
        ctx,
        "avg by (service_name) (avg_over_time(events_value[1d])) > 48",
        for_seconds=2 * 86400,
    )
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value"), "alertstate"
    )


ORACLE_PROMQL_ALERT_STATE = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name, avg(value) AS value
  FROM events GROUP BY 1, 2
), cond AS (SELECT * FROM m WHERE value > 48),
runs AS (
  SELECT bucket, service_name, value,
         bucket - row_number() OVER (PARTITION BY service_name ORDER BY bucket) * 86400 AS rk
  FROM cond
)
SELECT bucket, service_name, round(value, 6) AS value,
       CASE WHEN row_number() OVER (PARTITION BY service_name, rk ORDER BY bucket) >= 3
            THEN 'firing' ELSE 'pending' END AS alertstate
FROM runs
"""

QUERIES["promql_alert_state"] = q_promql_alert_state
ORACLES["promql_alert_state"] = ORACLE_PROMQL_ALERT_STATE
