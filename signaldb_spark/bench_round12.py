"""Round-12 staging battery: oracle-gated queries registered AFTER the
round-11 block so earlier rounds' tuned driver prefixes stay intact.

Opens with the metric-native IR sub-model gates (the reference's
query-metrics-model proposal, openspec/changes/query-metrics-model/):
each builds an OTLP-shaped metric fixture from the events table —
deterministically, so the DuckDB oracle can rebuild the identical
fixture in SQL — and runs the FULL IR pipeline (validate → lower) over
it, proving the temporality-aware range vectors and bucket-based
histogram quantiles end-to-end against an independent engine.

Same conventions as bench_queries (round(x, 6) floats, BIGINT counts,
explicit tiebreaks, aliases identical on both sides).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

DAY = 86400
_DAY_BUCKET = "CAST(floor(epoch(h) / 86400) * 86400 AS BIGINT)"


def _hourly(spark: SparkSession, sf_dir: str):
    """Shared fixture base: one sample per (event_type, hour) — hourly
    timestamps are unique per series, so last/first sample picks are
    deterministic on both engines. Values aggregate as INTEGER CENTS
    (the battery's exactness convention): double summation is
    order-sensitive at the 6th decimal across engines, integer sums
    are not."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.col("event_type").alias("service_name"),
            F.date_trunc("hour", "ts").alias("timestamp"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


_HOURLY_SQL = """
  SELECT event_type AS service_name, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
"""


def _ir_metrics(df, metric: dict):
    from .ir.metrics import lower_metrics
    from .ir.model import validate

    q = validate({"version": 1, "from": "metrics", "metric": metric})
    return lower_metrics(df, q)


# ------------------------------------------------- batch 1: IR metrics


def q_ir_metrics_gauge_last(spark, sf_dir):
    """IR metric sub-model, instant vector: gauge `last` with a daily
    step — the last hourly-average sample per series per day. The gauge
    table shape matches metrics_gauge (schemas/signal_schemas.py); the
    IR wall validated the doc and the metric lowering owns the plan
    (one groupBy on (bucket, series) digests — no window over samples)."""
    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_hourly_avg").alias("metric_name"),
        (F.col("cents") / (F.lit(100.0) * F.col("n"))).alias("value"),
        F.create_map(F.lit("src"), F.lit("events")).alias("attributes"),
    )
    out = _ir_metrics(g, {
        "name": "events_hourly_avg", "type": "gauge", "fn": "last",
        "step_seconds": DAY, "agg": "max", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value")
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_GAUGE_LAST = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT {_DAY_BUCKET} AS bucket, service_name,
       round(max_by(cents / (100.0 * n), h), 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_gauge_last"] = q_ir_metrics_gauge_last
ORACLES["ir_metrics_gauge_last"] = ORACLE_IR_METRICS_GAUGE_LAST


def q_ir_metrics_rate_cumulative(spark, sf_dir):
    """IR metric sub-model, temporality-aware range vector over a
    CUMULATIVE sum with KNOWN reset points: the fixture counter
    accumulates hourly sums within each calendar week and resets at
    week boundaries (start_timestamp = the week start — OTLP's explicit
    stream-restart marker). Daily increase must be computed per
    (series, start_timestamp) run — earliest run last−first, later runs
    their full last — NOT a value-drop heuristic; the oracle implements
    exactly the run semantics in SQL."""
    w = Window.partitionBy("service_name", "week").orderBy("timestamp")
    c = (
        _hourly(spark, sf_dir)
        .withColumn("week", F.date_trunc("week", "timestamp"))
        .withColumn("cum", F.sum("cents").over(w))
        .select(
            "timestamp",
            F.col("week").alias("start_timestamp"),
            "service_name",
            F.lit("events_total").alias("metric_name"),
            F.col("cum").cast("double").alias("value"),
            F.lit(2).alias("aggregation_temporality"),
            F.lit(True).alias("is_monotonic"),
        )
    )
    out = _ir_metrics(c, {
        "name": "events_total", "type": "sum", "fn": "increase",
        "window_seconds": DAY, "agg": "sum", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_RATE_CUMULATIVE = f"""
WITH hourly AS ({_HOURLY_SQL}),
cum AS (
  SELECT service_name, h, date_trunc('week', h) AS wk,
         CAST(sum(cents) OVER (
           PARTITION BY service_name, date_trunc('week', h) ORDER BY h
         ) AS DOUBLE) AS cum_v
  FROM hourly
),
runs AS (
  SELECT service_name, {_DAY_BUCKET} AS bucket, wk,
         max_by(cum_v, h) AS run_last, min_by(cum_v, h) AS run_first
  FROM cum GROUP BY 1, 2, 3
),
contrib AS (
  SELECT service_name, bucket,
         run_last - CASE
           WHEN wk = min(wk) OVER (PARTITION BY service_name, bucket)
           THEN run_first ELSE 0 END AS c
  FROM runs
)
SELECT bucket, service_name, round(sum(c) / 100.0, 6) AS value
FROM contrib GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_rate_cumulative"] = q_ir_metrics_rate_cumulative
ORACLES["ir_metrics_rate_cumulative"] = ORACLE_IR_METRICS_RATE_CUMULATIVE


def q_ir_metrics_rate_delta(spark, sf_dir):
    """IR metric sub-model, DELTA-temporality rate: each sample already
    carries its own increase (the hourly sum), so the daily rate is
    simply sum(samples)/86400 — the other half of the spec's 'rate
    respects temporality' scenario (no run logic, no last−first)."""
    d = _hourly(spark, sf_dir).select(
        "timestamp",
        F.col("timestamp").alias("start_timestamp"),
        "service_name",
        F.lit("events_delta").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
        F.lit(1).alias("aggregation_temporality"),
        F.lit(True).alias("is_monotonic"),
    )
    out = _ir_metrics(d, {
        "name": "events_delta", "type": "sum", "fn": "rate",
        "window_seconds": DAY, "agg": "sum", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_RATE_DELTA = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT {_DAY_BUCKET} AS bucket, service_name,
       round(CAST(sum(cents) AS DOUBLE) / 86400.0 / 100.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_rate_delta"] = q_ir_metrics_rate_delta
ORACLES["ir_metrics_rate_delta"] = ORACLE_IR_METRICS_RATE_DELTA


_BOUNDS = [5.0, 20.0, 50.0, 150.0]


def q_ir_metrics_histogram_quantile(spark, sf_dir):
    """IR metric sub-model, bucket-based histogram quantile (spec
    scenario 2): hourly OTLP explicit-bounds histograms (delta
    temporality) accumulate element-wise over the daily window, then
    p90 interpolates linearly inside the bucket containing 0.9×total
    (first bucket's open lower bound → 0; overflow hit → top finite
    bound). The oracle rebuilds the same buckets from raw events and
    replicates the interpolation arithmetic in SQL."""
    e = load_table(spark, sf_dir, "events")
    idx = (
        F.when(F.col("value") <= _BOUNDS[0], 0)
        .when(F.col("value") <= _BOUNDS[1], 1)
        .when(F.col("value") <= _BOUNDS[2], 2)
        .when(F.col("value") <= _BOUNDS[3], 3)
        .otherwise(4)
    )
    counts = (
        e.select(
            F.col("event_type").alias("service_name"),
            F.date_trunc("hour", "ts").alias("timestamp"),
            idx.alias("i"),
        )
        .groupBy("service_name", "timestamp")
        .pivot("i", [0, 1, 2, 3, 4])
        .count()
        .na.fill(0)
    )
    h = counts.select(
        "timestamp",
        F.col("timestamp").alias("start_timestamp"),
        "service_name",
        F.lit("events_hist").alias("metric_name"),
        F.array(*[F.col(str(i)).cast("double") for i in range(5)]).alias(
            "bucket_counts"
        ),
        F.array(*[F.lit(b) for b in _BOUNDS]).alias("explicit_bounds"),
        F.lit(1).alias("aggregation_temporality"),
    )
    out = _ir_metrics(h, {
        "name": "events_hist", "type": "histogram", "fn": "quantile",
        "quantile": 0.9, "window_seconds": DAY,
        "agg": "max", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value")
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_HISTOGRAM_QUANTILE = """
WITH buckets AS (
  SELECT event_type AS service_name,
         CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         CASE WHEN value <= 5 THEN 0 WHEN value <= 20 THEN 1
              WHEN value <= 50 THEN 2 WHEN value <= 150 THEN 3
              ELSE 4 END AS i,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3
),
bounds AS (
  SELECT i,
         CASE i WHEN 0 THEN NULL WHEN 1 THEN 5.0 WHEN 2 THEN 20.0
                WHEN 3 THEN 50.0 WHEN 4 THEN 150.0 END AS lo,
         CASE i WHEN 0 THEN 5.0 WHEN 1 THEN 20.0 WHEN 2 THEN 50.0
                WHEN 3 THEN 150.0 ELSE NULL END AS hi
  FROM (SELECT unnest(range(5)) AS i)
),
cdf AS (
  SELECT b.service_name, b.bucket, b.i, b.n, bd.lo, bd.hi,
         sum(b.n) OVER (PARTITION BY b.service_name, b.bucket) AS total,
         sum(b.n) OVER (PARTITION BY b.service_name, b.bucket
                        ORDER BY b.i) AS cum
  FROM buckets b JOIN bounds bd USING (i)
),
hit AS (
  SELECT service_name, bucket, i, n, lo, hi, total, cum,
         0.9 * total AS target
  FROM cdf
  WHERE cum >= 0.9 * total AND n > 0 AND total > 0
  QUALIFY row_number() OVER (
    PARTITION BY service_name, bucket ORDER BY i) = 1
)
SELECT bucket, service_name,
       round(CASE WHEN hi IS NULL THEN coalesce(lo, 0.0)
             ELSE coalesce(lo, 0.0)
                  + (hi - coalesce(lo, 0.0)) * (target - (cum - n)) / n
             END, 6) AS value
FROM hit ORDER BY 1, 2
"""

QUERIES["ir_metrics_histogram_quantile"] = q_ir_metrics_histogram_quantile
ORACLES["ir_metrics_histogram_quantile"] = ORACLE_IR_METRICS_HISTOGRAM_QUANTILE


def q_typed_attr_int_predicate(spark, sf_dir):
    """Typed attribute values (otel-native-schema proposal) through the
    FULL path: a v1 logs table with STRINGIFIED attributes migrates to
    the v2 typed layout under the type authority (semconv hint makes
    http.response.status_code canonical int), then an IR `gt` predicate
    reads the typed int HOME — longs compared in codegen, and the
    off-type residue rows ('n/a' strings under the int key) read NULL
    and drop per Kleene instead of ANSI-poisoning the scan (gt 450
    keeps only the 503 class). The oracle
    replicates the fixture's code assignment and the residue exclusion
    directly over events."""
    from .ir import lower, validate
    from .schemas.anyvalue import AttributeTypeRegistry
    from .schemas.resolver import builtin_registry

    e = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "error", F.lit("n/a"))  # residue class
        .when(F.col("value") >= 100, F.lit("503"))
        .when(F.col("value") >= 20, F.lit("404"))
        .otherwise(F.lit("200"))
    )
    v1 = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.create_map(
            F.lit("http.response.status_code"), code,
            F.lit("user"), F.col("user_id").cast("string"),
        ).alias("log_attributes"),
    )
    v2 = builtin_registry().migrate(
        v1, "logs", "v1", "v2",
        attr_types=AttributeTypeRegistry().assignments(),
    )
    q = validate({
        "version": 1, "from": "logs",
        "where": {"field": "http.response.status_code", "op": "gt",
                  "value": 450},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(v2, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_TYPED_ATTR_INT_PREDICATE = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type <> 'error' AND value >= 100
GROUP BY 1 ORDER BY 1
"""

QUERIES["typed_attr_int_predicate"] = q_typed_attr_int_predicate
ORACLES["typed_attr_int_predicate"] = ORACLE_TYPED_ATTR_INT_PREDICATE
