"""Round-14 staging battery: oracle-gated queries registered AFTER the
round-13 block. Opens with the exponential-histogram IR gate (the
metric sub-model lifting the proposal's exphist deferral with the
engine's own bucket model, operators/exphist.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

DAY = 86400


def q_ir_metrics_exphist_quantile(spark, sf_dir):
    """p75 from OTLP EXPONENTIAL histograms through the IR metric
    sub-model: HOURLY scale-0 datapoints (bucket index from
    length(bin(floor(value))) — integer-exact both engines, no libm
    log) accumulate DELTA-wise over the daily window, then the
    value-ordered CDF walk interpolates. Since delta accumulation over
    the day equals counting the day's events per bucket, the oracle
    computes the identical walk from daily groups directly."""
    from .ir.metrics import lower_metrics
    from .ir.model import validate

    ev = load_table(spark, sf_dir, "events")
    h = F.date_trunc("hour", "ts")
    v = F.col("value")
    w = F.floor(v).cast("long")
    ln = F.length(F.bin(w))
    pow2 = w.bitwiseAND(w - 1) == 0
    i = F.when(pow2, ln - 2).otherwise(ln - 1).cast("int")
    rows = ev.select(
        h.alias("timestamp"),
        F.col("event_type").alias("service_name"),
        (v < 1).alias("_zero"),
        F.when(v >= 1, i).alias("i"),
    )
    pos = (
        rows.filter(~F.col("_zero"))
        .groupBy("timestamp", "service_name", "i")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dense = pos.groupBy("timestamp", "service_name").agg(
        F.min("i").alias("positive_offset"),
        F.max("i").alias("_mx"),
        F.map_from_entries(F.collect_list(F.struct("i", "c"))).alias("_m"),
    )
    counts = F.transform(
        F.sequence(F.col("positive_offset"), F.col("_mx")),
        lambda k: F.coalesce(F.element_at(F.col("_m"), k), F.lit(0)).cast("long"),
    )
    zeros = rows.groupBy("timestamp", "service_name").agg(
        F.sum(F.col("_zero").cast("long")).alias("zero_count")
    )
    atrest = zeros.join(dense, ["timestamp", "service_name"], "left").select(
        "timestamp", "service_name",
        F.lit("events_exphist").alias("metric_name"),
        F.lit(0).alias("scale"), "zero_count",
        F.coalesce("positive_offset", F.lit(0)).alias("positive_offset"),
        F.coalesce(counts, F.array().cast("array<long>")).alias(
            "positive_bucket_counts"
        ),
        F.lit(1).alias("aggregation_temporality"),
    )
    q = validate({
        "version": 1, "from": "metrics",
        "metric": {"name": "events_exphist", "type": "exponential_histogram",
                   "fn": "quantile", "quantile": 0.75,
                   "window_seconds": DAY,
                   "agg": "max", "by": ["service_name"]},
    })
    out = lower_metrics(atrest, q)
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value")
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_EXPHIST_QUANTILE = """
WITH base AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         event_type AS service_name,
         CASE WHEN value < 1 THEN NULL
              ELSE CAST(floor(value) AS BIGINT) END AS w
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
         min_by(m.i, m.i) AS pi, min_by(m.c, m.i) AS pc,
         min_by(m.cum, m.i) AS pcum
  FROM zeros z JOIN cum m USING (bucket, service_name)
  WHERE z.z + m.cum >= 0.75 * z.total
  GROUP BY 1, 2
)
SELECT z.bucket, z.service_name,
  round(CASE WHEN z.total <= 0 THEN NULL
             WHEN 0.75 * z.total <= z.z THEN 0.0
             ELSE power(2.0, p.pi)
                  + (power(2.0, p.pi + 1) - power(2.0, p.pi))
                    * (0.75 * z.total - (z.z + p.pcum - p.pc)) / p.pc END, 6)
    AS value
FROM zeros z LEFT JOIN pick p USING (bucket, service_name)
ORDER BY 1, 2
"""

QUERIES["ir_metrics_exphist_quantile"] = q_ir_metrics_exphist_quantile
ORACLES["ir_metrics_exphist_quantile"] = ORACLE_IR_METRICS_EXPHIST_QUANTILE
