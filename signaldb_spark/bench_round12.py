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


# ----------------------------------------------------- batch 2: relational


def q_supplier_lead_time_rank(spark, sf_dir):
    """Top-3 slowest suppliers per nation by average order→ship lag:
    the fulfillment league table. Lag sums stay exact integer days until
    the final division (identical IEEE divide both engines), row_number
    breaks ties on the supplier name; supplier/nation dims broadcast
    into the lineitem scan and orders projects to two columns before
    the fact-fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lag = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o, li.l_orderkey == o.o_orderkey
    ).select(
        "l_suppkey",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("d"),
    )
    per_s = lag.groupBy("l_suppkey").agg(
        F.sum("d").alias("sum_days"), F.count(F.lit(1)).cast("long").alias("n")
    )
    j = per_s.join(F.broadcast(s), per_s.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    scored = j.select(
        "n_name", "s_name",
        (F.col("sum_days").cast("double") / F.col("n")).alias("avg_lag"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("avg_lag").desc(), F.col("s_name").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("n_name", "rk", "s_name", F.round("avg_lag", 6).alias("avg_lag"))
        .orderBy("n_name", "rk")
    )


ORACLE_SUPPLIER_LEAD_TIME_RANK = """
WITH lag AS (
  SELECT l_suppkey, CAST(sum(datediff('day', o_orderdate, l_shipdate))
         AS BIGINT) AS sum_days, CAST(count(*) AS BIGINT) AS n
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1
),
scored AS (
  SELECT n.n_name, s.s_name,
         CAST(sum_days AS DOUBLE) / n AS avg_lag
  FROM lag JOIN supplier s ON l_suppkey = s_suppkey
  JOIN nation n ON s_nationkey = n_nationkey
),
r AS (
  SELECT n_name, s_name, avg_lag,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY avg_lag DESC, s_name ASC) AS rk
  FROM scored
)
SELECT n_name, rk, s_name, round(avg_lag, 6) AS avg_lag
FROM r WHERE rk <= 3 ORDER BY n_name, rk
"""

QUERIES["supplier_lead_time_rank"] = q_supplier_lead_time_rank
ORACLES["supplier_lead_time_rank"] = ORACLE_SUPPLIER_LEAD_TIME_RANK


def q_line_discount_stack(spark, sf_dir):
    """Revenue waterfall per order-year: list gross → after-discount →
    after-tax, each summed from PER-LINE integer cents (the rounding
    point is part of the contract — rounding the per-line product, not
    the total, is what a billing system does)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o.select("o_orderkey", F.year("o_orderdate").alias("yr")),
                li.l_orderkey == F.col("o_orderkey"))
    cents = lambda c: F.round(c * 100).cast("long")  # noqa: E731
    return (
        j.groupBy("yr")
        .agg(
            F.sum(cents(F.col("l_extendedprice"))).alias("gross_cents"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("disc_cents"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax")))).alias("net_cents"),
        )
        .orderBy("yr")
    )


ORACLE_LINE_DISCOUNT_STACK = """
SELECT year(o_orderdate) AS yr,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS gross_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS disc_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                * 100) AS BIGINT)) AS BIGINT) AS net_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["line_discount_stack"] = q_line_discount_stack
ORACLES["line_discount_stack"] = ORACLE_LINE_DISCOUNT_STACK


def q_customer_order_imbalance(spark, sf_dir):
    """Demand-concentration audit per priority: buyers, the heaviest
    buyer's order count, and the max/mean imbalance ratio — exact
    counts until the one final division."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_orderpriority", "o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        per_cust.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buyers"),
            F.max("n").alias("max_orders"),
            F.sum("n").alias("total_orders"),
        )
        .select(
            "o_orderpriority", "n_buyers", "max_orders",
            F.round(
                F.col("max_orders") * F.col("n_buyers")
                / F.col("total_orders"), 6
            ).alias("imbalance"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_CUSTOMER_ORDER_IMBALANCE = """
WITH per_cust AS (
  SELECT o_orderpriority, o_custkey, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_buyers,
       max(n) AS max_orders,
       round(max(n) * count(*) / sum(n), 6) AS imbalance
FROM per_cust GROUP BY 1 ORDER BY 1
"""

QUERIES["customer_order_imbalance"] = q_customer_order_imbalance
ORACLES["customer_order_imbalance"] = ORACLE_CUSTOMER_ORDER_IMBALANCE


def q_monthly_new_customers(spark, sf_dir):
    """Acquisition curve: customers by FIRST-order month (one min-agg
    per customer, then a month rollup — the first-seen trick, no
    window distinct)."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d0"))
    return (
        first.groupBy(F.date_trunc("month", "d0").cast("date").alias("month"))
        .agg(F.count(F.lit(1)).cast("long").alias("new_customers"))
        .orderBy("month")
    )


ORACLE_MONTHLY_NEW_CUSTOMERS = """
WITH first AS (
  SELECT o_custkey, min(o_orderdate) AS d0 FROM orders GROUP BY 1
)
SELECT CAST(date_trunc('month', d0) AS DATE) AS month,
       CAST(count(*) AS BIGINT) AS new_customers
FROM first GROUP BY 1 ORDER BY 1
"""

QUERIES["monthly_new_customers"] = q_monthly_new_customers
ORACLES["monthly_new_customers"] = ORACLE_MONTHLY_NEW_CUSTOMERS


def q_running_backlog(spark, sf_dir):
    """Open-order backlog per month: cumulative opened minus cumulative
    completed (an order completes at its LAST lineitem receipt). Two
    monthly rollups FULL OUTER joined on the month spine, then one
    cumulative window over the ~84-row table — the fact tables are
    touched exactly once each."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    opened = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.count(F.lit(1)).cast("long").alias("opened"))
    done = (
        li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("completed"))
        .groupBy(F.date_trunc("month", "completed").cast("date").alias("month"))
        .agg(F.count(F.lit(1)).cast("long").alias("closed"))
    )
    merged = (
        opened.join(done, "month", "full")
        .select(
            "month",
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("closed", F.lit(0)).alias("closed"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        merged.withColumn(
            "backlog", (F.sum("opened").over(w) - F.sum("closed").over(w))
        )
        .select("month", "opened", "closed", "backlog")
        .orderBy("month")
    )


ORACLE_RUNNING_BACKLOG = """
WITH opened AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS opened
  FROM orders GROUP BY 1
),
done AS (
  SELECT CAST(date_trunc('month', completed) AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS closed
  FROM (SELECT l_orderkey, max(l_shipdate) AS completed
        FROM lineitem GROUP BY 1)
  GROUP BY 1
),
merged AS (
  SELECT coalesce(o.month, d.month) AS month,
         coalesce(opened, 0) AS opened, coalesce(closed, 0) AS closed
  FROM opened o FULL OUTER JOIN done d ON o.month = d.month
)
SELECT month, opened, closed,
       CAST(sum(opened) OVER (ORDER BY month)
            - sum(closed) OVER (ORDER BY month) AS BIGINT) AS backlog
FROM merged ORDER BY month
"""

QUERIES["running_backlog"] = q_running_backlog
ORACLES["running_backlog"] = ORACLE_RUNNING_BACKLOG


def q_weekday_order_mix(spark, sf_dir):
    """Order volume by weekday × priority with within-priority shares;
    pins the cross-engine weekday convention (Spark dayofweek is
    1=Sunday; DuckDB's 0=Sunday shifts by one)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(
        "o_orderpriority", F.dayofweek("o_orderdate").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("o_orderpriority")
    return (
        per.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .select("o_orderpriority", "dow", "n", "share")
        .orderBy("o_orderpriority", "dow")
    )


ORACLE_WEEKDAY_ORDER_MIX = """
WITH per AS (
  SELECT o_orderpriority, CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, dow, n,
       round(n / sum(n) OVER (PARTITION BY o_orderpriority), 6) AS share
FROM per ORDER BY o_orderpriority, dow
"""

QUERIES["weekday_order_mix"] = q_weekday_order_mix
ORACLES["weekday_order_mix"] = ORACLE_WEEKDAY_ORDER_MIX


def q_cross_quarter_retention(spark, sf_dir):
    """Customer quarter-over-quarter retention: for each consecutive
    quarter pair, how many of Q(n)'s buyers bought again in Q(n+1).
    Distinct (customer, quarter) rollup first; the self-join runs on
    that digest, never on orders."""
    o = load_table(spark, sf_dir, "orders")
    cq = o.select(
        "o_custkey",
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("q"),
    ).distinct()
    nxt = cq.select(
        F.col("o_custkey").alias("c2"),
        F.add_months(F.col("q"), -3).alias("q_prev"),
    )
    joined = cq.join(
        nxt, (cq.o_custkey == nxt.c2) & (cq.q == nxt.q_prev), "left"
    )
    return (
        joined.groupBy("q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("buyers"),
            F.count("c2").cast("long").alias("retained"),
        )
        .withColumn("retention", F.round(F.col("retained") / F.col("buyers"), 6))
        .orderBy("q")
    )


ORACLE_CROSS_QUARTER_RETENTION = """
WITH cq AS (
  SELECT DISTINCT o_custkey,
         CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q
  FROM orders
)
SELECT a.q, CAST(count(*) AS BIGINT) AS buyers,
       CAST(count(b.o_custkey) AS BIGINT) AS retained,
       round(count(b.o_custkey) / count(*), 6) AS retention
FROM cq a LEFT JOIN cq b
  ON a.o_custkey = b.o_custkey AND b.q = a.q + INTERVAL 3 MONTH
GROUP BY 1 ORDER BY 1
"""

QUERIES["cross_quarter_retention"] = q_cross_quarter_retention
ORACLES["cross_quarter_retention"] = ORACLE_CROSS_QUARTER_RETENTION


def q_price_last_digit_uniformity(spark, sf_dir):
    """Pricing forensics, the Benford complement: the LAST digit of the
    retail-price cents should be ~uniform; digits come from exact
    integer cents (never float formatting), with each digit's deviation
    from the uniform expectation."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    per = p.select((cents % 10).alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy()
    return (
        per.withColumn(
            "dev_pct",
            F.round((F.col("n") * 10 - F.sum("n").over(w))
                    / F.sum("n").over(w) * 10.0, 6),
        )
        .select("digit", "n", "dev_pct")
        .orderBy("digit")
    )


ORACLE_PRICE_LAST_DIGIT_UNIFORMITY = """
WITH per AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) % 10 AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1
)
SELECT digit, n,
       round((n * 10 - sum(n) OVER ()) / sum(n) OVER () * 10.0, 6) AS dev_pct
FROM per ORDER BY digit
"""

QUERIES["price_last_digit_uniformity"] = q_price_last_digit_uniformity
ORACLES["price_last_digit_uniformity"] = ORACLE_PRICE_LAST_DIGIT_UNIFORMITY


# --------------------------------------------------------- batch 3: events


def q_session_entry_exit_matrix(spark, sf_dir):
    """Session entry→exit transition matrix: per 30-min-gap session,
    the (first event type, last event type) pair — where journeys start
    vs where they die. The portable lag-gap-cumsum idiom builds session
    ids; first/last picked by the (ts, event_id) composite so ties are
    deterministic on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            (F.col("prev").isNull()
             | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800)
             ).cast("int"),
        )
        .withColumn("sid", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.min_by("event_type", key).alias("entry"),
        F.max_by("event_type", key).alias("exit"),
    )
    return (
        per_sess.groupBy("entry", "exit")
        .agg(F.count(F.lit(1)).cast("long").alias("sessions"))
        .orderBy("entry", "exit")
    )


ORACLE_SESSION_ENTRY_EXIT_MATRIX = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM marked
),
per_sess AS (
  SELECT user_id, sid,
         first(event_type ORDER BY ts, event_id) AS entry,
         last(event_type ORDER BY ts, event_id) AS exit
  FROM sess GROUP BY 1, 2
)
SELECT entry, exit, CAST(count(*) AS BIGINT) AS sessions
FROM per_sess GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["session_entry_exit_matrix"] = q_session_entry_exit_matrix
ORACLES["session_entry_exit_matrix"] = ORACLE_SESSION_ENTRY_EXIT_MATRIX


def q_longest_quiet_hours(spark, sf_dir):
    """Stream-liveness audit per type: the longest silence between
    consecutive events (exact integer µs) and how many gaps exceeded
    one hour — what a missing-data alert would page on."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        e.select("event_type", "ts", "event_id")
        .withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "event_type",
            (F.unix_micros("ts") - F.unix_micros("prev")).alias("gap_us"),
        )
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.max("gap_us").alias("max_gap_us"),
            F.sum((F.col("gap_us") > 3_600_000_000).cast("long"))
            .alias("gaps_over_1h"),
        )
        .orderBy("event_type")
    )


ORACLE_LONGEST_QUIET_HOURS = """
WITH gaps AS (
  SELECT event_type,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us
  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type, max(gap_us) AS max_gap_us,
       CAST(sum(CASE WHEN gap_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS gaps_over_1h
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

QUERIES["longest_quiet_hours"] = q_longest_quiet_hours
ORACLES["longest_quiet_hours"] = ORACLE_LONGEST_QUIET_HOURS


def q_weekly_active_histogram(spark, sf_dir):
    """Engagement-breadth histogram: users by number of DISTINCT active
    weeks — the weekly complement of the active-days power-user curve."""
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.select("user_id", F.date_trunc("week", "ts").alias("wk"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("weeks"))
    )
    return (
        per_user.groupBy("weeks")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("weeks")
    )


ORACLE_WEEKLY_ACTIVE_HISTOGRAM = """
WITH per_user AS (
  SELECT user_id, CAST(count(DISTINCT date_trunc('week', ts)) AS BIGINT)
         AS weeks
  FROM events GROUP BY 1
)
SELECT weeks, CAST(count(*) AS BIGINT) AS users
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["weekly_active_histogram"] = q_weekly_active_histogram
ORACLES["weekly_active_histogram"] = ORACLE_WEEKLY_ACTIVE_HISTOGRAM


def q_daily_zscore_outlier_days(spark, sf_dir):
    """Volume-anomaly days per stream: |z| > 2 on the daily count,
    with mean/std derived from EXPLICIT raw power sums over the daily
    rollup (population convention — neither engine's stddev correction
    trusted, same posture as the skewness gate)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type")
    scored = (
        daily.withColumn("mean_n", F.sum("n").over(w) / F.count("n").over(w))
        .withColumn(
            "var_n",
            F.sum(F.col("n") * F.col("n")).over(w) / F.count("n").over(w)
            - F.col("mean_n") * F.col("mean_n"),
        )
        .withColumn("z", (F.col("n") - F.col("mean_n")) / F.sqrt("var_n"))
        .filter(F.abs("z") > 2)
    )
    return scored.select(
        "event_type", "day", "n", F.round("z", 6).alias("z")
    ).orderBy("event_type", "day")


ORACLE_DAILY_ZSCORE_OUTLIER_DAYS = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, day, n,
         sum(n) OVER w / count(n) OVER w AS mean_n,
         sum(n * n) OVER w / count(n) OVER w
           - (sum(n) OVER w / count(n) OVER w)
             * (sum(n) OVER w / count(n) OVER w) AS var_n
  FROM daily WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, day, n,
       round((n - mean_n) / sqrt(var_n), 6) AS z
FROM scored WHERE abs((n - mean_n) / sqrt(var_n)) > 2
ORDER BY event_type, day
"""

QUERIES["daily_zscore_outlier_days"] = q_daily_zscore_outlier_days
ORACLES["daily_zscore_outlier_days"] = ORACLE_DAILY_ZSCORE_OUTLIER_DAYS


def q_first_week_activation(spark, sf_dir):
    """Lifecycle-day activity curve: events on each user's day 0-6
    (days since their first event) by type — what a week-one onboarding
    dashboard plots. One min-agg per user broadcast back into the scan."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    j = e.join(F.broadcast(first), "user_id")
    return (
        j.withColumn("day_idx", F.datediff(F.to_date("ts"), F.col("d0")))
        .filter(F.col("day_idx") <= 6)
        .groupBy("day_idx", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("day_idx", "event_type")
    )


ORACLE_FIRST_WEEK_ACTIVATION = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
)
SELECT datediff('day', d0, CAST(ts AS DATE)) AS day_idx, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events JOIN first USING (user_id)
WHERE datediff('day', d0, CAST(ts AS DATE)) <= 6
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["first_week_activation"] = q_first_week_activation
ORACLES["first_week_activation"] = ORACLE_FIRST_WEEK_ACTIVATION


def q_props_k_distribution(spark, sf_dir):
    """JSON-payload profiling over the events props blob: extract the
    integer field k (get_json_object — JVM-side, no UDF), band by tens,
    count per type; the NULL/missing band is first-class."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select(
            "event_type",
            F.coalesce(F.floor(k / 10).cast("long"), F.lit(-1)).alias("k_band"),
        )
        .groupBy("event_type", "k_band")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "k_band")
    )


ORACLE_PROPS_K_DISTRIBUTION = """
SELECT event_type,
       coalesce(CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT)
                / 10) AS BIGINT), -1) AS k_band,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["props_k_distribution"] = q_props_k_distribution
ORACLES["props_k_distribution"] = ORACLE_PROPS_K_DISTRIBUTION


def q_hourly_load_concentration(spark, sf_dir):
    """Peak-hour concentration per stream: the busiest wall-clock hour
    and its share of total volume — exact counts, the peak picked by
    (count desc, hour asc) so ties are deterministic."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("h").asc()
    )
    wt = Window.partitionBy("event_type")
    return (
        hourly.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rk") == 1)
        .select(
            "event_type", F.col("h").alias("peak_hour"),
            F.col("n").alias("peak_n"),
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy("event_type")
    )


ORACLE_HOURLY_LOAD_CONCENTRATION = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, h, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, h ASC) AS rk,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM hourly
)
SELECT event_type, h AS peak_hour, n AS peak_n,
       round(n / total, 6) AS share
FROM r WHERE rk = 1 ORDER BY event_type
"""

QUERIES["hourly_load_concentration"] = q_hourly_load_concentration
ORACLES["hourly_load_concentration"] = ORACLE_HOURLY_LOAD_CONCENTRATION


def q_user_mean_gap_deciles(spark, sf_dir):
    """Per-user cadence profile: mean inter-event gap (exact integer µs
    sums / exact counts) cut into deciles by exact integer ranks — the
    engagement-frequency segmentation."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    per_user = (
        e.select("user_id", "ts", "event_id")
        .withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.unix_micros("ts") - F.unix_micros("prev")).alias("sum_us"),
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
        )
        .withColumn("mean_us", F.col("sum_us") / F.col("n_gaps"))
    )
    dw = Window.orderBy(F.col("mean_us").asc(), F.col("user_id").asc())
    return (
        per_user.withColumn("decile", F.ntile(10).over(dw))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("users"),
            F.round(F.avg("mean_us"), 6).alias("avg_gap_us"),
        )
        .orderBy("decile")
    )


ORACLE_USER_MEAN_GAP_DECILES = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
per_user AS (
  SELECT user_id, sum(gap_us) / count(*) AS mean_us
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY 1
),
cut AS (
  SELECT ntile(10) OVER (ORDER BY mean_us ASC, user_id ASC) AS decile,
         mean_us
  FROM per_user
)
SELECT decile, CAST(count(*) AS BIGINT) AS users,
       round(avg(mean_us), 6) AS avg_gap_us
FROM cut GROUP BY 1 ORDER BY 1
"""

QUERIES["user_mean_gap_deciles"] = q_user_mean_gap_deciles
ORACLES["user_mean_gap_deciles"] = ORACLE_USER_MEAN_GAP_DECILES


# -------------------------------------------------- batch 4: corpus / docs


def q_sentence_length_stats(spark, sf_dir):
    """Tokenizer-cost proxy per source: words-per-doc mean and the p90
    by exact integer rank selection over the word-count rollup (split
    on whitespace runs — both engines count identically)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("w"),
    )
    per = words.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("w").alias("total_words"),
    )
    ranked = words.withColumn(
        "rk", F.row_number().over(Window.partitionBy("source").orderBy("w"))
    )
    p90 = ranked.join(
        per.select("source", F.ceil(F.col("docs") * 0.9).alias("rk90")),
        "source",
    ).filter(F.col("rk") == F.col("rk90")).select(
        "source", F.col("w").alias("p90_words")
    )
    return (
        per.join(p90, "source")
        .select(
            "source", "docs",
            F.round(F.col("total_words") / F.col("docs"), 6).alias("avg_words"),
            "p90_words",
        )
        .orderBy("source")
    )


ORACLE_SENTENCE_LENGTH_STATS = r"""
WITH words AS (
  SELECT source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
  FROM documents
),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(w) AS BIGINT) AS total_words
  FROM words GROUP BY 1
),
ranked AS (
  SELECT source, w,
         row_number() OVER (PARTITION BY source ORDER BY w) AS rk
  FROM words
),
p90 AS (
  SELECT r.source, r.w AS p90_words
  FROM ranked r JOIN per USING (source)
  WHERE r.rk = CAST(ceil(per.docs * 0.9) AS BIGINT)
)
SELECT source, docs, round(total_words / docs, 6) AS avg_words, p90_words
FROM per JOIN p90 USING (source) ORDER BY source
"""

QUERIES["sentence_length_stats"] = q_sentence_length_stats
ORACLES["sentence_length_stats"] = ORACLE_SENTENCE_LENGTH_STATS


def q_numeric_token_share(spark, sf_dir):
    """Numeric-token density per source — a high share marks tables/
    logs masquerading as prose (a pretraining-quality screen). Counts
    are exact integers from one regexp pass."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    num = F.size(F.filter(toks, lambda t: t.rlike(r"^[0-9]+$")))
    per = d.select(
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        num.cast("long").alias("n_num"),
    ).groupBy("source").agg(
        F.sum("n_tok").alias("tokens"), F.sum("n_num").alias("numeric_tokens")
    )
    return per.select(
        "source", "tokens", "numeric_tokens",
        F.round(F.col("numeric_tokens") / F.col("tokens"), 6).alias("share"),
    ).orderBy("source")


ORACLE_NUMERIC_TOKEN_SHARE = r"""
WITH per_doc AS (
  SELECT source,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tok,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              t -> regexp_matches(t, '^[0-9]+$')))
           AS BIGINT) AS n_num
  FROM documents
)
SELECT source, CAST(sum(n_tok) AS BIGINT) AS tokens,
       CAST(sum(n_num) AS BIGINT) AS numeric_tokens,
       round(sum(n_num) / sum(n_tok), 6) AS share
FROM per_doc GROUP BY 1 ORDER BY 1
"""

QUERIES["numeric_token_share"] = q_numeric_token_share
ORACLES["numeric_token_share"] = ORACLE_NUMERIC_TOKEN_SHARE


def q_bigram_hapax_share(spark, sf_dir):
    """Bigram hapax share per lang: the fraction of distinct word
    bigrams seen exactly once — rises with genuine novelty, collapses
    under duplication (the 2-gram complement of the hapax gate).
    Bigrams live as (w1, w2) rollup rows, never concatenated strings."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    # Build the bigram-struct array FIRST (zip_with over two slices),
    # then explode once: O(words) cells per doc. Exploding token
    # positions and re-indexing the full array per row would carry the
    # WHOLE token array on every exploded row — O(words²) cells, which
    # measured 5-6s at sf0.1 vs ~1s for this shape.
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        d.filter(F.size(toks) >= 2)
        .select("lang", F.explode(bigrams).alias("p"))
        .select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    counts = pairs.groupBy("lang", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        counts.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("distinct_bigrams"),
            F.sum((F.col("n") == 1).cast("long")).alias("hapax_bigrams"),
        )
        .withColumn(
            "hapax_share",
            F.round(F.col("hapax_bigrams") / F.col("distinct_bigrams"), 6),
        )
        .orderBy("lang")
    )


ORACLE_BIGRAM_HAPAX_SHARE = r"""
WITH toks AS (
  SELECT lang, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
),
pairs AS (
  SELECT lang, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
),
counts AS (
  SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY 1, 2, 3
)
SELECT lang, CAST(count(*) AS BIGINT) AS distinct_bigrams,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS hapax_bigrams,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) / count(*), 6)
         AS hapax_share
FROM counts GROUP BY 1 ORDER BY 1
"""

QUERIES["bigram_hapax_share"] = q_bigram_hapax_share
ORACLES["bigram_hapax_share"] = ORACLE_BIGRAM_HAPAX_SHARE


def q_char_class_entropy(spark, sf_dir):
    """Character-CLASS entropy per source (letters/digits/spaces/other
    — a 4-symbol alphabet): crude but fully cross-engine-exact text
    signal (class counts are integers; the entropy fold happens on the
    4-row rollup)."""
    d = load_table(spark, sf_dir, "documents")
    total = F.length("text").cast("long")
    letters = F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")).cast("long")
    digits = F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("long")
    spaces = F.length(F.regexp_replace("text", r"[^ ]", "")).cast("long")
    per = d.select(
        "source", total.alias("t"), letters.alias("l"),
        digits.alias("g"), spaces.alias("s"),
    ).groupBy("source").agg(
        F.sum("t").alias("t"), F.sum("l").alias("l"),
        F.sum("g").alias("g"), F.sum("s").alias("s"),
    ).withColumn("o", F.col("t") - F.col("l") - F.col("g") - F.col("s"))

    def term(c):
        p = F.col(c) / F.col("t")
        return F.when(F.col(c) > 0, -p * F.log2(p)).otherwise(F.lit(0.0))

    return per.select(
        "source", F.col("t").alias("chars"),
        F.round(term("l") + term("g") + term("s") + term("o"), 6)
        .alias("class_entropy"),
    ).orderBy("source")


ORACLE_CHAR_CLASS_ENTROPY = """
WITH per AS (
  SELECT source,
         CAST(sum(len(text)) AS BIGINT) AS t,
         CAST(sum(len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) AS BIGINT) AS l,
         CAST(sum(len(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT) AS g,
         CAST(sum(len(regexp_replace(text, '[^ ]', '', 'g'))) AS BIGINT) AS s
  FROM documents GROUP BY 1
),
full_t AS (SELECT *, t - l - g - s AS o FROM per)
SELECT source, t AS chars,
       round(
         (CASE WHEN l > 0 THEN -(l / t) * log2(l / t) ELSE 0 END)
         + (CASE WHEN g > 0 THEN -(g / t) * log2(g / t) ELSE 0 END)
         + (CASE WHEN s > 0 THEN -(s / t) * log2(s / t) ELSE 0 END)
         + (CASE WHEN o > 0 THEN -(o / t) * log2(o / t) ELSE 0 END), 6)
         AS class_entropy
FROM full_t ORDER BY source
"""

QUERIES["char_class_entropy"] = q_char_class_entropy
ORACLES["char_class_entropy"] = ORACLE_CHAR_CLASS_ENTROPY


def q_doc_length_lang_profile(spark, sf_dir):
    """Length-by-language census on the PRECOMPUTED n_chars column:
    min/max/total plus the exact rank-selected median — the corpus
    balance sheet before a token-budget allocation."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
    )
    ranked = d.select("lang", "n_chars", "doc_id").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy("n_chars", "doc_id")
        ),
    )
    med = ranked.join(
        per.select("lang",
                   F.floor((F.col("docs") + 1) / 2).cast("long").alias("mrk")),
        "lang",
    ).filter(F.col("rk") == F.col("mrk")).select(
        "lang", F.col("n_chars").alias("median_chars")
    )
    return per.join(med, "lang").select(
        "lang", "docs", "min_chars", "median_chars", "max_chars", "total_chars"
    ).orderBy("lang")


ORACLE_DOC_LENGTH_LANG_PROFILE = """
WITH per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS docs,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rk
  FROM documents
),
med AS (
  SELECT r.lang, r.n_chars AS median_chars
  FROM ranked r JOIN per USING (lang)
  WHERE r.rk = CAST(floor((per.docs + 1) / 2) AS BIGINT)
)
SELECT lang, docs, min_chars, median_chars, max_chars, total_chars
FROM per JOIN med USING (lang) ORDER BY lang
"""

QUERIES["doc_length_lang_profile"] = q_doc_length_lang_profile
ORACLES["doc_length_lang_profile"] = ORACLE_DOC_LENGTH_LANG_PROFILE


# ------------------------------------------------- batch 5: embeddings


def q_emb_norm_percentile_bands(spark, sf_dir):
    """Per-label L2-norm p10/p50/p90 by EXACT integer-rank selection
    over the per-vector norm table: the normalization health-check
    before cosine ops. Norms are in-order folds (F.aggregate) — one
    row per vector, vectors never shuffle whole."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    ))
    scored = e.select("label", "vec_id", norm.alias("nrm"))
    w = Window.partitionBy("label").orderBy("nrm", "vec_id")
    ranked = scored.withColumn("rk", F.row_number().over(w))
    per = scored.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = ranked.join(F.broadcast(per), "label")
    out = None
    for q, name in ((0.1, "p10"), (0.5, "p50"), (0.9, "p90")):
        sel = j.filter(
            F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * q))
        ).select("label", F.round("nrm", 6).alias(name))
        out = sel if out is None else out.join(sel, "label")
    return out.orderBy("label")


ORACLE_EMB_NORM_PERCENTILE_BANDS = """
WITH scored AS (
  SELECT label, vec_id,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
ranked AS (
  SELECT label, nrm,
         row_number() OVER (PARTITION BY label ORDER BY nrm, vec_id) AS rk,
         count(*) OVER (PARTITION BY label) AS n
  FROM scored
)
SELECT label,
       round(max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.1) AS BIGINT))
                 THEN nrm END), 6) AS p10,
       round(max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
                 THEN nrm END), 6) AS p50,
       round(max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.9) AS BIGINT))
                 THEN nrm END), 6) AS p90
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_norm_percentile_bands"] = q_emb_norm_percentile_bands
ORACLES["emb_norm_percentile_bands"] = ORACLE_EMB_NORM_PERCENTILE_BANDS


def q_emb_label_centroid_distances(spark, sf_dir):
    """Inter-label centroid distance matrix (upper triangle): how
    separable the label space is BEFORE training a probe. Centroids
    come from (label, dim) partial sums — vectors never shuffle whole;
    the 10×64 centroid table self-joins broadcast."""
    e = load_table(spark, sf_dir, "embeddings")
    cd = (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg((F.sum(F.col("x").cast("double"))
              / F.count(F.lit(1))).alias("c"))
    )
    a = cd.select(F.col("label").alias("la"), "dim", F.col("c").alias("ca"))
    b_ = cd.select(F.col("label").alias("lb"), "dim", F.col("c").alias("cb"))
    return (
        a.join(F.broadcast(b_), "dim")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.round(
            F.sqrt(F.sum((F.col("ca") - F.col("cb"))
                         * (F.col("ca") - F.col("cb")))), 6).alias("dist"))
        .orderBy("la", "lb")
    )


ORACLE_EMB_LABEL_CENTROID_DISTANCES = """
WITH cd AS (
  SELECT label, i AS dim,
         sum(CAST(embedding[i + 1] AS DOUBLE)) / count(*) AS c
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
  GROUP BY 1, 2
)
SELECT a.label AS la, b.label AS lb,
       round(sqrt(sum((a.c - b.c) * (a.c - b.c))), 6) AS dist
FROM cd a JOIN cd b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["emb_label_centroid_distances"] = q_emb_label_centroid_distances
ORACLES["emb_label_centroid_distances"] = ORACLE_EMB_LABEL_CENTROID_DISTANCES


def q_emb_coordinate_range_report(spark, sf_dir):
    """Per-dimension min/max/mean over the whole collection for the
    FIRST 8 dimensions — the quantizer calibration table. (label, dim)
    partial sums; output bounded at 8 rows."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("dim", "x"))
        .filter(F.col("dim") < 8)
        .groupBy("dim")
        .agg(
            F.round(F.min(F.col("x").cast("double")), 6).alias("min_x"),
            F.round(F.max(F.col("x").cast("double")), 6).alias("max_x"),
            F.round(F.sum(F.col("x").cast("double")) / F.count(F.lit(1)), 6)
            .alias("mean_x"),
        )
        .orderBy("dim")
    )


ORACLE_EMB_COORDINATE_RANGE_REPORT = """
SELECT i AS dim,
       round(min(CAST(embedding[i + 1] AS DOUBLE)), 6) AS min_x,
       round(max(CAST(embedding[i + 1] AS DOUBLE)), 6) AS max_x,
       round(sum(CAST(embedding[i + 1] AS DOUBLE)) / count(*), 6) AS mean_x
FROM embeddings, unnest(range(len(embedding))) AS u(i)
WHERE i < 8
GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_coordinate_range_report"] = q_emb_coordinate_range_report
ORACLES["emb_coordinate_range_report"] = ORACLE_EMB_COORDINATE_RANGE_REPORT


def q_emb_label_purity_knn1(spark, sf_dir):
    """1-NN label purity on a deterministic 200-vector sample (vec_id
    % 29 == 0): the share whose nearest OTHER sampled vector (cosine)
    carries the same label — the cheapest labeled-manifold sanity
    check. The sample self-join is 200×200 on dim-keyed partial sums,
    never the full collection."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 29 == 0
    )
    flat = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select("vec_id", "label", "dim", F.col("x").cast("double").alias("x"))
    a = flat.select(F.col("vec_id").alias("ia"), F.col("label").alias("la"),
                    "dim", F.col("x").alias("xa"))
    b_ = flat.select(F.col("vec_id").alias("ib"), F.col("label").alias("lb"),
                     "dim", F.col("x").alias("xb"))
    dots = (
        a.join(b_, "dim")
        .filter(F.col("ia") != F.col("ib"))
        .groupBy("ia", "la", "ib", "lb")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
    )
    w = Window.partitionBy("ia").orderBy(F.col("dot").desc(), F.col("ib").asc())
    nn = dots.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return nn.agg(
        F.count(F.lit(1)).cast("long").alias("sampled"),
        F.sum((F.col("la") == F.col("lb")).cast("long")).alias("pure"),
        F.round(F.sum((F.col("la") == F.col("lb")).cast("double"))
                / F.count(F.lit(1)), 6).alias("purity"),
    )


ORACLE_EMB_LABEL_PURITY_KNN1 = """
WITH s AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 29 = 0
),
dots AS (
  SELECT a.vec_id AS ia, a.label AS la, b.vec_id AS ib, b.label AS lb,
         list_sum(list_transform(range(len(a.embedding)),
           i -> CAST(a.embedding[i + 1] AS DOUBLE)
                * CAST(b.embedding[i + 1] AS DOUBLE))) AS dot
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
nn AS (
  SELECT ia, la, lb,
         row_number() OVER (PARTITION BY ia ORDER BY dot DESC, ib ASC) AS rk
  FROM dots
)
SELECT CAST(count(*) AS BIGINT) AS sampled,
       CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS pure,
       round(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS purity
FROM nn WHERE rk = 1
"""

QUERIES["emb_label_purity_knn1"] = q_emb_label_purity_knn1
ORACLES["emb_label_purity_knn1"] = ORACLE_EMB_LABEL_PURITY_KNN1


# --------------------------------- batch 6: IR metrics depth + engine


def q_ir_metrics_sum_over_time(spark, sf_dir):
    """IR gauge range fn sum_over_time: daily sum of the hourly-cents
    gauge — exact integer accumulation through the metric sub-model's
    tumbling range vector."""
    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "sum_over_time",
        "window_seconds": DAY, "agg": "sum", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_SUM_OVER_TIME = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT {_DAY_BUCKET} AS bucket, service_name,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_sum_over_time"] = q_ir_metrics_sum_over_time
ORACLES["ir_metrics_sum_over_time"] = ORACLE_IR_METRICS_SUM_OVER_TIME


def q_ir_metrics_gauge_delta(spark, sf_dir):
    """IR gauge `delta` (PromQL last−first semantics) over the daily
    window: picks exactly two exact values per (series, day) — no
    accumulation, so cross-engine float drift is impossible."""
    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "delta",
        "window_seconds": DAY, "agg": "sum", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_GAUGE_DELTA = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT {_DAY_BUCKET} AS bucket, service_name,
       round((max_by(CAST(cents AS DOUBLE), h)
              - min_by(CAST(cents AS DOUBLE), h)) / 100.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_gauge_delta"] = q_ir_metrics_gauge_delta
ORACLES["ir_metrics_gauge_delta"] = ORACLE_IR_METRICS_GAUGE_DELTA


def q_ir_metrics_instant_nostep(spark, sf_dir):
    """IR instant vector with NO step: one row per series — the
    latest sample over the whole query window (the /query instant
    endpoint's shape, vs /query_range's bucketed one)."""
    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "last",
        "agg": "max", "by": ["service_name"],
    })
    return out.select(
        "service_name", F.round(F.col("value") / 100.0, 6).alias("value")
    ).orderBy("service_name")


ORACLE_IR_METRICS_INSTANT_NOSTEP = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT service_name,
       round(max_by(CAST(cents AS DOUBLE), h) / 100.0, 6) AS value
FROM hourly GROUP BY 1 ORDER BY 1
"""

QUERIES["ir_metrics_instant_nostep"] = q_ir_metrics_instant_nostep
ORACLES["ir_metrics_instant_nostep"] = ORACLE_IR_METRICS_INSTANT_NOSTEP


def q_typed_attr_eq_numeric(spark, sf_dir):
    """Typed-attribute EQUALITY with a numeric literal: eq 404 reads
    the int home (the eq branch of the typed numeric view); residue
    rows under the same key never match, and the count matches the
    oracle's direct band predicate."""
    from .ir import lower, validate
    from .schemas.anyvalue import AttributeTypeRegistry
    from .schemas.resolver import builtin_registry

    e = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "error", F.lit("n/a"))
        .when(F.col("value") >= 100, F.lit("503"))
        .when(F.col("value") >= 20, F.lit("404"))
        .otherwise(F.lit("200"))
    )
    v1 = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.create_map(F.lit("http.response.status_code"), code).alias(
            "log_attributes"
        ),
    )
    v2 = builtin_registry().migrate(
        v1, "logs", "v1", "v2",
        attr_types=AttributeTypeRegistry().assignments(),
    )
    q = validate({
        "version": 1, "from": "logs",
        "where": {"field": "http.response.status_code", "op": "eq",
                  "value": 404},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(v2, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_TYPED_ATTR_EQ_NUMERIC = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type <> 'error' AND value >= 20 AND value < 100
GROUP BY 1 ORDER BY 1
"""

QUERIES["typed_attr_eq_numeric"] = q_typed_attr_eq_numeric
ORACLES["typed_attr_eq_numeric"] = ORACLE_TYPED_ATTR_EQ_NUMERIC


_R12_CACHE: dict = {}


def q_streaming_resume_drain(spark, sf_dir):
    """DRIVER gate for checkpointed RESUME: the backlog drains in TWO
    separate availableNow runs against ONE checkpoint — first over half
    the source files, then (after the 'stream stopped', more data
    arrived) over all of them. The second run must pick up exactly
    where the first checkpointed: no batch replayed into the manifest,
    no file skipped, and the final table answers the oracle's
    whole-corpus rollup."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from .storage.manifest import ManifestTable, write_batch_manifest

    key = ("resume", sf_dir)
    if key not in _R12_CACHE:
        src_all = _tempfile.mkdtemp(prefix="sdb-r12-all-")
        src = _tempfile.mkdtemp(prefix="sdb-r12-src-")
        table = _tempfile.mkdtemp(prefix="sdb-r12-tbl-")
        ckpt = _tempfile.mkdtemp(prefix="sdb-r12-ckpt-")
        e = load_table(spark, sf_dir, "events").withColumn(
            "date_day", F.date_format("ts", "yyyy-MM-dd")
        ).withColumn("hour", F.lit(0))
        e.repartition(6).write.mode("overwrite").parquet(src_all)
        parts = sorted(
            n for n in _os.listdir(src_all) if n.endswith(".parquet")
        )
        schema = spark.read.parquet(src_all).schema

        def sink(bdf, bid):
            write_batch_manifest(
                bdf, table, "events_r12s", batch_id=bid,
                partition_cols=("date_day", "hour"), stats_cols=("ts",),
            )

        def drain():
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

        # phase 1: half the backlog
        for n in parts[: len(parts) // 2]:
            _shutil.copy(_os.path.join(src_all, n), _os.path.join(src, n))
        drain()
        # phase 2: the rest lands, the SAME checkpoint resumes
        for n in parts[len(parts) // 2:]:
            _shutil.copy(_os.path.join(src_all, n), _os.path.join(src, n))
        drain()
        _R12_CACHE[key] = table
    df = ManifestTable(_R12_CACHE[key]).read(spark)
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


ORACLE_STREAMING_RESUME_DRAIN = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["streaming_resume_drain"] = q_streaming_resume_drain
ORACLES["streaming_resume_drain"] = ORACLE_STREAMING_RESUME_DRAIN


# ------------------------------------- batch 7: SQL pins + relational


def q_interval_containment_probe(spark, sf_dir):
    """Point-in-interval cardinality at fixed probe dates: how many
    orders were 'active' (within 30 days of placement) on each probe —
    the scalar-probe shape whose predicate pushes to the scan instead
    of materializing an interval join."""
    o = load_table(spark, sf_dir, "orders")
    probes = ["1997-06-15", "1996-01-01", "1995-03-31"]
    aggs = [
        F.sum(
            (
                (F.to_date("o_orderdate") <= F.lit(p).cast("date"))
                & (F.date_add(F.to_date("o_orderdate"), 30)
                   >= F.lit(p).cast("date"))
            ).cast("long")
        ).alias(f"active_{p.replace('-', '_')}")
        for p in probes
    ]
    return o.agg(*aggs)


ORACLE_INTERVAL_CONTAINMENT_PROBE = """
SELECT
  CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) <= DATE '1997-06-15'
       AND CAST(o_orderdate AS DATE) + 30 >= DATE '1997-06-15'
       THEN 1 ELSE 0 END) AS BIGINT) AS active_1997_06_15,
  CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) <= DATE '1996-01-01'
       AND CAST(o_orderdate AS DATE) + 30 >= DATE '1996-01-01'
       THEN 1 ELSE 0 END) AS BIGINT) AS active_1996_01_01,
  CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) <= DATE '1995-03-31'
       AND CAST(o_orderdate AS DATE) + 30 >= DATE '1995-03-31'
       THEN 1 ELSE 0 END) AS BIGINT) AS active_1995_03_31
FROM orders
"""

QUERIES["interval_containment_probe"] = q_interval_containment_probe
ORACLES["interval_containment_probe"] = ORACLE_INTERVAL_CONTAINMENT_PROBE


def q_rounding_conventions_battery(spark, sf_dir):
    """floor/ceil/trunc-toward-zero pins over signed balances — the
    integer-conversion conventions that silently diverge across
    engines; every output is an exact BIGINT sum."""
    c = load_table(spark, sf_dir, "customer")
    b = F.col("c_acctbal")
    return c.agg(
        F.sum(F.floor(b).cast("long")).alias("sum_floor"),
        F.sum(F.ceil(b).cast("long")).alias("sum_ceil"),
        F.sum(b.cast("long")).alias("sum_trunc"),  # cast truncates toward 0
        F.sum(F.round(b, 0).cast("long")).alias("sum_round"),
        F.sum((b < 0).cast("long")).alias("n_negative"),
    )


ORACLE_ROUNDING_CONVENTIONS_BATTERY = """
SELECT CAST(sum(floor(c_acctbal)) AS BIGINT) AS sum_floor,
       CAST(sum(ceil(c_acctbal)) AS BIGINT) AS sum_ceil,
       CAST(sum(trunc(c_acctbal)) AS BIGINT) AS sum_trunc,
       CAST(sum(round(c_acctbal, 0)) AS BIGINT) AS sum_round,
       CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative
FROM customer
"""

QUERIES["rounding_conventions_battery"] = q_rounding_conventions_battery
ORACLES["rounding_conventions_battery"] = ORACLE_ROUNDING_CONVENTIONS_BATTERY


def q_union_vs_union_all_battery(spark, sf_dir):
    """UNION dedup vs UNION ALL multiset over two overlapping
    projections (high-value click users vs purchase users) — the
    row-fate ledger for the two set semantics."""
    e = load_table(spark, sf_dir, "events")
    a = e.filter(
        (F.col("event_type") == "click") & (F.col("value") > 50)
    ).select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return spark.createDataFrame(
        [("union_all",)], "which string"
    ).crossJoin(
        a.unionAll(b).agg(F.count(F.lit(1)).cast("long").alias("n"))
    ).unionByName(
        spark.createDataFrame([("union_distinct",)], "which string").crossJoin(
            a.unionAll(b).distinct().agg(
                F.count(F.lit(1)).cast("long").alias("n"))
        )
    ).orderBy("which")


ORACLE_UNION_VS_UNION_ALL_BATTERY = """
WITH a AS (SELECT user_id FROM events
           WHERE event_type = 'click' AND value > 50),
b AS (SELECT user_id FROM events WHERE event_type = 'purchase')
SELECT 'union_all' AS which,
       CAST((SELECT count(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b))
            AS BIGINT) AS n
UNION ALL
SELECT 'union_distinct' AS which,
       CAST((SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
            AS BIGINT) AS n
ORDER BY which
"""

QUERIES["union_vs_union_all_battery"] = q_union_vs_union_all_battery
ORACLES["union_vs_union_all_battery"] = ORACLE_UNION_VS_UNION_ALL_BATTERY


def q_bool_agg_battery(spark, sf_dir):
    """Boolean aggregates per priority: every/some/count_if — the
    predicate-rollup vocabulary (bool_and/bool_or in the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count_if(F.col("o_orderstatus") == "F").cast("long")
            .alias("n_finished"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_BOOL_AGG_BATTERY = """
SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS n_finished
FROM orders GROUP BY 1 ORDER BY 1
"""

QUERIES["bool_agg_battery"] = q_bool_agg_battery
ORACLES["bool_agg_battery"] = ORACLE_BOOL_AGG_BATTERY


def q_basket_value_quartiles_by_region(spark, sf_dir):
    """Order-value quartile cuts per customer region (exact integer
    ranks over cents; the customer→nation→region chain broadcasts into
    the orders scan)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    ).select("c_custkey", "r_name")
    j = o.join(F.broadcast(dim), o.o_custkey == F.col("c_custkey")).select(
        "r_name", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("r_name").orderBy("cents", "o_orderkey")
    ranked = j.withColumn("rk", F.row_number().over(w))
    per = j.groupBy("r_name").agg(F.count(F.lit(1)).cast("long").alias("n"))
    jj = ranked.join(F.broadcast(per), "r_name")
    out = None
    for q, name in ((0.25, "q1_cents"), (0.5, "q2_cents"), (0.75, "q3_cents")):
        sel = jj.filter(
            F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * q))
        ).select("r_name", F.col("cents").alias(name))
        out = sel if out is None else out.join(sel, "r_name")
    return out.orderBy("r_name")


ORACLE_BASKET_VALUE_QUARTILES_BY_REGION = """
WITH j AS (
  SELECT r_name, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
ranked AS (
  SELECT r_name, cents,
         row_number() OVER (PARTITION BY r_name
                            ORDER BY cents, o_orderkey) AS rk,
         count(*) OVER (PARTITION BY r_name) AS n
  FROM j
)
SELECT r_name,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
           THEN cents END) AS q1_cents,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
           THEN cents END) AS q2_cents,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.75) AS BIGINT))
           THEN cents END) AS q3_cents
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["basket_value_quartiles_by_region"] = q_basket_value_quartiles_by_region
ORACLES["basket_value_quartiles_by_region"] = (
    ORACLE_BASKET_VALUE_QUARTILES_BY_REGION
)


def q_events_value_ecdf_probe(spark, sf_dir):
    """Empirical CDF at fixed probe values per stream — one conditional
    agg pass, the monitoring-threshold calibration table."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                F.round(
                    F.sum((F.col("value") <= v).cast("long"))
                    / F.count(F.lit(1)), 6
                ).alias(f"cdf_{v}")
                for v in (10, 50, 100)
            ],
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_VALUE_ECDF_PROBE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE WHEN value <= 10 THEN 1 ELSE 0 END) / count(*), 6)
         AS cdf_10,
       round(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) / count(*), 6)
         AS cdf_50,
       round(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) / count(*), 6)
         AS cdf_100
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["events_value_ecdf_probe"] = q_events_value_ecdf_probe
ORACLES["events_value_ecdf_probe"] = ORACLE_EVENTS_VALUE_ECDF_PROBE


def q_order_fill_latency_bands(spark, sf_dir):
    """Fulfillment-start latency (order→FIRST ship) banded per
    priority: the ops SLA view that complements the per-supplier lag
    leaderboard; one min-agg per order before the band rollup."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    j = o.join(first_ship, o.o_orderkey == F.col("l_orderkey"))
    lag = F.datediff("first_ship", "o_orderdate")
    band = (
        F.when(lag <= 7, "0-7d")
        .when(lag <= 30, "8-30d")
        .when(lag <= 60, "31-60d")
        .otherwise("60d+")
    )
    return (
        j.groupBy("o_orderpriority", band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("o_orderpriority", "band")
    )


ORACLE_ORDER_FILL_LATENCY_BANDS = """
WITH first_ship AS (
  SELECT l_orderkey, min(l_shipdate) AS first_ship
  FROM lineitem GROUP BY 1
)
SELECT o_orderpriority,
       CASE WHEN datediff('day', o_orderdate, first_ship) <= 7 THEN '0-7d'
            WHEN datediff('day', o_orderdate, first_ship) <= 30 THEN '8-30d'
            WHEN datediff('day', o_orderdate, first_ship) <= 60 THEN '31-60d'
            ELSE '60d+' END AS band,
       CAST(count(*) AS BIGINT) AS n
FROM orders JOIN first_ship ON o_orderkey = l_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["order_fill_latency_bands"] = q_order_fill_latency_bands
ORACLES["order_fill_latency_bands"] = ORACLE_ORDER_FILL_LATENCY_BANDS


# ------------------------------------------------------- batch 8: mixed


def q_doc_source_lang_matrix(spark, sf_dir):
    """Corpus composition matrix with marginals via GROUPING SETS:
    (source, lang) cells plus per-source, per-lang, and grand totals in
    ONE Expand pass — the census a mixture-rebalance reads."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("r12_docs")
    return d.sparkSession.sql("""
        SELECT coalesce(source, '(all)') AS source,
               coalesce(lang, '(all)') AS lang,
               CAST(grouping_id(source, lang) AS INT) AS gid,
               CAST(count(*) AS BIGINT) AS docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM r12_docs
        GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
        ORDER BY gid, source, lang
    """)


ORACLE_DOC_SOURCE_LANG_MATRIX = """
SELECT coalesce(source, '(all)') AS source,
       coalesce(lang, '(all)') AS lang,
       CAST(grouping(source) * 2 + grouping(lang) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
ORDER BY gid, 1, 2
"""

QUERIES["doc_source_lang_matrix"] = q_doc_source_lang_matrix
ORACLES["doc_source_lang_matrix"] = ORACLE_DOC_SOURCE_LANG_MATRIX


def q_mode_stability_weekly(spark, sf_dir):
    """Weekly modal event type and whether it flipped week-over-week —
    regime-change detection on the cheapest possible signal. The mode
    picks deterministically by (count desc, type asc); the lag runs
    over the ~5-row weekly table."""
    e = load_table(spark, sf_dir, "events")
    weekly = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("wk"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("wk").orderBy(F.col("n").desc(), F.col("event_type").asc())
    modes = weekly.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") == 1
    ).select("wk", F.col("event_type").alias("mode_type"), "n")
    lw = Window.orderBy("wk")
    return (
        modes.withColumn(
            "changed",
            F.when(F.lag("mode_type").over(lw).isNull(), F.lit(None))
            .otherwise(F.lag("mode_type").over(lw) != F.col("mode_type")),
        )
        .select("wk", "mode_type", "n", "changed")
        .orderBy("wk")
    )


ORACLE_MODE_STABILITY_WEEKLY = """
WITH weekly AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
modes AS (
  SELECT wk, event_type AS mode_type, n,
         row_number() OVER (PARTITION BY wk
                            ORDER BY n DESC, event_type ASC) AS rk
  FROM weekly
)
SELECT wk, mode_type, n,
       CASE WHEN lag(mode_type) OVER (ORDER BY wk) IS NULL THEN NULL
            ELSE lag(mode_type) OVER (ORDER BY wk) <> mode_type END
         AS changed
FROM modes WHERE rk = 1 ORDER BY wk
"""

QUERIES["mode_stability_weekly"] = q_mode_stability_weekly
ORACLES["mode_stability_weekly"] = ORACLE_MODE_STABILITY_WEEKLY


def q_brand_price_premium(spark, sf_dir):
    """Per-brand list-price premium vs the catalog mean, in exact
    cents until the final two divisions — the assortment pricing view;
    the global scalar rides a 1-row broadcast."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    per = p.select("p_brand", cents.alias("c")).groupBy("p_brand").agg(
        F.sum("c").alias("sum_c"), F.count(F.lit(1)).cast("long").alias("n")
    )
    glob = p.select(cents.alias("c")).agg(
        F.sum("c").alias("gsum"), F.count(F.lit(1)).cast("long").alias("gn")
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "p_brand", "n",
            F.round(
                (F.col("sum_c") / F.col("n"))
                / (F.col("gsum") / F.col("gn")) - 1, 6
            ).alias("premium"),
        )
        .orderBy("p_brand")
    )


ORACLE_BRAND_PRICE_PREMIUM = """
WITH per AS (
  SELECT p_brand,
         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_c,
         CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1
),
g AS (
  SELECT CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS gsum,
         CAST(count(*) AS BIGINT) AS gn
  FROM part
)
SELECT p_brand, n,
       round((sum_c / n) / (gsum / gn) - 1, 6) AS premium
FROM per, g ORDER BY p_brand
"""

QUERIES["brand_price_premium"] = q_brand_price_premium
ORACLES["brand_price_premium"] = ORACLE_BRAND_PRICE_PREMIUM


def q_cume_dist_battery(spark, sf_dir):
    """cume_dist + percent_rank over supplier balances per nation —
    the two normalized-rank functions whose tie handling differs from
    each other (cume_dist counts peers IN, percent_rank counts them
    OUT); pinned at the top-balance supplier of each nation."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_name").orderBy("s_acctbal")
    scored = j.select(
        "n_name", "s_name", "s_acctbal",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )
    pick = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_name").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select("n_name", "s_name", "cd", "pr")
        .orderBy("n_name")
    )


ORACLE_CUME_DIST_BATTERY = """
WITH scored AS (
  SELECT n_name, s_name, s_acctbal,
         round(cume_dist() OVER (PARTITION BY n_name ORDER BY s_acctbal), 6)
           AS cd,
         round(percent_rank() OVER (PARTITION BY n_name ORDER BY s_acctbal), 6)
           AS pr,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY s_acctbal DESC, s_name ASC) AS rk
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, s_name, cd, pr FROM scored WHERE rk = 1 ORDER BY n_name
"""

QUERIES["cume_dist_battery"] = q_cume_dist_battery
ORACLES["cume_dist_battery"] = ORACLE_CUME_DIST_BATTERY


def q_trade_region_matrix(spark, sf_dir):
    """Supplier-region × customer-region revenue matrix (exact cents):
    the Q7 nation-pair shape widened to the full region grid; both dim
    chains broadcast, lineitem-orders is the only fact-fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    sdim = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("r_name").alias("supp_region"),
    )
    cdim = c.join(F.broadcast(nr), c.c_nationkey == nr.n_nationkey).select(
        "c_custkey", F.col("r_name").alias("cust_region")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.select("l_orderkey", "l_suppkey", cents.alias("c"))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(sdim), "l_suppkey")
        .join(F.broadcast(cdim), F.col("o_custkey") == cdim.c_custkey)
        .groupBy("supp_region", "cust_region")
        .agg(F.sum("c").alias("revenue_cents"))
        .orderBy("supp_region", "cust_region")
    )


ORACLE_TRADE_REGION_MATRIX = """
SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN region sr ON sn.n_regionkey = sr.r_regionkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region cr ON cn.n_regionkey = cr.r_regionkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["trade_region_matrix"] = q_trade_region_matrix
ORACLES["trade_region_matrix"] = ORACLE_TRADE_REGION_MATRIX


def q_user_span_bands(spark, sf_dir):
    """User lifetime-span histogram: days between first and last event
    per user, banded — the churn-exposure census (one min/max agg per
    user, then a band rollup)."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .alias("span_days")
    )
    band = (
        F.when(F.col("span_days") == 0, "same-day")
        .when(F.col("span_days") <= 7, "1-7d")
        .when(F.col("span_days") <= 21, "8-21d")
        .otherwise("22d+")
    )
    return (
        per.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("band")
    )


ORACLE_USER_SPAN_BANDS = """
WITH per AS (
  SELECT user_id,
         datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
           AS span_days
  FROM events GROUP BY 1
)
SELECT CASE WHEN span_days = 0 THEN 'same-day'
            WHEN span_days <= 7 THEN '1-7d'
            WHEN span_days <= 21 THEN '8-21d'
            ELSE '22d+' END AS band,
       CAST(count(*) AS BIGINT) AS users
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["user_span_bands"] = q_user_span_bands
ORACLES["user_span_bands"] = ORACLE_USER_SPAN_BANDS


def q_top_type_by_hourofday(spark, sf_dir):
    """Modal event type per hour-of-day with its share — the daily
    rhythm fingerprint; deterministic mode pick, shares from exact
    counts."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(F.hour("ts").cast("int").alias("hod"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("hod").orderBy(F.col("n").desc(), F.col("event_type").asc())
    wt = Window.partitionBy("hod")
    return (
        per.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rk") == 1)
        .select(
            "hod", F.col("event_type").alias("mode_type"), "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
        .orderBy("hod")
    )


ORACLE_TOP_TYPE_BY_HOUROFDAY = """
WITH per AS (
  SELECT CAST(hour(ts) AS INT) AS hod, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT hod, event_type, n,
         row_number() OVER (PARTITION BY hod
                            ORDER BY n DESC, event_type ASC) AS rk,
         sum(n) OVER (PARTITION BY hod) AS total
  FROM per
)
SELECT hod, event_type AS mode_type, n, round(n / total, 6) AS share
FROM r WHERE rk = 1 ORDER BY hod
"""

QUERIES["top_type_by_hourofday"] = q_top_type_by_hourofday
ORACLES["top_type_by_hourofday"] = ORACLE_TOP_TYPE_BY_HOUROFDAY


def q_dow_hour_heatmap(spark, sf_dir):
    """The ops-dashboard weekday×hour traffic heatmap with global
    shares — 168 cells, exact counts, the dayofweek convention pinned
    once more on a 2-D grid."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy()
    return (
        per.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .select("dow", "hod", "n", "share")
        .orderBy("dow", "hod")
    )


ORACLE_DOW_HOUR_HEATMAP = """
WITH per AS (
  SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
         CAST(hour(ts) AS INT) AS hod, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT dow, hod, n, round(n / sum(n) OVER (), 6) AS share
FROM per ORDER BY dow, hod
"""

QUERIES["dow_hour_heatmap"] = q_dow_hour_heatmap
ORACLES["dow_hour_heatmap"] = ORACLE_DOW_HOUR_HEATMAP
