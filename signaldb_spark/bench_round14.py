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


# ------------------------------------------------------------- batch 2


def q_order_halves_symmetry(spark, sf_dir):
    """H1-vs-H2 revenue split per year — the seasonality-balance read
    (exact cents, one conditional agg)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    h1 = F.month("o_orderdate") <= 6
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.when(h1, cents).otherwise(0)).alias("h1_cents"),
            F.sum(F.when(~h1, cents).otherwise(0)).alias("h2_cents"),
        )
        .withColumn(
            "h1_share",
            F.round(F.col("h1_cents")
                    / (F.col("h1_cents") + F.col("h2_cents")), 6),
        )
        .orderBy("yr")
    )


ORACLE_ORDER_HALVES_SYMMETRY = """
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(sum(CASE WHEN month(o_orderdate) <= 6
            THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
         AS BIGINT) AS h1_cents,
       CAST(sum(CASE WHEN month(o_orderdate) > 6
            THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
         AS BIGINT) AS h2_cents,
       round(sum(CASE WHEN month(o_orderdate) <= 6
                 THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
             / (sum(CAST(round(o_totalprice * 100) AS BIGINT))), 6)
         AS h1_share
FROM orders GROUP BY 1 ORDER BY 1
"""

QUERIES["order_halves_symmetry"] = q_order_halves_symmetry
ORACLES["order_halves_symmetry"] = ORACLE_ORDER_HALVES_SYMMETRY


def q_quantity_discount_interaction(spark, sf_dir):
    """Do bigger orders get deeper discounts? Mean discount (basis
    points, exact) per quantity band — the pricing-policy check."""
    li = load_table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_quantity") <= 10, "q01-10")
        .when(F.col("l_quantity") <= 25, "q11-25")
        .when(F.col("l_quantity") <= 40, "q26-40")
        .otherwise("q41-50")
    )
    bps = F.round(F.col("l_discount") * 10000).cast("long")
    return (
        li.groupBy(band.alias("qty_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("lines"),
            F.sum(bps).alias("bps_sum"),
        )
        .select(
            "qty_band", "lines",
            F.round(F.col("bps_sum") / F.col("lines"), 6).alias("avg_bps"),
        )
        .orderBy("qty_band")
    )


ORACLE_QUANTITY_DISCOUNT_INTERACTION = """
WITH per AS (
  SELECT CASE WHEN l_quantity <= 10 THEN 'q01-10'
              WHEN l_quantity <= 25 THEN 'q11-25'
              WHEN l_quantity <= 40 THEN 'q26-40'
              ELSE 'q41-50' END AS qty_band,
         CAST(round(l_discount * 10000) AS BIGINT) AS bps
  FROM lineitem
)
SELECT qty_band, CAST(count(*) AS BIGINT) AS lines,
       round(sum(bps) / count(*), 6) AS avg_bps
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["quantity_discount_interaction"] = q_quantity_discount_interaction
ORACLES["quantity_discount_interaction"] = ORACLE_QUANTITY_DISCOUNT_INTERACTION


def q_yearly_top10_customer_share(spark, sf_dir):
    """Revenue share of each year's top-10 customers (exact rank cut,
    tiebreak custkey) — key-account concentration over time."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey"
    ).agg(F.sum(cents).alias("c"))
    w = Window.partitionBy("yr").orderBy(
        F.col("c").desc(), F.col("o_custkey").asc()
    )
    wt = Window.partitionBy("yr")
    return (
        per.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("c").over(wt))
        .filter(F.col("rk") <= 10)
        .groupBy("yr")
        .agg(
            F.round(F.sum("c") / F.first("total"), 6).alias("top10_share")
        )
        .orderBy("yr")
    )


ORACLE_YEARLY_TOP10_CUSTOMER_SHARE = """
WITH per AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr, o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT yr, c,
         row_number() OVER (PARTITION BY yr
                            ORDER BY c DESC, o_custkey ASC) AS rk,
         sum(c) OVER (PARTITION BY yr) AS total
  FROM per
)
SELECT yr, round(sum(c) / max(total), 6) AS top10_share
FROM ranked WHERE rk <= 10 GROUP BY 1 ORDER BY 1
"""

QUERIES["yearly_top10_customer_share"] = q_yearly_top10_customer_share
ORACLES["yearly_top10_customer_share"] = ORACLE_YEARLY_TOP10_CUSTOMER_SHARE


def q_brand_size_coverage(spark, sf_dir):
    """Assortment coverage per brand: distinct sizes offered and their
    share of the catalog's full size range — the range-planning view."""
    p = load_table(spark, sf_dir, "part")
    total_sizes = p.select(
        F.countDistinct("p_size").cast("long").alias("catalog_sizes")
    )
    per = p.groupBy("p_brand").agg(
        F.countDistinct("p_size").cast("long").alias("sizes"),
        F.count(F.lit(1)).cast("long").alias("parts"),
    )
    return (
        per.crossJoin(F.broadcast(total_sizes))
        .select(
            "p_brand", "parts", "sizes",
            F.round(F.col("sizes") / F.col("catalog_sizes"), 6)
            .alias("coverage"),
        )
        .orderBy("p_brand")
    )


ORACLE_BRAND_SIZE_COVERAGE = """
WITH t AS (SELECT CAST(count(DISTINCT p_size) AS BIGINT) AS catalog_sizes
           FROM part)
SELECT p_brand, CAST(count(*) AS BIGINT) AS parts,
       CAST(count(DISTINCT p_size) AS BIGINT) AS sizes,
       round(count(DISTINCT p_size) / t.catalog_sizes, 6) AS coverage
FROM part, t GROUP BY 1, t.catalog_sizes ORDER BY 1
"""

QUERIES["brand_size_coverage"] = q_brand_size_coverage
ORACLES["brand_size_coverage"] = ORACLE_BRAND_SIZE_COVERAGE


def q_segment_priority_affinity(spark, sf_dir):
    """Segment × priority lift matrix (observed / expected under
    independence, from exact counts) — where sales motion differs by
    customer type."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    per = j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ws = Window.partitionBy("c_mktsegment")
    wp = Window.partitionBy("o_orderpriority")
    wt = Window.partitionBy()
    return (
        per.withColumn(
            "lift",
            F.round(
                F.col("n") * F.sum("n").over(wt)
                / (F.sum("n").over(ws) * F.sum("n").over(wp)), 6
            ),
        )
        .select("c_mktsegment", "o_orderpriority", "n", "lift")
        .orderBy("c_mktsegment", "o_orderpriority")
    )


ORACLE_SEGMENT_PRIORITY_AFFINITY = """
WITH per AS (
  SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, o_orderpriority, n,
       round(n * sum(n) OVER ()
             / (sum(n) OVER (PARTITION BY c_mktsegment)
                * sum(n) OVER (PARTITION BY o_orderpriority)), 6) AS lift
FROM per ORDER BY c_mktsegment, o_orderpriority
"""

QUERIES["segment_priority_affinity"] = q_segment_priority_affinity
ORACLES["segment_priority_affinity"] = ORACLE_SEGMENT_PRIORITY_AFFINITY


def q_basket_size_by_value_band(spark, sf_dir):
    """Average lines-per-order by order-value band — basket geometry
    against spend (exact counts/cents, one join of two rollups)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lines = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    band = (
        F.when(cents < 5_000_000, "low")
        .when(cents < 20_000_000, "mid")
        .otherwise("high")
    )
    j = o.select("o_orderkey", band.alias("band")).join(
        lines, F.col("o_orderkey") == lines.l_orderkey
    )
    return (
        j.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.round(F.sum("n_lines") / F.count(F.lit(1)), 6)
            .alias("avg_lines"),
            F.max("n_lines").alias("max_lines"),
        )
        .orderBy("band")
    )


ORACLE_BASKET_SIZE_BY_VALUE_BAND = """
WITH lines AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) < 5000000
              THEN 'low'
              WHEN CAST(round(o_totalprice * 100) AS BIGINT) < 20000000
              THEN 'mid' ELSE 'high' END AS band,
         n_lines
  FROM orders JOIN lines ON o_orderkey = l_orderkey
)
SELECT band, CAST(count(*) AS BIGINT) AS orders,
       round(sum(n_lines) / count(*), 6) AS avg_lines,
       max(n_lines) AS max_lines
FROM j GROUP BY 1 ORDER BY 1
"""

QUERIES["basket_size_by_value_band"] = q_basket_size_by_value_band
ORACLES["basket_size_by_value_band"] = ORACLE_BASKET_SIZE_BY_VALUE_BAND


def q_same_month_ship_share(spark, sf_dir):
    """Fulfillment locality: share of lineitems shipped in the SAME
    calendar month as the order, per year — the quick-turn ratio."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    same = (F.date_trunc("month", "l_shipdate")
            == F.date_trunc("month", "o_orderdate"))
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("lines"),
            F.sum(same.cast("long")).alias("same_month"),
        )
        .withColumn("share", F.round(F.col("same_month") / F.col("lines"), 6))
        .orderBy("yr")
    )


ORACLE_SAME_MONTH_SHIP_SHARE = """
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(count(*) AS BIGINT) AS lines,
       CAST(sum(CASE WHEN date_trunc('month', l_shipdate)
                = date_trunc('month', o_orderdate)
                THEN 1 ELSE 0 END) AS BIGINT) AS same_month,
       round(sum(CASE WHEN date_trunc('month', l_shipdate)
             = date_trunc('month', o_orderdate) THEN 1 ELSE 0 END)
             / count(*), 6) AS share
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["same_month_ship_share"] = q_same_month_ship_share
ORACLES["same_month_ship_share"] = ORACLE_SAME_MONTH_SHIP_SHARE


def q_nation_balance_iqr(spark, sf_dir):
    """Supplier account-balance IQR per nation by exact integer-rank
    selection on cents — the spread audit behind the MAD gate."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "n_name", cents.alias("c"), "s_suppkey"
    )
    w = Window.partitionBy("n_name").orderBy("c", "s_suppkey")
    ranked = j.withColumn("rk", F.row_number().over(w))
    per = j.groupBy("n_name").agg(F.count(F.lit(1)).cast("long").alias("n"))
    jj = ranked.join(F.broadcast(per), "n_name")
    q1 = jj.filter(
        F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * 0.25))
    ).select("n_name", F.col("c").alias("q1_cents"))
    q3 = jj.filter(
        F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * 0.75))
    ).select("n_name", F.col("c").alias("q3_cents"))
    return (
        q1.join(q3, "n_name")
        .withColumn("iqr_cents", F.col("q3_cents") - F.col("q1_cents"))
        .orderBy("n_name")
    )


ORACLE_NATION_BALANCE_IQR = """
WITH j AS (
  SELECT n_name, CAST(round(s_acctbal * 100) AS BIGINT) AS c, s_suppkey
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
ranked AS (
  SELECT n_name, c,
         row_number() OVER (PARTITION BY n_name ORDER BY c, s_suppkey) AS rk,
         count(*) OVER (PARTITION BY n_name) AS n
  FROM j
)
SELECT n_name,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
           THEN c END) AS q1_cents,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.75) AS BIGINT))
           THEN c END) AS q3_cents,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.75) AS BIGINT))
           THEN c END)
       - max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
             THEN c END) AS iqr_cents
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["nation_balance_iqr"] = q_nation_balance_iqr
ORACLES["nation_balance_iqr"] = ORACLE_NATION_BALANCE_IQR


# ------------------------------------------------------------- batch 3


def q_daily_peak_trough_ratio(spark, sf_dir):
    """Intraday load shape per stream: mean of each day's peak/trough
    hourly-count ratio — capacity-planning headroom (exact counts; the
    ratio averaged over the ~30-row daily table)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.to_date("ts").alias("day"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    daily = hourly.groupBy("event_type", "day").agg(
        F.max("n").alias("peak"), F.min("n").alias("trough"),
        F.count(F.lit(1)).cast("long").alias("active_hours"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("days"),
            F.round(F.avg(F.col("peak") / F.col("trough")), 6)
            .alias("avg_peak_trough"),
            F.round(F.avg("active_hours"), 6).alias("avg_active_hours"),
        )
        .orderBy("event_type")
    )


ORACLE_DAILY_PEAK_TROUGH_RATIO = """
WITH hourly AS (
  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hod,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
daily AS (
  SELECT event_type, day, max(n) AS peak, min(n) AS trough,
         CAST(count(*) AS BIGINT) AS active_hours
  FROM hourly GROUP BY 1, 2
)
SELECT event_type, CAST(count(*) AS BIGINT) AS days,
       round(avg(peak * 1.0 / trough), 6) AS avg_peak_trough,
       round(avg(active_hours), 6) AS avg_active_hours
FROM daily GROUP BY 1 ORDER BY 1
"""

QUERIES["daily_peak_trough_ratio"] = q_daily_peak_trough_ratio
ORACLES["daily_peak_trough_ratio"] = ORACLE_DAILY_PEAK_TROUGH_RATIO


def q_value_round_number_bias(spark, sf_dir):
    """Forensic round-number bias per stream: shares of values that
    are exact integers and exact multiples of 5 (from integer cents —
    never float formatting)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((cents % 100 == 0).cast("long")).alias("integers"),
            F.sum((cents % 500 == 0).cast("long")).alias("mult5"),
        )
        .select(
            "event_type", "n",
            F.round(F.col("integers") / F.col("n"), 6).alias("int_share"),
            F.round(F.col("mult5") / F.col("n"), 6).alias("mult5_share"),
        )
        .orderBy("event_type")
    )


ORACLE_VALUE_ROUND_NUMBER_BIAS = """
WITH per AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END)
             / count(*), 6) AS int_share,
       round(sum(CASE WHEN cents % 500 = 0 THEN 1 ELSE 0 END)
             / count(*), 6) AS mult5_share
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["value_round_number_bias"] = q_value_round_number_bias
ORACLES["value_round_number_bias"] = ORACLE_VALUE_ROUND_NUMBER_BIAS


def q_first_session_depth_retention(spark, sf_dir):
    """Does first-session depth predict coming back? Users bucketed by
    FIRST 30-min session's event count, each bucket's share of users
    with a later session."""
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
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("depth")
    )
    agg = per.groupBy("user_id").agg(
        F.min_by("depth", "sid").alias("first_depth"),
        F.max("sid").alias("sessions"),
    )
    band = (
        F.when(F.col("first_depth") == 1, "1")
        .when(F.col("first_depth") <= 3, "2-3")
        .otherwise("4+")
    )
    return (
        agg.groupBy(band.alias("first_depth_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("users"),
            F.sum((F.col("sessions") >= 2).cast("long")).alias("returned"),
        )
        .withColumn(
            "return_rate", F.round(F.col("returned") / F.col("users"), 6)
        )
        .orderBy("first_depth_band")
    )


ORACLE_FIRST_SESSION_DEPTH_RETENTION = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM marked
),
per AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS depth
  FROM sess GROUP BY 1, 2
),
agg AS (
  SELECT user_id, arg_min(depth, sid) AS first_depth,
         max(sid) AS sessions
  FROM per GROUP BY 1
)
SELECT CASE WHEN first_depth = 1 THEN '1'
            WHEN first_depth <= 3 THEN '2-3' ELSE '4+' END
         AS first_depth_band,
       CAST(count(*) AS BIGINT) AS users,
       CAST(sum(CASE WHEN sessions >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS returned,
       round(sum(CASE WHEN sessions >= 2 THEN 1 ELSE 0 END) / count(*), 6)
         AS return_rate
FROM agg GROUP BY 1 ORDER BY 1
"""

QUERIES["first_session_depth_retention"] = q_first_session_depth_retention
ORACLES["first_session_depth_retention"] = ORACLE_FIRST_SESSION_DEPTH_RETENTION


def q_hourly_autocorr_lag24(spark, sf_dir):
    """Daily-rhythm strength per stream: lag-24 autocorrelation of the
    hourly count series (Pearson over (h, h+24) pairs; exact integer
    moments, closed form in doubles)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    nxt = hourly.select(
        F.col("event_type").alias("t2"),
        (F.col("h") - F.expr("INTERVAL 24 HOURS")).alias("h_prev"),
        F.col("n").alias("n2"),
    )
    pairs = hourly.join(
        nxt, (hourly.event_type == nxt.t2) & (hourly.h == nxt.h_prev)
    ).select("event_type", F.col("n").alias("x"), F.col("n2").alias("y"))
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = {c: F.col(c).cast("double") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    num = d["n"] * d["sxy"] - d["sx"] * d["sy"]
    den = F.sqrt(
        (d["n"] * d["sxx"] - d["sx"] * d["sx"])
        * (d["n"] * d["syy"] - d["sy"] * d["sy"])
    )
    return m.select(
        "event_type", "n", F.round(num / den, 6).alias("autocorr_24h")
    ).orderBy("event_type")


ORACLE_HOURLY_AUTOCORR_LAG24 = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.n AS x, b.n AS y
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND b.h = a.h + INTERVAL 24 HOURS
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY 1
)
SELECT event_type, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS autocorr_24h
FROM m ORDER BY event_type
"""

QUERIES["hourly_autocorr_lag24"] = q_hourly_autocorr_lag24
ORACLES["hourly_autocorr_lag24"] = ORACLE_HOURLY_AUTOCORR_LAG24


def q_active_days_value_corr(spark, sf_dir):
    """Engagement-monetization link: Pearson r between per-user active
    days and total value cents (integer moments, double closed form)."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.countDistinct(F.to_date("ts")).cast("long").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
    )
    m = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("double") * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
    )
    d = {c: F.col(c).cast("double") for c in ("n", "sx", "sy")}
    num = d["n"] * F.col("sxy") - d["sx"] * d["sy"]
    den = F.sqrt(
        (d["n"] * F.col("sxx") - d["sx"] * d["sx"])
        * (d["n"] * F.col("syy") - d["sy"] * d["sy"])
    )
    return m.select("n", F.round(num / den, 6).alias("pearson_r"))


ORACLE_ACTIVE_DAYS_VALUE_CORR = """
WITH per AS (
  SELECT user_id,
         CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS x,
         sum(CAST(round(value * 100) AS BIGINT)) AS y
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS DOUBLE) * x) AS sxx,
         sum(CAST(y AS DOUBLE) * y) AS syy,
         sum(CAST(x AS DOUBLE) * y) AS sxy
  FROM per
)
SELECT n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS pearson_r
FROM m
"""

QUERIES["active_days_value_corr"] = q_active_days_value_corr
ORACLES["active_days_value_corr"] = ORACLE_ACTIVE_DAYS_VALUE_CORR


def q_source_lang_purity(spark, sf_dir):
    """Dominant language share per source — mislabeled-source triage
    (deterministic dominant pick by count desc, lang asc)."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("lang").asc()
    )
    wt = Window.partitionBy("source")
    return (
        per.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rk") == 1)
        .select(
            "source", F.col("lang").alias("dominant_lang"),
            F.round(F.col("n") / F.col("total"), 6).alias("purity"),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_LANG_PURITY = """
WITH per AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
r AS (
  SELECT source, lang, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, lang ASC) AS rk,
         sum(n) OVER (PARTITION BY source) AS total
  FROM per
)
SELECT source, lang AS dominant_lang, round(n / total, 6) AS purity
FROM r WHERE rk = 1 ORDER BY source
"""

QUERIES["source_lang_purity"] = q_source_lang_purity
ORACLES["source_lang_purity"] = ORACLE_SOURCE_LANG_PURITY


def q_alpha_density_percentiles(spark, sf_dir):
    """Alphabetic-character density p10/p50/p90 per source by exact
    integer-rank selection on ppm-scaled densities — the binary-junk
    screen."""
    d = load_table(spark, sf_dir, "documents")
    alpha = F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")).cast("long")
    ppm = F.floor(alpha * 1_000_000 / F.length("text")).cast("long")
    scored = d.filter(F.length("text") > 0).select(
        "source", ppm.alias("ppm"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy("ppm", "doc_id")
    ranked = scored.withColumn("rk", F.row_number().over(w))
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    j = ranked.join(F.broadcast(per), "source")
    out = None
    for q, name in ((0.1, "p10_ppm"), (0.5, "p50_ppm"), (0.9, "p90_ppm")):
        sel = j.filter(
            F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * q))
        ).select("source", F.col("ppm").alias(name))
        out = sel if out is None else out.join(sel, "source")
    return out.orderBy("source")


ORACLE_ALPHA_DENSITY_PERCENTILES = """
WITH scored AS (
  SELECT source,
         CAST(floor(len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
              * 1000000 / len(text)) AS BIGINT) AS ppm,
         doc_id
  FROM documents WHERE len(text) > 0
),
ranked AS (
  SELECT source, ppm,
         row_number() OVER (PARTITION BY source ORDER BY ppm, doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n
  FROM scored
)
SELECT source,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.1) AS BIGINT))
           THEN ppm END) AS p10_ppm,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
           THEN ppm END) AS p50_ppm,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.9) AS BIGINT))
           THEN ppm END) AS p90_ppm
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["alpha_density_percentiles"] = q_alpha_density_percentiles
ORACLES["alpha_density_percentiles"] = ORACLE_ALPHA_DENSITY_PERCENTILES


def q_vocab_half_drift(spark, sf_dir):
    """Corpus drift along ingestion order: vocabulary Jaccard between
    the doc_id halves, per lang — the (word, lang, half) distinct
    rollup joins on itself, bounded by vocabulary size."""
    d = load_table(spark, sf_dir, "documents")
    mid = d.agg(F.percentile(F.col("doc_id").cast("double"), F.lit(0.5))
                .alias("m"))
    ws = (
        d.crossJoin(F.broadcast(mid))
        .select(
            "lang",
            (F.col("doc_id") <= F.col("m")).alias("first_half"),
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
        )
        .distinct()
    )
    a = ws.filter(F.col("first_half")).select("lang", "w")
    b_ = ws.filter(~F.col("first_half")).select(F.col("lang").alias("l2"), F.col("w").alias("w2"))
    inter = a.join(
        b_, (a.lang == b_.l2) & (a.w == b_.w2)
    ).groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("i"))
    sizes = ws.groupBy("lang", "first_half").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    va = sizes.filter(F.col("first_half")).select("lang", F.col("v").alias("va"))
    vb = sizes.filter(~F.col("first_half")).select("lang", F.col("v").alias("vb"))
    return (
        inter.join(va, "lang").join(vb, "lang")
        .select(
            "lang",
            F.round(F.col("i") / (F.col("va") + F.col("vb") - F.col("i")), 6)
            .alias("half_jaccard"),
        )
        .orderBy("lang")
    )


ORACLE_VOCAB_HALF_DRIFT = r"""
WITH mid AS (
  SELECT quantile_cont(CAST(doc_id AS DOUBLE), 0.5) AS m FROM documents
),
ws AS (
  SELECT DISTINCT lang, doc_id <= m AS first_half, w
  FROM documents, mid,
       unnest(regexp_split_to_array(trim(text), '\s+')) AS t(w)
),
inter AS (
  SELECT a.lang, CAST(count(*) AS BIGINT) AS i
  FROM ws a JOIN ws b
    ON a.lang = b.lang AND a.w = b.w AND a.first_half AND NOT b.first_half
  GROUP BY 1
),
sizes AS (
  SELECT lang, first_half, CAST(count(*) AS BIGINT) AS v
  FROM ws GROUP BY 1, 2
)
SELECT i.lang,
       round(i.i / (va.v + vb.v - i.i), 6) AS half_jaccard
FROM inter i
JOIN sizes va ON va.lang = i.lang AND va.first_half
JOIN sizes vb ON vb.lang = i.lang AND NOT vb.first_half
ORDER BY i.lang
"""

QUERIES["vocab_half_drift"] = q_vocab_half_drift
ORACLES["vocab_half_drift"] = ORACLE_VOCAB_HALF_DRIFT


# ------------------------------------------------------------- batch 4


def q_balance_sign_activity(spark, sf_dir):
    """Do negative-balance customers order differently? Order rate and
    value per balance-sign cohort — exact counts/cents, one broadcast
    dim join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative").otherwise("non-negative")
        .alias("bal_sign"),
    )
    cust = c.groupBy("bal_sign").agg(
        F.count(F.lit(1)).cast("long").alias("customers")
    )
    ords = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("bal_sign")
        .agg(
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("cents"),
        )
    )
    return (
        cust.join(ords, "bal_sign")
        .select(
            "bal_sign", "customers", "orders",
            F.round(F.col("orders") / F.col("customers"), 6)
            .alias("orders_per_customer"),
            F.round(F.col("cents") / F.col("orders") / 100.0, 6)
            .alias("avg_order_value"),
        )
        .orderBy("bal_sign")
    )


ORACLE_BALANCE_SIGN_ACTIVITY = """
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN 'negative'
              ELSE 'non-negative' END AS bal_sign
  FROM customer
),
cust AS (
  SELECT bal_sign, CAST(count(*) AS BIGINT) AS customers FROM c GROUP BY 1
),
ords AS (
  SELECT bal_sign, CAST(count(*) AS BIGINT) AS orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders JOIN c ON o_custkey = c_custkey GROUP BY 1
)
SELECT bal_sign, customers, orders,
       round(orders / customers, 6) AS orders_per_customer,
       round(cents / orders / 100.0, 6) AS avg_order_value
FROM cust JOIN ords USING (bal_sign) ORDER BY bal_sign
"""

QUERIES["balance_sign_activity"] = q_balance_sign_activity
ORACLES["balance_sign_activity"] = ORACLE_BALANCE_SIGN_ACTIVITY


def q_typeclass_price_quartiles(spark, sf_dir):
    """Retail-price quartiles per type class (first word of p_type) by
    exact integer-rank selection on cents."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    scored = p.select(
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_class"),
        cents.alias("c"), "p_partkey",
    )
    w = Window.partitionBy("type_class").orderBy("c", "p_partkey")
    ranked = scored.withColumn("rk", F.row_number().over(w))
    per = scored.groupBy("type_class").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    j = ranked.join(F.broadcast(per), "type_class")
    out = None
    for q, name in ((0.25, "q1_cents"), (0.5, "q2_cents"), (0.75, "q3_cents")):
        sel = j.filter(
            F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * q))
        ).select("type_class", F.col("c").alias(name))
        out = sel if out is None else out.join(sel, "type_class")
    return out.orderBy("type_class")


ORACLE_TYPECLASS_PRICE_QUARTILES = """
WITH scored AS (
  SELECT split_part(p_type, ' ', 1) AS type_class,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c, p_partkey
  FROM part
),
ranked AS (
  SELECT type_class, c,
         row_number() OVER (PARTITION BY type_class
                            ORDER BY c, p_partkey) AS rk,
         count(*) OVER (PARTITION BY type_class) AS n
  FROM scored
)
SELECT type_class,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
           THEN c END) AS q1_cents,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
           THEN c END) AS q2_cents,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.75) AS BIGINT))
           THEN c END) AS q3_cents
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["typeclass_price_quartiles"] = q_typeclass_price_quartiles
ORACLES["typeclass_price_quartiles"] = ORACLE_TYPECLASS_PRICE_QUARTILES


def q_busiest_quietest_dates(spark, sf_dir):
    """Global order-volume extremes: top-3 and bottom-3 dates by count
    (deterministic tiebreak on the date) — the calendar outlier card."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    top = daily.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("n").desc(), F.col("day").asc()))
    ).filter(F.col("rk") <= 3).select(
        F.lit("busiest").alias("kind"), "rk", "day", "n")
    bot = daily.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("n").asc(), F.col("day").asc()))
    ).filter(F.col("rk") <= 3).select(
        F.lit("quietest").alias("kind"), "rk", "day", "n")
    return top.unionByName(bot).orderBy("kind", "rk")


ORACLE_BUSIEST_QUIETEST_DATES = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
top AS (
  SELECT 'busiest' AS kind,
         row_number() OVER (ORDER BY n DESC, day ASC) AS rk, day, n
  FROM daily
),
bot AS (
  SELECT 'quietest' AS kind,
         row_number() OVER (ORDER BY n ASC, day ASC) AS rk, day, n
  FROM daily
)
SELECT kind, CAST(rk AS BIGINT) AS rk, day, n FROM top WHERE rk <= 3
UNION ALL
SELECT kind, CAST(rk AS BIGINT) AS rk, day, n FROM bot WHERE rk <= 3
ORDER BY kind, rk
"""

QUERIES["busiest_quietest_dates"] = q_busiest_quietest_dates
ORACLES["busiest_quietest_dates"] = ORACLE_BUSIEST_QUIETEST_DATES


def q_supplier_part_efficiency(spark, sf_dir):
    """Top-10 suppliers by revenue per distinct part served — focus vs
    breadth; two exact rollup columns per supplier, TakeOrdered cut."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per = li.groupBy("l_suppkey").agg(
        F.sum(cents).alias("cents"),
        F.countDistinct("l_partkey").cast("long").alias("parts"),
    )
    return (
        per.select(
            "l_suppkey", "parts",
            F.round(F.col("cents") / F.col("parts") / 100.0, 6)
            .alias("revenue_per_part"),
        )
        .orderBy(F.col("revenue_per_part").desc(), F.col("l_suppkey").asc())
        .limit(10)
    )


ORACLE_SUPPLIER_PART_EFFICIENCY = """
WITH per AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
             AS BIGINT)) AS cents,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts
  FROM lineitem GROUP BY 1
)
SELECT l_suppkey, parts,
       round(cents / parts / 100.0, 6) AS revenue_per_part
FROM per ORDER BY revenue_per_part DESC, l_suppkey ASC LIMIT 10
"""

QUERIES["supplier_part_efficiency"] = q_supplier_part_efficiency
ORACLES["supplier_part_efficiency"] = ORACLE_SUPPLIER_PART_EFFICIENCY


def q_nation_market_depth(spark, sf_dir):
    """Customers-per-supplier ratio per nation — demand vs supply
    footprint from two dim rollups joined on the nation."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cc = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("customers"))
    ss = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("suppliers"))
    return (
        n.join(cc, n.n_nationkey == cc.c_nationkey, "left")
        .join(ss, n.n_nationkey == ss.s_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
            F.round(
                F.coalesce("customers", F.lit(0))
                / F.greatest(F.coalesce("suppliers", F.lit(0)), F.lit(1)), 6
            ).alias("depth"),
        )
        .orderBy("n_name")
    )


ORACLE_NATION_MARKET_DEPTH = """
WITH cc AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS customers
  FROM customer GROUP BY 1
),
ss AS (
  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS suppliers
  FROM supplier GROUP BY 1
)
SELECT n_name,
       coalesce(customers, 0) AS customers,
       coalesce(suppliers, 0) AS suppliers,
       round(coalesce(customers, 0)
             / greatest(coalesce(suppliers, 0), 1), 6) AS depth
FROM nation
LEFT JOIN cc ON n_nationkey = c_nationkey
LEFT JOIN ss ON n_nationkey = s_nationkey
ORDER BY n_name
"""

QUERIES["nation_market_depth"] = q_nation_market_depth
ORACLES["nation_market_depth"] = ORACLE_NATION_MARKET_DEPTH


def q_quarter_end_loading(spark, sf_dir):
    """Fiscal-pressure read: share of each quarter's orders landing in
    its LAST month — exact counts, one conditional agg."""
    o = load_table(spark, sf_dir, "orders")
    last_month = F.month("o_orderdate").isin(3, 6, 9, 12)
    return (
        o.groupBy(
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("q")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.sum(last_month.cast("long")).alias("last_month_orders"),
        )
        .withColumn(
            "loading",
            F.round(F.col("last_month_orders") / F.col("orders"), 6),
        )
        .orderBy("q")
    )


ORACLE_QUARTER_END_LOADING = """
SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q,
       CAST(count(*) AS BIGINT) AS orders,
       CAST(sum(CASE WHEN month(o_orderdate) IN (3, 6, 9, 12)
                THEN 1 ELSE 0 END) AS BIGINT) AS last_month_orders,
       round(sum(CASE WHEN month(o_orderdate) IN (3, 6, 9, 12)
             THEN 1 ELSE 0 END) / count(*), 6) AS loading
FROM orders GROUP BY 1 ORDER BY 1
"""

QUERIES["quarter_end_loading"] = q_quarter_end_loading
ORACLES["quarter_end_loading"] = ORACLE_QUARTER_END_LOADING


def q_second_session_gap_bands(spark, sf_dir):
    """Time from FIRST to SECOND session start, banded — the
    habit-formation clock (30-min-gap sessions; exact integer µs until
    the band cut)."""
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
    starts = sess.groupBy("user_id", "sid").agg(F.min("ts").alias("start"))
    two = starts.filter(F.col("sid") <= 2).groupBy("user_id").agg(
        F.min_by("start", "sid").alias("s1"),
        F.max_by("start", "sid").alias("s2"),
        F.count(F.lit(1)).cast("long").alias("k"),
    ).filter(F.col("k") == 2)
    hours = F.floor(
        (F.unix_micros("s2") - F.unix_micros("s1")) / 3_600_000_000
    )
    band = (
        F.when(hours < 6, "<6h")
        .when(hours < 48, "6-48h")
        .when(hours < 168, "2-7d")
        .otherwise("7d+")
    )
    return (
        two.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("band")
    )


ORACLE_SECOND_SESSION_GAP_BANDS = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid,
         ts
  FROM marked
),
starts AS (
  SELECT user_id, sid, min(ts) AS start FROM sess GROUP BY 1, 2
),
two AS (
  SELECT user_id, arg_min(start, sid) AS s1, arg_max(start, sid) AS s2,
         count(*) AS k
  FROM starts WHERE sid <= 2 GROUP BY 1 HAVING count(*) = 2
)
SELECT CASE
         WHEN floor((epoch_us(s2) - epoch_us(s1)) / 3600000000) < 6
           THEN '<6h'
         WHEN floor((epoch_us(s2) - epoch_us(s1)) / 3600000000) < 48
           THEN '6-48h'
         WHEN floor((epoch_us(s2) - epoch_us(s1)) / 3600000000) < 168
           THEN '2-7d'
         ELSE '7d+' END AS band,
       CAST(count(*) AS BIGINT) AS users
FROM two GROUP BY 1 ORDER BY 1
"""

QUERIES["second_session_gap_bands"] = q_second_session_gap_bands
ORACLES["second_session_gap_bands"] = ORACLE_SECOND_SESSION_GAP_BANDS


def q_peak_day_contribution(spark, sf_dir):
    """Each stream's busiest day as a share of its month — single-day
    concentration that breaks naive capacity plans (deterministic peak
    pick)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("month", "ts").cast("date").alias("month"),
        F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("event_type", "month").orderBy(
        F.col("n").desc(), F.col("day").asc()
    )
    wt = Window.partitionBy("event_type", "month")
    return (
        daily.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rk") == 1)
        .select(
            "event_type", "month", F.col("day").alias("peak_day"),
            F.round(F.col("n") / F.col("total"), 6).alias("peak_share"),
        )
        .orderBy("event_type", "month")
    )


ORACLE_PEAK_DAY_CONTRIBUTION = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
         CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
r AS (
  SELECT event_type, month, day, n,
         row_number() OVER (PARTITION BY event_type, month
                            ORDER BY n DESC, day ASC) AS rk,
         sum(n) OVER (PARTITION BY event_type, month) AS total
  FROM daily
)
SELECT event_type, month, day AS peak_day,
       round(n / total, 6) AS peak_share
FROM r WHERE rk = 1 ORDER BY event_type, month
"""

QUERIES["peak_day_contribution"] = q_peak_day_contribution
ORACLES["peak_day_contribution"] = ORACLE_PEAK_DAY_CONTRIBUTION


def q_chars_per_token_by_lang(spark, sf_dir):
    """Average characters per whitespace token per lang — the
    tokenizer-fertility proxy that drives token-budget conversion
    rates; exact integer sums to the one division."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    per = d.select(
        "lang",
        F.length("text").cast("long").alias("chars"),
        F.size(toks).cast("long").alias("tokens"),
    ).groupBy("lang").agg(
        F.sum("chars").alias("chars"), F.sum("tokens").alias("tokens")
    )
    return per.select(
        "lang", "tokens",
        F.round(F.col("chars") / F.col("tokens"), 6).alias("chars_per_token"),
    ).orderBy("lang")


ORACLE_CHARS_PER_TOKEN_BY_LANG = r"""
WITH per AS (
  SELECT lang, CAST(sum(len(text)) AS BIGINT) AS chars,
         CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS tokens
  FROM documents GROUP BY 1
)
SELECT lang, tokens, round(chars / tokens, 6) AS chars_per_token
FROM per ORDER BY lang
"""

QUERIES["chars_per_token_by_lang"] = q_chars_per_token_by_lang
ORACLES["chars_per_token_by_lang"] = ORACLE_CHARS_PER_TOKEN_BY_LANG


def q_long_word_profile(spark, sf_dir):
    """Tokenizer-pathology screen per source: longest word and the
    per-mille of words over 15 chars (exact counts)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    per = d.select(
        "source",
        F.array_max(F.transform(toks, F.length)).cast("long")
        .alias("max_word"),
        F.size(F.filter(toks, lambda t: F.length(t) > 15)).cast("long")
        .alias("long_words"),
        F.size(toks).cast("long").alias("words"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.max("max_word").alias("longest_word"),
            F.sum("long_words").alias("long_words"),
            F.sum("words").alias("words"),
        )
        .withColumn(
            "long_per_mille",
            F.round(F.col("long_words") * 1000 / F.col("words"), 6),
        )
        .orderBy("source")
    )


ORACLE_LONG_WORD_PROFILE = r"""
WITH per AS (
  SELECT source,
         CAST(list_max(list_transform(
              regexp_split_to_array(trim(text), '\s+'), w -> len(w)))
              AS BIGINT) AS max_word,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
              w -> len(w) > 15)) AS BIGINT) AS long_words,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS words
  FROM documents
)
SELECT source, max(max_word) AS longest_word,
       CAST(sum(long_words) AS BIGINT) AS long_words,
       CAST(sum(words) AS BIGINT) AS words,
       round(sum(long_words) * 1000 / sum(words), 6) AS long_per_mille
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["long_word_profile"] = q_long_word_profile
ORACLES["long_word_profile"] = ORACLE_LONG_WORD_PROFILE


def q_emb_dim_extreme_census(spark, sf_dir):
    """Per-dimension extreme-coordinate census (|x| > 0.3, first 8
    dims) — the heavy-coordinate read behind clip-range choices."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("dim", "x"))
        .filter(F.col("dim") < 8)
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.abs(F.col("x").cast("double")) > 0.3).cast("long"))
            .alias("extremes"),
        )
        .withColumn(
            "extreme_share", F.round(F.col("extremes") / F.col("n"), 6)
        )
        .orderBy("dim")
    )


ORACLE_EMB_DIM_EXTREME_CENSUS = """
SELECT i AS dim, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN abs(CAST(embedding[i + 1] AS DOUBLE)) > 0.3
                THEN 1 ELSE 0 END) AS BIGINT) AS extremes,
       round(sum(CASE WHEN abs(CAST(embedding[i + 1] AS DOUBLE)) > 0.3
             THEN 1 ELSE 0 END) / count(*), 6) AS extreme_share
FROM embeddings, unnest(range(len(embedding))) AS u(i)
WHERE i < 8 GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_dim_extreme_census"] = q_emb_dim_extreme_census
ORACLES["emb_dim_extreme_census"] = ORACLE_EMB_DIM_EXTREME_CENSUS


def q_ir_metrics_avg_over_time(spark, sf_dir):
    """IR gauge avg_over_time daily — exact integer sums over exact
    counts inside the window, one identical IEEE division per bucket."""
    from .bench_round12 import _hourly, _ir_metrics

    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "avg_over_time",
        "window_seconds": DAY, "agg": "max", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_AVG_OVER_TIME = """
WITH hourly AS (
  SELECT event_type AS service_name, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT CAST(floor(epoch(h) / 86400) * 86400 AS BIGINT) AS bucket,
       service_name,
       round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_avg_over_time"] = q_ir_metrics_avg_over_time
ORACLES["ir_metrics_avg_over_time"] = ORACLE_IR_METRICS_AVG_OVER_TIME


def q_ir_metrics_max_over_time(spark, sf_dir):
    """IR gauge max_over_time daily — the ceiling tracker (exact value
    picks)."""
    from .bench_round12 import _hourly, _ir_metrics

    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "max_over_time",
        "window_seconds": DAY, "agg": "max", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_MAX_OVER_TIME = """
WITH hourly AS (
  SELECT event_type AS service_name, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT CAST(floor(epoch(h) / 86400) * 86400 AS BIGINT) AS bucket,
       service_name,
       round(CAST(max(cents) AS DOUBLE) / 100.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_max_over_time"] = q_ir_metrics_max_over_time
ORACLES["ir_metrics_max_over_time"] = ORACLE_IR_METRICS_MAX_OVER_TIME


def q_typed_attr_exists_predicate(spark, sf_dir):
    """IR `exists` over the typed attribute map: only `exists` observes
    absence (Kleene) — rows whose map lacks the key drop, rows with ANY
    typed value (including residue strings) pass."""
    from .ir import lower, validate
    from .schemas.anyvalue import AttributeTypeRegistry
    from .schemas.resolver import builtin_registry

    e = load_table(spark, sf_dir, "events")
    # only non-error rows carry the key at all
    attrs = F.when(
        F.col("event_type") != "error",
        F.create_map(F.lit("http.response.status_code"),
                     F.round(F.col("value")).cast("long").cast("string")),
    ).otherwise(F.create_map().cast("map<string,string>"))
    v1 = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        attrs.alias("log_attributes"),
    )
    v2 = builtin_registry().migrate(
        v1, "logs", "v1", "v2",
        attr_types=AttributeTypeRegistry().assignments(),
    )
    q = validate({
        "version": 1, "from": "logs",
        "where": {"field": "http.response.status_code", "op": "exists"},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(v2, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_TYPED_ATTR_EXISTS_PREDICATE = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events WHERE event_type <> 'error'
GROUP BY 1 ORDER BY 1
"""

QUERIES["typed_attr_exists_predicate"] = q_typed_attr_exists_predicate
ORACLES["typed_attr_exists_predicate"] = ORACLE_TYPED_ATTR_EXISTS_PREDICATE


# ------------------------------------------------------------- batch 5


def q_nation_balance_deviation(spark, sf_dir):
    """Nations whose supplier-balance mean deviates most from the
    global mean (exact cents moments, deviation in dollars) — the
    regional-risk screen."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "n_name", cents.alias("c")
    )
    per = j.groupBy("n_name").agg(
        F.sum("c").alias("sc"), F.count(F.lit(1)).cast("long").alias("n")
    )
    glob = j.agg(F.sum("c").alias("gc"),
                 F.count(F.lit(1)).cast("long").alias("gn"))
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "n_name", "n",
            F.round(
                (F.col("sc") / F.col("n") - F.col("gc") / F.col("gn"))
                / 100.0, 6
            ).alias("mean_deviation"),
        )
        .orderBy(F.abs(F.col("mean_deviation")).desc(), F.col("n_name").asc())
        .limit(10)
    )


ORACLE_NATION_BALANCE_DEVIATION = """
WITH j AS (
  SELECT n_name, CAST(round(s_acctbal * 100) AS BIGINT) AS c
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
per AS (
  SELECT n_name, CAST(sum(c) AS BIGINT) AS sc,
         CAST(count(*) AS BIGINT) AS n
  FROM j GROUP BY 1
),
g AS (SELECT CAST(sum(c) AS BIGINT) AS gc,
             CAST(count(*) AS BIGINT) AS gn FROM j)
SELECT n_name, n,
       round((sc / n - gc / gn) / 100.0, 6) AS mean_deviation
FROM per, g
ORDER BY abs(round((sc / n - gc / gn) / 100.0, 6)) DESC, n_name ASC
LIMIT 10
"""

QUERIES["nation_balance_deviation"] = q_nation_balance_deviation
ORACLES["nation_balance_deviation"] = ORACLE_NATION_BALANCE_DEVIATION


def q_annual_repeat_revenue_share(spark, sf_dir):
    """Share of each year's revenue from customers who ALSO bought the
    previous year — the repeat-business dependency curve (two distinct
    rollups, one shifted semi-join on digests)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey"
    ).agg(F.sum(cents).alias("c"))
    prev = per.select(
        (F.col("yr") + 1).alias("yr2"), F.col("o_custkey").alias("c2")
    ).distinct()
    j = per.join(
        prev, (per.yr == prev.yr2) & (per.o_custkey == prev.c2), "left"
    )
    return (
        j.groupBy("yr")
        .agg(
            F.sum("c").alias("total_c"),
            F.sum(F.when(F.col("c2").isNotNull(), F.col("c"))
                  .otherwise(0)).alias("repeat_c"),
        )
        .select(
            "yr",
            F.round(F.col("repeat_c") / F.col("total_c"), 6)
            .alias("repeat_share"),
        )
        .orderBy("yr")
    )


ORACLE_ANNUAL_REPEAT_REVENUE_SHARE = """
WITH per AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr, o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1, 2
),
prev AS (SELECT DISTINCT yr + 1 AS yr, o_custkey FROM per)
SELECT p.yr,
       round(sum(CASE WHEN pr.o_custkey IS NOT NULL THEN p.c ELSE 0 END)
             / sum(p.c), 6) AS repeat_share
FROM per p LEFT JOIN prev pr
  ON p.yr = pr.yr AND p.o_custkey = pr.o_custkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["annual_repeat_revenue_share"] = q_annual_repeat_revenue_share
ORACLES["annual_repeat_revenue_share"] = ORACLE_ANNUAL_REPEAT_REVENUE_SHARE


def q_dominant_line_share_bands(spark, sf_dir):
    """How concentrated is an order in its biggest line? max-line share
    of order total, banded — exact cents, one max/sum rollup per
    order."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per = li.groupBy("l_orderkey").agg(
        F.max(cents).alias("mx"), F.sum(cents).alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    ).filter(F.col("n_lines") >= 2)
    share = F.col("mx") / F.col("tot")
    band = (
        F.when(share < 0.4, "<40%")
        .when(share < 0.6, "40-60%")
        .when(share < 0.8, "60-80%")
        .otherwise("80%+")
    )
    return (
        per.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("orders"))
        .orderBy("band")
    )


ORACLE_DOMINANT_LINE_SHARE_BANDS = """
WITH per AS (
  SELECT l_orderkey,
         max(CAST(round(l_extendedprice * 100) AS BIGINT)) AS mx,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS tot,
         count(*) AS n_lines
  FROM lineitem GROUP BY 1 HAVING count(*) >= 2
)
SELECT CASE WHEN mx * 1.0 / tot < 0.4 THEN '<40%'
            WHEN mx * 1.0 / tot < 0.6 THEN '40-60%'
            WHEN mx * 1.0 / tot < 0.8 THEN '60-80%'
            ELSE '80%+' END AS band,
       CAST(count(*) AS BIGINT) AS orders
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["dominant_line_share_bands"] = q_dominant_line_share_bands
ORACLES["dominant_line_share_bands"] = ORACLE_DOMINANT_LINE_SHARE_BANDS


def q_span_ordercount_correlation(spark, sf_dir):
    """Pearson r between customer lifetime span (days between first
    and last order) and order count — does tenure buy frequency?
    Integer moments, double closed form."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).cast("long")
        .alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    m = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("double") * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
    )
    d = {c: F.col(c).cast("double") for c in ("n", "sx", "sy")}
    num = d["n"] * F.col("sxy") - d["sx"] * d["sy"]
    den = F.sqrt(
        (d["n"] * F.col("sxx") - d["sx"] * d["sx"])
        * (d["n"] * F.col("syy") - d["sy"] * d["sy"])
    )
    return m.select("n", F.round(num / den, 6).alias("pearson_r"))


ORACLE_SPAN_ORDERCOUNT_CORRELATION = """
WITH per AS (
  SELECT o_custkey,
         CAST(datediff('day', min(o_orderdate), max(o_orderdate))
              AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS DOUBLE) * x) AS sxx,
         sum(CAST(y AS DOUBLE) * y) AS syy,
         sum(CAST(x AS DOUBLE) * y) AS sxy
  FROM per
)
SELECT n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS pearson_r
FROM m
"""

QUERIES["span_ordercount_correlation"] = q_span_ordercount_correlation
ORACLES["span_ordercount_correlation"] = ORACLE_SPAN_ORDERCOUNT_CORRELATION


def q_zero_discount_share_by_brand(spark, sf_dir):
    """Discount discipline per brand: share of lines sold at list price
    (zero discount) — part broadcast into the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_discount")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("lines"),
            F.sum((F.col("l_discount") == 0).cast("long")).alias("list_price"),
        )
        .withColumn(
            "list_share", F.round(F.col("list_price") / F.col("lines"), 6)
        )
        .orderBy("p_brand")
    )


ORACLE_ZERO_DISCOUNT_SHARE_BY_BRAND = """
SELECT p_brand, CAST(count(*) AS BIGINT) AS lines,
       CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS list_price,
       round(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) / count(*), 6)
         AS list_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["zero_discount_share_by_brand"] = q_zero_discount_share_by_brand
ORACLES["zero_discount_share_by_brand"] = ORACLE_ZERO_DISCOUNT_SHARE_BY_BRAND


def q_monthday_order_profile(spark, sf_dir):
    """Orders by day-of-month (1-31) with shares — billing-cycle and
    month-edge loading."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(F.dayofmonth("o_orderdate").cast("int").alias("dom")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy()
    return (
        per.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .orderBy("dom")
    )


ORACLE_MONTHDAY_ORDER_PROFILE = """
WITH per AS (
  SELECT CAST(dayofmonth(o_orderdate) AS INT) AS dom,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT dom, n, round(n / sum(n) OVER (), 6) AS share
FROM per ORDER BY dom
"""

QUERIES["monthday_order_profile"] = q_monthday_order_profile
ORACLES["monthday_order_profile"] = ORACLE_MONTHDAY_ORDER_PROFILE


def q_user_max_daily_histogram(spark, sf_dir):
    """Histogram of each user's BUSIEST day (max daily event count) —
    the burst-capacity profile of the user base."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).groupBy("user_id").agg(F.max("n").alias("max_daily"))
    return (
        per.groupBy("max_daily")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("max_daily")
    )


ORACLE_USER_MAX_DAILY_HISTOGRAM = """
WITH per AS (
  SELECT user_id, max(n) AS max_daily
  FROM (SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2)
  GROUP BY 1
)
SELECT max_daily, CAST(count(*) AS BIGINT) AS users
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["user_max_daily_histogram"] = q_user_max_daily_histogram
ORACLES["user_max_daily_histogram"] = ORACLE_USER_MAX_DAILY_HISTOGRAM


def q_value_by_session_position(spark, sf_dir):
    """Average value by within-session position band (1st event, 2-5,
    6+) — does intent build or decay inside a session? Exact cents and
    the session index from one lag-cumsum pass."""
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
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    pos = sess.withColumn("idx", F.row_number().over(ws))
    band = (
        F.when(F.col("idx") == 1, "pos-1")
        .when(F.col("idx") <= 5, "pos-2-5")
        .otherwise("pos-6+")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        pos.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("events"),
            F.sum(cents).alias("cents"),
        )
        .select(
            "band", "events",
            F.round(F.col("cents") / F.col("events") / 100.0, 6)
            .alias("avg_value"),
        )
        .orderBy("band")
    )


ORACLE_VALUE_BY_SESSION_POSITION = """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM marked
),
pos AS (
  SELECT value,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS idx
  FROM sess
)
SELECT CASE WHEN idx = 1 THEN 'pos-1'
            WHEN idx <= 5 THEN 'pos-2-5' ELSE 'pos-6+' END AS band,
       CAST(count(*) AS BIGINT) AS events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / count(*) / 100.0, 6)
         AS avg_value
FROM pos GROUP BY 1 ORDER BY 1
"""

QUERIES["value_by_session_position"] = q_value_by_session_position
ORACLES["value_by_session_position"] = ORACLE_VALUE_BY_SESSION_POSITION


def q_weekly_value_retention(spark, sf_dir):
    """VALUE-based weekly retention: of week W's active users, the
    value they spend in W+1 as a share of their week-W value — follows
    the money where cohort_triangle counts heads."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    uw = e.groupBy(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).agg(F.sum(cents).alias("c"))
    nxt = uw.select(
        F.col("user_id").alias("u2"),
        F.add_months(F.col("wk"), 0).alias("_ignore"),
        F.date_sub(F.col("wk"), 7).alias("wk_prev"),
        F.col("c").alias("c2"),
    ).drop("_ignore")
    j = uw.join(
        nxt, (uw.user_id == nxt.u2) & (uw.wk == nxt.wk_prev), "left"
    )
    return (
        j.groupBy("wk")
        .agg(
            F.sum("c").alias("week_cents"),
            F.sum(F.coalesce("c2", F.lit(0))).alias("next_week_cents"),
        )
        .select(
            "wk",
            F.round(F.col("next_week_cents") / F.col("week_cents"), 6)
            .alias("value_retention"),
        )
        .orderBy("wk")
    )


ORACLE_WEEKLY_VALUE_RETENTION = """
WITH uw AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
         sum(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY 1, 2
)
SELECT a.wk,
       round(sum(coalesce(b.c, 0)) / sum(a.c), 6) AS value_retention
FROM uw a LEFT JOIN uw b
  ON a.user_id = b.user_id AND b.wk = a.wk + 7
GROUP BY 1 ORDER BY 1
"""

QUERIES["weekly_value_retention"] = q_weekly_value_retention
ORACLES["weekly_value_retention"] = ORACLE_WEEKLY_VALUE_RETENTION


def q_short_doc_census(spark, sf_dir):
    """Under-64-char docs per source: count, share, and the shortest
    length — the stub-document screen."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum((F.length("text") < 64).cast("long")).alias("short_docs"),
            F.min(F.length("text")).cast("long").alias("min_chars"),
        )
        .withColumn(
            "short_share", F.round(F.col("short_docs") / F.col("docs"), 6)
        )
        .orderBy("source")
    )


ORACLE_SHORT_DOC_CENSUS = """
SELECT source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN len(text) < 64 THEN 1 ELSE 0 END) AS BIGINT)
         AS short_docs,
       CAST(min(len(text)) AS BIGINT) AS min_chars,
       round(sum(CASE WHEN len(text) < 64 THEN 1 ELSE 0 END) / count(*), 6)
         AS short_share
FROM documents GROUP BY 1 ORDER BY 1
"""

QUERIES["short_doc_census"] = q_short_doc_census
ORACLES["short_doc_census"] = ORACLE_SHORT_DOC_CENSUS


def q_initial_letter_entropy(spark, sf_dir):
    """Shannon entropy of word-INITIAL letters per lang (a-z folded,
    exact counts; the fold runs over the ≤27-row rollup) — a crude but
    fully portable orthography fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    first = F.lower(F.substring(F.col("w"), 1, 1))
    letters = (
        d.select("lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .select("lang", F.when(first.rlike("^[a-z]$"), first)
                .otherwise(F.lit("#")).alias("ch"))
        .groupBy("lang", "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("lang")
    p = F.col("n") / F.sum("n").over(w)
    return (
        letters.withColumn("term", -p * F.log2(p))
        .groupBy("lang")
        .agg(
            F.round(F.sum("term"), 6).alias("entropy_bits"),
            F.count(F.lit(1)).cast("long").alias("symbols"),
        )
        .orderBy("lang")
    )


ORACLE_INITIAL_LETTER_ENTROPY = r"""
WITH letters AS (
  SELECT lang,
         CASE WHEN regexp_matches(lower(substring(w, 1, 1)), '^[a-z]$')
              THEN lower(substring(w, 1, 1)) ELSE '#' END AS ch,
         CAST(count(*) AS BIGINT) AS n
  FROM documents,
       unnest(regexp_split_to_array(trim(text), '\s+')) AS t(w)
  GROUP BY 1, 2
),
p AS (
  SELECT lang, n / sum(n) OVER (PARTITION BY lang) AS p FROM letters
)
SELECT lang, round(sum(-p * log2(p)), 6) AS entropy_bits,
       CAST(count(*) AS BIGINT) AS symbols
FROM p GROUP BY 1 ORDER BY 1
"""

QUERIES["initial_letter_entropy"] = q_initial_letter_entropy
ORACLES["initial_letter_entropy"] = ORACLE_INITIAL_LETTER_ENTROPY


def q_emb_first_dim_histogram(spark, sf_dir):
    """Fixed-edge histogram of dimension 0 (10 bands over [-0.5, 0.5))
    per label — the marginal-distribution read before choosing scalar
    quantizer edges."""
    e = load_table(spark, sf_dir, "embeddings")
    x = F.element_at("embedding", 1).cast("double")
    band = F.least(
        F.greatest(F.floor((x + 0.5) * 10).cast("int"), F.lit(0)), F.lit(9)
    )
    return (
        e.groupBy("label", band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("label", "band")
    )


ORACLE_EMB_FIRST_DIM_HISTOGRAM = """
SELECT label,
       least(greatest(CAST(floor((CAST(embedding[1] AS DOUBLE) + 0.5) * 10)
                      AS INT), 0), 9) AS band,
       CAST(count(*) AS BIGINT) AS n
FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["emb_first_dim_histogram"] = q_emb_first_dim_histogram
ORACLES["emb_first_dim_histogram"] = ORACLE_EMB_FIRST_DIM_HISTOGRAM


def q_emb_ring_dot_extremes(spark, sf_dir):
    """Max/min dot product over the deterministic md5 hash-ring pairing
    (each vector paired with its ring successor — N pairs, never N²):
    the quick spread read on pairwise geometry."""
    e = load_table(spark, sf_dir, "embeddings")
    ringed = e.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.md5(F.col("vec_id").cast("string")))),
    )
    n_total = ringed.agg(F.max("rk").alias("m"))
    nxt = ringed.crossJoin(F.broadcast(n_total)).select(
        (F.when(F.col("rk") == F.col("m"), 1).otherwise(F.col("rk") + 1))
        .alias("rk2"),
        F.col("embedding").alias("e2"),
    )
    pairs = ringed.join(nxt, ringed.rk == nxt.rk2).select(
        F.zip_with(
            "embedding", "e2",
            lambda a, b: a.cast("double") * b.cast("double"),
        ).alias("prods")
    )
    dot = F.aggregate("prods", F.lit(0.0), lambda acc, x: acc + x)
    return pairs.select(dot.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("pairs"),
        F.round(F.max("d"), 6).alias("max_dot"),
        F.round(F.min("d"), 6).alias("min_dot"),
    )


ORACLE_EMB_RING_DOT_EXTREMES = """
WITH ringed AS (
  SELECT embedding,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rk
  FROM embeddings
),
m AS (SELECT max(rk) AS mx FROM ringed),
pairs AS (
  SELECT a.embedding AS ea, b.embedding AS eb
  FROM ringed a, m
  JOIN ringed b
    ON b.rk = CASE WHEN a.rk = m.mx THEN 1 ELSE a.rk + 1 END
),
dots AS (
  SELECT list_sum(list_transform(range(len(ea)),
           i -> CAST(ea[i + 1] AS DOUBLE) * CAST(eb[i + 1] AS DOUBLE)))
           AS d
  FROM pairs
)
SELECT CAST(count(*) AS BIGINT) AS pairs,
       round(max(d), 6) AS max_dot, round(min(d), 6) AS min_dot
FROM dots
"""

QUERIES["emb_ring_dot_extremes"] = q_emb_ring_dot_extremes
ORACLES["emb_ring_dot_extremes"] = ORACLE_EMB_RING_DOT_EXTREMES


def q_ir_extract_logfmt_gate(spark, sf_dir):
    """IR logfmt EXTRACT under the oracle: bodies synthesized from
    events as logfmt lines, the IR extract stage pulls a typed field
    and aggregates — the zero-UDF parser path proven end-to-end."""
    from .ir import lower, validate

    e = load_table(spark, sf_dir, "events")
    body = F.format_string(
        "evt=%s k=%d", F.col("event_type"),
        F.get_json_object("props", "$.k").cast("long"),
    )
    df = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        body.alias("body"),
    )
    q = validate({
        "version": 1, "from": "logs",
        "extract": [{"field": "k", "parser": "logfmt", "source": "body",
                     "type": "long"}],
        "where": {"field": "k", "op": "gte", "value": 50},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(df, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_IR_EXTRACT_LOGFMT_GATE = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
GROUP BY 1 ORDER BY 1
"""

QUERIES["ir_extract_logfmt_gate"] = q_ir_extract_logfmt_gate
ORACLES["ir_extract_logfmt_gate"] = ORACLE_IR_EXTRACT_LOGFMT_GATE


def q_typed_attr_in_predicate(spark, sf_dir):
    """IR `in` over the typed map's DISPLAY strings (the set-membership
    op keeps string semantics across layouts): 4xx/5xx selection."""
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
        "where": {"field": "http.response.status_code", "op": "in",
                  "value": ["404", "503"]},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(v2, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_TYPED_ATTR_IN_PREDICATE = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type <> 'error' AND value >= 20
GROUP BY 1 ORDER BY 1
"""

QUERIES["typed_attr_in_predicate"] = q_typed_attr_in_predicate
ORACLES["typed_attr_in_predicate"] = ORACLE_TYPED_ATTR_IN_PREDICATE


_R14_CACHE: dict = {}


def q_manifest_props_carry(spark, sf_dir):
    """DRIVER gate for table-property carry-forward: a property set on
    commit 2 of 3 must survive later commits that don't touch it (the
    channel the hot/cold watermark rides), while the table answers the
    whole-corpus rollup."""
    import tempfile as _tempfile

    from .storage.manifest import ManifestTable, write_batch_manifest

    key = ("props", sf_dir)
    if key not in _R14_CACHE:
        table = _tempfile.mkdtemp(prefix="sdb-r14-props-")
        e = load_table(spark, sf_dir, "events").withColumn(
            "date_day", F.date_format("ts", "yyyy-MM-dd")
        ).withColumn("hour", F.lit(0))
        mt = ManifestTable(table)
        for k in range(3):
            part = e.filter(F.col("event_id") % 3 == k)
            write_batch_manifest(
                part, table, "events_r14p", batch_id=f"b{k}",
                partition_cols=("date_day", "hour"), stats_cols=("ts",),
            )
            if k == 1:
                mt.commit([], batch_id="mark",
                          properties={"pipeline.watermark": "batch-1"})
        _R14_CACHE[key] = table
    mt = ManifestTable(_R14_CACHE[key])
    prop = mt.load_manifest().get("props", {}).get("pipeline.watermark")
    df = mt.read(spark)
    return (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("watermark", F.lit(prop))
        .orderBy("event_type")
    )


ORACLE_MANIFEST_PROPS_CARRY = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       'batch-1' AS watermark
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["manifest_props_carry"] = q_manifest_props_carry
ORACLES["manifest_props_carry"] = ORACLE_MANIFEST_PROPS_CARRY


def q_ratelimit_override_isolation(spark, sf_dir):
    """DRIVER gate for override-replaces-defaults semantics: a VIP
    override lifting the query rate also lifts unlisted dimensions
    (wholesale replace, ratelimit.rs limits_for), while default tenants
    stay capped — the admit ledger for both tenants vs a closed-form
    replay."""
    from .ratelimit import RateLimitExceeded, TenantRateLimiter

    limiter = TenantRateLimiter(
        {"max_query_requests_per_sec": 2, "burst_seconds": 1.0},
        {"vip": {"max_ingest_requests_per_sec": 1000,
                 "burst_seconds": 1.0}},  # query dim UNLISTED → unlimited
    )
    rows = []
    for tenant in ("acme", "vip"):
        for i in range(30):
            t = i * 0.25  # 0.5 tokens refilled per step at 2/s
            try:
                limiter.check_query(tenant, now=float(t))
                rows.append((tenant, i, True))
            except RateLimitExceeded:
                rows.append((tenant, i, False))
    df = spark.createDataFrame(rows, "tenant string, step int, admitted boolean")
    return (
        df.groupBy("tenant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("requests"),
            F.sum(F.col("admitted").cast("long")).alias("admitted"),
        )
        .orderBy("tenant")
    )


ORACLE_RATELIMIT_OVERRIDE_ISOLATION = """
WITH RECURSIVE sim(step, tokens, admitted) AS (
  SELECT 0, 2.0 - 1.0, TRUE
  UNION ALL
  SELECT step + 1,
         CASE WHEN least(tokens + 0.5, 2.0) >= 1.0
              THEN least(tokens + 0.5, 2.0) - 1.0
              ELSE least(tokens + 0.5, 2.0) END,
         least(tokens + 0.5, 2.0) >= 1.0
  FROM sim WHERE step < 29
)
SELECT 'acme' AS tenant, CAST(count(*) AS BIGINT) AS requests,
       CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
         AS admitted
FROM sim
UNION ALL
SELECT 'vip' AS tenant, CAST(30 AS BIGINT), CAST(30 AS BIGINT)
ORDER BY tenant
"""

QUERIES["ratelimit_override_isolation"] = q_ratelimit_override_isolation
ORACLES["ratelimit_override_isolation"] = ORACLE_RATELIMIT_OVERRIDE_ISOLATION


def q_ir_metrics_series_count(spark, sf_dir):
    """IR outer agg COUNT: active series per daily bucket — the
    cardinality meter through the metric sub-model (each (service,
    attrs) series counts once per bucket)."""
    from .bench_round12 import _hourly, _ir_metrics

    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
        F.create_map(F.lit("src"), F.lit("events")).alias("attributes"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "last",
        "step_seconds": DAY, "agg": "count",
    })
    return out.select(
        "bucket", F.col("value").cast("bigint").alias("series")
    ).orderBy("bucket")


ORACLE_IR_METRICS_SERIES_COUNT = """
SELECT CAST(floor(epoch(date_trunc('hour', ts)) / 86400) * 86400 AS BIGINT)
         AS bucket,
       CAST(count(DISTINCT event_type) AS BIGINT) AS series
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["ir_metrics_series_count"] = q_ir_metrics_series_count
ORACLES["ir_metrics_series_count"] = ORACLE_IR_METRICS_SERIES_COUNT


def q_typed_attr_contains_predicate(spark, sf_dir):
    """IR `contains` over the typed map's display string — substring
    matchers stay layout-invariant (the int home renders '503', so
    contains '50' hits 503s and nothing else in this fixture)."""
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
        "where": {"field": "http.response.status_code", "op": "contains",
                  "value": "50"},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(v2, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_TYPED_ATTR_CONTAINS_PREDICATE = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type <> 'error' AND value >= 100
GROUP BY 1 ORDER BY 1
"""

QUERIES["typed_attr_contains_predicate"] = q_typed_attr_contains_predicate
ORACLES["typed_attr_contains_predicate"] = ORACLE_TYPED_ATTR_CONTAINS_PREDICATE
