"""Round-11 staging battery: oracle-gated queries registered AFTER the
round-10 block so earlier rounds' tuned driver prefixes stay intact;
these become fresh driver evidence once rounds 7-10 are proven.

Same conventions as bench_queries (round(x, 6) floats, BIGINT counts,
explicit tiebreaks, aliases identical on both sides, integer cents
wherever exactness matters).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------------------------- batch 1


def q_mad_retail_price(spark, sf_dir):
    """Median absolute deviation of part retail price per type prefix
    (first word of p_type): the robust spread a price-anomaly screen
    uses. Two exact medians — value median, then deviation median —
    with the tiny per-group median table broadcast back."""
    p = load_table(spark, sf_dir, "part").select(
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_class"),
        "p_retailprice",
    )
    med = p.groupBy("type_class").agg(
        F.percentile("p_retailprice", F.lit(0.5)).alias("med")
    )
    return (
        p.join(F.broadcast(med), "type_class")
        .groupBy("type_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.first("med"), 6).alias("median_price"),
            F.round(
                F.percentile(
                    F.abs(F.col("p_retailprice") - F.col("med")), F.lit(0.5)
                ),
                6,
            ).alias("mad_price"),
        )
        .orderBy("type_class")
    )


ORACLE_MAD_RETAIL_PRICE = """
WITH p AS (
  SELECT split_part(p_type, ' ', 1) AS type_class, p_retailprice
  FROM part
), med AS (
  SELECT type_class, quantile_cont(p_retailprice, 0.5) AS med
  FROM p GROUP BY 1
)
SELECT p.type_class AS type_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(any_value(med.med), 6) AS median_price,
       round(quantile_cont(abs(p.p_retailprice - med.med), 0.5), 6)
         AS mad_price
FROM p JOIN med USING (type_class)
GROUP BY 1 ORDER BY 1
"""

QUERIES["mad_retail_price"] = q_mad_retail_price
ORACLES["mad_retail_price"] = ORACLE_MAD_RETAIL_PRICE


def q_order_value_cv(spark, sf_dir):
    """Coefficient of variation of order value per customer nation —
    which markets have erratic basket sizes. Population stddev over
    mean; the two dims broadcast into the orders scan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.stddev_pop("o_totalprice") / F.avg("o_totalprice"), 6
            ).alias("cv"),
        )
        .orderBy("nation")
    )


ORACLE_ORDER_VALUE_CV = """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(stddev_pop(o.o_totalprice) / avg(o.o_totalprice), 6) AS cv
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["order_value_cv"] = q_order_value_cv
ORACLES["order_value_cv"] = ORACLE_ORDER_VALUE_CV


def q_supplier_balance_by_nation(spark, sf_dir):
    """Supplier account-balance rollup per nation with rank ties kept
    (RANK, not row_number): nations tied on total cents must share a
    rank on both engines."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum(F.round(F.col("s_acctbal") * 100).cast("bigint")).alias(
                "balance_cents"
            ),
        )
    )
    w = Window.orderBy(F.desc("balance_cents"))
    return (
        agg.withColumn("balance_rank", F.rank().over(w))
        .select("nation", "n_suppliers",
                F.col("balance_cents").cast("bigint").alias("balance_cents"),
                F.col("balance_rank").cast("int").alias("balance_rank"))
        .orderBy("nation")
    )


ORACLE_SUPPLIER_BALANCE_BY_NATION = """
WITH agg AS (
  SELECT n.n_name AS nation,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS balance_cents
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation, n_suppliers, balance_cents,
       CAST(rank() OVER (ORDER BY balance_cents DESC) AS INTEGER)
         AS balance_rank
FROM agg ORDER BY nation
"""

QUERIES["supplier_balance_by_nation"] = q_supplier_balance_by_nation
ORACLES["supplier_balance_by_nation"] = ORACLE_SUPPLIER_BALANCE_BY_NATION


def q_linenumber_profile(spark, sf_dir):
    """Per-linenumber profile: count, exact quantity sum, and mean
    extended price — the positional mix of order composition (line 1
    skews toward the primary item)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_linenumber").alias("linenumber"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias(
                "quantity_hundredths"
            ),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        )
        .orderBy("linenumber")
    )


ORACLE_LINENUMBER_PROFILE = """
SELECT l_linenumber AS linenumber,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS quantity_hundredths,
       round(avg(l_extendedprice), 6) AS avg_price
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["linenumber_profile"] = q_linenumber_profile
ORACLES["linenumber_profile"] = ORACLE_LINENUMBER_PROFILE


def q_discount_band_revenue(spark, sf_dir):
    """Revenue by discount band (none / 1-5% / 6%+): explicit CASE
    banding with integer-percent boundaries, exact discounted cents
    per band."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.round(F.col("l_discount") * 100).cast("int")
    band = (
        F.when(pct == 0, "0_none")
        .when(pct <= 5, "1_low")
        .otherwise("2_high")
    )
    return (
        li.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("revenue_cents"),
        )
        .orderBy("band")
    )


ORACLE_DISCOUNT_BAND_REVENUE = """
SELECT CASE WHEN CAST(round(l_discount * 100) AS INTEGER) = 0 THEN '0_none'
            WHEN CAST(round(l_discount * 100) AS INTEGER) <= 5 THEN '1_low'
            ELSE '2_high' END AS band,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["discount_band_revenue"] = q_discount_band_revenue
ORACLES["discount_band_revenue"] = ORACLE_DISCOUNT_BAND_REVENUE


def q_regional_price_index(spark, sf_dir):
    """Regional price parity: each region's mean unit price indexed to
    the global mean (=100). The global scalar rides a literal-free
    cross join of one aggregated row — both sides exact cents until
    the final index division."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    unit = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
        )
    )
    glob = unit.agg(F.avg("unit").alias("g"))
    return (
        unit.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.avg("unit").alias("mean_unit"),
        )
        .crossJoin(F.broadcast(glob))
        .select(
            "region",
            "n_items",
            F.round("mean_unit", 6).alias("mean_unit"),
            F.round(F.col("mean_unit") / F.col("g") * 100.0, 6).alias(
                "price_index"
            ),
        )
        .orderBy("region")
    )


ORACLE_REGIONAL_PRICE_INDEX = """
WITH unit AS (
  SELECT r.r_name AS region, l.l_extendedprice / l.l_quantity AS unit
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
), overall AS (SELECT avg(unit) AS g FROM unit)
SELECT region,
       CAST(count(*) AS BIGINT) AS n_items,
       round(avg(unit), 6) AS mean_unit,
       round(avg(unit) / any_value(overall.g) * 100.0, 6) AS price_index
FROM unit, overall
GROUP BY region ORDER BY region
"""

QUERIES["regional_price_index"] = q_regional_price_index
ORACLES["regional_price_index"] = ORACLE_REGIONAL_PRICE_INDEX


def q_status_priority_lift(spark, sf_dir):
    """Lift matrix orderstatus x priority: observed cell share over the
    product of marginal shares — the independence screen. All shares
    derive from one contingency rollup; the marginals broadcast."""
    o = load_table(spark, sf_dir, "orders")
    cell = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("k")
    )
    tot = cell.agg(F.sum("k").alias("t"))
    ms = cell.groupBy("o_orderstatus").agg(F.sum("k").alias("ks"))
    mp = cell.groupBy("o_orderpriority").agg(F.sum("k").alias("kp"))
    return (
        cell.join(F.broadcast(ms), "o_orderstatus")
        .join(F.broadcast(mp), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("k").cast("bigint").alias("n"),
            F.round(
                (F.col("k") / F.col("t"))
                / ((F.col("ks") / F.col("t")) * (F.col("kp") / F.col("t"))),
                6,
            ).alias("lift"),
        )
        .orderBy("status", "priority")
    )


ORACLE_STATUS_PRIORITY_LIFT = """
WITH cell AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS k
  FROM orders GROUP BY 1, 2
), tot AS (SELECT sum(k) AS t FROM cell),
ms AS (SELECT o_orderstatus, sum(k) AS ks FROM cell GROUP BY 1),
mp AS (SELECT o_orderpriority, sum(k) AS kp FROM cell GROUP BY 1)
SELECT cell.o_orderstatus AS status,
       cell.o_orderpriority AS priority,
       CAST(cell.k AS BIGINT) AS n,
       round((cell.k * 1.0 / tot.t)
             / ((ms.ks * 1.0 / tot.t) * (mp.kp * 1.0 / tot.t)), 6) AS lift
FROM cell
JOIN ms USING (o_orderstatus)
JOIN mp USING (o_orderpriority)
CROSS JOIN tot
ORDER BY status, priority
"""

QUERIES["status_priority_lift"] = q_status_priority_lift
ORACLES["status_priority_lift"] = ORACLE_STATUS_PRIORITY_LIFT


def q_top2_supplier_share(spark, sf_dir):
    """Concentration: the revenue share of each part-type class's top-2
    suppliers (row_number with supplier-key tiebreak). Per-class
    revenue rolls up once; only the tiny ranked rollup re-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_class")
    )
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("type_class", "l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("cents")
        )
    )
    w = Window.partitionBy("type_class").orderBy(
        F.desc("cents"), F.col("l_suppkey")
    )
    ranked = rev.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("type_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("cents").alias("total_cents"),
            F.sum(F.when(F.col("rk") <= 2, F.col("cents")).otherwise(0)).alias(
                "top2_cents"
            ),
        )
        .select(
            "type_class",
            "n_suppliers",
            F.round(F.col("top2_cents") / F.col("total_cents"), 6).alias(
                "top2_share"
            ),
        )
        .orderBy("type_class")
    )


ORACLE_TOP2_SUPPLIER_SHARE = """
WITH rev AS (
  SELECT split_part(p.p_type, ' ', 1) AS type_class, l.l_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT type_class, cents,
         row_number() OVER (PARTITION BY type_class
                            ORDER BY cents DESC, l_suppkey) AS rk
  FROM rev
)
SELECT type_class,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       round(sum(CASE WHEN rk <= 2 THEN cents ELSE 0 END) * 1.0
             / sum(cents), 6) AS top2_share
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["top2_supplier_share"] = q_top2_supplier_share
ORACLES["top2_supplier_share"] = ORACLE_TOP2_SUPPLIER_SHARE


# ------------------------------------------------------------- batch 2


def q_size_price_slope(spark, sf_dir):
    """Least-squares slope of retail price on part size per brand
    (regr_slope on both engines — identical population formula): does
    bigger cost more, and how steeply, brand by brand."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.regr_slope(F.col("p_retailprice"), F.col("p_size").cast("double")),
                6,
            ).alias("price_per_size"),
        )
        .orderBy("brand")
    )


ORACLE_SIZE_PRICE_SLOPE = """
SELECT p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(regr_slope(p_retailprice, CAST(p_size AS DOUBLE)), 6)
         AS price_per_size
FROM part GROUP BY 1 ORDER BY 1
"""

QUERIES["size_price_slope"] = q_size_price_slope
ORACLES["size_price_slope"] = ORACLE_SIZE_PRICE_SLOPE


def q_acctbal_sign_mix(spark, sf_dir):
    """Sign mix of customer balances per market segment: negative /
    zero / positive counts and the net cents — conditional aggregation
    with exact integer arithmetic throughout."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum((cents < 0).cast("long")).alias("n_negative"),
            F.sum((cents == 0).cast("long")).alias("n_zero"),
            F.sum((cents > 0).cast("long")).alias("n_positive"),
            F.sum(cents).alias("net_cents"),
        )
        .select(
            "segment",
            F.col("n_negative").cast("bigint").alias("n_negative"),
            F.col("n_zero").cast("bigint").alias("n_zero"),
            F.col("n_positive").cast("bigint").alias("n_positive"),
            F.col("net_cents").cast("bigint").alias("net_cents"),
        )
        .orderBy("segment")
    )


ORACLE_ACCTBAL_SIGN_MIX = """
WITH c AS (
  SELECT c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
)
SELECT c_mktsegment AS segment,
       CAST(sum(CASE WHEN cents < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       CAST(sum(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(sum(CASE WHEN cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_positive,
       CAST(sum(cents) AS BIGINT) AS net_cents
FROM c GROUP BY 1 ORDER BY 1
"""

QUERIES["acctbal_sign_mix"] = q_acctbal_sign_mix
ORACLES["acctbal_sign_mix"] = ORACLE_ACCTBAL_SIGN_MIX


def q_qoq_revenue(spark, sf_dir):
    """Quarter-over-quarter revenue growth: calendar-quarter rollup in
    exact cents, LAG window for the prior quarter, growth only where a
    prior quarter exists."""
    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.orderBy("yr", "qtr")
    return (
        q.withColumn("prev", F.lag("cents").over(w))
        .select(
            (F.col("yr") * 10 + F.col("qtr")).cast("int").alias("yq"),
            F.col("cents").cast("bigint").alias("revenue_cents"),
            F.round(
                (F.col("cents") - F.col("prev")) / F.col("prev"), 6
            ).alias("qoq_growth"),
        )
        .orderBy("yq")
    )


ORACLE_QOQ_REVENUE = """
WITH q AS (
  SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
)
SELECT CAST(yr * 10 + qtr AS INTEGER) AS yq,
       CAST(cents AS BIGINT) AS revenue_cents,
       round((cents - lag(cents) OVER (ORDER BY yr, qtr)) * 1.0
             / lag(cents) OVER (ORDER BY yr, qtr), 6) AS qoq_growth
FROM q ORDER BY yq
"""

QUERIES["qoq_revenue"] = q_qoq_revenue
ORACLES["qoq_revenue"] = ORACLE_QOQ_REVENUE


def q_calendar_gap_days(spark, sf_dir):
    """Calendar coverage: per month, days in the observed span with NO
    orders — a date spine (sequence/generate_series between the global
    min and max order date) anti-joined against the distinct order-day
    set. The spine is driver-bounded metadata (days), never data."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    days = o.select(F.to_date("o_orderdate").alias("d")).distinct()
    return (
        spine.join(days, "d", "left_anti")
        .groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("gap_days"))
        .orderBy("month")
    )


ORACLE_CALENDAR_GAP_DAYS = """
WITH bounds AS (
  SELECT min(CAST(o_orderdate AS DATE)) AS lo,
         max(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
), spine AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
), days AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
SELECT strftime(s.d, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS gap_days
FROM spine s ANTI JOIN days USING (d)
GROUP BY 1 ORDER BY 1
"""

QUERIES["calendar_gap_days"] = q_calendar_gap_days
ORACLES["calendar_gap_days"] = ORACLE_CALENDAR_GAP_DAYS


def q_rank_functions_battery(spark, sf_dir):
    """rank / dense_rank / row_number disagreement battery over a
    deliberately tie-heavy ordering (orders per day): where ties exist
    the three functions diverge in a fully pinned way — per day-count
    value: how many days share it, the min rank, min dense rank."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy(F.desc("n_orders"), "d")
    wv = Window.orderBy(F.desc("n_orders"))
    ranked = daily.select(
        "n_orders",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wv).alias("rk"),
        F.dense_rank().over(wv).alias("drk"),
    )
    return (
        ranked.groupBy(F.col("n_orders").cast("bigint").alias("orders_per_day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.min("rk").cast("bigint").alias("min_rank"),
            F.min("drk").cast("bigint").alias("dense_rank"),
            F.min("rn").cast("bigint").alias("first_row_number"),
        )
        .orderBy(F.desc("orders_per_day"))
    )


ORACLE_RANK_FUNCTIONS_BATTERY = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
  FROM orders GROUP BY 1
), ranked AS (
  SELECT n_orders,
         row_number() OVER (ORDER BY n_orders DESC, d) AS rn,
         rank() OVER (ORDER BY n_orders DESC) AS rk,
         dense_rank() OVER (ORDER BY n_orders DESC) AS drk
  FROM daily
)
SELECT CAST(n_orders AS BIGINT) AS orders_per_day,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(min(rk) AS BIGINT) AS min_rank,
       CAST(min(drk) AS BIGINT) AS dense_rank,
       CAST(min(rn) AS BIGINT) AS first_row_number
FROM ranked GROUP BY 1 ORDER BY orders_per_day DESC
"""

QUERIES["rank_functions_battery"] = q_rank_functions_battery
ORACLES["rank_functions_battery"] = ORACLE_RANK_FUNCTIONS_BATTERY


def q_local_trade_share(spark, sf_dir):
    """Local-trade share: revenue where the customer's and supplier's
    nations MATCH, as a share of each customer nation's total. Both
    dims broadcast; one fact-scan rollup keyed by the two nation
    keys."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("cust_nation"),
            (F.col("c_nationkey") == F.col("s_nationkey")).alias("is_local"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint").alias("cents"),
        )
    )
    return (
        base.groupBy("cust_nation")
        .agg(
            F.sum("cents").alias("total_cents"),
            F.sum(F.when(F.col("is_local"), F.col("cents")).otherwise(0)).alias(
                "local_cents"
            ),
        )
        .join(F.broadcast(n), F.col("cust_nation") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("total_cents").cast("bigint").alias("total_cents"),
            F.round(F.col("local_cents") / F.col("total_cents"), 6).alias(
                "local_share"
            ),
        )
        .orderBy("nation")
    )


ORACLE_LOCAL_TRADE_SHARE = """
WITH base AS (
  SELECT c.c_nationkey AS cust_nation,
         c.c_nationkey = s.s_nationkey AS is_local,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
)
SELECT n.n_name AS nation,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(sum(CASE WHEN is_local THEN cents ELSE 0 END) * 1.0
             / sum(cents), 6) AS local_share
FROM base JOIN nation n ON base.cust_nation = n.n_nationkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["local_trade_share"] = q_local_trade_share
ORACLES["local_trade_share"] = ORACLE_LOCAL_TRADE_SHARE


def q_split_part_battery(spark, sf_dir):
    """split_part / element_at parity battery over part types: first,
    second, and last space-separated word, plus the word count — the
    tokenizer primitives a schema-on-read extractor leans on."""
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return (
        p.select(
            F.split_part("p_type", F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part("p_type", F.lit(" "), F.lit(2)).alias("w2"),
            F.element_at(words, -1).alias("w_last"),
            F.size(words).alias("n_words"),
        )
        .groupBy("w1", "w2", "w_last", "n_words")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("w1", "w2", "w_last")
    )


ORACLE_SPLIT_PART_BATTERY = """
WITH t AS (
  SELECT split_part(p_type, ' ', 1) AS w1,
         split_part(p_type, ' ', 2) AS w2,
         string_split(p_type, ' ')[-1] AS w_last,
         CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_words
  FROM part
)
SELECT w1, w2, w_last, n_words, CAST(count(*) AS BIGINT) AS n_parts
FROM t GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3
"""

QUERIES["split_part_battery"] = q_split_part_battery
ORACLES["split_part_battery"] = ORACLE_SPLIT_PART_BATTERY


def q_date_trunc_battery(spark, sf_dir):
    """date_trunc parity battery: week (Monday-start on both engines),
    month, and quarter truncations of the order date, counted per
    (week_start, month_start, quarter_start) triple."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("week_start"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
            F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd").alias("quarter_start"),
        )
        .groupBy("week_start", "month_start", "quarter_start")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("week_start", "month_start")
    )


ORACLE_DATE_TRUNC_BATTERY = """
SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
         AS quarter_start,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2
"""

QUERIES["date_trunc_battery"] = q_date_trunc_battery
ORACLES["date_trunc_battery"] = ORACLE_DATE_TRUNC_BATTERY
