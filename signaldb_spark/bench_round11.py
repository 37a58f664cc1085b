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


# ------------------------------------------------------------- batch 3
# events-stream family


def q_hour_of_week_peak(spark, sf_dir):
    """168-cell hour-of-week profile reduced to each event type's peak
    cell: (dow, hour) with the max event count, count-desc then
    earliest-cell tiebreak so both engines pick the same peak."""
    e = load_table(spark, sf_dir, "events")
    prof = e.groupBy(
        "event_type",
        F.dayofweek("ts").alias("dow_sun1"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("k"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("k"), "dow_sun1", "hod"
    )
    return (
        prof.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("dow_sun1").cast("int").alias("peak_dow"),
            F.col("hod").cast("int").alias("peak_hour"),
            F.col("k").cast("bigint").alias("peak_count"),
        )
        .orderBy("event_type")
    )


ORACLE_HOUR_OF_WEEK_PEAK = """
WITH prof AS (
  SELECT event_type,
         dayofweek(ts) + 1 AS dow_sun1,  -- DuckDB Sunday=0; Spark Sunday=1
         hour(ts) AS hod, count(*) AS k
  FROM events GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY k DESC, dow_sun1, hod) AS rk
  FROM prof
)
SELECT event_type, CAST(dow_sun1 AS INTEGER) AS peak_dow,
       CAST(hod AS INTEGER) AS peak_hour,
       CAST(k AS BIGINT) AS peak_count
FROM ranked WHERE rk = 1 ORDER BY event_type
"""

QUERIES["hour_of_week_peak"] = q_hour_of_week_peak
ORACLES["hour_of_week_peak"] = ORACLE_HOUR_OF_WEEK_PEAK


def q_log_value_histogram(spark, sf_dir):
    """Log10-bucketed value histogram per event type: floor(log10(v))
    for positive values, a NULL-bucket row counting non-positives —
    order-of-magnitude mix, exact counts."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.when(
        F.col("value") > 0, F.floor(F.log10("value")).cast("int")
    )
    return (
        e.groupBy("event_type", bucket.alias("log10_bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("event_type", F.col("log10_bucket").asc_nulls_first())
    )


ORACLE_LOG_VALUE_HISTOGRAM = """
SELECT event_type,
       CASE WHEN value > 0 THEN CAST(floor(log10(value)) AS INTEGER)
            ELSE NULL END AS log10_bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
ORDER BY event_type, log10_bucket ASC NULLS FIRST
"""

QUERIES["log_value_histogram"] = q_log_value_histogram
ORACLES["log_value_histogram"] = ORACLE_LOG_VALUE_HISTOGRAM


def q_user_type_diversity(spark, sf_dir):
    """Behavioral breadth: distinct event types per user, rolled into a
    histogram (how many users touch 1, 2, ... 5 types) — the engagement
    depth curve."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )
    return (
        per_user.groupBy(F.col("n_types").cast("int").alias("n_types"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("n_types")
    )


ORACLE_USER_TYPE_DIVERSITY = """
WITH per_user AS (
  SELECT user_id, count(DISTINCT event_type) AS n_types
  FROM events GROUP BY 1
)
SELECT CAST(n_types AS INTEGER) AS n_types,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""

QUERIES["user_type_diversity"] = q_user_type_diversity
ORACLES["user_type_diversity"] = ORACLE_USER_TYPE_DIVERSITY


def q_interarrival_cv(spark, sf_dir):
    """Arrival burstiness per event type: coefficient of variation of
    inter-arrival gaps (CV=1 is Poisson; higher is bursty). Gaps are
    exact integer microseconds from a per-type LAG; the one float
    division happens at the end."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "event_type",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
                "gap_us"
            ),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(
                F.stddev_pop("gap_us") / F.avg("gap_us"), 6
            ).alias("cv"),
        )
        .orderBy("event_type")
    )


ORACLE_INTERARRIVAL_CV = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(stddev_pop(gap_us) / avg(gap_us), 6) AS cv
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

QUERIES["interarrival_cv"] = q_interarrival_cv
ORACLES["interarrival_cv"] = ORACLE_INTERARRIVAL_CV


def q_user_lifespan_histogram(spark, sf_dir):
    """User lifespan (days between first and last event) bucketed into
    a week histogram: floor(span_days / 7) — retention length at a
    glance. Exact integer microsecond spans."""
    e = load_table(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        (
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
            / F.lit(86400000000.0)
        ).alias("span_days")
    )
    return (
        span.groupBy(
            F.floor(F.col("span_days") / 7).cast("int").alias("week_bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("week_bucket")
    )


ORACLE_USER_LIFESPAN_HISTOGRAM = """
WITH span AS (
  SELECT user_id,
         (max(epoch_us(ts)) - min(epoch_us(ts))) / 86400000000.0
           AS span_days
  FROM events GROUP BY 1
)
SELECT CAST(floor(span_days / 7) AS INTEGER) AS week_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM span GROUP BY 1 ORDER BY 1
"""

QUERIES["user_lifespan_histogram"] = q_user_lifespan_histogram
ORACLES["user_lifespan_histogram"] = ORACLE_USER_LIFESPAN_HISTOGRAM


def q_peak_minute_by_type(spark, sf_dir):
    """The single busiest minute per event type (count desc, earliest
    minute tiebreak) — the spike a burst-limit is sized against."""
    e = load_table(spark, sf_dir, "events")
    per_min = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm").alias(
            "minute"
        ),
    ).agg(F.count(F.lit(1)).alias("k"))
    w = Window.partitionBy("event_type").orderBy(F.desc("k"), "minute")
    return (
        per_min.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type", "minute", F.col("k").cast("bigint").alias("peak_count")
        )
        .orderBy("event_type")
    )


ORACLE_PEAK_MINUTE_BY_TYPE = """
WITH per_min AS (
  SELECT event_type,
         strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute,
         count(*) AS k
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY k DESC, minute) AS rk
  FROM per_min
)
SELECT event_type, minute, CAST(k AS BIGINT) AS peak_count
FROM ranked WHERE rk = 1 ORDER BY event_type
"""

QUERIES["peak_minute_by_type"] = q_peak_minute_by_type
ORACLES["peak_minute_by_type"] = ORACLE_PEAK_MINUTE_BY_TYPE


def q_daily_volume_percentiles(spark, sf_dir):
    """Daily event-count distribution per type: exact p50/p90/p99 over
    the per-day rollup — capacity planning's demand curve."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.percentile("k", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("k", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("k", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


ORACLE_DAILY_VOLUME_PERCENTILES = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS k
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(quantile_cont(k, 0.5), 6) AS p50,
       round(quantile_cont(k, 0.9), 6) AS p90,
       round(quantile_cont(k, 0.99), 6) AS p99
FROM daily GROUP BY 1 ORDER BY 1
"""

QUERIES["daily_volume_percentiles"] = q_daily_volume_percentiles
ORACLES["daily_volume_percentiles"] = ORACLE_DAILY_VOLUME_PERCENTILES


def q_mtbe_stats(spark, sf_dir):
    """Mean/max time between ERROR events (the MTBF analog for the
    error stream): one global ordered LAG over errors only, exact
    microsecond gaps, seconds reported."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    w = Window.orderBy("ts", "event_id")
    gaps = (
        e.select(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
                "gap_us"
            )
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.avg("gap_us") / 1e6, 6).alias("mean_gap_s"),
        F.round(F.max("gap_us") / 1e6, 6).alias("max_gap_s"),
    )


ORACLE_MTBE_STATS = """
WITH gaps AS (
  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (ORDER BY ts, event_id)
           AS gap_us
  FROM events WHERE event_type = 'error'
)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       round(avg(gap_us) / 1e6, 6) AS mean_gap_s,
       round(max(gap_us) / 1e6, 6) AS max_gap_s
FROM gaps WHERE gap_us IS NOT NULL
"""

QUERIES["mtbe_stats"] = q_mtbe_stats
ORACLES["mtbe_stats"] = ORACLE_MTBE_STATS


# ------------------------------------------------------------- batch 4
# corpus / embedding family


def q_word_length_profile(spark, sf_dir):
    """Mean word length and words-per-doc per (lang, source) — the
    lexical profile a quality filter thresholds on. Tokens are
    whitespace splits; totals stay integer until the final
    divisions."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", "source",
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    ).filter(F.length("w") > 0)
    per_doc = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    agg = tok.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("w")).alias("chars"),
    )
    return (
        agg.join(per_doc, ["lang", "source"])
        .select(
            "lang", "source",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(F.col("chars") / F.col("n_words"), 6).alias(
                "mean_word_len"
            ),
            F.round(F.col("n_words") / F.col("n_docs"), 6).alias(
                "words_per_doc"
            ),
        )
        .orderBy("lang", "source")
    )


ORACLE_WORD_LENGTH_PROFILE = """
WITH tok AS (
  SELECT lang, source, UNNEST(string_split(text, ' ')) AS w
  FROM documents
), filt AS (SELECT * FROM tok WHERE len(w) > 0),
per_doc AS (
  SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY 1, 2
)
SELECT f.lang AS lang, f.source AS source,
       CAST(count(*) AS BIGINT) AS n_words,
       round(sum(len(f.w)) * 1.0 / count(*), 6) AS mean_word_len,
       round(count(*) * 1.0 / any_value(p.n_docs), 6) AS words_per_doc
FROM filt f JOIN per_doc p USING (lang, source)
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["word_length_profile"] = q_word_length_profile
ORACLES["word_length_profile"] = ORACLE_WORD_LENGTH_PROFILE


def q_char_class_mix(spark, sf_dir):
    """Character-class composition per source: digit / space / letter
    fractions via counted regexp removals — the garbled-text screen.
    Counts are exact integers; three rounded divisions at the end."""
    d = load_table(spark, sf_dir, "documents")

    def frac(pattern):
        return (
            F.sum(
                F.length("text")
                - F.length(F.regexp_replace("text", pattern, ""))
            )
        )

    return (
        d.groupBy("source")
        .agg(
            F.sum(F.length("text")).alias("chars"),
            frac("[0-9]").alias("digits"),
            frac(" ").alias("spaces"),
            frac("[a-zA-Z]").alias("letters"),
        )
        .select(
            "source",
            F.col("chars").cast("bigint").alias("chars"),
            F.round(F.col("digits") / F.col("chars"), 6).alias("digit_frac"),
            F.round(F.col("spaces") / F.col("chars"), 6).alias("space_frac"),
            F.round(F.col("letters") / F.col("chars"), 6).alias("letter_frac"),
        )
        .orderBy("source")
    )


ORACLE_CHAR_CLASS_MIX = """
SELECT source,
       CAST(sum(len(text)) AS BIGINT) AS chars,
       round(sum(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))
             * 1.0 / sum(len(text)), 6) AS digit_frac,
       round(sum(len(text) - len(regexp_replace(text, ' ', '', 'g')))
             * 1.0 / sum(len(text)), 6) AS space_frac,
       round(sum(len(text) - len(regexp_replace(text, '[a-zA-Z]', '', 'g')))
             * 1.0 / sum(len(text)), 6) AS letter_frac
FROM documents GROUP BY 1 ORDER BY 1
"""

QUERIES["char_class_mix"] = q_char_class_mix
ORACLES["char_class_mix"] = ORACLE_CHAR_CLASS_MIX


def q_source_entropy_by_lang(spark, sf_dir):
    """Source-mix entropy per language (nats): how concentrated each
    language's corpus is across sources — the diversity check before a
    source-cap pass."""
    d = load_table(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("k"))
    tot = Window.partitionBy("lang")
    return (
        cell.withColumn("p", F.col("k") / F.sum("k").over(tot))
        .groupBy("lang")
        .agg(
            F.sum("k").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy_nats"),
        )
        .orderBy("lang")
    )


ORACLE_SOURCE_ENTROPY_BY_LANG = """
WITH cell AS (
  SELECT lang, source, count(*) AS k FROM documents GROUP BY 1, 2
), p AS (
  SELECT lang, source, k,
         k * 1.0 / sum(k) OVER (PARTITION BY lang) AS p
  FROM cell
)
SELECT lang,
       CAST(sum(k) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       round(-sum(p * ln(p)), 6) AS entropy_nats
FROM p GROUP BY 1 ORDER BY 1
"""

QUERIES["source_entropy_by_lang"] = q_source_entropy_by_lang
ORACLES["source_entropy_by_lang"] = ORACLE_SOURCE_ENTROPY_BY_LANG


def q_sign_pattern_buckets(spark, sf_dir):
    """SimHash-style sign bucketing: the sign pattern of the first 8
    embedding dims as an 8-bit code; bucket occupancy histogram (how
    many codes hold 1, 2, ... vectors) — the load-balance check for a
    sign-LSH index."""
    emb = load_table(spark, sf_dir, "embeddings")
    code = F.aggregate(
        F.zip_with(
            F.slice("embedding", 1, 8),
            F.sequence(F.lit(0), F.lit(7)),
            lambda v, i: F.when(
                v.cast("double") >= 0, F.pow(F.lit(2.0), i).cast("int")
            ).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    per_code = emb.select(code.alias("code")).groupBy("code").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        per_code.groupBy(F.col("k").cast("bigint").alias("bucket_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_buckets"))
        .orderBy("bucket_size")
    )


ORACLE_SIGN_PATTERN_BUCKETS = """
WITH codes AS (
  SELECT vec_id,
         sum(CASE WHEN CAST(embedding[d.d] AS DOUBLE) >= 0
                  THEN CAST(pow(2, d.d - 1) AS BIGINT) ELSE 0 END) AS code
  FROM embeddings, UNNEST(range(1, 9)) d(d)
  GROUP BY 1
), per_code AS (
  SELECT code, count(*) AS k FROM codes GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS bucket_size,
       CAST(count(*) AS BIGINT) AS n_buckets
FROM per_code GROUP BY 1 ORDER BY 1
"""

QUERIES["sign_pattern_buckets"] = q_sign_pattern_buckets
ORACLES["sign_pattern_buckets"] = ORACLE_SIGN_PATTERN_BUCKETS


def q_label_centroid_spread(spark, sf_dir):
    """Within-label dispersion: mean Euclidean distance of each vector
    to its label centroid. Centroids are a per-label dim-wise mean
    (tiny, broadcast); distances fold dim-wise with zip_with — stored
    vectors never shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("d", "v")
    ).select("label", "vec_id", "d", F.col("v").cast("double").alias("v"))
    cent = ex.groupBy("label", "d").agg(F.avg("v").alias("c"))
    dist = (
        ex.join(F.broadcast(cent), ["label", "d"])
        .groupBy("label", "vec_id")
        .agg(F.sqrt(F.sum(F.pow(F.col("v") - F.col("c"), 2))).alias("dist"))
    )
    return (
        dist.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.round(F.avg("dist"), 6).alias("mean_dist"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
        .orderBy("label")
    )


ORACLE_LABEL_CENTROID_SPREAD = """
WITH ex AS (
  SELECT label, vec_id, d.d AS d, CAST(embedding[d.d] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, 65)) d(d)
), cent AS (
  SELECT label, d, avg(v) AS c FROM ex GROUP BY 1, 2
), dist AS (
  SELECT ex.label, ex.vec_id, sqrt(sum(pow(ex.v - cent.c, 2))) AS dist
  FROM ex JOIN cent USING (label, d)
  GROUP BY 1, 2
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg(dist), 6) AS mean_dist,
       round(max(dist), 6) AS max_dist
FROM dist GROUP BY 1 ORDER BY 1
"""

QUERIES["label_centroid_spread"] = q_label_centroid_spread
ORACLES["label_centroid_spread"] = ORACLE_LABEL_CENTROID_SPREAD


def q_dim_discrimination_top(spark, sf_dir):
    """The 5 most label-discriminating dimensions: |mean(label 0) −
    mean(label 1)| per dim, top-5 with dim-index tiebreak — the
    feature-selection screen before a cheap linear probe."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isin(0, 1)
    )
    ex = emb.select(
        "label", F.posexplode("embedding").alias("d", "v")
    ).select("label", "d", F.col("v").cast("double").alias("v"))
    means = ex.groupBy("d").agg(
        F.avg(F.when(F.col("label") == 0, F.col("v"))).alias("m0"),
        F.avg(F.when(F.col("label") == 1, F.col("v"))).alias("m1"),
    )
    return (
        means.select(
            (F.col("d") + 1).cast("int").alias("dim"),
            F.round(F.abs(F.col("m0") - F.col("m1")), 6).alias("mean_gap"),
        )
        .orderBy(F.desc("mean_gap"), "dim")
        .limit(5)
    )


ORACLE_DIM_DISCRIMINATION_TOP = """
WITH ex AS (
  SELECT label, d.d AS dim, CAST(embedding[d.d] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, 65)) d(d)
  WHERE label IN (0, 1)
)
SELECT CAST(dim AS INTEGER) AS dim,
       round(abs(avg(CASE WHEN label = 0 THEN v END)
                 - avg(CASE WHEN label = 1 THEN v END)), 6) AS mean_gap
FROM ex GROUP BY dim
ORDER BY mean_gap DESC, dim LIMIT 5
"""

QUERIES["dim_discrimination_top"] = q_dim_discrimination_top
ORACLES["dim_discrimination_top"] = ORACLE_DIM_DISCRIMINATION_TOP


# ------------------------------------------------------------- batch 5


def q_ratelimit_bytes_admission(spark, sf_dir):
    """Byte-dimension token-bucket gate (companion to the round-10
    request gate): per (tenant=event_type, hour) the REAL limiter is
    charged one request per event with a deterministic byte cost —
    1 byte normally, 51 bytes (over the 50-byte burst cap) every 7th
    event id. Oversized requests can NEVER be admitted (cost > cap)
    and unit requests admit until the bucket drains, so the outcome
    has an order-independent closed form: min(units, 50) admitted per
    hour, everything else rejected — which also pins that REJECTED
    requests consume no tokens (if they did, the admitted count would
    fall short). Bounded schedule: tenants x hours."""
    from .ratelimit import RateLimitExceeded, TenantRateLimiter

    e = load_table(spark, sf_dir, "events")
    sched = (
        e.groupBy(
            F.col("event_type").alias("tenant"),
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
        )
        .agg(
            F.sum((F.col("event_id") % 7 == 0).cast("long")).alias("big"),
            F.sum((F.col("event_id") % 7 != 0).cast("long")).alias("unit"),
        )
        .collect()
    )
    limiter = TenantRateLimiter(
        {"max_ingest_bytes_per_sec": 50, "burst_seconds": 1.0}
    )
    stats: dict = {}
    for row in sorted(sched, key=lambda r: (r["hr"], r["tenant"])):
        adm = rej = 0
        now = float(row["hr"]) * 3600.0
        for cost, count in ((51, row["big"]), (1, row["unit"])):
            for _ in range(count):
                try:
                    limiter.check_ingest(row["tenant"], cost, now=now)
                    adm += 1
                except RateLimitExceeded:
                    rej += 1
        a, rr = stats.get(row["tenant"], (0, 0))
        stats[row["tenant"]] = (a + adm, rr + rej)
    rows = [(t, a, r) for t, (a, r) in sorted(stats.items())]
    return spark.createDataFrame(
        rows, "tenant string, admitted long, rejected long"
    ).orderBy("tenant")


ORACLE_RATELIMIT_BYTES_ADMISSION = """
WITH sched AS (
  SELECT event_type AS tenant,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS big,
         sum(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END) AS unit
  FROM events GROUP BY 1, 2
)
SELECT tenant,
       CAST(sum(least(unit, 50)) AS BIGINT) AS admitted,
       CAST(sum(big + greatest(unit - 50, 0)) AS BIGINT) AS rejected
FROM sched GROUP BY 1 ORDER BY 1
"""

QUERIES["ratelimit_bytes_admission"] = q_ratelimit_bytes_admission
ORACLES["ratelimit_bytes_admission"] = ORACLE_RATELIMIT_BYTES_ADMISSION


def q_single_supplier_orders(spark, sf_dir):
    """Orders served end-to-end by ONE supplier, per order status:
    count and share. One distinct-supplier rollup keyed by order, then
    a status join — no wide row ever carries line detail."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum((F.col("n_supp") == 1).cast("long")).cast("bigint").alias(
                "single_supplier"
            ),
            F.round(
                F.sum((F.col("n_supp") == 1).cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("share"),
        )
        .orderBy("status")
    )


ORACLE_SINGLE_SUPPLIER_ORDERS = """
WITH per_order AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN p.n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS single_supplier,
       round(sum(CASE WHEN p.n_supp = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS share
FROM per_order p JOIN orders o ON p.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["single_supplier_orders"] = q_single_supplier_orders
ORACLES["single_supplier_orders"] = ORACLE_SINGLE_SUPPLIER_ORDERS


def q_multi_nation_orders(spark, sf_dir):
    """Supply-chain spread histogram: orders by how many DISTINCT
    supplier nations their lines draw from. The supplier dim
    broadcasts; the distinct count keys on the order."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    per_order = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_orderkey")
        .agg(F.countDistinct("s_nationkey").alias("n_nations"))
    )
    return (
        per_order.groupBy(F.col("n_nations").cast("int").alias("n_nations"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("n_nations")
    )


ORACLE_MULTI_NATION_ORDERS = """
WITH per_order AS (
  SELECT l.l_orderkey, count(DISTINCT s.s_nationkey) AS n_nations
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1
)
SELECT CAST(n_nations AS INTEGER) AS n_nations,
       CAST(count(*) AS BIGINT) AS n_orders
FROM per_order GROUP BY 1 ORDER BY 1
"""

QUERIES["multi_nation_orders"] = q_multi_nation_orders
ORACLES["multi_nation_orders"] = ORACLE_MULTI_NATION_ORDERS


def q_widest_orders(spark, sf_dir):
    """Top-5 widest orders by line count (count desc, orderkey asc
    tiebreak) with their total quantity hundredths — the outlier
    baskets a packing pass special-cases."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias(
                "quantity_hundredths"
            ),
        )
        .orderBy(F.desc("n_lines"), "orderkey")
        .limit(5)
    )


ORACLE_WIDEST_ORDERS = """
SELECT l_orderkey AS orderkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS quantity_hundredths
FROM lineitem GROUP BY 1
ORDER BY n_lines DESC, orderkey LIMIT 5
"""

QUERIES["widest_orders"] = q_widest_orders
ORACLES["widest_orders"] = ORACLE_WIDEST_ORDERS


def q_between_boundary_battery(spark, sf_dir):
    """BETWEEN inclusivity battery: numeric BETWEEN on integer-cents
    boundaries, NOT BETWEEN complement, and a date BETWEEN over
    timestamp days — the inclusive-bounds semantics both engines must
    share exactly (boundary rows counted IN)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity") * 100).cast("bigint")
    return li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(qty.between(1000, 2000).cast("long")).cast("bigint").alias(
            "qty_10_to_20"
        ),
        F.sum((~qty.between(1000, 2000)).cast("long")).cast("bigint").alias(
            "qty_outside"
        ),
        F.sum((qty == 1000).cast("long")).cast("bigint").alias("at_low_bound"),
        F.sum((qty == 2000).cast("long")).cast("bigint").alias("at_high_bound"),
        F.sum(
            F.to_date("l_shipdate").between("1995-01-01", "1995-12-31").cast("long")
        ).cast("bigint").alias("shipped_1995"),
    )


ORACLE_BETWEEN_BOUNDARY_BATTERY = """
WITH t AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS qty,
         CAST(l_shipdate AS DATE) AS d
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN qty BETWEEN 1000 AND 2000 THEN 1 ELSE 0 END)
            AS BIGINT) AS qty_10_to_20,
       CAST(sum(CASE WHEN qty NOT BETWEEN 1000 AND 2000 THEN 1 ELSE 0 END)
            AS BIGINT) AS qty_outside,
       CAST(sum(CASE WHEN qty = 1000 THEN 1 ELSE 0 END) AS BIGINT)
         AS at_low_bound,
       CAST(sum(CASE WHEN qty = 2000 THEN 1 ELSE 0 END) AS BIGINT)
         AS at_high_bound,
       CAST(sum(CASE WHEN d BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
                     THEN 1 ELSE 0 END) AS BIGINT) AS shipped_1995
FROM t
"""

QUERIES["between_boundary_battery"] = q_between_boundary_battery
ORACLES["between_boundary_battery"] = ORACLE_BETWEEN_BOUNDARY_BATTERY


def q_nation_top_balance_holder(spark, sf_dir):
    """Per nation: the customer holding the max balance, with an
    explicit custkey tiebreak (row_number, not arg_max — ties must
    resolve identically on both engines)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    top = c.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        top.join(F.broadcast(n), top.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").cast("bigint").alias("top_custkey"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias(
                "balance_cents"
            ),
        )
        .orderBy("nation")
    )


ORACLE_NATION_TOP_BALANCE_HOLDER = """
WITH ranked AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer
)
SELECT n.n_name AS nation,
       CAST(r.c_custkey AS BIGINT) AS top_custkey,
       CAST(round(r.c_acctbal * 100) AS BIGINT) AS balance_cents
FROM ranked r JOIN nation n ON r.c_nationkey = n.n_nationkey
WHERE r.rk = 1 ORDER BY nation
"""

QUERIES["nation_top_balance_holder"] = q_nation_top_balance_holder
ORACLES["nation_top_balance_holder"] = ORACLE_NATION_TOP_BALANCE_HOLDER


def q_weighted_avg_discount(spark, sf_dir):
    """Quantity-weighted average discount per brand: weights and
    values both scaled to integers (hundredths), one rounded division
    at the end; the part dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qh = F.round(F.col("l_quantity") * 100).cast("bigint")
    dh = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(qh * dh).alias("wsum"),
            F.sum(qh).alias("w"),
        )
        .select(
            "brand", "n_items",
            F.round(F.col("wsum") / F.col("w") / 100.0, 6).alias(
                "weighted_avg_discount_pct"
            ),
        )
        .orderBy("brand")
    )


ORACLE_WEIGHTED_AVG_DISCOUNT = """
WITH t AS (
  SELECT p.p_brand AS brand,
         CAST(round(l.l_quantity * 100) AS BIGINT) AS qh,
         CAST(round(l.l_discount * 100) AS BIGINT) AS dh
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT brand, CAST(count(*) AS BIGINT) AS n_items,
       round(sum(qh * dh) * 1.0 / sum(qh) / 100.0, 6)
         AS weighted_avg_discount_pct
FROM t GROUP BY 1 ORDER BY 1
"""

QUERIES["weighted_avg_discount"] = q_weighted_avg_discount
ORACLES["weighted_avg_discount"] = ORACLE_WEIGHTED_AVG_DISCOUNT


def q_never_ordered_parts(spark, sf_dir):
    """Dead stock: parts never appearing in any lineitem, counted per
    brand with the brand's live-part contrast — a LEFT ANTI against
    the distinct ordered-part set."""
    p = load_table(spark, sf_dir, "part")
    ordered = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    ).distinct()
    dead = p.join(ordered, "p_partkey", "left_anti")
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .join(
            dead.groupBy(F.col("p_brand").alias("brand")).agg(
                F.count(F.lit(1)).alias("n_dead")
            ),
            "brand",
            "left",
        )
        .select(
            "brand",
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.coalesce("n_dead", F.lit(0)).cast("bigint").alias("never_ordered"),
        )
        .orderBy("brand")
    )


ORACLE_NEVER_ORDERED_PARTS = """
WITH dead AS (
  SELECT p_brand, count(*) AS n_dead
  FROM part
  WHERE p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem)
  GROUP BY 1
)
SELECT p.p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(coalesce(any_value(dead.n_dead), 0) AS BIGINT) AS never_ordered
FROM part p LEFT JOIN dead ON p.p_brand = dead.p_brand
GROUP BY 1 ORDER BY 1
"""

QUERIES["never_ordered_parts"] = q_never_ordered_parts
ORACLES["never_ordered_parts"] = ORACLE_NEVER_ORDERED_PARTS


def q_value_props_correlation(spark, sf_dir):
    """Pearson correlation between the numeric value and the JSON
    props field k, per event type — the embedded-attribute association
    screen (get_json_object stays in codegen; no UDF)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        e.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.corr("value", "k"), 6).alias("value_k_corr"),
        )
        .orderBy("event_type")
    )


ORACLE_VALUE_PROPS_CORRELATION = """
WITH t AS (
  SELECT event_type, value,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(corr(value, k), 6) AS value_k_corr
FROM t GROUP BY 1 ORDER BY 1
"""

QUERIES["value_props_correlation"] = q_value_props_correlation
ORACLES["value_props_correlation"] = ORACLE_VALUE_PROPS_CORRELATION


def q_exists_in_battery(spark, sf_dir):
    """Subquery-shape battery: EXISTS (semi), NOT EXISTS (anti), and a
    correlated IN over a filtered set — one row of counts pinning
    the three predicate shapes' cardinalities."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    custs_with_orders = o.select("o_custkey").distinct()
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    ).distinct()
    with_orders = c.join(
        custs_with_orders, c.c_custkey == custs_with_orders.o_custkey, "left_semi"
    ).count()
    without_orders = c.join(
        custs_with_orders, c.c_custkey == custs_with_orders.o_custkey, "left_anti"
    ).count()
    with_urgent = c.join(
        urgent, c.c_custkey == urgent.o_custkey, "left_semi"
    ).count()
    return spark.createDataFrame(
        [(with_orders, without_orders, with_urgent)],
        "with_orders long, without_orders long, with_urgent long",
    )


ORACLE_EXISTS_IN_BATTERY = """
SELECT CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_custkey = c.c_custkey)
                     THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_custkey = c.c_custkey)
                     THEN 1 ELSE 0 END) AS BIGINT) AS without_orders,
       CAST(sum(CASE WHEN c.c_custkey IN (SELECT o_custkey FROM orders
                                          WHERE o_orderpriority = '1-URGENT')
                     THEN 1 ELSE 0 END) AS BIGINT) AS with_urgent
FROM customer c
"""

QUERIES["exists_in_battery"] = q_exists_in_battery
ORACLES["exists_in_battery"] = ORACLE_EXISTS_IN_BATTERY


# ------------------------------------------------------------- batch 6


def q_filtered_agg_battery(spark, sf_dir):
    """Conditional-aggregation battery per priority: filtered counts,
    filtered exact sums, and a filtered average — the FILTER-clause
    shapes (Spark spells them count(when)/sum(when)) that must agree
    including the all-filtered-out NULL average case."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    is_f = F.col("o_orderstatus") == "F"
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(is_f, F.lit(1))).cast("bigint").alias("n_finished"),
            F.sum(F.when(is_f, cents)).cast("bigint").alias("finished_cents"),
            F.round(F.avg(F.when(is_f, F.col("o_totalprice"))), 6).alias(
                "avg_finished"
            ),
        )
        .orderBy("priority")
    )


ORACLE_FILTERED_AGG_BATTERY = """
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS n_finished,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS finished_cents,
       round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 6)
         AS avg_finished
FROM orders GROUP BY 1 ORDER BY 1
"""

QUERIES["filtered_agg_battery"] = q_filtered_agg_battery
ORACLES["filtered_agg_battery"] = ORACLE_FILTERED_AGG_BATTERY


def q_cohort_triangle(spark, sf_dir):
    """Weekly cohort triangle: users grouped by their FIRST-event week,
    counted distinct in every week they act — the retention matrix's
    raw cells (cohort_week <= active_week by construction)."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
    first = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = e.select("user_id", wk.alias("active_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "active_week")
    )


ORACLE_COHORT_TRIANGLE = """
WITH wk AS (
  SELECT user_id, strftime(date_trunc('week', ts), '%Y-%m-%d') AS w
  FROM events
), first AS (
  SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1
), active AS (SELECT DISTINCT user_id, w AS active_week FROM wk)
SELECT f.cohort_week AS cohort_week, a.active_week AS active_week,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["cohort_triangle"] = q_cohort_triangle
ORACLES["cohort_triangle"] = ORACLE_COHORT_TRIANGLE


def q_type_share_trend(spark, sf_dir):
    """Is each event type gaining or losing share? Least-squares slope
    of the type's daily share against the day index (regr_slope both
    engines) — the mix-shift detector."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d"), "event_type").agg(
        F.count(F.lit(1)).alias("k")
    )
    tot = Window.partitionBy("d")
    shares = daily.withColumn("share", F.col("k") / F.sum("k").over(tot)).withColumn(
        "day_idx",
        (F.unix_timestamp(F.col("d").cast("timestamp")) / 86400).cast("double"),
    )
    return (
        shares.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.regr_slope(F.col("share"), F.col("day_idx")) * 1e6, 6).alias(
                "share_slope_ppm_per_day"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_TYPE_SHARE_TREND = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, count(*) AS k
  FROM events GROUP BY 1, 2
), shares AS (
  SELECT event_type,
         k * 1.0 / sum(k) OVER (PARTITION BY d) AS share,
         CAST(epoch(CAST(d AS TIMESTAMP)) / 86400 AS DOUBLE) AS day_idx
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(regr_slope(share, day_idx) * 1e6, 6) AS share_slope_ppm_per_day
FROM shares GROUP BY 1 ORDER BY 1
"""

QUERIES["type_share_trend"] = q_type_share_trend
ORACLES["type_share_trend"] = ORACLE_TYPE_SHARE_TREND


def q_revenue_acceleration(spark, sf_dir):
    """Second difference of monthly revenue (cents − 2·lag1 + lag2) —
    integer-exact acceleration, defined only where both lags exist."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("month")
    return (
        m.withColumn("l1", F.lag("cents", 1).over(w))
        .withColumn("l2", F.lag("cents", 2).over(w))
        .select(
            "month",
            F.col("cents").cast("bigint").alias("revenue_cents"),
            (F.col("cents") - 2 * F.col("l1") + F.col("l2")).cast("bigint").alias(
                "acceleration_cents"
            ),
        )
        .orderBy("month")
    )


ORACLE_REVENUE_ACCELERATION = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT month,
       CAST(cents AS BIGINT) AS revenue_cents,
       CAST(cents - 2 * lag(cents, 1) OVER (ORDER BY month)
             + lag(cents, 2) OVER (ORDER BY month) AS BIGINT)
         AS acceleration_cents
FROM m ORDER BY month
"""

QUERIES["revenue_acceleration"] = q_revenue_acceleration
ORACLES["revenue_acceleration"] = ORACLE_REVENUE_ACCELERATION


def q_cosine_angle_histogram(spark, sf_dir):
    """Pairwise-cosine histogram: the 10 lowest-id vectors against the
    rest, cosines bucketed at 0.1 — the separation profile that says
    whether a cosine near-dup threshold is meaningful. The query side
    broadcasts; dot products fold with zip_with."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        norm.alias("qn"),
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), "embedding", norm.alias("cn")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("embedding"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        (dot / (F.col("qn") * F.col("cn"))).alias("cos")
    )
    return (
        pairs.groupBy(
            F.floor(F.col("cos") * 10).cast("int").alias("cos_decile")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("cos_decile")
    )


ORACLE_COSINE_ANGLE_HISTOGRAM = """
WITH norms AS (
  SELECT vec_id, embedding,
         sqrt(sum(CAST(embedding[d.d] AS DOUBLE)
                  * CAST(embedding[d.d] AS DOUBLE))) AS nrm
  FROM embeddings, UNNEST(range(1, 65)) d(d)
  GROUP BY 1, 2
), pairs AS (
  SELECT sum(CAST(q.embedding[d.d] AS DOUBLE)
             * CAST(c.embedding[d.d] AS DOUBLE))
           / (any_value(q.nrm) * any_value(c.nrm)) AS cos
  FROM norms q, norms c, UNNEST(range(1, 65)) d(d)
  WHERE q.vec_id < 10 AND c.vec_id >= 10
  GROUP BY q.vec_id, c.vec_id
)
SELECT CAST(floor(cos * 10) AS INTEGER) AS cos_decile,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1 ORDER BY 1
"""

QUERIES["cosine_angle_histogram"] = q_cosine_angle_histogram
ORACLES["cosine_angle_histogram"] = ORACLE_COSINE_ANGLE_HISTOGRAM


def q_l2_cosine_topk_overlap(spark, sf_dir):
    """Metric agreement audit: for query vector 0, the top-10 neighbor
    sets under L2 distance and cosine similarity, reported as the
    overlap count — how interchangeable the two metrics are on this
    embedding space. Ties break on vec_id on both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    c = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qv))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("embedding"),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda a, x: a + x,
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("embedding"),
                       lambda a, b: (a.cast("double") - b.cast("double"))
                       * (a.cast("double") - b.cast("double"))),
            F.lit(0.0), lambda a, x: a + x,
        )
    )
    nq = F.sqrt(F.aggregate(F.col("qv"), F.lit(0.0),
                            lambda a, x: a + x.cast("double") * x.cast("double")))
    nc = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0),
                            lambda a, x: a + x.cast("double") * x.cast("double")))
    scored = c.select(
        "vec_id", l2.alias("l2"), (dot / (nq * nc)).alias("cos")
    )
    wl2 = Window.orderBy("l2", "vec_id")
    wcos = Window.orderBy(F.desc("cos"), "vec_id")
    ranked = scored.select(
        "vec_id",
        F.row_number().over(wl2).alias("rl2"),
        F.row_number().over(wcos).alias("rcos"),
    )
    return ranked.agg(
        F.sum(((F.col("rl2") <= 10) & (F.col("rcos") <= 10)).cast("long"))
        .cast("bigint").alias("overlap_at_10"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
    )


ORACLE_L2_COSINE_TOPK_OVERLAP = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT c.vec_id,
         sqrt(sum(pow(CAST(q.qv[d.d] AS DOUBLE)
                      - CAST(c.embedding[d.d] AS DOUBLE), 2))) AS l2,
         sum(CAST(q.qv[d.d] AS DOUBLE) * CAST(c.embedding[d.d] AS DOUBLE))
           / (sqrt(sum(CAST(q.qv[d.d] AS DOUBLE)
                       * CAST(q.qv[d.d] AS DOUBLE)))
              * sqrt(sum(CAST(c.embedding[d.d] AS DOUBLE)
                         * CAST(c.embedding[d.d] AS DOUBLE)))) AS cos
  FROM embeddings c, q, UNNEST(range(1, 65)) d(d)
  WHERE c.vec_id <> 0
  GROUP BY c.vec_id
), ranked AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY l2, vec_id) AS rl2,
         row_number() OVER (ORDER BY cos DESC, vec_id) AS rcos
  FROM scored
)
SELECT CAST(sum(CASE WHEN rl2 <= 10 AND rcos <= 10 THEN 1 ELSE 0 END)
            AS BIGINT) AS overlap_at_10,
       CAST(count(*) AS BIGINT) AS n_candidates
FROM ranked
"""

QUERIES["l2_cosine_topk_overlap"] = q_l2_cosine_topk_overlap
ORACLES["l2_cosine_topk_overlap"] = ORACLE_L2_COSINE_TOPK_OVERLAP


def q_sturges_histogram(spark, sf_dir):
    """Sturges-rule histogram of order value: k = floor(log2(n)) + 1
    bins over [min, max], top bin right-closed — the automatic bin
    count a dashboard picks, computed identically from the same
    scalars on both engines."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    binned = (
        o.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo"))
                       / (F.floor(F.log2("n")) + 1))
                ),
                F.floor(F.log2("n")),
            ).cast("int").alias("bin")
        )
    )
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("bin")
    )


ORACLE_STURGES_HISTOGRAM = """
WITH stats AS (
  SELECT count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
  FROM orders
)
SELECT CAST(least(floor((o.o_totalprice - s.lo)
                        / ((s.hi - s.lo) / (floor(log2(s.n)) + 1))),
                  floor(log2(s.n))) AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o, stats s
GROUP BY 1 ORDER BY 1
"""

QUERIES["sturges_histogram"] = q_sturges_histogram
ORACLES["sturges_histogram"] = ORACLE_STURGES_HISTOGRAM


def q_consecutive_day_orders(spark, sf_dir):
    """Back-to-back buying: customers ordering on consecutive calendar
    days — distinct (customer, day) pairs, LAG by one day, counted as
    adjacent-day pairs and as distinct customers exhibiting any."""
    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    adj = days.withColumn(
        "gap", F.datediff(F.col("d"), F.lag("d").over(w))
    ).filter(F.col("gap") == 1)
    return adj.agg(
        F.count(F.lit(1)).cast("bigint").alias("adjacent_day_pairs"),
        F.countDistinct("o_custkey").cast("bigint").alias("customers"),
    )


ORACLE_CONSECUTIVE_DAY_ORDERS = """
WITH days AS (
  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
), adj AS (
  SELECT o_custkey,
         date_diff('day', lag(d) OVER (PARTITION BY o_custkey ORDER BY d),
                   d) AS gap
  FROM days
)
SELECT CAST(count(*) AS BIGINT) AS adjacent_day_pairs,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS customers
FROM adj WHERE gap = 1
"""

QUERIES["consecutive_day_orders"] = q_consecutive_day_orders
ORACLES["consecutive_day_orders"] = ORACLE_CONSECUTIVE_DAY_ORDERS


def q_per_day_month_rate(spark, sf_dir):
    """Month-length-normalized revenue: monthly cents divided by the
    month's calendar day count (day(last_day)) — the fair month-to-
    month comparison February always needs."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.dayofmonth(F.last_day("o_orderdate")).alias("days_in_month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
        .select(
            "month",
            F.col("days_in_month").cast("int").alias("days_in_month"),
            F.round(F.col("cents") / F.col("days_in_month") / 100.0, 6).alias(
                "usd_per_day"
            ),
        )
        .orderBy("month")
    )


ORACLE_PER_DAY_MONTH_RATE = """
WITH t AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         day(last_day(CAST(o_orderdate AS DATE))) AS dim,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT month,
       CAST(dim AS INTEGER) AS days_in_month,
       round(sum(cents) * 1.0 / dim / 100.0, 6) AS usd_per_day
FROM t GROUP BY month, dim ORDER BY month
"""

QUERIES["per_day_month_rate"] = q_per_day_month_rate
ORACLES["per_day_month_rate"] = ORACLE_PER_DAY_MONTH_RATE


def q_error_follow_rate(spark, sf_dir):
    """Conditional failure rate: the share of purchase events followed
    by an ERROR from the SAME user within one hour — an interval
    semi-join keyed on user, exact microsecond bounds."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.unix_micros("ts").alias("pt"),
    )
    err = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("eu"), F.unix_micros("ts").alias("et")
    )
    followed = (
        p.join(
            err,
            (F.col("pu") == F.col("eu"))
            & (F.col("et") > F.col("pt"))
            & (F.col("et") <= F.col("pt") + 3_600_000_000),
            "left_semi",
        )
    )
    tot = p.count()
    bad = followed.count()
    return (
        p.sparkSession.createDataFrame(
            [(tot, bad, round(bad / tot, 6) if tot else None)],
            "purchases long, followed_by_error long, follow_rate double",
        )
    )


ORACLE_ERROR_FOLLOW_RATE = """
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS pt
  FROM events WHERE event_type = 'purchase'
), flagged AS (
  SELECT p.event_id,
         EXISTS (SELECT 1 FROM events e
                 WHERE e.event_type = 'error' AND e.user_id = p.user_id
                   AND epoch_us(e.ts) > p.pt
                   AND epoch_us(e.ts) <= p.pt + 3600000000) AS followed
  FROM p
)
SELECT CAST(count(*) AS BIGINT) AS purchases,
       CAST(sum(CASE WHEN followed THEN 1 ELSE 0 END) AS BIGINT)
         AS followed_by_error,
       round(sum(CASE WHEN followed THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS follow_rate
FROM flagged
"""

QUERIES["error_follow_rate"] = q_error_follow_rate
ORACLES["error_follow_rate"] = ORACLE_ERROR_FOLLOW_RATE
