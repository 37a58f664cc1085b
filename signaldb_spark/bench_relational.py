"""Relational operator battery: joins, set ops, discovery, predicates.

Covers the SURVEY §2 rows that are generic-relational rather than
time-series: the SQL surface the reference delegates to DataFusion
(flight.rs:1243), union-by-name scans (metrics.rs:1444-1484), discovery
endpoints (distinct label values / detected_fields, logs.rs:415-577),
map-attribute predicates with NULL/Kleene semantics
(logql.rs:209-254, querying-ir.md:120-129), and point lookups
(trace.rs find-by-id pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table

R6 = lambda c: F.round(c, 6)


# ---------------------------------------------------------------------------
# joins (the generic surface; Catalyst picks broadcast for dims)


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.

    customer is small → Catalyst broadcasts it; orders⋈lineitem is the
    shuffle join on l_orderkey. At 100 TB both sides are bucketable on
    orderkey to eliminate the shuffle entirely.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    j = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join through region→nation→customer→orders→
    lineitem→supplier with co-nation condition; all dims broadcast."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg(R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


ORACLE_REGION_REVENUE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_semi_anti_join(spark, sf_dir):
    """EXISTS / NOT EXISTS as left-semi / left-anti joins: customers with
    orders vs without (the and/unless set semantics on row sets)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    has = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("with_orders").alias("bucket_kind")
    )
    hasnot = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("no_orders").alias("bucket_kind")
    )
    return has.unionByName(hasnot)


ORACLE_SEMI_ANTI_JOIN = """
SELECT c_custkey, 'with_orders' AS bucket_kind FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS bucket_kind FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# ---------------------------------------------------------------------------
# set ops / union-by-name


def q_union_by_name(spark, sf_dir):
    """Metrics union scan: union two differently-shaped projections with
    absent columns null-filled per side (scan_union,
    metrics.rs:1444-1484 → unionByName allowMissingColumns)."""
    e = load_table(spark, sf_dir, "events")
    gauge_like = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("value").alias("gauge_value")
    )
    sum_like = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("value").alias("sum_value"), F.lit(True).alias("is_monotonic")
    )
    return gauge_like.unionByName(sum_like, allowMissingColumns=True)


ORACLE_UNION_BY_NAME = """
SELECT event_id, user_id, value AS gauge_value, NULL::DOUBLE AS sum_value, NULL::BOOLEAN AS is_monotonic
FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, user_id, NULL::DOUBLE AS gauge_value, value AS sum_value, TRUE AS is_monotonic
FROM events WHERE event_type = 'purchase'
"""


def q_intersect_except(spark, sf_dir):
    """INTERSECT / EXCEPT on row sets (free in Spark; absent in the
    reference engine — SURVEY §2.7): users who clicked AND purchased,
    minus users who errored."""
    e = load_table(spark, sf_dir, "events")
    clickers = e.filter(F.col("event_type") == "click").select("user_id")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    errored = e.filter(F.col("event_type") == "error").select("user_id")
    return clickers.intersect(buyers).subtract(errored)


ORACLE_INTERSECT_EXCEPT = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""


# ---------------------------------------------------------------------------
# discovery endpoints


def q_distinct_discovery(spark, sf_dir):
    """Label-values discovery: distinct non-empty values, sorted, capped
    at LABEL_SCAN_LIMIT=1000 (logs.rs:415-475, metrics.rs:58)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type")
        .filter(F.col("event_type").isNotNull() & (F.col("event_type") != ""))
        .distinct()
        .orderBy("event_type")
        .limit(1000)
    )


ORACLE_DISTINCT_DISCOVERY = """
SELECT DISTINCT event_type FROM events
WHERE event_type IS NOT NULL AND event_type <> ''
ORDER BY event_type LIMIT 1000
"""


def q_detected_fields(spark, sf_dir):
    """detected_fields: per attribute key, sniffed type + distinct-count
    (logs.rs:483-577). Per-value classification (true/false → bool, then
    integer format, then float parse, else string) and the reference's
    per-key resolution: all-bool → boolean, int-only → int, int+float →
    float, any string → string. The rendered-value documents here are
    synthesized from event columns so every branch is exercised; exact
    distinct (the reference reports a capped lower bound)."""
    e = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("string")
    rendered = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k"),
        F.lit("flag"), F.when(F.col("event_type") == "purchase", "true").otherwise("false"),
        F.lit("ratio"), F.concat(uid, F.lit(".5")),
        F.lit("mix"), F.when(F.col("user_id") % 2 == 0, uid).otherwise(
            F.concat(uid, F.lit(".5"))
        ),
        F.lit("type"), F.col("event_type"),
    )
    from .maintenance.jobs import detect_field_types

    kv = e.select(F.explode(rendered).alias("field", "v"))
    return detect_field_types(kv)


ORACLE_DETECTED_FIELDS = """
WITH kv AS (
  SELECT 'k' AS field, json_extract_string(props, '$.k') AS v FROM events
  UNION ALL
  SELECT 'flag', CASE WHEN event_type = 'purchase' THEN 'true' ELSE 'false' END FROM events
  UNION ALL
  SELECT 'ratio', CAST(user_id AS VARCHAR) || '.5' FROM events
  UNION ALL
  SELECT 'mix', CASE WHEN user_id % 2 = 0 THEN CAST(user_id AS VARCHAR)
                     ELSE CAST(user_id AS VARCHAR) || '.5' END FROM events
  UNION ALL
  SELECT 'type', event_type FROM events
),
cls AS (
  SELECT field, v,
         v IN ('true', 'false') AS isb,
         regexp_matches(v, '^[+-]?[0-9]+$') AS isi,
         TRY_CAST(v AS DOUBLE) IS NOT NULL AS isf
  FROM kv WHERE v IS NOT NULL
),
agg AS (
  SELECT field,
         max(CASE WHEN NOT isb AND NOT isi AND NOT isf THEN 1 ELSE 0 END) AS s,
         max(CASE WHEN NOT isb AND isi THEN 1 ELSE 0 END) AS i,
         max(CASE WHEN NOT isb AND NOT isi AND isf THEN 1 ELSE 0 END) AS f,
         max(CASE WHEN isb THEN 1 ELSE 0 END) AS b,
         count(DISTINCT v) AS cardinality
  FROM cls GROUP BY field
)
SELECT field,
       CASE WHEN s = 0 AND i = 0 AND f = 0 AND b = 1 THEN 'boolean'
            WHEN s = 0 AND i = 1 AND f = 0 AND b = 0 THEN 'int'
            WHEN s = 0 AND f = 1 AND b = 0 THEN 'float'
            ELSE 'string' END AS dtype,
       cardinality
FROM agg
"""


# ---------------------------------------------------------------------------
# predicates: map attributes, NULL/Kleene semantics, line filters


def q_map_attr_ordered(spark, sf_dir):
    """Ordered comparison on an extracted attribute cast to double
    (map_attribute_expr, logql.rs:209-254): props.k >= 50."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        e.filter(k >= 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), R6(F.avg(k)).alias("avg_k"))
    )


ORACLE_MAP_ATTR_ORDERED = """
SELECT event_type, count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
GROUP BY event_type
"""


def q_ne_matches_absent(spark, sf_dir):
    """LogQL `!=` semantics: negations also match NULL/absent values
    (logql.rs:222-237) — `k10 != 3` keeps rows where the derived field
    is NULL, unlike plain SQL `<>`. Field k10 = nullif(k % 10, 0)."""
    e = load_table(spark, sf_dir, "events")
    k10 = F.nullif(F.get_json_object("props", "$.k").cast("long") % 10, F.lit(0))
    return (
        e.withColumn("k10", k10)
        .filter(F.col("k10").isNull() | (F.col("k10") != 3))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_NE_MATCHES_ABSENT = """
WITH t AS (
  SELECT event_type,
         nullif(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10, 0) AS k10
  FROM events
)
SELECT event_type, count(*) AS n FROM t
WHERE k10 IS NULL OR k10 <> 3
GROUP BY event_type
"""


def q_ir_kleene(spark, sf_dir):
    """IR Kleene semantics (querying-ir.md:120-129): an absent field
    fails BOTH `x = v` and `not(x = v)`; only `exists` observes it.
    Three disjoint counts over the same derived nullable field."""
    e = load_table(spark, sf_dir, "events")
    k10 = F.nullif(F.get_json_object("props", "$.k").cast("long") % 10, F.lit(0))
    t = e.withColumn("k10", k10)
    eq = t.filter(F.col("k10") == 3).select(F.lit("eq3").alias("rule"))
    ne = t.filter(~(F.col("k10") == 3)).select(F.lit("not_eq3").alias("rule"))
    ex = t.filter(F.col("k10").isNotNull()).select(F.lit("exists").alias("rule"))
    return eq.unionByName(ne).unionByName(ex).groupBy("rule").agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE_IR_KLEENE = """
WITH t AS (
  SELECT nullif(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10, 0) AS k10
  FROM events
)
SELECT 'eq3' AS rule, count(*) AS n FROM t WHERE k10 = 3
UNION ALL
SELECT 'not_eq3' AS rule, count(*) AS n FROM t WHERE NOT (k10 = 3)
UNION ALL
SELECT 'exists' AS rule, count(*) AS n FROM t WHERE k10 IS NOT NULL
"""


def q_line_filters(spark, sf_dir):
    """LogQL line-filter chain |= != |~ (line_filter_expr,
    logql.rs:131-144): contains / not-contains / regex over a text
    column (documents.text as the body stand-in)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").contains("join"))
        .filter(~F.col("text").contains("window"))
        .filter(F.col("text").rlike("scan (merge|hash)"))
        .select("doc_id", "lang")
    )


ORACLE_LINE_FILTERS = """
SELECT doc_id, lang FROM documents
WHERE contains(text, 'join')
  AND NOT contains(text, 'window')
  AND regexp_matches(text, 'scan (merge|hash)')
"""


def q_point_lookup(spark, sf_dir):
    """Trace find-by-id pattern: equality point lookup with minimal
    projection (TRACE_LOOKUP_COLUMNS, trace.rs:560-574). At rest this
    column carries a parquet bloom filter so row groups prune."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_orderkey") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


ORACLE_POINT_LOOKUP = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem WHERE l_orderkey = 1
"""


def q_time_window_sorted(spark, sf_dir):
    """Log-query shape: inclusive time window + direction sort + limit
    (shape_log_query logs.rs:638-660) with explicit event_id tiebreak."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts").between("2024-01-05 00:00:00", "2024-01-10 00:00:00"))
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .select("event_id", "user_id", "event_type", "value")
    )


ORACLE_TIME_WINDOW_SORTED = """
SELECT event_id, user_id, event_type, value FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-10 00:00:00'
ORDER BY ts DESC, event_id DESC
LIMIT 100
"""


def q_sql_surface(spark, sf_dir):
    """Raw SQL surface: registered views + spark.sql with the 1M row cap
    appended, as the reference does for every raw query
    (flight.rs:1243-1263)."""
    from .catalog import load_tables

    load_tables(spark, sf_dir, ("orders", "customer"), register=True)
    df = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n,
               round(avg(o_totalprice), 6) AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 0
        GROUP BY o_orderpriority
        """
    )
    return df.limit(1_000_000)


ORACLE_SQL_SURFACE = """
SELECT o_orderpriority, count(*) AS n, round(avg(o_totalprice), 6) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_acctbal > 0
GROUP BY o_orderpriority
"""


QUERIES = {
    "shipping_priority": q_shipping_priority,
    "region_revenue": q_region_revenue,
    "semi_anti_join": q_semi_anti_join,
    "union_by_name": q_union_by_name,
    "intersect_except": q_intersect_except,
    "distinct_discovery": q_distinct_discovery,
    "detected_fields": q_detected_fields,
    "map_attr_ordered": q_map_attr_ordered,
    "ne_matches_absent": q_ne_matches_absent,
    "ir_kleene": q_ir_kleene,
    "line_filters": q_line_filters,
    "point_lookup": q_point_lookup,
    "time_window_sorted": q_time_window_sorted,
    "sql_surface": q_sql_surface,
}

ORACLES = {
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "region_revenue": ORACLE_REGION_REVENUE,
    "semi_anti_join": ORACLE_SEMI_ANTI_JOIN,
    "union_by_name": ORACLE_UNION_BY_NAME,
    "intersect_except": ORACLE_INTERSECT_EXCEPT,
    "distinct_discovery": ORACLE_DISTINCT_DISCOVERY,
    "detected_fields": ORACLE_DETECTED_FIELDS,
    "map_attr_ordered": ORACLE_MAP_ATTR_ORDERED,
    "ne_matches_absent": ORACLE_NE_MATCHES_ABSENT,
    "ir_kleene": ORACLE_IR_KLEENE,
    "line_filters": ORACLE_LINE_FILTERS,
    "point_lookup": ORACLE_POINT_LOOKUP,
    "time_window_sorted": ORACLE_TIME_WINDOW_SORTED,
    "sql_surface": ORACLE_SQL_SURFACE,
}


def q_returned_item_revenue(spark, sf_dir):
    """TPC-H Q10 shape: per-customer revenue from returned items in one
    quarter, nation joined in. Dim tables broadcast; one shuffle on the
    (custkey, name, nation) agg key; deterministic top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    j = (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1993-10-01")
                & (F.col("o_orderdate") < "1994-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


ORACLE_RETURNED_ITEM_REVENUE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1993-10-01' AND o_orderdate < '1994-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

QUERIES["returned_item_revenue"] = q_returned_item_revenue
ORACLES["returned_item_revenue"] = ORACLE_RETURNED_ITEM_REVENUE


def q_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total lineitem quantity crosses a
    threshold, with customer context. The HAVING subquery becomes a
    pre-aggregated semi-join keep-list (tiny by construction)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


ORACLE_LARGE_ORDERS = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       round(total_qty, 2) AS total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""

QUERIES["large_orders"] = q_large_orders
ORACLES["large_orders"] = ORACLE_LARGE_ORDERS


def q_salted_agg(spark, sf_dir):
    """Skew-proof two-phase salted aggregation (operators/skew.
    salted_aggregate): per-event-type count + sum through the
    (key, salt) partial → key merge path; results are salt-invariant,
    so the plain-SQL oracle checks them exactly."""
    from .operators.skew import salted_aggregate

    e = load_table(spark, sf_dir, "events")
    cnt = salted_aggregate(e, ["event_type"], None, "count", out="cnt")
    ssum = salted_aggregate(e, ["event_type"], "value", "sum", out="vsum")
    return (
        cnt.join(ssum, "event_type")
        .select(
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            F.round("vsum", 6).alias("vsum"),
        )
        .orderBy("event_type")
    )


ORACLE_SALTED_AGG = """
SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
       round(sum(value), 6) AS vsum
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["salted_agg"] = q_salted_agg
ORACLES["salted_agg"] = ORACLE_SALTED_AGG


def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue between two nations by (supplier nation,
    customer nation, year) with the OR of both direction pairs. The two
    nation dims broadcast TWICE under different aliases; the fact-side
    filter keeps only the two nations' suppliers/customers before the
    (nation, nation, year) agg — one shuffle on a 2×2×years key."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["volume_shipping"] = q_volume_shipping
ORACLES["volume_shipping"] = ORACLE_VOLUME_SHIPPING


def q_priority_shipmode(spark, sf_dir):
    """TPC-H Q12 shape (conditional counting): per line status, how many
    orders are high- vs low-priority — the CASE-inside-SUM idiom, one
    partial+final agg after the fact join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = l.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_PRIORITY_SHIPMODE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
GROUP BY 1 ORDER BY 1
"""

QUERIES["priority_shipmode"] = q_priority_shipmode
ORACLES["priority_shipmode"] = ORACLE_PRIORITY_SHIPMODE


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share for one month — a scalar
    ratio of two conditional sums over the part join. 6dp-rounded."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    ).join(p, F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        R6(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev)
        ).alias("promo_revenue")
    )


ORACLE_PROMO_REVENUE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'
"""

QUERIES["promo_revenue"] = q_promo_revenue
ORACLES["promo_revenue"] = ORACLE_PROMO_REVENUE


def q_brand_quantity_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — the
    predicate Catalyst must keep as a post-join filter while still
    pushing the per-side conjuncts (brand/size to the part scan,
    quantity to the lineitem scan) down as a derived OR."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


ORACLE_BRAND_QUANTITY_REVENUE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

QUERIES["brand_quantity_revenue"] = q_brand_quantity_revenue
ORACLES["brand_quantity_revenue"] = ORACLE_BRAND_QUANTITY_REVENUE
