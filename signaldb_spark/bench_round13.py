"""Round-13 staging battery: oracle-gated queries registered AFTER the
round-12 block so earlier rounds' tuned driver prefixes stay intact;
these become fresh driver evidence once rounds 8-12 are proven.

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


def q_order_growth_rate(spark, sf_dir):
    """Month-over-month order-count growth: exact counts, one lag over
    the monthly rollup, growth as an exact-int ratio rounded once."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev", F.lag("n").over(w))
        .select(
            "month", "n",
            F.round((F.col("n") - F.col("prev")) / F.col("prev"), 6)
            .alias("growth"),
        )
        .orderBy("month")
    )


ORACLE_ORDER_GROWTH_RATE = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT month, n,
       round((n - lag(n) OVER (ORDER BY month))
             / lag(n) OVER (ORDER BY month), 6) AS growth
FROM monthly ORDER BY month
"""

QUERIES["order_growth_rate"] = q_order_growth_rate
ORACLES["order_growth_rate"] = ORACLE_ORDER_GROWTH_RATE


def q_discount_cap_counterfactual(spark, sf_dir):
    """Counterfactual pricing: revenue recovered per year if every
    discount above 5% were capped at 5% — the what-if a pricing review
    runs; per-line integer cents under BOTH discount schedules."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    actual = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    capped = F.round(
        F.col("l_extendedprice")
        * (1 - F.least(F.col("l_discount"), F.lit(0.05))) * 100
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("yr")
        .agg(
            F.sum(actual).alias("actual_cents"),
            F.sum(capped - actual).alias("recovered_cents"),
            F.sum((F.col("l_discount") > 0.05).cast("long")).alias(
                "lines_over_cap"
            ),
        )
        .orderBy("yr")
    )


ORACLE_DISCOUNT_CAP_COUNTERFACTUAL = """
SELECT year(o_orderdate) AS yr,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS actual_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - least(l_discount, 0.05))
                     * 100) AS BIGINT)
           - CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
         AS BIGINT) AS recovered_cents,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS lines_over_cap
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["discount_cap_counterfactual"] = q_discount_cap_counterfactual
ORACLES["discount_cap_counterfactual"] = ORACLE_DISCOUNT_CAP_COUNTERFACTUAL


def q_orders_per_customer_tail(spark, sf_dir):
    """Survival counts P(orders ≥ k) for k = 1..10 — the heavy-buyer
    tail a loyalty program sizes against; one rollup, one bounded
    spine join."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ks = spark.range(1, 11).select(F.col("id").cast("long").alias("k"))
    return (
        ks.crossJoin(F.broadcast(per.agg(
            *[F.sum((F.col("n") >= k).cast("long")).alias(f"c{k}")
              for k in range(1, 11)]
        )))
        .select(
            "k",
            F.coalesce(*[
                F.when(F.col("k") == k, F.col(f"c{k}")) for k in range(1, 11)
            ]).alias("customers"),
        )
        .orderBy("k")
    )


ORACLE_ORDERS_PER_CUSTOMER_TAIL = """
WITH per AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY 1
)
SELECT k, CAST(sum(CASE WHEN n >= k THEN 1 ELSE 0 END) AS BIGINT)
       AS customers
FROM per, unnest(range(1, 11)) AS u(k)
GROUP BY 1 ORDER BY 1
"""

QUERIES["orders_per_customer_tail"] = q_orders_per_customer_tail
ORACLES["orders_per_customer_tail"] = ORACLE_ORDERS_PER_CUSTOMER_TAIL


def q_linenumber_price_trend(spark, sf_dir):
    """Average line value by position in the order (linenumber 1-7):
    do later lines carry smaller items? Exact cents until the one
    division, plus each position's share of lines."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per = li.groupBy("l_linenumber").agg(
        F.sum(cents).alias("sum_cents"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.partitionBy()
    return (
        per.select(
            "l_linenumber", "n",
            F.round(F.col("sum_cents") / F.col("n") / 100.0, 6)
            .alias("avg_value"),
            F.round(F.col("n") / F.sum("n").over(w), 6).alias("line_share"),
        )
        .orderBy("l_linenumber")
    )


ORACLE_LINENUMBER_PRICE_TREND = """
WITH per AS (
  SELECT l_linenumber,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
)
SELECT l_linenumber, n,
       round(sum_cents / n / 100.0, 6) AS avg_value,
       round(n / sum(n) OVER (), 6) AS line_share
FROM per ORDER BY l_linenumber
"""

QUERIES["linenumber_price_trend"] = q_linenumber_price_trend
ORACLES["linenumber_price_trend"] = ORACLE_LINENUMBER_PRICE_TREND


def q_quantity_histogram_cumshare(spark, sf_dir):
    """The full integer-quantity histogram (1-50) with cumulative
    share — exact counts, one cumulative window over the 50-row
    rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_quantity").cast("int").alias("qty")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    return (
        per.withColumn(
            "cum_share",
            F.round(F.sum("n").over(w) / F.sum("n").over(wt), 6),
        )
        .select("qty", "n", "cum_share")
        .orderBy("qty")
    )


ORACLE_QUANTITY_HISTOGRAM_CUMSHARE = """
WITH per AS (
  SELECT CAST(l_quantity AS INT) AS qty, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
)
SELECT qty, n,
       round(sum(n) OVER (ORDER BY qty) / sum(n) OVER (), 6) AS cum_share
FROM per ORDER BY qty
"""

QUERIES["quantity_histogram_cumshare"] = q_quantity_histogram_cumshare
ORACLES["quantity_histogram_cumshare"] = ORACLE_QUANTITY_HISTOGRAM_CUMSHARE


def q_value_top_decile_share(spark, sf_dir):
    """Value-mass concentration per stream: the share of total value
    carried by the top 10% of events (exact integer-rank cut on cents,
    tiebreak event_id)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    scored = e.select("event_type", cents.alias("c"), "event_id")
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("event_id").asc()
    )
    ranked = scored.withColumn("rk", F.row_number().over(w))
    per = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").alias("total_c"),
    )
    return (
        ranked.join(F.broadcast(per), "event_type")
        .filter(F.col("rk") <= F.greatest(F.lit(1), F.floor(F.col("n") / 10)))
        .groupBy("event_type")
        .agg(
            F.first("n").alias("events"),
            F.round(F.sum("c") / F.first("total_c"), 6).alias(
                "top_decile_share"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_VALUE_TOP_DECILE_SHARE = """
WITH scored AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, event_id
  FROM events
),
ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c DESC, event_id ASC) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS total_c
  FROM scored
)
SELECT event_type, CAST(max(n) AS BIGINT) AS events,
       round(sum(c) / max(total_c), 6) AS top_decile_share
FROM ranked
WHERE rk <= greatest(1, CAST(floor(n / 10) AS BIGINT))
GROUP BY 1 ORDER BY 1
"""

QUERIES["value_top_decile_share"] = q_value_top_decile_share
ORACLES["value_top_decile_share"] = ORACLE_VALUE_TOP_DECILE_SHARE


def q_user_loyalty_bands(spark, sf_dir):
    """Behavioral focus bands: each user's dominant-event-type share
    (exact counts, deterministic dominant pick), banded — how
    single-purpose the audience is."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    wt = Window.partitionBy("user_id")
    dom = (
        per.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rk") == 1)
        .select((F.col("n") * 100 / F.col("total")).alias("pct"))
    )
    band = (
        F.when(F.col("pct") >= 80, "focused-80+")
        .when(F.col("pct") >= 50, "major-50-79")
        .otherwise("diverse-<50")
    )
    return (
        dom.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("band")
    )


ORACLE_USER_LOYALTY_BANDS = """
WITH per AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
dom AS (
  SELECT user_id, n * 100 / sum(n) OVER (PARTITION BY user_id) AS pct,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type ASC) AS rk
  FROM per
)
SELECT CASE WHEN pct >= 80 THEN 'focused-80+'
            WHEN pct >= 50 THEN 'major-50-79'
            ELSE 'diverse-<50' END AS band,
       CAST(count(*) AS BIGINT) AS users
FROM dom WHERE rk = 1 GROUP BY 1 ORDER BY 1
"""

QUERIES["user_loyalty_bands"] = q_user_loyalty_bands
ORACLES["user_loyalty_bands"] = ORACLE_USER_LOYALTY_BANDS


def q_value_quantile_by_dow(spark, sf_dir):
    """p50/p90 of event value per day-of-week by exact integer-rank
    selection on cents — does weekend traffic carry different value?"""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    scored = e.select(
        F.dayofweek("ts").cast("int").alias("dow"),
        cents.alias("c"), "event_id",
    )
    w = Window.partitionBy("dow").orderBy("c", "event_id")
    ranked = scored.withColumn("rk", F.row_number().over(w))
    per = scored.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = ranked.join(F.broadcast(per), "dow")
    p50 = j.filter(
        F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * 0.5))
    ).select("dow", F.col("c").alias("p50_cents"))
    p90 = j.filter(
        F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * 0.9))
    ).select("dow", F.col("c").alias("p90_cents"))
    return p50.join(p90, "dow").orderBy("dow")


ORACLE_VALUE_QUANTILE_BY_DOW = """
WITH scored AS (
  SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
         CAST(round(value * 100) AS BIGINT) AS c, event_id
  FROM events
),
ranked AS (
  SELECT dow, c,
         row_number() OVER (PARTITION BY dow ORDER BY c, event_id) AS rk,
         count(*) OVER (PARTITION BY dow) AS n
  FROM scored
)
SELECT dow,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
           THEN c END) AS p50_cents,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.9) AS BIGINT))
           THEN c END) AS p90_cents
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["value_quantile_by_dow"] = q_value_quantile_by_dow
ORACLES["value_quantile_by_dow"] = ORACLE_VALUE_QUANTILE_BY_DOW


# ------------------------------------------------ batch 2: corpus + engine


def q_hour_stickiness(spark, sf_dir):
    """Consecutive-hour user stickiness: of users active in hour h,
    the share also active in hour h+1, rolled up by hour-of-day — the
    short-horizon retention curve. Distinct (user, hour) rollup first;
    the self-join runs on that digest."""
    e = load_table(spark, sf_dir, "events")
    uh = e.select(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    nxt = uh.select(
        F.col("user_id").alias("u2"),
        (F.col("h") - F.expr("INTERVAL 1 HOUR")).alias("h_prev"),
    )
    j = uh.join(
        nxt, (uh.user_id == nxt.u2) & (uh.h == nxt.h_prev), "left"
    )
    return (
        j.groupBy(F.hour("h").cast("int").alias("hod"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("user_hours"),
            F.count("u2").cast("long").alias("retained_next_hour"),
        )
        .withColumn(
            "stickiness",
            F.round(F.col("retained_next_hour") / F.col("user_hours"), 6),
        )
        .orderBy("hod")
    )


ORACLE_HOUR_STICKINESS = """
WITH uh AS (
  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h FROM events
)
SELECT CAST(hour(a.h) AS INT) AS hod,
       CAST(count(*) AS BIGINT) AS user_hours,
       CAST(count(b.user_id) AS BIGINT) AS retained_next_hour,
       round(count(b.user_id) / count(*), 6) AS stickiness
FROM uh a LEFT JOIN uh b
  ON a.user_id = b.user_id AND b.h = a.h + INTERVAL 1 HOUR
GROUP BY 1 ORDER BY 1
"""

QUERIES["hour_stickiness"] = q_hour_stickiness
ORACLES["hour_stickiness"] = ORACLE_HOUR_STICKINESS


def q_doc_prefix_dup_rate(spark, sf_dir):
    """Cheap near-dup screen: docs sharing their first 48 characters,
    per source — prefix-block sizes and the share of docs in blocks of
    2+ (the triage BEFORE paying for MinHash)."""
    d = load_table(spark, sf_dir, "documents")
    blocks = d.groupBy(
        "source", F.substring("text", 1, 48).alias("pfx")
    ).agg(F.count(F.lit(1)).cast("long").alias("bn"))
    return (
        blocks.groupBy("source")
        .agg(
            F.sum("bn").alias("docs"),
            F.sum(F.when(F.col("bn") >= 2, F.col("bn")).otherwise(0))
            .alias("docs_in_dup_blocks"),
            F.count(F.lit(1)).cast("long").alias("blocks"),
        )
        .withColumn(
            "dup_rate",
            F.round(F.col("docs_in_dup_blocks") / F.col("docs"), 6),
        )
        .orderBy("source")
    )


ORACLE_DOC_PREFIX_DUP_RATE = """
WITH blocks AS (
  SELECT source, substring(text, 1, 48) AS pfx,
         CAST(count(*) AS BIGINT) AS bn
  FROM documents GROUP BY 1, 2
)
SELECT source, CAST(sum(bn) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN bn >= 2 THEN bn ELSE 0 END) AS BIGINT)
         AS docs_in_dup_blocks,
       CAST(count(*) AS BIGINT) AS blocks,
       round(sum(CASE WHEN bn >= 2 THEN bn ELSE 0 END) / sum(bn), 6)
         AS dup_rate
FROM blocks GROUP BY 1 ORDER BY 1
"""

QUERIES["doc_prefix_dup_rate"] = q_doc_prefix_dup_rate
ORACLES["doc_prefix_dup_rate"] = ORACLE_DOC_PREFIX_DUP_RATE


def q_boundary_token_vocab(spark, sf_dir):
    """First-token vs last-token vocabulary per lang: documents that
    start formulaically but end diversely (or vice versa) mark
    template contamination — two bounded distinct counts from one
    projection."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    per = d.select(
        "lang",
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.countDistinct("first_tok").cast("long").alias("first_vocab"),
            F.countDistinct("last_tok").cast("long").alias("last_vocab"),
            F.count(F.lit(1)).cast("long").alias("docs"),
        )
        .orderBy("lang")
    )


ORACLE_BOUNDARY_TOKEN_VOCAB = r"""
WITH per AS (
  SELECT lang,
         regexp_split_to_array(trim(text), '\s+')[1] AS first_tok,
         regexp_split_to_array(trim(text), '\s+')[-1] AS last_tok
  FROM documents
)
SELECT lang, CAST(count(DISTINCT first_tok) AS BIGINT) AS first_vocab,
       CAST(count(DISTINCT last_tok) AS BIGINT) AS last_vocab,
       CAST(count(*) AS BIGINT) AS docs
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["boundary_token_vocab"] = q_boundary_token_vocab
ORACLES["boundary_token_vocab"] = ORACLE_BOUNDARY_TOKEN_VOCAB


def q_source_vocab_jaccard(spark, sf_dir):
    """Pairwise vocabulary Jaccard between sources (upper triangle):
    which sources write alike — the mixture-design complement of the
    digest-keyed source-overlap gate. The pair join runs on the
    (word, source) DISTINCT rollup, bounded by vocabulary size, never
    on documents."""
    d = load_table(spark, sf_dir, "documents")
    ws = (
        d.select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .distinct()
    )
    sizes = ws.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("v"))
    a = ws.select(F.col("source").alias("sa"), "w")
    b_ = ws.select(F.col("source").alias("sb"), "w")
    inter = (
        a.join(b_, "w")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    va = sizes.select(F.col("source").alias("sa"), F.col("v").alias("va"))
    vb = sizes.select(F.col("source").alias("sb"), F.col("v").alias("vb"))
    out = (
        inter.join(F.broadcast(va), "sa").join(F.broadcast(vb), "sb")
        .select(
            "sa", "sb",
            F.round(F.col("i") / (F.col("va") + F.col("vb") - F.col("i")), 6)
            .alias("jaccard"),
        )
        .orderBy("sa", "sb")
    )
    return out


ORACLE_SOURCE_VOCAB_JACCARD = r"""
WITH ws AS (
  SELECT DISTINCT source, w
  FROM documents,
       unnest(regexp_split_to_array(trim(text), '\s+')) AS t(w)
),
sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS v FROM ws GROUP BY 1
),
inter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS i
  FROM ws a JOIN ws b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sa, sb, round(i / (va.v + vb.v - i), 6) AS jaccard
FROM inter
JOIN sizes va ON va.source = sa
JOIN sizes vb ON vb.source = sb
ORDER BY sa, sb
"""

QUERIES["source_vocab_jaccard"] = q_source_vocab_jaccard
ORACLES["source_vocab_jaccard"] = ORACLE_SOURCE_VOCAB_JACCARD


def q_emb_top_norm_label_mix(spark, sf_dir):
    """Label mix among the 100 largest-norm vectors (exact rank cut,
    tiebreak vec_id) — norm outliers concentrated in one label mark a
    preprocessing bug; norms are row-local folds."""
    e = load_table(spark, sf_dir, "embeddings")
    norm2 = F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    scored = e.select("label", "vec_id", norm2.alias("n2"))
    w = Window.orderBy(F.col("n2").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 100)
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("in_top100"))
        .orderBy("label")
    )


ORACLE_EMB_TOP_NORM_LABEL_MIX = """
WITH scored AS (
  SELECT label, vec_id,
         list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
  FROM embeddings
),
ranked AS (
  SELECT label, row_number() OVER (ORDER BY n2 DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT label, CAST(count(*) AS BIGINT) AS in_top100
FROM ranked WHERE rk <= 100 GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_top_norm_label_mix"] = q_emb_top_norm_label_mix
ORACLES["emb_top_norm_label_mix"] = ORACLE_EMB_TOP_NORM_LABEL_MIX


def q_ratelimit_fractional_rates(spark, sf_dir):
    """DRIVER gate for FRACTIONAL rate limits (the r8 admin fix: 0.5
    req/s survives as a float instead of truncating to a zero-capacity
    bucket): replay a deterministic admission schedule against the
    REAL limiter at rate 0.5/s burst 2 (capacity 1.0) and compare the
    per-tenant admit/reject ledger to the oracle's closed-form replay
    of the same token arithmetic."""
    from .ratelimit import RateLimitExceeded, TenantRateLimiter

    limiter = TenantRateLimiter(
        {"max_query_requests_per_sec": 0.5, "burst_seconds": 2.0}
    )
    rows = []
    for tenant in ("acme", "globex"):
        for i in range(40):
            t = i * 0.7  # 0.35 tokens refilled per step at 0.5/s
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
            F.min(F.when(~F.col("admitted"), F.col("step"))).alias(
                "first_reject_step"
            ),
        )
        .orderBy("tenant")
    )


ORACLE_RATELIMIT_FRACTIONAL_RATES = """
WITH RECURSIVE sim(tenant, step, tokens, admitted) AS (
  SELECT t.tenant, 0, 1.0 - 1.0, TRUE
  FROM (VALUES ('acme'), ('globex')) AS t(tenant)
  UNION ALL
  SELECT tenant, step + 1,
         CASE WHEN least(tokens + 0.35, 1.0) >= 1.0
              THEN least(tokens + 0.35, 1.0) - 1.0
              ELSE least(tokens + 0.35, 1.0) END,
         least(tokens + 0.35, 1.0) >= 1.0
  FROM sim WHERE step < 39
)
SELECT tenant, CAST(count(*) AS BIGINT) AS requests,
       CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
         AS admitted,
       min(CASE WHEN NOT admitted THEN step END) AS first_reject_step
FROM sim GROUP BY 1 ORDER BY 1
"""

QUERIES["ratelimit_fractional_rates"] = q_ratelimit_fractional_rates
ORACLES["ratelimit_fractional_rates"] = ORACLE_RATELIMIT_FRACTIONAL_RATES


def q_typed_attr_migration_census(spark, sf_dir):
    """Typed-migration routing census: after v1→v2, every (key,
    type-tag) combination counted — ints landed in the int home,
    off-type strings in the residue, bools as bools; the oracle counts
    the same routing straight off the fixture rule."""
    from .schemas.anyvalue import AttributeTypeRegistry
    from .schemas.resolver import builtin_registry

    e = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "error", F.lit("n/a"))
        .otherwise(F.round(F.col("value")).cast("long").cast("string"))
    )
    flag = F.when(F.col("value") >= 50, F.lit("true")).otherwise(F.lit("false"))
    v1 = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.create_map(
            F.lit("http.response.status_code"), code,
            F.lit("exception.escaped"), flag,
            F.lit("note"), F.lit("hello"),
        ).alias("log_attributes"),
    )
    v2 = builtin_registry().migrate(
        v1, "logs", "v1", "v2",
        attr_types=AttributeTypeRegistry().assignments(),
    )
    return (
        v2.select(F.explode("log_attributes").alias("k", "v"))
        .groupBy("k", F.col("v.type").alias("vtype"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("k", "vtype")
    )


ORACLE_TYPED_ATTR_MIGRATION_CENSUS = """
WITH rows_t AS (
  SELECT CASE WHEN event_type = 'error' THEN 'string' ELSE 'int' END
           AS code_type,
         'bool' AS flag_type
  FROM events
)
SELECT 'exception.escaped' AS k, flag_type AS vtype,
       CAST(count(*) AS BIGINT) AS n
FROM rows_t GROUP BY 1, 2
UNION ALL
SELECT 'http.response.status_code' AS k, code_type AS vtype,
       CAST(count(*) AS BIGINT) AS n
FROM rows_t GROUP BY 1, 2
UNION ALL
SELECT 'note' AS k, 'string' AS vtype, CAST(count(*) AS BIGINT) AS n
FROM rows_t GROUP BY 1, 2
ORDER BY k, vtype
"""

QUERIES["typed_attr_migration_census"] = q_typed_attr_migration_census
ORACLES["typed_attr_migration_census"] = ORACLE_TYPED_ATTR_MIGRATION_CENSUS


# ------------------------------------------------------------- batch 3


def q_price_band_transition(spark, sf_dir):
    """Customers' order-value band in their FIRST vs LAST order — the
    upsell/downsell transition matrix (deterministic first/last by
    (date, orderkey); bands from exact cents)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    key = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    per = o.select("o_custkey", cents.alias("c"), key.alias("k")).groupBy(
        "o_custkey"
    ).agg(
        F.min_by("c", F.col("k")).alias("first_c"),
        F.max_by("c", F.col("k")).alias("last_c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).filter(F.col("n") >= 2)

    def band(c):
        return (
            F.when(c < 5_000_000, "low")
            .when(c < 20_000_000, "mid")
            .otherwise("high")
        )

    return (
        per.groupBy(
            band(F.col("first_c")).alias("first_band"),
            band(F.col("last_c")).alias("last_band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("customers"))
        .orderBy("first_band", "last_band")
    )


ORACLE_PRICE_BAND_TRANSITION = """
WITH per AS (
  SELECT o_custkey,
         first(CAST(round(o_totalprice * 100) AS BIGINT)
               ORDER BY o_orderdate, o_orderkey) AS first_c,
         last(CAST(round(o_totalprice * 100) AS BIGINT)
              ORDER BY o_orderdate, o_orderkey) AS last_c,
         count(*) AS n
  FROM orders GROUP BY 1 HAVING count(*) >= 2
)
SELECT CASE WHEN first_c < 5000000 THEN 'low'
            WHEN first_c < 20000000 THEN 'mid' ELSE 'high' END AS first_band,
       CASE WHEN last_c < 5000000 THEN 'low'
            WHEN last_c < 20000000 THEN 'mid' ELSE 'high' END AS last_band,
       CAST(count(*) AS BIGINT) AS customers
FROM per GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["price_band_transition"] = q_price_band_transition
ORACLES["price_band_transition"] = ORACLE_PRICE_BAND_TRANSITION


def q_supplier_active_months(spark, sf_dir):
    """Supplier activity breadth: distinct shipping months per
    supplier, histogrammed — the always-on vs seasonal supplier mix."""
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.select("l_suppkey", F.date_trunc("month", "l_shipdate").alias("m"))
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("months"))
    )
    return (
        per.groupBy("months")
        .agg(F.count(F.lit(1)).cast("long").alias("suppliers"))
        .orderBy("months")
    )


ORACLE_SUPPLIER_ACTIVE_MONTHS = """
WITH per AS (
  SELECT l_suppkey,
         CAST(count(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT)
           AS months
  FROM lineitem GROUP BY 1
)
SELECT months, CAST(count(*) AS BIGINT) AS suppliers
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["supplier_active_months"] = q_supplier_active_months
ORACLES["supplier_active_months"] = ORACLE_SUPPLIER_ACTIVE_MONTHS


def q_tax_rate_census(spark, sf_dir):
    """The discrete tax-rate vocabulary with per-rate line counts and
    taxed-value sums (exact cents) — the rate table recovered from the
    data, as a fiscal audit would."""
    li = load_table(spark, sf_dir, "lineitem")
    rate = F.round(F.col("l_tax") * 100).cast("int")
    taxed = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        * F.col("l_tax") * 100
    ).cast("long")
    return (
        li.groupBy(rate.alias("tax_pct"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("lines"),
            F.sum(taxed).alias("tax_cents"),
        )
        .orderBy("tax_pct")
    )


ORACLE_TAX_RATE_CENSUS = """
SELECT CAST(round(l_tax * 100) AS INT) AS tax_pct,
       CAST(count(*) AS BIGINT) AS lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100)
                AS BIGINT)) AS BIGINT) AS tax_cents
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["tax_rate_census"] = q_tax_rate_census
ORACLES["tax_rate_census"] = ORACLE_TAX_RATE_CENSUS


def q_part_name_token_idf(spark, sf_dir):
    """Top-15 rarest part-name tokens by IDF (exact doc-frequency
    counts, ln((N+1)/(df+1)) computed once on the token rollup) — the
    catalog-search weighting table."""
    p = load_table(spark, sf_dir, "part")
    toks = (
        p.select("p_partkey", F.explode(F.split("p_name", " ")).alias("w"))
        .distinct()
    )
    n_parts = p.select(F.count(F.lit(1)).cast("long").alias("n_parts"))
    df = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return (
        df.crossJoin(F.broadcast(n_parts))
        .select(
            "w", "df",
            F.round(F.log((F.col("n_parts") + 1) / (F.col("df") + 1)), 6)
            .alias("idf"),
        )
        .orderBy(F.col("idf").desc(), F.col("w").asc())
        .limit(15)
    )


ORACLE_PART_NAME_TOKEN_IDF = """
WITH toks AS (
  SELECT DISTINCT p_partkey, w
  FROM part, unnest(string_split(p_name, ' ')) AS t(w)
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part),
df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1)
SELECT w, df, round(ln((n_parts + 1) / (df + 1)), 6) AS idf
FROM df, n ORDER BY idf DESC, w ASC LIMIT 15
"""

QUERIES["part_name_token_idf"] = q_part_name_token_idf
ORACLES["part_name_token_idf"] = ORACLE_PART_NAME_TOKEN_IDF


def q_weekend_weekday_value_gap(spark, sf_dir):
    """Weekend vs weekday value profile per stream: exact-cents means
    and the gap, one conditional agg pass (Spark dayofweek 1=Sun,
    7=Sat; weekend = {1, 7})."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    wknd = F.dayofweek("ts").isin(1, 7)
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(F.when(wknd, cents)).alias("wknd_cents"),
            F.sum(F.when(wknd, 1).otherwise(0)).cast("long").alias("wknd_n"),
            F.sum(F.when(~wknd, cents)).alias("wkday_cents"),
            F.sum(F.when(~wknd, 1).otherwise(0)).cast("long").alias("wkday_n"),
        )
        .select(
            "event_type",
            F.round(F.col("wknd_cents") / F.col("wknd_n") / 100.0, 6)
            .alias("weekend_avg"),
            F.round(F.col("wkday_cents") / F.col("wkday_n") / 100.0, 6)
            .alias("weekday_avg"),
            F.round(
                (F.col("wknd_cents") / F.col("wknd_n")
                 - F.col("wkday_cents") / F.col("wkday_n")) / 100.0, 6
            ).alias("gap"),
        )
        .orderBy("event_type")
    )


ORACLE_WEEKEND_WEEKDAY_VALUE_GAP = """
WITH per AS (
  SELECT event_type,
         sum(CASE WHEN dayofweek(ts) IN (0, 6)
             THEN CAST(round(value * 100) AS BIGINT) END) AS wknd_cents,
         CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
              AS BIGINT) AS wknd_n,
         sum(CASE WHEN dayofweek(ts) NOT IN (0, 6)
             THEN CAST(round(value * 100) AS BIGINT) END) AS wkday_cents,
         CAST(sum(CASE WHEN dayofweek(ts) NOT IN (0, 6) THEN 1 ELSE 0 END)
              AS BIGINT) AS wkday_n
  FROM events GROUP BY 1
)
SELECT event_type,
       round(wknd_cents / wknd_n / 100.0, 6) AS weekend_avg,
       round(wkday_cents / wkday_n / 100.0, 6) AS weekday_avg,
       round((wknd_cents / wknd_n - wkday_cents / wkday_n) / 100.0, 6) AS gap
FROM per ORDER BY event_type
"""

QUERIES["weekend_weekday_value_gap"] = q_weekend_weekday_value_gap
ORACLES["weekend_weekday_value_gap"] = ORACLE_WEEKEND_WEEKDAY_VALUE_GAP


def q_doc_repeat_word_runs(spark, sf_dir):
    """Immediate word-repetition rate per source (w[i] == w[i+1]) —
    the stutter artifact detector; the adjacent-pair walk is the same
    O(words) zip_with shape as the bigram gate."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    reps = F.size(
        F.filter(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: a == b,
            ),
            lambda x: x,
        )
    )
    per = d.filter(F.size(toks) >= 2).select(
        "source",
        reps.cast("long").alias("reps"),
        (F.size(toks) - 1).cast("long").alias("pairs"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum("reps").alias("repeat_pairs"),
            F.sum("pairs").alias("total_pairs"),
            F.sum((F.col("reps") > 0).cast("long")).alias("docs_with_repeats"),
        )
        .withColumn(
            "repeat_rate",
            F.round(F.col("repeat_pairs") / F.col("total_pairs"), 6),
        )
        .orderBy("source")
    )


ORACLE_DOC_REPEAT_WORD_RUNS = r"""
WITH per AS (
  SELECT source,
         CAST(len(list_filter(range(1, len(t)),
                  i -> t[i] = t[i + 1])) AS BIGINT) AS reps,
         CAST(len(t) - 1 AS BIGINT) AS pairs
  FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents)
  WHERE len(t) >= 2
)
SELECT source, CAST(sum(reps) AS BIGINT) AS repeat_pairs,
       CAST(sum(pairs) AS BIGINT) AS total_pairs,
       CAST(sum(CASE WHEN reps > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_repeats,
       round(sum(reps) / sum(pairs), 6) AS repeat_rate
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["doc_repeat_word_runs"] = q_doc_repeat_word_runs
ORACLES["doc_repeat_word_runs"] = ORACLE_DOC_REPEAT_WORD_RUNS


def q_balance_percentile_of_spenders(spark, sf_dir):
    """Do big spenders hold big balances? The top-100 spenders' (exact
    cents, tiebreak custkey) account-balance percentile within the
    whole customer population — a rank join over two digests."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sp")
    )
    top = (
        spend.orderBy(F.col("sp").desc(), F.col("o_custkey").asc())
        .limit(100)
        .select("o_custkey")
    )
    w = Window.orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_custkey",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    pct = (
        top.join(ranked, top.o_custkey == ranked.c_custkey)
        .select((F.col("rk") / F.col("n")).alias("p"))
    )
    return pct.agg(
        F.count(F.lit(1)).cast("long").alias("spenders"),
        F.round(F.avg("p"), 6).alias("avg_balance_pctile"),
        F.round(F.min("p"), 6).alias("min_balance_pctile"),
    )


ORACLE_BALANCE_PERCENTILE_OF_SPENDERS = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sp
  FROM orders GROUP BY 1
),
top AS (
  SELECT o_custkey FROM spend ORDER BY sp DESC, o_custkey ASC LIMIT 100
),
ranked AS (
  SELECT c_custkey,
         row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rk,
         count(*) OVER () AS n
  FROM customer
)
SELECT CAST(count(*) AS BIGINT) AS spenders,
       round(avg(rk * 1.0 / n), 6) AS avg_balance_pctile,
       round(min(rk * 1.0 / n), 6) AS min_balance_pctile
FROM top JOIN ranked ON o_custkey = c_custkey
"""

QUERIES["balance_percentile_of_spenders"] = q_balance_percentile_of_spenders
ORACLES["balance_percentile_of_spenders"] = (
    ORACLE_BALANCE_PERCENTILE_OF_SPENDERS
)


# ------------------------------------------------------------- batch 4


def q_session_length_by_entry_type(spark, sf_dir):
    """Session depth by ENTRY event type (30-min gaps): does the first
    touch predict engagement? Exact counts; entry picked by the
    (ts, event_id) composite."""
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
    per = sess.groupBy("user_id", "sid").agg(
        F.min_by("event_type", key).alias("entry"),
        F.count(F.lit(1)).cast("long").alias("depth"),
    )
    return (
        per.groupBy("entry")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sessions"),
            F.sum("depth").alias("events"),
            F.round(F.sum("depth") / F.count(F.lit(1)), 6).alias("avg_depth"),
            F.max("depth").alias("max_depth"),
        )
        .orderBy("entry")
    )


ORACLE_SESSION_LENGTH_BY_ENTRY_TYPE = """
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
per AS (
  SELECT user_id, sid,
         first(event_type ORDER BY ts, event_id) AS entry,
         CAST(count(*) AS BIGINT) AS depth
  FROM sess GROUP BY 1, 2
)
SELECT entry, CAST(count(*) AS BIGINT) AS sessions,
       CAST(sum(depth) AS BIGINT) AS events,
       round(sum(depth) / count(*), 6) AS avg_depth,
       max(depth) AS max_depth
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["session_length_by_entry_type"] = q_session_length_by_entry_type
ORACLES["session_length_by_entry_type"] = ORACLE_SESSION_LENGTH_BY_ENTRY_TYPE


def q_purchase_conversion_lag(spark, sf_dir):
    """View→purchase conversion lag bands: per converting user, hours
    from first view to first purchase AFTER it (exact integer µs until
    the band cut)."""
    e = load_table(spark, sf_dir, "events")
    fv = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("first_view")
    )
    fp = e.filter(F.col("event_type") == "purchase").join(
        F.broadcast(fv), "user_id"
    ).filter(F.col("ts") >= F.col("first_view")).groupBy("user_id").agg(
        F.min("ts").alias("first_purchase"),
        F.min("first_view").alias("first_view"),
    )
    hours = F.floor(
        (F.unix_micros("first_purchase") - F.unix_micros("first_view"))
        / 3_600_000_000
    )
    band = (
        F.when(hours < 1, "<1h")
        .when(hours < 24, "1-24h")
        .when(hours < 168, "1-7d")
        .otherwise("7d+")
    )
    return (
        fp.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("band")
    )


ORACLE_PURCHASE_CONVERSION_LAG = """
WITH fv AS (
  SELECT user_id, min(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.ts) AS first_purchase, min(fv.first_view)
         AS first_view
  FROM events e JOIN fv USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
  GROUP BY 1
)
SELECT CASE
         WHEN floor((epoch_us(first_purchase) - epoch_us(first_view))
                    / 3600000000) < 1 THEN '<1h'
         WHEN floor((epoch_us(first_purchase) - epoch_us(first_view))
                    / 3600000000) < 24 THEN '1-24h'
         WHEN floor((epoch_us(first_purchase) - epoch_us(first_view))
                    / 3600000000) < 168 THEN '1-7d'
         ELSE '7d+' END AS band,
       CAST(count(*) AS BIGINT) AS users
FROM fp GROUP BY 1 ORDER BY 1
"""

QUERIES["purchase_conversion_lag"] = q_purchase_conversion_lag
ORACLES["purchase_conversion_lag"] = ORACLE_PURCHASE_CONVERSION_LAG


def q_type_run_length_profile(spark, sf_dir):
    """Consecutive same-type run lengths per stream (gaps-and-islands
    on the type-change flag within each user's sequence): repetitive
    interaction bursts vs alternating behavior."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        e.withColumn(
            "chg",
            (F.lag("event_type").over(w).isNull()
             | (F.lag("event_type").over(w) != F.col("event_type"))
             ).cast("int"),
        )
        .withColumn("rid", F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "rid", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("runs"),
            F.max("run_len").alias("max_run"),
            F.round(F.sum("run_len") / F.count(F.lit(1)), 6).alias("avg_run"),
        )
        .orderBy("event_type")
    )


ORACLE_TYPE_RUN_LENGTH_PROFILE = """
WITH marked AS (
  SELECT user_id, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
              OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg,
         ts, event_id
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rid
  FROM marked
),
per AS (
  SELECT user_id, rid, event_type, CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY 1, 2, 3
)
SELECT event_type, CAST(count(*) AS BIGINT) AS runs,
       max(run_len) AS max_run,
       round(sum(run_len) / count(*), 6) AS avg_run
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["type_run_length_profile"] = q_type_run_length_profile
ORACLES["type_run_length_profile"] = ORACLE_TYPE_RUN_LENGTH_PROFILE


def q_order_value_zscore_by_segment(spark, sf_dir):
    """Outlier orders per market segment: |z| > 3 on order value with
    mean/variance from EXPLICIT power sums over exact whole DOLLARS
    (population convention) — the fraud-screen shape. Dollars, not
    cents: the Σv² power sum must stay inside int64 (cents² × rows
    overflows at sf0.1), and whole-dollar values keep every moment
    integer-exact on both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    dollars = F.round(F.col("o_totalprice")).cast("long")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", dollars.alias("v")
    )
    w = Window.partitionBy("c_mktsegment")
    scored = (
        j.withColumn("mean_v", F.sum("v").over(w) / F.count("v").over(w))
        .withColumn(
            "var_v",
            F.sum(F.col("v") * F.col("v")).over(w) / F.count("v").over(w)
            - F.col("mean_v") * F.col("mean_v"),
        )
        .withColumn("z", (F.col("v") - F.col("mean_v")) / F.sqrt("var_v"))
    )
    return (
        scored.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.sum((F.abs("z") > 3).cast("long")).alias("outliers"),
            F.round(F.max("z"), 6).alias("max_z"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_ORDER_VALUE_ZSCORE_BY_SEGMENT = """
WITH j AS (
  SELECT c_mktsegment, CAST(round(o_totalprice) AS BIGINT) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
),
scored AS (
  SELECT c_mktsegment, v,
         sum(v) OVER w / count(v) OVER w AS mean_v,
         sum(v * v) OVER w / count(v) OVER w
           - (sum(v) OVER w / count(v) OVER w)
             * (sum(v) OVER w / count(v) OVER w) AS var_v
  FROM j WINDOW w AS (PARTITION BY c_mktsegment)
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS orders,
       CAST(sum(CASE WHEN abs((v - mean_v) / sqrt(var_v)) > 3
                THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
       round(max((v - mean_v) / sqrt(var_v)), 6) AS max_z
FROM scored GROUP BY 1 ORDER BY 1
"""

QUERIES["order_value_zscore_by_segment"] = q_order_value_zscore_by_segment
ORACLES["order_value_zscore_by_segment"] = ORACLE_ORDER_VALUE_ZSCORE_BY_SEGMENT


def q_regional_quarter_share_shift(spark, sf_dir):
    """Region revenue share per quarter plus the quarter-over-quarter
    share delta — the market-shift monitor (exact cents, shares from
    one window, delta from one lag)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dim = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    ).select("c_custkey", "r_name")
    per = (
        o.join(F.broadcast(dim), o.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("q"),
            "r_name",
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .alias("cents"))
    )
    wq = Window.partitionBy("q")
    wr = Window.partitionBy("r_name").orderBy("q")
    return (
        per.withColumn("share", F.col("cents") / F.sum("cents").over(wq))
        .withColumn(
            "share_delta",
            F.round(F.col("share") - F.lag("share").over(wr), 6),
        )
        .select("q", "r_name", F.round("share", 6).alias("share"),
                "share_delta")
        .orderBy("q", "r_name")
    )


ORACLE_REGIONAL_QUARTER_SHARE_SHIFT = """
WITH per AS (
  SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q, r_name,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
),
shares AS (
  SELECT q, r_name, cents / sum(cents) OVER (PARTITION BY q) AS share
  FROM per
)
SELECT q, r_name, round(share, 6) AS share,
       round(share - lag(share) OVER (PARTITION BY r_name ORDER BY q), 6)
         AS share_delta
FROM shares ORDER BY q, r_name
"""

QUERIES["regional_quarter_share_shift"] = q_regional_quarter_share_shift
ORACLES["regional_quarter_share_shift"] = ORACLE_REGIONAL_QUARTER_SHARE_SHIFT


def q_priority_escalation_matrix(spark, sf_dir):
    """First-order vs last-order priority transition for repeat
    customers (priorities order lexically '1-URGENT' < '5-LOW', so the
    string pick is deterministic): do accounts escalate?"""
    o = load_table(spark, sf_dir, "orders")
    key = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    per = o.groupBy("o_custkey").agg(
        F.min_by("o_orderpriority", key).alias("first_p"),
        F.max_by("o_orderpriority", key).alias("last_p"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).filter(F.col("n") >= 2)
    return (
        per.groupBy("first_p", "last_p")
        .agg(F.count(F.lit(1)).cast("long").alias("customers"))
        .orderBy("first_p", "last_p")
    )


ORACLE_PRIORITY_ESCALATION_MATRIX = """
WITH per AS (
  SELECT o_custkey,
         first(o_orderpriority ORDER BY o_orderdate, o_orderkey) AS first_p,
         last(o_orderpriority ORDER BY o_orderdate, o_orderkey) AS last_p,
         count(*) AS n
  FROM orders GROUP BY 1 HAVING count(*) >= 2
)
SELECT first_p, last_p, CAST(count(*) AS BIGINT) AS customers
FROM per GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["priority_escalation_matrix"] = q_priority_escalation_matrix
ORACLES["priority_escalation_matrix"] = ORACLE_PRIORITY_ESCALATION_MATRIX


def q_supplier_customer_reuse(spark, sf_dir):
    """Repeat-business census: (supplier, customer) pairs by number of
    DISTINCT orders — relationship stickiness; the pair rollup runs on
    a 3-column projection of the fact join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.select("l_suppkey", "l_orderkey")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .select("l_suppkey", "o_custkey", "l_orderkey")
        .distinct()
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("orders"))
    )
    return (
        pairs.groupBy("orders")
        .agg(F.count(F.lit(1)).cast("long").alias("pairs"))
        .orderBy("orders")
    )


ORACLE_SUPPLIER_CUSTOMER_REUSE = """
WITH pairs AS (
  SELECT l_suppkey, o_custkey,
         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS orders
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)
SELECT orders, CAST(count(*) AS BIGINT) AS pairs
FROM pairs GROUP BY 1 ORDER BY 1
"""

QUERIES["supplier_customer_reuse"] = q_supplier_customer_reuse
ORACLES["supplier_customer_reuse"] = ORACLE_SUPPLIER_CUSTOMER_REUSE


def q_lang_top_words_overlap(spark, sf_dir):
    """Cross-language contamination screen: overlap count of each
    language pair's top-20 words (exact df ranks, tiebreak word asc) —
    high overlap between 'different' languages marks mislabeled docs.
    The pair join runs on the 20-per-lang rank-cut vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("w").asc())
    top = wc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 20
    ).select("lang", "w")
    a = top.select(F.col("lang").alias("la"), "w")
    b_ = top.select(F.col("lang").alias("lb"), "w")
    return (
        a.join(b_, "w")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_top20"))
        .orderBy("la", "lb")
    )


ORACLE_LANG_TOP_WORDS_OVERLAP = r"""
WITH wc AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS n
  FROM documents,
       unnest(regexp_split_to_array(trim(text), '\s+')) AS t(w)
  GROUP BY 1, 2
),
top AS (
  SELECT lang, w,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, w ASC) AS rk
  FROM wc
)
SELECT a.lang AS la, b.lang AS lb, CAST(count(*) AS BIGINT) AS shared_top20
FROM top a JOIN top b ON a.w = b.w AND a.lang < b.lang
WHERE a.rk <= 20 AND b.rk <= 20
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["lang_top_words_overlap"] = q_lang_top_words_overlap
ORACLES["lang_top_words_overlap"] = ORACLE_LANG_TOP_WORDS_OVERLAP


def q_type_token_ratio_bands(spark, sf_dir):
    """Type-token ratio (distinct words / words) per doc, banded per
    source — the lexical-diversity screen; per-doc distinct counts are
    row-local (array_distinct on the token array, no shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    band = (
        F.when(ttr < 0.5, "low-<0.5")
        .when(ttr < 0.8, "mid-0.5-0.8")
        .otherwise("high-0.8+")
    )
    return (
        d.filter(F.size(toks) >= 1)
        .groupBy("source", band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("docs"))
        .orderBy("source", "band")
    )


ORACLE_TYPE_TOKEN_RATIO_BANDS = r"""
WITH per AS (
  SELECT source,
         len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
           * 1.0
           / len(regexp_split_to_array(trim(text), '\s+')) AS ttr
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 1
)
SELECT source,
       CASE WHEN ttr < 0.5 THEN 'low-<0.5'
            WHEN ttr < 0.8 THEN 'mid-0.5-0.8'
            ELSE 'high-0.8+' END AS band,
       CAST(count(*) AS BIGINT) AS docs
FROM per GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["type_token_ratio_bands"] = q_type_token_ratio_bands
ORACLES["type_token_ratio_bands"] = ORACLE_TYPE_TOKEN_RATIO_BANDS


def q_emb_quadrant_occupancy(spark, sf_dir):
    """Sign-quadrant occupancy of the first two dimensions per label —
    the cheapest geometry read on the label manifold (pure map-side
    projection before one rollup)."""
    e = load_table(spark, sf_dir, "embeddings")
    quad = F.concat(
        F.when(F.element_at("embedding", 1) >= 0, F.lit("+")).otherwise(F.lit("-")),
        F.when(F.element_at("embedding", 2) >= 0, F.lit("+")).otherwise(F.lit("-")),
    )
    return (
        e.groupBy("label", quad.alias("quadrant"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("label", "quadrant")
    )


ORACLE_EMB_QUADRANT_OCCUPANCY = """
SELECT label,
       concat(CASE WHEN embedding[1] >= 0 THEN '+' ELSE '-' END,
              CASE WHEN embedding[2] >= 0 THEN '+' ELSE '-' END) AS quadrant,
       CAST(count(*) AS BIGINT) AS n
FROM embeddings GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["emb_quadrant_occupancy"] = q_emb_quadrant_occupancy
ORACLES["emb_quadrant_occupancy"] = ORACLE_EMB_QUADRANT_OCCUPANCY


def q_emb_dim_mean_shift_halves(spark, sf_dir):
    """Per-dimension mean shift between the vec_id halves of the
    collection (first 8 dims) — the ingestion-order drift screen;
    (half, dim) partial sums, vectors never shuffle whole."""
    e = load_table(spark, sf_dir, "embeddings")
    mid = e.agg(
        F.percentile(F.col("vec_id").cast("double"), F.lit(0.5)).alias("m")
    )
    flat = (
        e.crossJoin(F.broadcast(mid))
        .select(
            (F.col("vec_id") <= F.col("m")).alias("first_half"),
            F.posexplode("embedding").alias("dim", "x"),
        )
        .filter(F.col("dim") < 8)
    )
    per = flat.groupBy("dim", "first_half").agg(
        (F.sum(F.col("x").cast("double")) / F.count(F.lit(1))).alias("mu")
    )
    a = per.filter(F.col("first_half")).select("dim", F.col("mu").alias("mu_a"))
    b_ = per.filter(~F.col("first_half")).select("dim", F.col("mu").alias("mu_b"))
    return (
        a.join(b_, "dim")
        .select("dim", F.round(F.col("mu_b") - F.col("mu_a"), 6).alias("shift"))
        .orderBy("dim")
    )


ORACLE_EMB_DIM_MEAN_SHIFT_HALVES = """
WITH mid AS (
  SELECT quantile_cont(CAST(vec_id AS DOUBLE), 0.5) AS m FROM embeddings
),
flat AS (
  SELECT vec_id <= m AS first_half, i AS dim,
         CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings, mid, unnest(range(len(embedding))) AS u(i)
  WHERE i < 8
),
per AS (
  SELECT dim, first_half, sum(x) / count(*) AS mu
  FROM flat GROUP BY 1, 2
)
SELECT a.dim, round(b.mu - a.mu, 6) AS shift
FROM per a JOIN per b ON a.dim = b.dim
WHERE a.first_half AND NOT b.first_half
ORDER BY a.dim
"""

QUERIES["emb_dim_mean_shift_halves"] = q_emb_dim_mean_shift_halves
ORACLES["emb_dim_mean_shift_halves"] = ORACLE_EMB_DIM_MEAN_SHIFT_HALVES


def q_discovery_value_suggestions(spark, sf_dir):
    """DRIVER gate for the field-discovery surface: suggest_values over
    an events-derived logs frame, scoped by a chosen predicate —
    exactly what the builder's 'what can I add next' call runs — vs the
    oracle's direct scoped distinct-count."""
    from .ir.discovery import suggest_values
    from .ir.model import _validate_pred

    e = load_table(spark, sf_dir, "events")
    df = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.create_map(
            F.lit("band"),
            F.when(F.col("value") >= 100, F.lit("hot")).otherwise(F.lit("cold")),
        ).alias("log_attributes"),
    )
    where = _validate_pred(
        {"field": "service_name", "op": "eq", "value": "purchase"})
    return (
        suggest_values(df, "band", where=where, limit=10)
        .select("value", "n")
        .orderBy(F.col("n").desc(), F.col("value").asc())
    )


ORACLE_DISCOVERY_VALUE_SUGGESTIONS = """
SELECT CASE WHEN value >= 100 THEN 'hot' ELSE 'cold' END AS value,
       CAST(count(*) AS BIGINT) AS n
FROM events WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY n DESC, value ASC
"""

QUERIES["discovery_value_suggestions"] = q_discovery_value_suggestions
ORACLES["discovery_value_suggestions"] = ORACLE_DISCOVERY_VALUE_SUGGESTIONS


_R13_CACHE: dict = {}


def q_manifest_lineage_census(spark, sf_dir):
    """DRIVER gate for idempotent lineage accounting: commit the events
    corpus as K=4 batches with every batch REPLAYED once (different
    file lists on the replay — the crashed-retry shape), then read the
    final table: rows must count exactly once and the lineage must hold
    exactly K entries; the oracle is the whole-corpus rollup plus the
    closed-form K."""
    import tempfile as _tempfile

    from .storage.manifest import ManifestTable, write_batch_manifest

    key = ("lineage", sf_dir)
    if key not in _R13_CACHE:
        table = _tempfile.mkdtemp(prefix="sdb-r13-lineage-")
        e = load_table(spark, sf_dir, "events").withColumn(
            "date_day", F.date_format("ts", "yyyy-MM-dd")
        ).withColumn("hour", F.lit(0))
        for k in range(4):
            part = e.filter(F.col("event_id") % 4 == k)
            write_batch_manifest(
                part, table, "events_r13l", batch_id=f"b{k}",
                partition_cols=("date_day", "hour"), stats_cols=("ts",),
            )
            # replay with a DIFFERENT parallelism (file list differs):
            # the lineage guard must refuse the duplicate
            write_batch_manifest(
                part.repartition(2), table, "events_r13l", batch_id=f"b{k}",
                partition_cols=("date_day", "hour"), stats_cols=("ts",),
            )
        _R13_CACHE[key] = table
    mt = ManifestTable(_R13_CACHE[key])
    df = mt.read(spark)
    lineage_n = len(mt.load_manifest()["batches"])
    return (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("lineage_batches", F.lit(lineage_n).cast("long"))
        .orderBy("event_type")
    )


ORACLE_MANIFEST_LINEAGE_CENSUS = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(4 AS BIGINT) AS lineage_batches
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["manifest_lineage_census"] = q_manifest_lineage_census
ORACLES["manifest_lineage_census"] = ORACLE_MANIFEST_LINEAGE_CENSUS


# ------------------------------------------------------------- batch 5


def q_monthly_aov_trend(spark, sf_dir):
    """Average order value per month with a 3-month centered moving
    average — exact cents to the last division, the MA over the
    ~84-row monthly rollup."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.orderBy("month").rowsBetween(-1, 1)
    return (
        monthly.withColumn("aov", F.col("cents") / F.col("n") / 100.0)
        .withColumn("aov_ma3", F.round(F.avg("aov").over(w), 6))
        .select("month", F.round("aov", 6).alias("aov"), "aov_ma3")
        .orderBy("month")
    )


ORACLE_MONTHLY_AOV_TREND = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
aov AS (SELECT month, cents / n / 100.0 AS aov FROM monthly)
SELECT month, round(aov, 6) AS aov,
       round(avg(aov) OVER (ORDER BY month
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6) AS aov_ma3
FROM aov ORDER BY month
"""

QUERIES["monthly_aov_trend"] = q_monthly_aov_trend
ORACLES["monthly_aov_trend"] = ORACLE_MONTHLY_AOV_TREND


def q_status_mix_by_year(spark, sf_dir):
    """Order-status mix per year (exact counts + shares): the
    fulfillment-state ledger over time."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"), "o_orderstatus"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("yr")
    return (
        per.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .select("yr", "o_orderstatus", "n", "share")
        .orderBy("yr", "o_orderstatus")
    )


ORACLE_STATUS_MIX_BY_YEAR = """
WITH per AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
)
SELECT yr, o_orderstatus, n,
       round(n / sum(n) OVER (PARTITION BY yr), 6) AS share
FROM per ORDER BY yr, o_orderstatus
"""

QUERIES["status_mix_by_year"] = q_status_mix_by_year
ORACLES["status_mix_by_year"] = ORACLE_STATUS_MIX_BY_YEAR


def q_size_quantity_correlation(spark, sf_dir):
    """Does part size predict order quantity? Pearson r from explicit
    raw moments over the (size, quantity) pairs — part broadcast into
    the lineitem scan, integers exact until the closed form."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_size").cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # closed form in DOUBLES built from the exact integer moments —
    # n·Σxy and Σx·Σy overflow int64 at corpus scale, and identical
    # double arithmetic from identical exact ints is engine-portable
    d = {c: F.col(c).cast("double") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
    num = d["n"] * d["sxy"] - d["sx"] * d["sy"]
    den = F.sqrt(
        (d["n"] * d["sxx"] - d["sx"] * d["sx"])
        * (d["n"] * d["syy"] - d["sy"] * d["sy"])
    )
    return m.select("n", F.round(num / den, 6).alias("pearson_r"))


ORACLE_SIZE_QUANTITY_CORRELATION = """
WITH j AS (
  SELECT CAST(p_size AS BIGINT) AS x, CAST(l_quantity AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM j
)
SELECT n, round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS pearson_r
FROM m
"""

QUERIES["size_quantity_correlation"] = q_size_quantity_correlation
ORACLES["size_quantity_correlation"] = ORACLE_SIZE_QUANTITY_CORRELATION


def q_first_value_cohort_ltv(spark, sf_dir):
    """Lifetime value by FIRST-order-value cohort: does a big first
    basket predict a big account? Deterministic first pick, exact-cents
    LTV sums."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    key = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    per = o.select("o_custkey", cents.alias("c"), key.alias("k")).groupBy(
        "o_custkey"
    ).agg(
        F.min_by("c", F.col("k")).alias("first_c"),
        F.sum("c").alias("ltv_c"),
        F.count(F.lit(1)).cast("long").alias("orders"),
    )
    band = (
        F.when(F.col("first_c") < 5_000_000, "low")
        .when(F.col("first_c") < 20_000_000, "mid")
        .otherwise("high")
    )
    return (
        per.groupBy(band.alias("first_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("customers"),
            F.round(F.sum("ltv_c") / F.count(F.lit(1)) / 100.0, 6)
            .alias("avg_ltv"),
            F.round(F.sum("orders") / F.count(F.lit(1)), 6)
            .alias("avg_orders"),
        )
        .orderBy("first_band")
    )


ORACLE_FIRST_VALUE_COHORT_LTV = """
WITH per AS (
  SELECT o_custkey,
         first(CAST(round(o_totalprice * 100) AS BIGINT)
               ORDER BY o_orderdate, o_orderkey) AS first_c,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS ltv_c,
         CAST(count(*) AS BIGINT) AS orders
  FROM orders GROUP BY 1
)
SELECT CASE WHEN first_c < 5000000 THEN 'low'
            WHEN first_c < 20000000 THEN 'mid' ELSE 'high' END AS first_band,
       CAST(count(*) AS BIGINT) AS customers,
       round(sum(ltv_c) / count(*) / 100.0, 6) AS avg_ltv,
       round(sum(orders) / count(*), 6) AS avg_orders
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["first_value_cohort_ltv"] = q_first_value_cohort_ltv
ORACLES["first_value_cohort_ltv"] = ORACLE_FIRST_VALUE_COHORT_LTV


def q_multi_supplier_order_share(spark, sf_dir):
    """Orders whose lines span 2+ suppliers, per priority — the
    split-shipment complexity share; distinct-supplier counts per
    order, then one rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    per = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("nsupp")
    )
    j = o.join(per, o.o_orderkey == per.l_orderkey)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.sum((F.col("nsupp") >= 2).cast("long")).alias("multi_supplier"),
        )
        .withColumn(
            "share", F.round(F.col("multi_supplier") / F.col("orders"), 6)
        )
        .orderBy("o_orderpriority")
    )


ORACLE_MULTI_SUPPLIER_ORDER_SHARE = """
WITH per AS (
  SELECT l_orderkey, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nsupp
  FROM lineitem GROUP BY 1
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS orders,
       CAST(sum(CASE WHEN nsupp >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS multi_supplier,
       round(sum(CASE WHEN nsupp >= 2 THEN 1 ELSE 0 END) / count(*), 6)
         AS share
FROM orders JOIN per ON o_orderkey = l_orderkey
GROUP BY 1 ORDER BY 1
"""

QUERIES["multi_supplier_order_share"] = q_multi_supplier_order_share
ORACLES["multi_supplier_order_share"] = ORACLE_MULTI_SUPPLIER_ORDER_SHARE


def q_daily_new_user_share(spark, sf_dir):
    """Share of each day's events from users FIRST SEEN that day (the
    first-seen trick): acquisition-vs-retention load split, daily."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    j = e.join(F.broadcast(first), "user_id")
    return (
        j.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("events"),
            F.sum((F.to_date("ts") == F.col("d0")).cast("long"))
            .alias("new_user_events"),
        )
        .withColumn(
            "new_share",
            F.round(F.col("new_user_events") / F.col("events"), 6),
        )
        .orderBy("day")
    )


ORACLE_DAILY_NEW_USER_SHARE = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
)
SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS events,
       CAST(sum(CASE WHEN CAST(ts AS DATE) = d0 THEN 1 ELSE 0 END)
            AS BIGINT) AS new_user_events,
       round(sum(CASE WHEN CAST(ts AS DATE) = d0 THEN 1 ELSE 0 END)
             / count(*), 6) AS new_share
FROM events JOIN first USING (user_id)
GROUP BY 1 ORDER BY 1
"""

QUERIES["daily_new_user_share"] = q_daily_new_user_share
ORACLES["daily_new_user_share"] = ORACLE_DAILY_NEW_USER_SHARE


def q_type_percentile_ladder(spark, sf_dir):
    """p25/p50/p75/p95 value ladder per stream by exact integer-rank
    selection — the full calibration card in one ranked pass."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    scored = e.select("event_type", cents.alias("c"), "event_id")
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    ranked = scored.withColumn("rk", F.row_number().over(w))
    per = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    j = ranked.join(F.broadcast(per), "event_type")
    out = None
    for q, name in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")):
        sel = j.filter(
            F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * q))
        ).select("event_type", F.col("c").alias(name))
        out = sel if out is None else out.join(sel, "event_type")
    return out.orderBy("event_type")


ORACLE_TYPE_PERCENTILE_LADDER = """
WITH scored AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, event_id
  FROM events
),
ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM scored
)
SELECT event_type,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
           THEN c END) AS p25,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
           THEN c END) AS p50,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.75) AS BIGINT))
           THEN c END) AS p75,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.95) AS BIGINT))
           THEN c END) AS p95
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["type_percentile_ladder"] = q_type_percentile_ladder
ORACLES["type_percentile_ladder"] = ORACLE_TYPE_PERCENTILE_LADDER


def q_error_rate_by_hourofday(spark, sf_dir):
    """Error share by wall-clock hour — does the error rate follow
    load or fight it? One conditional agg over the hour rollup."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.hour("ts").cast("int").alias("hod"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("events"),
            F.sum((F.col("event_type") == "error").cast("long"))
            .alias("errors"),
        )
        .withColumn(
            "error_rate", F.round(F.col("errors") / F.col("events"), 6)
        )
        .orderBy("hod")
    )


ORACLE_ERROR_RATE_BY_HOUROFDAY = """
SELECT CAST(hour(ts) AS INT) AS hod, CAST(count(*) AS BIGINT) AS events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS errors,
       round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             / count(*), 6) AS error_rate
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["error_rate_by_hourofday"] = q_error_rate_by_hourofday
ORACLES["error_rate_by_hourofday"] = ORACLE_ERROR_RATE_BY_HOUROFDAY


def q_exact_dup_pair_count(spark, sf_dir):
    """Exact-duplicate PAIR counts per lang from md5 groups — C(n,2)
    per digest group summed, the pair-count complement of the dup-rate
    gates (pairs counted, never materialized)."""
    d = load_table(spark, sf_dir, "documents")
    groups = d.groupBy("lang", F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        groups.groupBy("lang")
        .agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long")
            .alias("dup_pairs"),
            F.sum((F.col("n") >= 2).cast("long")).alias("dup_groups"),
        )
        .orderBy("lang")
    )


ORACLE_EXACT_DUP_PAIR_COUNT = """
WITH groups AS (
  SELECT lang, md5(text) AS h, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
)
SELECT lang, CAST(sum(n * (n - 1) / 2) AS BIGINT) AS dup_pairs,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups
FROM groups GROUP BY 1 ORDER BY 1
"""

QUERIES["exact_dup_pair_count"] = q_exact_dup_pair_count
ORACLES["exact_dup_pair_count"] = ORACLE_EXACT_DUP_PAIR_COUNT


def q_top_trigram_by_source(spark, sf_dir):
    """The modal word-trigram per source (deterministic pick by count
    desc, trigram asc) — the template-detection headline; trigrams
    built with the O(words) zip_with walk and kept as 3 columns."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    tris = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 2),
        F.zip_with(
            F.slice(toks, 2, F.size(toks) - 2),
            F.slice(toks, 3, F.size(toks) - 2),
            lambda b, c: F.struct(b.alias("w2"), c.alias("w3")),
        ),
        lambda a, bc: F.struct(
            a.alias("w1"), bc["w2"].alias("w2"), bc["w3"].alias("w3")
        ),
    )
    per = (
        d.filter(F.size(toks) >= 3)
        .select("source", F.explode(tris).alias("t"))
        .groupBy("source", "t.w1", "t.w2", "t.w3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc(),
        F.col("w3").asc(),
    )
    return (
        per.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "source",
            F.concat_ws(" ", "w1", "w2", "w3").alias("top_trigram"),
            "n",
        )
        .orderBy("source")
    )


ORACLE_TOP_TRIGRAM_BY_SOURCE = r"""
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
),
tris AS (
  SELECT source, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
per AS (
  SELECT source, w1, w2, w3, CAST(count(*) AS BIGINT) AS n
  FROM tris GROUP BY 1, 2, 3, 4
),
r AS (
  SELECT source, w1, w2, w3, n,
         row_number() OVER (PARTITION BY source
             ORDER BY n DESC, w1 ASC, w2 ASC, w3 ASC) AS rk
  FROM per
)
SELECT source, concat_ws(' ', w1, w2, w3) AS top_trigram, n
FROM r WHERE rk = 1 ORDER BY source
"""

QUERIES["top_trigram_by_source"] = q_top_trigram_by_source
ORACLES["top_trigram_by_source"] = ORACLE_TOP_TRIGRAM_BY_SOURCE


def q_emb_norm_by_vecid_decile(spark, sf_dir):
    """Mean L2 norm over vec_id deciles — norm drift along ingestion
    order (the scale-calibration complement of the per-dim shift
    gate); deciles by exact integer ranks."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    ))
    scored = e.select("vec_id", norm.alias("nrm"))
    w = Window.orderBy("vec_id")
    return (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vectors"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
        .orderBy("decile")
    )


ORACLE_EMB_NORM_BY_VECID_DECILE = """
WITH scored AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
cut AS (
  SELECT ntile(10) OVER (ORDER BY vec_id) AS decile, nrm FROM scored
)
SELECT decile, CAST(count(*) AS BIGINT) AS vectors,
       round(avg(nrm), 6) AS avg_norm
FROM cut GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_norm_by_vecid_decile"] = q_emb_norm_by_vecid_decile
ORACLES["emb_norm_by_vecid_decile"] = ORACLE_EMB_NORM_BY_VECID_DECILE


def q_emb_centroid_global_cosine(spark, sf_dir):
    """Per-label centroid cosine vs the GLOBAL centroid — how far each
    label sits off the collection's mean direction; centroids from
    (label, dim) partial sums, the 10×64 table joined to the 64-row
    global one."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("dim", "x")
                    ).select("label", "dim", F.col("x").cast("double").alias("x"))
    cl = flat.groupBy("label", "dim").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("c")
    )
    cg = flat.groupBy("dim").agg(
        (F.sum("x") / F.count(F.lit(1))).alias("g")
    )
    j = cl.join(F.broadcast(cg), "dim")
    return (
        j.groupBy("label")
        .agg(
            F.round(
                F.sum(F.col("c") * F.col("g"))
                / (F.sqrt(F.sum(F.col("c") * F.col("c")))
                   * F.sqrt(F.sum(F.col("g") * F.col("g")))), 6
            ).alias("cosine_to_global")
        )
        .orderBy("label")
    )


ORACLE_EMB_CENTROID_GLOBAL_COSINE = """
WITH flat AS (
  SELECT label, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
),
cl AS (SELECT label, dim, sum(x) / count(*) AS c FROM flat GROUP BY 1, 2),
cg AS (SELECT dim, sum(x) / count(*) AS g FROM flat GROUP BY 1)
SELECT label,
       round(sum(c * g) / (sqrt(sum(c * c)) * sqrt(sum(g * g))), 6)
         AS cosine_to_global
FROM cl JOIN cg USING (dim) GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_centroid_global_cosine"] = q_emb_centroid_global_cosine
ORACLES["emb_centroid_global_cosine"] = ORACLE_EMB_CENTROID_GLOBAL_COSINE


def q_ir_metrics_min_over_time(spark, sf_dir):
    """IR gauge min_over_time daily — the floor tracker through the
    metric sub-model's range vector (exact value picks)."""
    from .bench_round12 import _hourly, _ir_metrics

    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "min_over_time",
        "window_seconds": 86400, "agg": "min", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_MIN_OVER_TIME = """
WITH hourly AS (
  SELECT event_type AS service_name, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT CAST(floor(epoch(h) / 86400) * 86400 AS BIGINT) AS bucket,
       service_name,
       round(CAST(min(cents) AS DOUBLE) / 100.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_min_over_time"] = q_ir_metrics_min_over_time
ORACLES["ir_metrics_min_over_time"] = ORACLE_IR_METRICS_MIN_OVER_TIME


def q_ir_metrics_last_over_time(spark, sf_dir):
    """IR gauge last_over_time daily — the range-vector LAST (exact
    sample pick by timestamp), distinct from the instant `last` path
    in the lowering."""
    from .bench_round12 import _hourly, _ir_metrics

    g = _hourly(spark, sf_dir).select(
        "timestamp", "service_name",
        F.lit("events_cents").alias("metric_name"),
        F.col("cents").cast("double").alias("value"),
    )
    out = _ir_metrics(g, {
        "name": "events_cents", "type": "gauge", "fn": "last_over_time",
        "window_seconds": 86400, "agg": "max", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_LAST_OVER_TIME = """
WITH hourly AS (
  SELECT event_type AS service_name, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT CAST(floor(epoch(h) / 86400) * 86400 AS BIGINT) AS bucket,
       service_name,
       round(max_by(CAST(cents AS DOUBLE), h) / 100.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_last_over_time"] = q_ir_metrics_last_over_time
ORACLES["ir_metrics_last_over_time"] = ORACLE_IR_METRICS_LAST_OVER_TIME


def q_typed_attr_between_predicate(spark, sf_dir):
    """IR BETWEEN over the typed int home (the range form of the typed
    numeric view): 4xx codes only, residue rows excluded by NULL
    semantics, never by a cast error."""
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
        "where": {"field": "http.response.status_code", "op": "between",
                  "value": 400, "upper": 499},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(v2, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_TYPED_ATTR_BETWEEN_PREDICATE = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type <> 'error' AND value >= 20 AND value < 100
GROUP BY 1 ORDER BY 1
"""

QUERIES["typed_attr_between_predicate"] = q_typed_attr_between_predicate
ORACLES["typed_attr_between_predicate"] = ORACLE_TYPED_ATTR_BETWEEN_PREDICATE
