"""Round-15 staging battery: oracle-gated queries registered AFTER the
round-14 block. Same conventions as bench_queries (round(x, 6) floats,
BIGINT counts, explicit tiebreaks, aliases identical on both sides,
integer cents wherever exactness matters, every batch sf0.1-smoked for
ANSI overflow before commit).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F

from .catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------------------------- batch 1


def q_order_line_status_mix(spark, sf_dir):
    """Per-order line-status composition (all-F / all-O / mixed) by
    year — the fulfillment-state ledger at order grain."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per = li.groupBy("l_orderkey").agg(
        F.sum((F.col("l_linestatus") == "F").cast("long")).alias("f"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mix = (
        F.when(F.col("f") == F.col("n"), "all-F")
        .when(F.col("f") == 0, "all-O")
        .otherwise("mixed")
    )
    j = per.join(o, per.l_orderkey == o.o_orderkey)
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("yr"),
                  mix.alias("mix"))
        .agg(F.count(F.lit(1)).cast("long").alias("orders"))
        .orderBy("yr", "mix")
    )


ORACLE_ORDER_LINE_STATUS_MIX = """
WITH per AS (
  SELECT l_orderkey,
         CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS f,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
)
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CASE WHEN f = n THEN 'all-F' WHEN f = 0 THEN 'all-O'
            ELSE 'mixed' END AS mix,
       CAST(count(*) AS BIGINT) AS orders
FROM per JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["order_line_status_mix"] = q_order_line_status_mix
ORACLES["order_line_status_mix"] = ORACLE_ORDER_LINE_STATUS_MIX


def q_price_spread_within_order(spark, sf_dir):
    """Line-price spread inside multi-line orders (max−min extended
    price, exact cents), banded — order heterogeneity."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per = li.groupBy("l_orderkey").agg(
        (F.max(cents) - F.min(cents)).alias("spread"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).filter(F.col("n") >= 2)
    band = (
        F.when(F.col("spread") < 1_000_000, "<$10k")
        .when(F.col("spread") < 3_000_000, "$10-30k")
        .otherwise("$30k+")
    )
    return (
        per.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("orders"))
        .orderBy("band")
    )


ORACLE_PRICE_SPREAD_WITHIN_ORDER = """
WITH per AS (
  SELECT l_orderkey,
         max(CAST(round(l_extendedprice * 100) AS BIGINT))
         - min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS spread,
         count(*) AS n
  FROM lineitem GROUP BY 1 HAVING count(*) >= 2
)
SELECT CASE WHEN spread < 1000000 THEN '<$10k'
            WHEN spread < 3000000 THEN '$10-30k'
            ELSE '$30k+' END AS band,
       CAST(count(*) AS BIGINT) AS orders
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["price_spread_within_order"] = q_price_spread_within_order
ORACLES["price_spread_within_order"] = ORACLE_PRICE_SPREAD_WITHIN_ORDER


def q_quarter_streaks(spark, sf_dir):
    """Longest consecutive-quarter buying streak per customer,
    histogrammed — gaps-and-islands on the quarter INDEX (year*4 + q),
    never the calendar."""
    o = load_table(spark, sf_dir, "orders")
    cq = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1)
        .cast("long").alias("qi"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("qi")
    runs = (
        cq.withColumn("grp", F.col("qi") - F.row_number().over(w))
        .groupBy("o_custkey", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
        .groupBy("o_custkey")
        .agg(F.max("len").alias("best"))
    )
    return (
        runs.groupBy("best")
        .agg(F.count(F.lit(1)).cast("long").alias("customers"))
        .orderBy("best")
    )


ORACLE_QUARTER_STREAKS = """
WITH cq AS (
  SELECT DISTINCT o_custkey,
         CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS BIGINT)
           AS qi
  FROM orders
),
runs AS (
  SELECT o_custkey,
         qi - row_number() OVER (PARTITION BY o_custkey ORDER BY qi) AS grp
  FROM cq
),
per AS (
  SELECT o_custkey, max(len) AS best
  FROM (SELECT o_custkey, grp, CAST(count(*) AS BIGINT) AS len
        FROM runs GROUP BY 1, 2)
  GROUP BY 1
)
SELECT best, CAST(count(*) AS BIGINT) AS customers
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["quarter_streaks"] = q_quarter_streaks
ORACLES["quarter_streaks"] = ORACLE_QUARTER_STREAKS


def q_session_gap_percentiles(spark, sf_dir):
    """Inter-SESSION gap percentiles (end of one 30-min session to
    start of the next, exact integer-rank selection on µs) — the
    return-cadence clock at session grain."""
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
        F.min("ts").alias("start"), F.max("ts").alias("end")
    )
    ws = Window.partitionBy("user_id").orderBy("sid")
    gaps = (
        per.withColumn("prev_end", F.lag("end").over(ws))
        .filter(F.col("prev_end").isNotNull())
        .select(
            (F.unix_micros("start") - F.unix_micros("prev_end"))
            .alias("gap_us")
        )
    )
    wr = Window.orderBy("gap_us")
    ranked = gaps.withColumn("rk", F.row_number().over(wr))
    n = gaps.agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = ranked.crossJoin(F.broadcast(n))
    out = None
    for q, name in ((0.25, "p25_us"), (0.5, "p50_us"), (0.9, "p90_us")):
        sel = j.filter(
            F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * q))
        ).select(F.col("gap_us").alias(name))
        out = sel if out is None else out.crossJoin(sel)
    return out


ORACLE_SESSION_GAP_PERCENTILES = """
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
per AS (
  SELECT user_id, sid, min(ts) AS start, max(ts) AS send
  FROM sess GROUP BY 1, 2
),
gaps AS (
  SELECT epoch_us(start) - epoch_us(lag(send) OVER (
           PARTITION BY user_id ORDER BY sid)) AS gap_us
  FROM per
),
ranked AS (
  SELECT gap_us, row_number() OVER (ORDER BY gap_us) AS rk,
         count(*) OVER () AS n
  FROM gaps WHERE gap_us IS NOT NULL
)
SELECT max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
           THEN gap_us END) AS p25_us,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
           THEN gap_us END) AS p50_us,
       max(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.9) AS BIGINT))
           THEN gap_us END) AS p90_us
FROM ranked
"""

QUERIES["session_gap_percentiles"] = q_session_gap_percentiles
ORACLES["session_gap_percentiles"] = ORACLE_SESSION_GAP_PERCENTILES


def q_type_mix_by_tenure(spark, sf_dir):
    """Event-type mix by user tenure band (days since the user's first
    event at event time) — does behavior change as accounts age?"""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    j = e.join(F.broadcast(first), "user_id")
    tenure = F.datediff(F.to_date("ts"), F.col("d0"))
    band = (
        F.when(tenure == 0, "day-0")
        .when(tenure <= 7, "week-1")
        .otherwise("later")
    )
    per = j.groupBy(band.alias("tenure"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("tenure")
    return (
        per.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .orderBy("tenure", "event_type")
    )


ORACLE_TYPE_MIX_BY_TENURE = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
),
per AS (
  SELECT CASE WHEN datediff('day', d0, CAST(ts AS DATE)) = 0 THEN 'day-0'
              WHEN datediff('day', d0, CAST(ts AS DATE)) <= 7
                THEN 'week-1'
              ELSE 'later' END AS tenure,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events JOIN first USING (user_id)
  GROUP BY 1, 2
)
SELECT tenure, event_type, n,
       round(n / sum(n) OVER (PARTITION BY tenure), 6) AS share
FROM per ORDER BY tenure, event_type
"""

QUERIES["type_mix_by_tenure"] = q_type_mix_by_tenure
ORACLES["type_mix_by_tenure"] = ORACLE_TYPE_MIX_BY_TENURE


def q_daily_revenue_cv(spark, sf_dir):
    """Coefficient of variation of the DAILY value sum per stream
    (population convention, explicit power sums over exact cents on
    the 30-row daily rollup) — revenue predictability."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("days"),
            F.sum("c").alias("sc"),
            F.sum(F.col("c").cast("double") * F.col("c")).alias("scc"),
        )
        .select(
            "event_type", "days",
            F.round(
                F.sqrt(F.col("scc") / F.col("days")
                       - (F.col("sc").cast("double") / F.col("days"))
                       * (F.col("sc").cast("double") / F.col("days")))
                / (F.col("sc").cast("double") / F.col("days")), 6
            ).alias("daily_cv"),
        )
        .orderBy("event_type")
    )


ORACLE_DAILY_REVENUE_CV = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS days,
         CAST(sum(c) AS BIGINT) AS sc, sum(CAST(c AS DOUBLE) * c) AS scc
  FROM daily GROUP BY 1
)
SELECT event_type, days,
       round(sqrt(scc / days - (CAST(sc AS DOUBLE) / days)
                  * (CAST(sc AS DOUBLE) / days))
             / (CAST(sc AS DOUBLE) / days), 6) AS daily_cv
FROM m ORDER BY event_type
"""

QUERIES["daily_revenue_cv"] = q_daily_revenue_cv
ORACLES["daily_revenue_cv"] = ORACLE_DAILY_REVENUE_CV


def q_cross_source_prefix_overlap(spark, sf_dir):
    """Syndication screen: 48-char prefixes appearing in 2+ SOURCES —
    the cross-source complement of the per-source prefix dup gate;
    the prefix rollup is digest-sized, never documents."""
    d = load_table(spark, sf_dir, "documents")
    ps = d.select(
        "source", F.substring("text", 1, 48).alias("pfx")
    ).distinct()
    per = ps.groupBy("pfx").agg(
        F.countDistinct("source").cast("long").alias("nsrc")
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("prefixes"),
        F.sum((F.col("nsrc") >= 2).cast("long")).alias("shared_prefixes"),
        F.max("nsrc").alias("max_sources"),
    )


ORACLE_CROSS_SOURCE_PREFIX_OVERLAP = """
WITH ps AS (
  SELECT DISTINCT source, substring(text, 1, 48) AS pfx FROM documents
),
per AS (
  SELECT pfx, CAST(count(DISTINCT source) AS BIGINT) AS nsrc
  FROM ps GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS prefixes,
       CAST(sum(CASE WHEN nsrc >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS shared_prefixes,
       max(nsrc) AS max_sources
FROM per
"""

QUERIES["cross_source_prefix_overlap"] = q_cross_source_prefix_overlap
ORACLES["cross_source_prefix_overlap"] = ORACLE_CROSS_SOURCE_PREFIX_OVERLAP


def q_tail_token_census(spark, sf_dir):
    """Top-5 document-ENDING tokens per lang (deterministic rank) —
    the closing-formula detector that complements the boundary-vocab
    gate."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    per = d.select(
        "lang", F.element_at(toks, -1).alias("w")
    ).groupBy("lang", "w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("w").asc())
    return (
        per.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", F.col("rk").cast("long").alias("rk"), "w", "n")
        .orderBy("lang", "rk")
    )


ORACLE_TAIL_TOKEN_CENSUS = r"""
WITH per AS (
  SELECT lang, regexp_split_to_array(trim(text), '\s+')[-1] AS w,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
r AS (
  SELECT lang, w, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, w ASC) AS rk
  FROM per
)
SELECT lang, CAST(rk AS BIGINT) AS rk, w, n
FROM r WHERE rk <= 5 ORDER BY lang, rk
"""

QUERIES["tail_token_census"] = q_tail_token_census
ORACLES["tail_token_census"] = ORACLE_TAIL_TOKEN_CENSUS


def q_emb_dim_separability(spark, sf_dir):
    """Per-dimension between-label variance share (first 8 dims): the
    ANOVA-lite 'which dims carry the labels' read — label means from
    (label, dim) partial sums, total moments from the same explode."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).filter(F.col("dim") < 8).select(
        "label", "dim", F.col("x").cast("double").alias("x")
    )
    per_label = flat.groupBy("dim", "label").agg(
        F.sum("x").alias("sx"), F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = flat.groupBy("dim").agg(
        F.sum("x").alias("gsx"),
        F.sum(F.col("x") * F.col("x")).alias("gsxx"),
        F.count(F.lit(1)).cast("long").alias("gn"),
    )
    between = (
        per_label.join(F.broadcast(tot), "dim")
        .withColumn("gmu", F.col("gsx") / F.col("gn"))
        .withColumn(
            "term",
            F.col("n") * (F.col("sx") / F.col("n") - F.col("gmu"))
            * (F.col("sx") / F.col("n") - F.col("gmu")),
        )
        .groupBy("dim")
        .agg(F.sum("term").alias("ssb"), F.first("gsxx").alias("gsxx"),
             F.first("gsx").alias("gsx"), F.first("gn").alias("gn"))
    )
    sst = F.col("gsxx") - F.col("gsx") * F.col("gsx") / F.col("gn")
    return between.select(
        "dim", F.round(F.col("ssb") / sst, 6).alias("between_share")
    ).orderBy("dim")


ORACLE_EMB_DIM_SEPARABILITY = """
WITH flat AS (
  SELECT label, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
  WHERE i < 8
),
per_label AS (
  SELECT dim, label, sum(x) AS sx, CAST(count(*) AS BIGINT) AS n
  FROM flat GROUP BY 1, 2
),
tot AS (
  SELECT dim, sum(x) AS gsx, sum(x * x) AS gsxx,
         CAST(count(*) AS BIGINT) AS gn
  FROM flat GROUP BY 1
),
between_t AS (
  SELECT p.dim,
         sum(p.n * (p.sx / p.n - t.gsx / t.gn)
             * (p.sx / p.n - t.gsx / t.gn)) AS ssb,
         max(t.gsxx) AS gsxx, max(t.gsx) AS gsx, max(t.gn) AS gn
  FROM per_label p JOIN tot t USING (dim)
  GROUP BY 1
)
SELECT dim, round(ssb / (gsxx - gsx * gsx / gn), 6) AS between_share
FROM between_t ORDER BY dim
"""

QUERIES["emb_dim_separability"] = q_emb_dim_separability
ORACLES["emb_dim_separability"] = ORACLE_EMB_DIM_SEPARABILITY


def q_emb_anchor_cosine_profile(spark, sf_dir):
    """Cosine-to-anchor profile: every vector's cosine to the FIXED
    anchor (vec_id 0), mean per label — one broadcast anchor row, one
    row-local fold per vector, vectors never shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    anchor = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("a")
    )
    j = e.crossJoin(F.broadcast(anchor))
    dot = F.aggregate(
        F.zip_with("embedding", "a",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        c, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    cos = dot / (norm(F.col("embedding")) * norm(F.col("a")))
    return (
        j.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vectors"),
            F.round(F.avg(cos), 6).alias("mean_cos_to_anchor"),
        )
        .orderBy("label")
    )


ORACLE_EMB_ANCHOR_COSINE_PROFILE = """
WITH anchor AS (
  SELECT embedding AS a FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT label,
         list_sum(list_transform(range(len(embedding)),
           i -> CAST(embedding[i + 1] AS DOUBLE)
                * CAST(a[i + 1] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(a,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
  FROM embeddings, anchor
)
SELECT label, CAST(count(*) AS BIGINT) AS vectors,
       round(avg(cos), 6) AS mean_cos_to_anchor
FROM scored GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_anchor_cosine_profile"] = q_emb_anchor_cosine_profile
ORACLES["emb_anchor_cosine_profile"] = ORACLE_EMB_ANCHOR_COSINE_PROFILE


def q_ir_rank_topk_gate(spark, sf_dir):
    """The IR rank stage under the oracle: topk 20 over an aggregated
    frame — the planner's deterministic tiebreak contract (rank value
    desc, then every other column asc in schema order) replicated in
    SQL."""
    from .ir import lower, validate

    e = load_table(spark, sf_dir, "events")
    df = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.col("user_id").cast("long").alias("user_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    q = validate({
        "version": 1, "from": "events",
        "aggregate": {"op": "sum", "by": ["service_name", "user_id"],
                      "value_field": "cents"},
        "rank": {"kind": "topk", "k": 20, "value": "value"},
    })
    return lower(df, q).select(
        "service_name", "user_id", F.col("value").cast("long").alias("value")
    )


ORACLE_IR_RANK_TOPK_GATE = """
WITH agg AS (
  SELECT event_type AS service_name, user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value
  FROM events GROUP BY 1, 2
)
SELECT service_name, user_id, value
FROM agg ORDER BY value DESC, service_name ASC, user_id ASC
LIMIT 20
"""

QUERIES["ir_rank_topk_gate"] = q_ir_rank_topk_gate
ORACLES["ir_rank_topk_gate"] = ORACLE_IR_RANK_TOPK_GATE


def q_ir_metrics_sum_instant(spark, sf_dir):
    """Instant `last` on a SUM-type metric (the bare-counter read —
    /query's shape for counters): last cumulative sample per series per
    day through the metric sub-model's sum table path."""
    from .bench_round12 import _hourly, _ir_metrics

    c = (
        _hourly(spark, sf_dir)
        .withColumn("week", F.date_trunc("week", "timestamp"))
        .withColumn(
            "cum",
            F.sum("cents").over(
                Window.partitionBy("service_name", "week").orderBy("timestamp")
            ),
        )
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
        "name": "events_total", "type": "sum", "fn": "last",
        "step_seconds": 86400, "agg": "max", "by": ["service_name"],
    })
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_SUM_INSTANT = """
WITH hourly AS (
  SELECT event_type AS service_name, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT service_name, h,
         CAST(sum(cents) OVER (
           PARTITION BY service_name, date_trunc('week', h) ORDER BY h
         ) AS DOUBLE) AS cum_v
  FROM hourly
)
SELECT CAST(floor(epoch(h) / 86400) * 86400 AS BIGINT) AS bucket,
       service_name,
       round(max_by(cum_v, h) / 100.0, 6) AS value
FROM cum GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_sum_instant"] = q_ir_metrics_sum_instant
ORACLES["ir_metrics_sum_instant"] = ORACLE_IR_METRICS_SUM_INSTANT


# ---------------------------------------- batch 2: IR v1 deferral lifts
# (summary source + vector-matching binop — the proposal's last two
# deferred items, round-9 work; unit semantics in tests/test_ir_metrics)

DAY = 86400


def q_ir_metrics_summary_quantile(spark, sf_dir):
    """Summary metrics as an IR source: φ=0.5 read-back against stored
    quantile anchors, instant semantics (the LATEST datapoint per
    (day, series) — earlier anchors must not leak in). Anchors here are
    (0.25→hourly min, 0.75→hourly max), so the interpolated φ=0.5 is
    exactly their midpoint — single float ops over exact picks, no
    order-sensitive summation."""
    from .ir.metrics import lower_metrics
    from .ir.model import validate

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
    ).agg(
        F.min("value").alias("_lo"),
        F.max("value").alias("_hi"),
        F.count(F.lit(1)).cast("long").alias("count"),
        F.sum("value").alias("sum"),
    )
    atrest = hourly.select(
        "timestamp", "service_name",
        F.lit("ev_summary").alias("metric_name"),
        "count", "sum",
        F.array(
            F.struct(F.lit(0.25).alias("quantile"),
                     F.col("_lo").alias("value")),
            F.struct(F.lit(0.75).alias("quantile"),
                     F.col("_hi").alias("value")),
        ).alias("quantile_values"),
    )
    q = validate({
        "version": 1, "from": "metrics",
        "metric": {"name": "ev_summary", "type": "summary",
                   "fn": "quantile", "quantile": 0.5,
                   "step_seconds": DAY},
    })
    out = lower_metrics(atrest, q)
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value")
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_SUMMARY_QUANTILE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         event_type AS service_name,
         min(value) AS lo, max(value) AS hi
  FROM events GROUP BY 1, 2, 3
)
SELECT bucket, service_name,
       round((max_by(lo, h) + max_by(hi, h)) / 2.0, 6) AS value
FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["ir_metrics_summary_quantile"] = q_ir_metrics_summary_quantile
ORACLES["ir_metrics_summary_quantile"] = ORACLE_IR_METRICS_SUMMARY_QUANTILE


def q_ir_metrics_vector_binop(spark, sf_dir):
    """Vector-matching binop inside IR: hot-value share per (day,
    service) as `increase(ev_hot[1d]) / increase(ev_all[1d])` — two
    DELTA sum metrics in one table, default full-identity matching
    (raw series, service_name only), inner-join drop of unmatched
    series. Integer cents keep both engines' sums exact."""
    from .ir.metrics import lower_metrics
    from .ir.model import validate

    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
    ).agg(
        F.sum(F.when(F.col("value") >= 100, cents)).alias("_hot"),
        F.sum(cents).alias("_all"),
    )
    mk = lambda name, col: hourly.filter(F.col(col).isNotNull()).select(  # noqa: E731
        "timestamp", "service_name",
        F.lit(name).alias("metric_name"),
        F.col(col).cast("double").alias("value"),
        F.lit(1).alias("aggregation_temporality"),
        F.lit(None).cast("timestamp").alias("start_timestamp"),
    )
    both = mk("ev_hot", "_hot").unionByName(mk("ev_all", "_all"))
    q = validate({
        "version": 1, "from": "metrics",
        "metric": {"name": "ev_hot", "type": "sum", "fn": "increase",
                   "window_seconds": DAY},
        "binop": {"op": "/", "metric": {"name": "ev_all", "type": "sum",
                                        "fn": "increase"}},
    })
    out = lower_metrics(both, q, rhs_df=both)
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value")
    ).orderBy("bucket", "service_name")


ORACLE_IR_METRICS_VECTOR_BINOP = """
WITH base AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         event_type AS service_name,
         CAST(sum(CASE WHEN value >= 100
                       THEN CAST(round(value * 100) AS BIGINT) END)
              AS DOUBLE) AS hot,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
)
SELECT bucket, service_name, round(hot / total, 6) AS value
FROM base WHERE hot IS NOT NULL ORDER BY 1, 2
"""

QUERIES["ir_metrics_vector_binop"] = q_ir_metrics_vector_binop
ORACLES["ir_metrics_vector_binop"] = ORACLE_IR_METRICS_VECTOR_BINOP


def q_ir_metrics_binop_group_left(spark, sf_dir):
    """Many-to-one binop: per-(service, band) count share of the
    service total via on(service_name) group_left — the many side
    keeps its full label identity, with 'band' resolved from the
    attributes map through the aggregated 'by' path."""
    from .ir.metrics import lower_metrics
    from .ir.model import validate

    e = load_table(spark, sf_dir, "events")
    atrest = e.groupBy(
        F.date_trunc("hour", "ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.when(F.col("value") >= 100, F.lit("hot"))
        .otherwise(F.lit("cold")).alias("_band"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value")).select(
        "timestamp", "service_name",
        F.lit("ev_cnt").alias("metric_name"),
        "value",
        F.lit(1).alias("aggregation_temporality"),
        F.lit(None).cast("timestamp").alias("start_timestamp"),
        F.create_map(F.lit("band"), F.col("_band")).alias("attributes"),
    )
    q = validate({
        "version": 1, "from": "metrics",
        "metric": {"name": "ev_cnt", "type": "sum", "fn": "increase",
                   "window_seconds": DAY, "agg": "sum",
                   "by": ["service_name", "band"]},
        "binop": {"op": "/",
                  "metric": {"name": "ev_cnt", "type": "sum",
                             "fn": "increase", "agg": "sum",
                             "by": ["service_name"]},
                  "on": ["service_name"], "group": "left"},
    })
    out = lower_metrics(atrest, q, rhs_df=atrest)
    return out.select(
        "bucket", "service_name", F.col("band"),
        F.round("value", 6).alias("value"),
    ).orderBy("bucket", "service_name", "band")


ORACLE_IR_METRICS_BINOP_GROUP_LEFT = """
WITH cnt AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         event_type AS service_name,
         CASE WHEN value >= 100 THEN 'hot' ELSE 'cold' END AS band,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2, 3
), tot AS (
  SELECT bucket, service_name, sum(c) AS t FROM cnt GROUP BY 1, 2
)
SELECT c.bucket, c.service_name, c.band, round(c.c / t.t, 6) AS value
FROM cnt c JOIN tot t USING (bucket, service_name)
ORDER BY 1, 2, 3
"""

QUERIES["ir_metrics_binop_group_left"] = q_ir_metrics_binop_group_left
ORACLES["ir_metrics_binop_group_left"] = ORACLE_IR_METRICS_BINOP_GROUP_LEFT


def q_typed_attr_trace_predicate(spark, sf_dir):
    """Typed attributes across the TRACES signal (otel-native-schema,
    round-9 extension of the logs-only r8 substrate): a v2 traces table
    with stringified span/resource attributes migrates to the v3 typed
    layout (traces.v3 retype, one type authority across signals), then
    an IR `between` predicate reads the typed int home on
    span_attributes — codegen long compares, residue rows ('n/a' under
    the int key) drop per Kleene, and the resource-side typed home is
    exercised via an eq predicate on process.pid."""
    from .ir import lower, validate
    from .schemas.anyvalue import AttributeTypeRegistry
    from .schemas.resolver import builtin_registry

    e = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "error", F.lit("n/a"))  # residue
        .when(F.col("value") >= 100, F.lit("503"))
        .when(F.col("value") >= 20, F.lit("404"))
        .otherwise(F.lit("200"))
    )
    v2 = e.select(
        F.col("ts").alias("timestamp"),
        F.concat(F.lit("tr-"), F.col("user_id").cast("string")).alias("trace_id"),
        F.col("event_type").alias("service_name"),
        F.create_map(
            F.lit("http.response.status_code"), code,
            F.lit("peer"), F.col("event_type"),
        ).alias("span_attributes"),
        F.create_map(
            F.lit("process.pid"),
            (F.col("user_id") % 2).cast("string"),
        ).alias("resource_attributes"),
    )
    v3 = builtin_registry().migrate(
        v2, "traces", "v2", "v3",
        attr_types=AttributeTypeRegistry().assignments(),
    )
    q = validate({
        "version": 1, "from": "traces",
        "where": {"and": [
            {"field": "http.response.status_code", "op": "between",
             "value": 400, "upper": 599},
            {"field": "process.pid", "op": "eq", "value": 0},
        ]},
        "aggregate": {"op": "count", "by": ["service_name"]},
    })
    return (
        lower(v3, q)
        .select("service_name", F.col("value").cast("bigint").alias("n"))
        .orderBy("service_name")
    )


ORACLE_TYPED_ATTR_TRACE_PREDICATE = """
SELECT event_type AS service_name, CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type <> 'error' AND value >= 20 AND user_id % 2 = 0
GROUP BY 1 ORDER BY 1
"""

QUERIES["typed_attr_trace_predicate"] = q_typed_attr_trace_predicate
ORACLES["typed_attr_trace_predicate"] = ORACLE_TYPED_ATTR_TRACE_PREDICATE


# --------------------------- batch 3: engine contracts as driver gates
# (the two pytest-only surfaces VERDICT r8 called out — admin quotas and
# the self-monitoring loop — plus typed attrs on the metrics signal)

import tempfile as _tempfile

_R15_CACHE: dict = {}


def q_quota_enforcement(spark, sf_dir):
    """Engine-contract gate for admin dataset quotas (admin.py
    create_dataset, reference config TenantLimits lineage): tenants are
    the event types; each tenant's max_datasets quota is a closed form
    of the data (1 + distinct-users mod 3) and it then attempts one
    dataset per distinct active day. The REAL catalog admits/rejects
    (quota_exceeded) each create; the oracle states the closed form
    admitted = least(days, quota) independently. Bounded by
    tenants x days — a contract gate, not a data-scale query."""
    from .admin import AdminError, TenantCatalog

    e = load_table(spark, sf_dir, "events")
    plan = (
        e.groupBy(F.col("event_type").alias("tenant"))
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct(F.to_date("ts")).alias("days"),
        )
        .collect()
    )
    store = TenantCatalog(_tempfile.mkdtemp(prefix="sdb-quota-"))
    rows = []
    for r in sorted(plan, key=lambda x: x["tenant"]):
        quota = 1 + int(r["u"]) % 3
        store.create_tenant(r["tenant"], r["tenant"], now="1970-01-01T00:00:00+00:00")
        store.set_tenant_limits(r["tenant"], max_datasets=quota)
        admitted = rejected = 0
        # the default dataset created with the tenant counts against
        # the quota — exactly the reference's accounting
        for d in range(int(r["days"])):
            try:
                store.create_dataset(r["tenant"], f"ds-{d}", now="1970-01-01T00:00:00+00:00")
                admitted += 1
            except AdminError as err:
                assert err.code == "quota_exceeded"
                rejected += 1
        rows.append((r["tenant"], quota, admitted, rejected))
    return spark.createDataFrame(
        rows, "tenant string, quota long, admitted long, rejected long"
    ).orderBy("tenant")


ORACLE_QUOTA_ENFORCEMENT = """
WITH plan AS (
  SELECT event_type AS tenant,
         1 + count(DISTINCT user_id) % 3 AS quota,
         count(DISTINCT CAST(ts AS DATE)) AS days
  FROM events GROUP BY 1
)
SELECT tenant, CAST(quota AS BIGINT) AS quota,
       CAST(least(days, quota - 1) AS BIGINT) AS admitted,
       CAST(days - least(days, quota - 1) AS BIGINT) AS rejected
FROM plan ORDER BY tenant
"""

QUERIES["quota_enforcement"] = q_quota_enforcement
ORACLES["quota_enforcement"] = ORACLE_QUOTA_ENFORCEMENT


def q_api_key_quota_lifecycle(spark, sf_dir):
    """API-key lifecycle under max_api_keys (admin.py create/revoke/
    authenticate): per tenant, quota = 1 + (distinct days mod 4); it
    requests one key per distinct user bucket (users mod 7), revokes
    every 3rd GRANTED key, and the verdict is (granted, denied,
    live-after-revoke, auth_ok for every live key). The oracle states
    the arithmetic independently."""
    from .admin import AdminError, TenantCatalog

    e = load_table(spark, sf_dir, "events")
    plan = (
        e.groupBy(F.col("event_type").alias("tenant"))
        .agg(
            F.countDistinct(F.col("user_id") % 7).alias("want"),
            F.countDistinct(F.to_date("ts")).alias("days"),
        )
        .collect()
    )
    store = TenantCatalog(_tempfile.mkdtemp(prefix="sdb-keys-"))
    rows = []
    for r in sorted(plan, key=lambda x: x["tenant"]):
        quota = 1 + int(r["days"]) % 4
        store.create_tenant(r["tenant"], r["tenant"], now="1970-01-01T00:00:00+00:00")
        store.set_tenant_limits(r["tenant"], max_api_keys=quota)
        granted, denied = [], 0
        for _ in range(int(r["want"])):
            try:
                granted.append(store.create_api_key(r["tenant"], now="1970-01-01T00:00:00+00:00"))
            except AdminError as err:
                assert err.code == "quota_exceeded"
                denied += 1
        for i, k in enumerate(granted):
            if i % 3 == 2:
                store.revoke_api_key(r["tenant"], k["id"], now="1970-01-01T00:00:00+00:00")
        live = [k for i, k in enumerate(granted) if i % 3 != 2]
        auth_ok = sum(
            1 for k in live
            if (store.authenticate(k["key"]) or {}).get("tenant_id")
            == r["tenant"]
        )
        rows.append((r["tenant"], len(granted), denied, len(live), auth_ok))
    return spark.createDataFrame(
        rows,
        "tenant string, granted long, denied long, live long, auth_ok long",
    ).orderBy("tenant")


ORACLE_API_KEY_QUOTA_LIFECYCLE = """
WITH plan AS (
  SELECT event_type AS tenant,
         count(DISTINCT user_id % 7) AS want,
         1 + count(DISTINCT CAST(ts AS DATE)) % 4 AS quota
  FROM events GROUP BY 1
), verdict AS (
  SELECT tenant, least(want, quota) AS granted,
         want - least(want, quota) AS denied
  FROM plan
)
SELECT tenant, CAST(granted AS BIGINT) AS granted,
       CAST(denied AS BIGINT) AS denied,
       CAST(granted - granted / 3 AS BIGINT) AS live,
       CAST(granted - granted / 3 AS BIGINT) AS auth_ok
FROM verdict ORDER BY tenant
"""

QUERIES["api_key_quota_lifecycle"] = q_api_key_quota_lifecycle
ORACLES["api_key_quota_lifecycle"] = ORACLE_API_KEY_QUOTA_LIFECYCLE


def q_selfmon_query_spans(spark, sf_dir):
    """The self-monitoring dogfood loop as a driver gate
    (monitoring.py, reference src/common/src/self_monitoring/): one
    server span per (endpoint=event_type, hour) with duration = the
    hour's event count in µs, recorded through SelfMonitor, flushed
    through the SAME manifest sink ingest uses, and read back with the
    normal hybrid reader — then rolled up per endpoint. Spans recorded
    FOR the system tenant must be suppressed (the anti-loop guard), and
    a traceparent-joined child span must keep its parent's trace_id —
    both verified inline; the oracle states the per-endpoint rollup
    closed form."""
    from .monitoring import SYSTEM_TENANT, SelfMonitor
    from .storage import hybrid_read

    key = ("selfmon", sf_dir)
    if key not in _R15_CACHE:
        e = load_table(spark, sf_dir, "events")
        # contract gate, not a data-scale query: the span schedule is
        # bounded to the first 2 days (endpoints x <=48 hours) at any SF
        mn = e.agg(F.min("ts")).first()[0]
        e = e.filter(
            F.col("ts") < F.lit(mn) + F.expr("INTERVAL 2 DAYS"))
        sched = (
            e.groupBy(
                F.col("event_type").alias("endpoint"),
                F.date_trunc("hour", "ts").alias("h"),
            )
            .agg(F.count(F.lit(1)).alias("k"))
            .collect()
        )
        base = _tempfile.mkdtemp(prefix="sdb-selfmon-")
        mon = SelfMonitor(spark, base, sample_ratio=1.0, max_buffer=10**6)
        for r in sorted(sched, key=lambda x: (x["endpoint"], x["h"])):
            start = int(r["h"].timestamp()) * 10**9
            resp = mon.record_span(r["endpoint"], "acme", "prod",
                                   start, start + int(r["k"]) * 1000)
            assert resp is not None and resp.endswith("-01")
            # anti-loop: a system-tenant call records NOTHING
            assert mon.record_span(r["endpoint"], SYSTEM_TENANT, "prod",
                                   start, start + 1) is None
            # context propagation: child joins the parent's trace
            trace_id = resp.split("-")[1]
            child = mon.record_span("child:" + r["endpoint"], "acme",
                                    "prod", start, start + 1,
                                    traceparent=resp)
            assert child.split("-")[1] == trace_id
        mon.flush()
        _R15_CACHE[key] = base
    from .catalog import signal_table_path
    from .monitoring import SYSTEM_DATASET

    spans = hybrid_read(spark, signal_table_path(
        _R15_CACHE[key], SYSTEM_TENANT, SYSTEM_DATASET, "traces"))
    return (
        spans.filter(~F.col("span_name").startswith("child:"))
        .groupBy(F.col("span_name").alias("endpoint"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            (F.sum("duration_nanos") / 1000).cast("bigint")
            .alias("total_events"),
            F.sum(F.col("is_root").cast("bigint")).alias("n_roots"),
        )
        .orderBy("endpoint")
    )


ORACLE_SELFMON_QUERY_SPANS = """
WITH hourly AS (
  SELECT event_type AS endpoint, date_trunc('hour', ts) AS h,
         count(*) AS k
  FROM events
  WHERE ts < (SELECT min(ts) + INTERVAL 2 DAY FROM events)
  GROUP BY 1, 2
)
SELECT endpoint, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(k) AS BIGINT) AS total_events,
       CAST(count(*) AS BIGINT) AS n_roots
FROM hourly GROUP BY 1 ORDER BY 1
"""

QUERIES["selfmon_query_spans"] = q_selfmon_query_spans
ORACLES["selfmon_query_spans"] = ORACLE_SELFMON_QUERY_SPANS


def q_typed_attr_metric_predicate(spark, sf_dir):
    """Typed attributes on the METRICS signal (metrics_gauge.v2 — the
    third signal under the one type authority): a v1 gauge table with
    stringified datapoint attributes migrates to the typed layout
    (config makes 'shard' canonical int), then an IR metric query's
    `where` reads the typed int home — avg_over_time per (day, service)
    restricted to shard 0, residue-free by construction. Integer cents
    keep the averages exact on both engines."""
    from .ir.metrics import lower_metrics
    from .ir.model import validate
    from .schemas.anyvalue import AttributeTypeRegistry
    from .schemas.resolver import builtin_registry

    e = load_table(spark, sf_dir, "events")
    v1 = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit("ev_gauge").alias("metric_name"),
        F.round(F.col("value") * 100).cast("double").alias("value"),
        F.create_map(
            F.lit("shard"), (F.col("user_id") % 2).cast("string"),
            F.lit("env"), F.lit("prod"),
        ).alias("attributes"),
    )
    v2 = builtin_registry().migrate(
        v1, "metrics_gauge", "v1", "v2",
        attr_types=AttributeTypeRegistry(
            config={"shard": "int"}).assignments(),
    )
    q = validate({
        "version": 1, "from": "metrics",
        "metric": {"name": "ev_gauge", "type": "gauge",
                   "fn": "avg_over_time", "window_seconds": DAY,
                   "agg": "avg", "by": ["service_name"]},
        "where": {"field": "shard", "op": "eq", "value": 0},
    })
    out = lower_metrics(v2, q)
    return out.select(
        "bucket", "service_name",
        F.round(F.col("value") / 100.0, 6).alias("value"),
    ).orderBy("bucket", "service_name")


ORACLE_TYPED_ATTR_METRIC_PREDICATE = """
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       event_type AS service_name,
       round(avg(CAST(round(value * 100) AS BIGINT)) / 100.0, 6) AS value
FROM events WHERE user_id % 2 = 0
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["typed_attr_metric_predicate"] = q_typed_attr_metric_predicate
ORACLES["typed_attr_metric_predicate"] = ORACLE_TYPED_ATTR_METRIC_PREDICATE


# ----------------------------------- batch 4: relational / stat depth


def q_order_fill_rate_matrix(spark, sf_dir):
    """Order-status composition per priority tier with the within-tier
    share — exact integer counts, one division at the end."""
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("o_orderpriority")
    return (
        cnt.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .orderBy("o_orderpriority", "o_orderstatus")
    )


ORACLE_ORDER_FILL_RATE_MATRIX = """
SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (
         PARTITION BY o_orderpriority), 6) AS share
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["order_fill_rate_matrix"] = q_order_fill_rate_matrix
ORACLES["order_fill_rate_matrix"] = ORACLE_ORDER_FILL_RATE_MATRIX


def q_customer_interpurchase_cv(spark, sf_dir):
    """Coefficient of variation of inter-purchase gaps per customer
    (>= 3 orders, positive mean gap), banded into cadence classes.
    Gaps are integer DAYS; mean/variance computed from exact integer
    sums in the same expression order on both engines, so the band
    edges cannot flip."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("prev", F.lag("o_orderdate").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "o_custkey",
            F.datediff("o_orderdate", "prev").cast("long").alias("g"),
        )
    )
    per = gaps.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("ss"),
    ).filter((F.col("n") >= 2) & (F.col("s") > 0))
    mean = F.col("s") / F.col("n")
    var = F.greatest(F.lit(0.0), F.col("ss") / F.col("n") - mean * mean)
    cv = F.sqrt(var) / mean
    band = (
        F.when(cv < 0.5, "regular")
        .when(cv < 1.0, "mixed")
        .otherwise("bursty")
    )
    return (
        per.groupBy(band.alias("cadence"))
        .agg(F.count(F.lit(1)).cast("long").alias("customers"))
        .orderBy("cadence")
    )


ORACLE_CUSTOMER_INTERPURCHASE_CV = """
WITH gaps AS (
  SELECT o_custkey,
         CAST(datediff('day', lag(o_orderdate) OVER w, o_orderdate)
              AS BIGINT) AS g
  FROM orders WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)
),
per AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(g) AS BIGINT) AS s, CAST(sum(g * g) AS BIGINT) AS ss
  FROM gaps WHERE g IS NOT NULL GROUP BY 1
  HAVING count(*) >= 2 AND sum(g) > 0
),
cvs AS (
  SELECT sqrt(greatest(0.0, ss * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)))
         / (s * 1.0 / n) AS cv
  FROM per
)
SELECT CASE WHEN cv < 0.5 THEN 'regular'
            WHEN cv < 1.0 THEN 'mixed' ELSE 'bursty' END AS cadence,
       CAST(count(*) AS BIGINT) AS customers
FROM cvs GROUP BY 1 ORDER BY 1
"""

QUERIES["customer_interpurchase_cv"] = q_customer_interpurchase_cv
ORACLES["customer_interpurchase_cv"] = ORACLE_CUSTOMER_INTERPURCHASE_CV


def q_customer_order_gini(spark, sf_dir):
    """Gini coefficient of order counts across customers — demand
    concentration in one number. Rank-weighted sum stays in exact
    integers (rank ties broken on custkey); only the final closed form
    touches floats."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    wr = Window.orderBy("x", "o_custkey")
    ranked = per.withColumn("rk", F.row_number().over(wr).cast("long"))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(
            (2.0 * F.sum(F.col("rk") * F.col("x"))
             / (F.count(F.lit(1)) * F.sum("x")))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


ORACLE_CUSTOMER_ORDER_GINI = """
WITH per AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS rk
  FROM per
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       round(2.0 * sum(rk * x) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
"""

QUERIES["customer_order_gini"] = q_customer_order_gini
ORACLES["customer_order_gini"] = ORACLE_CUSTOMER_ORDER_GINI


def q_part_brand_price_iqr(spark, sf_dir):
    """Retail-price interquartile range per brand — exact integer-rank
    selection on cents (rank ceil(q*n), ties broken on partkey), never
    an interpolating percentile."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    w = Window.partitionBy("p_brand").orderBy("c", "p_partkey")
    ranked = (
        p.select("p_brand", "p_partkey", cents.alias("c"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy("p_brand")).cast("long"))
    )
    q1 = ranked.filter(
        F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * 0.25))
    ).select("p_brand", F.col("c").alias("q1_cents"))
    q3 = ranked.filter(
        F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("n") * 0.75))
    ).select("p_brand", F.col("c").alias("q3_cents"))
    return (
        q1.join(q3, "p_brand")
        .select(
            "p_brand", "q1_cents", "q3_cents",
            (F.col("q3_cents") - F.col("q1_cents")).alias("iqr_cents"),
        )
        .orderBy("p_brand")
    )


ORACLE_PART_BRAND_PRICE_IQR = """
WITH ranked AS (
  SELECT p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS c,
         CAST(row_number() OVER (
           PARTITION BY p_brand
           ORDER BY CAST(round(p_retailprice * 100) AS BIGINT), p_partkey)
           AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n
  FROM part
)
SELECT p_brand,
       min(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
                THEN c END) AS q1_cents,
       min(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.75) AS BIGINT))
                THEN c END) AS q3_cents,
       min(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.75) AS BIGINT))
                THEN c END)
       - min(CASE WHEN rk = greatest(1, CAST(ceil(n * 0.25) AS BIGINT))
                  THEN c END) AS iqr_cents
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["part_brand_price_iqr"] = q_part_brand_price_iqr
ORACLES["part_brand_price_iqr"] = ORACLE_PART_BRAND_PRICE_IQR


def q_orders_monthly_momentum(spark, sf_dir):
    """Month-over-month revenue momentum — exact cents per month, one
    lag, one division."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    monthly = o.groupBy(
        F.trunc("o_orderdate", "month").alias("month")
    ).agg(F.sum(cents).alias("rev_cents"))
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev", F.lag("rev_cents").over(w))
        .select(
            "month", "rev_cents",
            F.round((F.col("rev_cents") - F.col("prev"))
                    / F.col("prev"), 6).alias("mom"),
        )
        .orderBy("month")
    )


ORACLE_ORDERS_MONTHLY_MOMENTUM = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
)
SELECT month, rev_cents,
       round((rev_cents - lag(rev_cents) OVER (ORDER BY month)) * 1.0
             / lag(rev_cents) OVER (ORDER BY month), 6) AS mom
FROM monthly ORDER BY month
"""

QUERIES["orders_monthly_momentum"] = q_orders_monthly_momentum
ORACLES["orders_monthly_momentum"] = ORACLE_ORDERS_MONTHLY_MOMENTUM


def q_returnflag_price_gap(spark, sf_dir):
    """Average line price per return flag and its gap to the overall
    average — integer-cent sums, divisions in the same order both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).alias("s"),
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "l_returnflag", F.col("n").cast("bigint").alias("n"),
            F.round(F.col("s") / F.col("n") / 100.0, 6).alias("avg_price"),
            F.round(F.col("s") / F.col("n") / 100.0
                    - F.col("ts") / F.col("tn") / 100.0, 6).alias("gap"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_RETURNFLAG_PRICE_GAP = """
WITH per AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS s
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(n) AS tn, sum(s) AS ts FROM per)
SELECT l_returnflag, n,
       round(s * 1.0 / n / 100.0, 6) AS avg_price,
       round(s * 1.0 / n / 100.0 - ts * 1.0 / tn / 100.0, 6) AS gap
FROM per, tot ORDER BY l_returnflag
"""

QUERIES["returnflag_price_gap"] = q_returnflag_price_gap
ORACLES["returnflag_price_gap"] = ORACLE_RETURNFLAG_PRICE_GAP


def q_supplier_part_coverage_deciles(spark, sf_dir):
    """Distinct-part coverage per supplier, cut into deciles (ntile
    with explicit (coverage, suppkey) tiebreak) — the assortment-width
    distribution."""
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.select("l_suppkey", "l_partkey").distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("parts"))
    )
    w = Window.orderBy("parts", "l_suppkey")
    return (
        per.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("suppliers"),
            F.min("parts").cast("bigint").alias("min_parts"),
            F.max("parts").cast("bigint").alias("max_parts"),
        )
        .orderBy("decile")
    )


ORACLE_SUPPLIER_PART_COVERAGE_DECILES = """
WITH per AS (
  SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts
  FROM lineitem GROUP BY 1
),
cut AS (
  SELECT parts, ntile(10) OVER (ORDER BY parts, l_suppkey) AS decile
  FROM per
)
SELECT decile, CAST(count(*) AS BIGINT) AS suppliers,
       CAST(min(parts) AS BIGINT) AS min_parts,
       CAST(max(parts) AS BIGINT) AS max_parts
FROM cut GROUP BY 1 ORDER BY 1
"""

QUERIES["supplier_part_coverage_deciles"] = q_supplier_part_coverage_deciles
ORACLES["supplier_part_coverage_deciles"] = ORACLE_SUPPLIER_PART_COVERAGE_DECILES


def q_weekday_hour_load_matrix(spark, sf_dir):
    """Event load per (ISO weekday, hour) with the within-day share —
    the traffic heatmap, integer counts and one division."""
    e = load_table(spark, sf_dir, "events")
    cnt = e.groupBy(
        (F.expr("weekday(ts)") + 1).cast("int").alias("isodow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("isodow")
    return (
        cnt.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .orderBy("isodow", "hr")
    )


ORACLE_WEEKDAY_HOUR_LOAD_MATRIX = """
WITH cnt AS (
  SELECT CAST(isodow(ts) AS INT) AS isodow, CAST(hour(ts) AS INT) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT isodow, hr, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY isodow), 6) AS share
FROM cnt ORDER BY 1, 2
"""

QUERIES["weekday_hour_load_matrix"] = q_weekday_hour_load_matrix
ORACLES["weekday_hour_load_matrix"] = ORACLE_WEEKDAY_HOUR_LOAD_MATRIX


def q_value_log2_histogram(spark, sf_dir):
    """Event-value magnitude histogram on a log2 scale — bucket index
    from the binary-representation length of integer cents
    (floor(log2)+1), integer-exact on both engines, no libm."""
    e = load_table(spark, sf_dir, "events")
    w = F.round(F.col("value") * 100).cast("long")
    bkt = F.when(w <= 0, F.lit(0)).otherwise(F.length(F.bin(w))).cast("int")
    return (
        e.select(bkt.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("bucket")
    )


ORACLE_VALUE_LOG2_HISTOGRAM = """
WITH b AS (
  SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) <= 0 THEN 0
              ELSE length(bin(CAST(round(value * 100) AS BIGINT)))
         END AS bucket
  FROM events
)
SELECT CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY 1 ORDER BY 1
"""

QUERIES["value_log2_histogram"] = q_value_log2_histogram
ORACLES["value_log2_histogram"] = ORACLE_VALUE_LOG2_HISTOGRAM


def q_doc_type_token_ratio(spark, sf_dir):
    """Type-token ratio per document (the battery's shared [^a-z]+
    tokenization), banded per language — lexical-diversity profile.
    TTR is one division of exact integers; the band cut is identical
    IEEE on both engines."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(
            "doc_id", "lang",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") > 0)
    )
    per = words.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("toks"),
        F.countDistinct("term").cast("long").alias("types"),
    )
    ttr = F.col("types") / F.col("toks")
    band = (
        F.when(ttr < 0.5, "low")
        .when(ttr < 0.8, "mid")
        .otherwise("high")
    )
    return (
        per.groupBy("lang", band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("docs"))
        .orderBy("lang", "band")
    )


ORACLE_DOC_TYPE_TOKEN_RATIO = """
WITH words AS (
  SELECT doc_id, lang, t.term
  FROM documents,
       LATERAL unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
  WHERE length(t.term) > 0
),
per AS (
  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS toks,
         CAST(count(DISTINCT term) AS BIGINT) AS types
  FROM words GROUP BY 1, 2
)
SELECT lang,
       CASE WHEN types * 1.0 / toks < 0.5 THEN 'low'
            WHEN types * 1.0 / toks < 0.8 THEN 'mid'
            ELSE 'high' END AS band,
       CAST(count(*) AS BIGINT) AS docs
FROM per GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["doc_type_token_ratio"] = q_doc_type_token_ratio
ORACLES["doc_type_token_ratio"] = ORACLE_DOC_TYPE_TOKEN_RATIO


# ------------------------------------ batch 5: behavioral / text depth


def q_user_burstiness_bands(spark, sf_dir):
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of per-user event
    inter-arrivals (seconds, exact integers), banded — Poisson traffic
    sits near 0, humans are bursty. Moments from exact integer sums;
    identical float order both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "user_id",
            (F.unix_timestamp("ts") - F.unix_timestamp("prev"))
            .cast("long").alias("g"),
        )
    )
    per = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g") * F.col("g")).alias("ss"),
    ).filter((F.col("n") >= 5) & (F.col("s") > 0))
    mean = F.col("s") / F.col("n")
    sig = F.sqrt(F.greatest(F.lit(0.0), F.col("ss") / F.col("n") - mean * mean))
    b = (sig - mean) / (sig + mean)
    band = (
        F.when(b < -0.1, "regular")
        .when(b <= 0.1, "poissonian")
        .otherwise("bursty")
    )
    return (
        per.groupBy(band.alias("band"))
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .orderBy("band")
    )


ORACLE_USER_BURSTINESS_BANDS = """
WITH gaps AS (
  SELECT user_id,
         CAST(epoch(ts) - epoch(lag(ts) OVER w) AS BIGINT) AS g
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(g) AS BIGINT) AS s, CAST(sum(g * g) AS BIGINT) AS ss
  FROM gaps WHERE g IS NOT NULL GROUP BY 1
  HAVING count(*) >= 5 AND sum(g) > 0
),
bs AS (
  SELECT (sqrt(greatest(0.0, ss * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)))
          - s * 1.0 / n)
         / (sqrt(greatest(0.0, ss * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)))
            + s * 1.0 / n) AS b
  FROM per
)
SELECT CASE WHEN b < -0.1 THEN 'regular'
            WHEN b <= 0.1 THEN 'poissonian' ELSE 'bursty' END AS band,
       CAST(count(*) AS BIGINT) AS users
FROM bs GROUP BY 1 ORDER BY 1
"""

QUERIES["user_burstiness_bands"] = q_user_burstiness_bands
ORACLES["user_burstiness_bands"] = ORACLE_USER_BURSTINESS_BANDS


def q_emb_dim_range_profile(spark, sf_dir):
    """Per-dimension min/max/range over the embedding corpus — the
    quantizer's calibration table. Min/max are exact picks (no
    summation), so floats compare exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode("embedding").alias("dim", "_x")
    ).filter(F.col("dim") < 16).withColumn("x", F.col("_x").cast("double"))
    return (
        flat.groupBy(F.col("dim").cast("int").alias("dim"))
        .agg(
            F.round(F.min("x"), 6).alias("lo"),
            F.round(F.max("x"), 6).alias("hi"),
            F.round(F.max("x") - F.min("x"), 6).alias("range"),
        )
        .orderBy("dim")
    )


ORACLE_EMB_DIM_RANGE_PROFILE = """
WITH flat AS (
  SELECT i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
  WHERE i < 16
)
SELECT CAST(dim AS INT) AS dim, round(min(x), 6) AS lo,
       round(max(x), 6) AS hi, round(max(x) - min(x), 6) AS range
FROM flat GROUP BY 1 ORDER BY 1
"""

QUERIES["emb_dim_range_profile"] = q_emb_dim_range_profile
ORACLES["emb_dim_range_profile"] = ORACLE_EMB_DIM_RANGE_PROFILE


def q_doc_char_class_profile(spark, sf_dir):
    """Character-class composition per source (letter/digit/space/other
    shares) — the OCR-noise sniff test. Counts via regexp_replace
    lengths (integer-exact), one division each."""
    d = load_table(spark, sf_dir, "documents")

    def n_of(pat):
        return F.length(F.regexp_replace(F.lower("text"), pat, ""))

    per = d.groupBy("source").agg(
        F.sum(F.length("text")).cast("long").alias("total"),
        F.sum(F.length(F.lower("text")) - n_of("[a-z]")).cast("long")
        .alias("letters"),
        F.sum(F.length("text") - n_of("[0-9]")).cast("long").alias("digits"),
        F.sum(F.length("text") - n_of(" ")).cast("long").alias("spaces"),
    )
    return per.select(
        "source", "total",
        F.round(F.col("letters") / F.col("total"), 6).alias("letter_share"),
        F.round(F.col("digits") / F.col("total"), 6).alias("digit_share"),
        F.round(F.col("spaces") / F.col("total"), 6).alias("space_share"),
    ).orderBy("source")


ORACLE_DOC_CHAR_CLASS_PROFILE = """
WITH per AS (
  SELECT source, CAST(sum(length(text)) AS BIGINT) AS total,
         CAST(sum(length(lower(text))
                  - length(regexp_replace(lower(text), '[a-z]', '', 'g')))
              AS BIGINT) AS letters,
         CAST(sum(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g')))
              AS BIGINT) AS digits,
         CAST(sum(length(text)
                  - length(regexp_replace(text, ' ', '', 'g')))
              AS BIGINT) AS spaces
  FROM documents GROUP BY 1
)
SELECT source, total,
       round(letters * 1.0 / total, 6) AS letter_share,
       round(digits * 1.0 / total, 6) AS digit_share,
       round(spaces * 1.0 / total, 6) AS space_share
FROM per ORDER BY source
"""

QUERIES["doc_char_class_profile"] = q_doc_char_class_profile
ORACLES["doc_char_class_profile"] = ORACLE_DOC_CHAR_CLASS_PROFILE


def q_brand_price_quantity_corr(spark, sf_dir):
    """Pearson correlation of line price (cents) and quantity per
    brand, from EXACT integer moment sums — the closed form touches
    floats once, in the same order on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    x = F.round(F.col("l_extendedprice") * 100).cast("long")
    y = F.col("l_quantity").cast("long")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    per = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return per.select(
        "p_brand", F.col("n").cast("bigint").alias("n"),
        F.round(num / den, 6).alias("corr"),
    ).orderBy("p_brand")


ORACLE_BRAND_PRICE_QUANTITY_CORR = """
WITH per AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sx,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sxx,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS syy
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT p_brand, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS corr
FROM per ORDER BY p_brand
"""

QUERIES["brand_price_quantity_corr"] = q_brand_price_quantity_corr
ORACLES["brand_price_quantity_corr"] = ORACLE_BRAND_PRICE_QUANTITY_CORR


def q_wau_mau_stickiness(spark, sf_dir):
    """Weekly-active / monthly-active stickiness: each ISO week's
    distinct users over its calendar month's distinct users (weeks
    keyed to the month containing their Monday) — integer distincts,
    one division."""
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        F.date_trunc("week", "ts").alias("week"), "user_id"
    ).distinct()
    wau = wk.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    mau = (
        e.select(F.date_trunc("month", "ts").alias("month"), "user_id")
        .distinct()
        .groupBy("month")
        .agg(F.count(F.lit(1)).cast("long").alias("mau"))
    )
    j = wau.join(
        mau, F.date_trunc("month", F.col("week")) == F.col("month")
    )
    return j.select(
        F.col("week").cast("date").alias("week"), "wau", "mau",
        F.round(F.col("wau") / F.col("mau"), 6).alias("stickiness"),
    ).orderBy("week")


ORACLE_WAU_MAU_STICKINESS = """
WITH wau AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM events GROUP BY 1
),
mau AS (
  SELECT date_trunc('month', ts) AS month,
         CAST(count(DISTINCT user_id) AS BIGINT) AS mau
  FROM events GROUP BY 1
)
SELECT week, wau, mau, round(wau * 1.0 / mau, 6) AS stickiness
FROM wau JOIN mau ON date_trunc('month', week) = month
ORDER BY week
"""

QUERIES["wau_mau_stickiness"] = q_wau_mau_stickiness
ORACLES["wau_mau_stickiness"] = ORACLE_WAU_MAU_STICKINESS


def q_event_value_top10_share(spark, sf_dir):
    """Share of each event type's total value held by its 10 largest
    events (exact cents, event_id tiebreak) — whale concentration."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("event_id")
    )
    ranked = e.select(
        "event_type", "event_id", cents.alias("c")
    ).withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.sum("c").alias("total_cents"),
            F.sum(F.when(F.col("rk") <= 10, F.col("c")).otherwise(0))
            .alias("top10_cents"),
        )
        .select(
            "event_type",
            F.col("total_cents").cast("bigint").alias("total_cents"),
            F.round(F.col("top10_cents") / F.col("total_cents"), 6)
            .alias("top10_share"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENT_VALUE_TOP10_SHARE = """
WITH ranked AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id) AS rk
  FROM events
)
SELECT event_type, CAST(sum(c) AS BIGINT) AS total_cents,
       round(sum(CASE WHEN rk <= 10 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
         AS top10_share
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["event_value_top10_share"] = q_event_value_top10_share
ORACLES["event_value_top10_share"] = ORACLE_EVENT_VALUE_TOP10_SHARE


def q_lineitem_discount_ladder(spark, sf_dir):
    """Revenue and volume by discrete discount level — the discount
    ladder, exact cents with the discount key held as integer basis
    points so grouping never touches float identity."""
    li = load_table(spark, sf_dir, "lineitem")
    bp = F.round(F.col("l_discount") * 100).cast("int")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.groupBy(bp.alias("discount_pct"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("lines"),
            F.sum(cents).cast("bigint").alias("gross_cents"),
            F.sum(F.round(cents * (1 - F.col("l_discount"))).cast("long"))
            .cast("bigint").alias("net_cents"),
            F.round(F.sum("l_quantity") / F.count(F.lit(1)), 6)
            .alias("avg_qty"),
        )
        .orderBy("discount_pct")
    )


ORACLE_LINEITEM_DISCOUNT_LADDER = """
SELECT CAST(round(l_discount * 100) AS INT) AS discount_pct,
       CAST(count(*) AS BIGINT) AS lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS gross_cents,
       CAST(sum(CAST(round(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (1 - l_discount)) AS BIGINT)) AS BIGINT)
         AS net_cents,
       round(sum(l_quantity) / count(*), 6) AS avg_qty
FROM lineitem GROUP BY 1 ORDER BY 1
"""

QUERIES["lineitem_discount_ladder"] = q_lineitem_discount_ladder
ORACLES["lineitem_discount_ladder"] = ORACLE_LINEITEM_DISCOUNT_LADDER


def q_user_first_touch_conversion(spark, sf_dir):
    """Conversion by acquisition channel: each user's FIRST event type
    (ts then event_id tiebreak) vs whether they ever purchase —
    first-touch attribution at user grain."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    buyers = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct()
        .withColumn("converted", F.lit(1))
    )
    j = first.join(buyers, "user_id", "left").fillna({"converted": 0})
    return (
        j.groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("users"),
            F.sum("converted").cast("bigint").alias("converted"),
            F.round(F.sum("converted") / F.count(F.lit(1)), 6)
            .alias("cr"),
        )
        .orderBy("first_touch")
    )


ORACLE_USER_FIRST_TOUCH_CONVERSION = """
WITH first AS (
  SELECT user_id, event_type AS first_touch
  FROM (SELECT user_id, event_type, row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS rk
        FROM events)
  WHERE rk = 1
),
buyers AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT first_touch, CAST(count(*) AS BIGINT) AS users,
       CAST(count(b.user_id) AS BIGINT) AS converted,
       round(count(b.user_id) * 1.0 / count(*), 6) AS cr
FROM first f LEFT JOIN buyers b USING (user_id)
GROUP BY 1 ORDER BY 1
"""

QUERIES["user_first_touch_conversion"] = q_user_first_touch_conversion
ORACLES["user_first_touch_conversion"] = ORACLE_USER_FIRST_TOUCH_CONVERSION


def q_nation_balance_spread(spark, sf_dir):
    """Customer account-balance spread per nation: exact integer-rank
    median plus min/max on cents — dimension join broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", cents.alias("bal"), "c_custkey"
    )
    w = Window.partitionBy("n_name").orderBy("bal", "c_custkey")
    ranked = j.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("n_name"))
    )
    med = ranked.filter(
        F.col("rk") == F.greatest(F.lit(1), F.ceil(F.col("cnt") * 0.5))
    ).select("n_name", F.col("bal").alias("median_cents"))
    mm = j.groupBy("n_name").agg(
        F.min("bal").cast("bigint").alias("min_cents"),
        F.max("bal").cast("bigint").alias("max_cents"),
        F.count(F.lit(1)).cast("bigint").alias("customers"),
    )
    return (
        mm.join(med, "n_name")
        .select("n_name", "customers", "min_cents",
                F.col("median_cents").cast("bigint").alias("median_cents"),
                "max_cents")
        .orderBy("n_name")
    )


ORACLE_NATION_BALANCE_SPREAD = """
WITH j AS (
  SELECT n_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal, c_custkey
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
ranked AS (
  SELECT n_name, bal,
         row_number() OVER (PARTITION BY n_name ORDER BY bal, c_custkey)
           AS rk,
         count(*) OVER (PARTITION BY n_name) AS cnt
  FROM j
)
SELECT n_name, CAST(max(cnt) AS BIGINT) AS customers,
       CAST(min(bal) AS BIGINT) AS min_cents,
       CAST(min(CASE WHEN rk = greatest(1, CAST(ceil(cnt * 0.5) AS BIGINT))
                     THEN bal END) AS BIGINT) AS median_cents,
       CAST(max(bal) AS BIGINT) AS max_cents
FROM ranked GROUP BY 1 ORDER BY 1
"""

QUERIES["nation_balance_spread"] = q_nation_balance_spread
ORACLES["nation_balance_spread"] = ORACLE_NATION_BALANCE_SPREAD


# -------------------------- batch 6: dialect corners + mix analytics
# LogQL output stages (the reference PARSES these but ignores them —
# logql.rs:107-128; executing them is this engine's upgrade, so each
# goes under the oracle) and PromQL aggregation corners, through the
# FULL parse→lower→execute pipelines.


def _r15_logql_ctx(spark, sf_dir):
    from .bench_logql import _ctx

    return _ctx(spark, sf_dir)


def q_logql_distinct_stage(spark, sf_dir):
    """LogQL `| distinct k`: keep the EARLIEST line per distinct value
    of the json-extracted label (timestamp then body tiebreak), then a
    daily count by service — dedup-by-label executed, not parsed-and-
    ignored."""
    from .logql.lowering import query_metric

    out = query_metric(
        _r15_logql_ctx(spark, sf_dir),
        'sum by (service) (count_over_time('
        '{service=~".+"} | json | distinct k [1d]))',
    )
    return out.select("bucket", "service_name", "value").orderBy(
        "bucket", "service_name")


ORACLE_LOGQL_DISTINCT_STAGE = """
WITH rows AS (
  SELECT ts, event_type, props,
         json_extract_string(props, '$.k') AS k
  FROM events
),
first AS (
  SELECT * FROM (
    SELECT ts, event_type,
           row_number() OVER (PARTITION BY k ORDER BY ts, props) AS rn
    FROM rows)
  WHERE rn = 1
)
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       event_type AS service_name, CAST(count(*) AS DOUBLE) AS value
FROM first GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["logql_distinct_stage"] = q_logql_distinct_stage
ORACLES["logql_distinct_stage"] = ORACLE_LOGQL_DISTINCT_STAGE


def q_logql_drop_label_stage(spark, sf_dir):
    """LogQL `| drop user`: the attribute is pruned from the map, so a
    later `by (user)` grouping sees one NULL-label group per service —
    the drop must actually execute for the user dimension to
    disappear."""
    from .logql.lowering import query_metric

    out = query_metric(
        _r15_logql_ctx(spark, sf_dir),
        'sum by (service, user) (count_over_time('
        '{service=~".+"} | drop user [1d]))',
    )
    return out.select(
        "bucket", "service_name", F.col("user"), "value"
    ).orderBy("bucket", "service_name")


ORACLE_LOGQL_DROP_LABEL_STAGE = """
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       event_type AS service_name, CAST(NULL AS VARCHAR) AS user,
       CAST(count(*) AS DOUBLE) AS value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["logql_drop_label_stage"] = q_logql_drop_label_stage
ORACLES["logql_drop_label_stage"] = ORACLE_LOGQL_DROP_LABEL_STAGE


def q_logql_decolorize_bytes(spark, sf_dir):
    """LogQL `| decolorize`: ANSI escape sequences are stripped from
    the line BEFORE byte accounting — bytes_over_time over a view whose
    bodies carry a 9-byte color wrapper must equal the clean length."""
    from .logql.lowering import LowerCtx, query_metric

    e = load_table(spark, sf_dir, "events")
    view = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit(None).cast("string").alias("severity_text"),
        F.lit(None).cast("string").alias("label_namespace"),
        F.concat(F.lit("\x1b[31m"), F.col("props"), F.lit("\x1b[0m"))
        .alias("body"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string"))
        .alias("log_attributes"),
    )
    from .bench_logql import DAY as LDAY
    from .bench_logql import END, START

    out = query_metric(
        LowerCtx(spark, view, START, END, LDAY),
        'sum by (service) (bytes_over_time('
        '{service=~".+"} | decolorize [1d]))',
    )
    return out.select("bucket", "service_name", "value").orderBy(
        "bucket", "service_name")


ORACLE_LOGQL_DECOLORIZE_BYTES = """
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       event_type AS service_name,
       CAST(sum(strlen(props)) AS DOUBLE) AS value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["logql_decolorize_bytes"] = q_logql_decolorize_bytes
ORACLES["logql_decolorize_bytes"] = ORACLE_LOGQL_DECOLORIZE_BYTES


def q_logql_line_format_bytes(spark, sf_dir):
    """LogQL `| line_format "{{.k}}"`: the body is REWRITTEN to the
    template rendering before byte accounting — bytes_over_time equals
    the summed length of the extracted k values, not the raw lines."""
    from .logql.lowering import query_metric

    out = query_metric(
        _r15_logql_ctx(spark, sf_dir),
        'sum by (service) (bytes_over_time('
        '{service=~".+"} | json | line_format "{{.k}}" [1d]))',
    )
    return out.select("bucket", "service_name", "value").orderBy(
        "bucket", "service_name")


ORACLE_LOGQL_LINE_FORMAT_BYTES = """
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
       event_type AS service_name,
       CAST(sum(length(json_extract_string(props, '$.k'))) AS DOUBLE)
         AS value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["logql_line_format_bytes"] = q_logql_line_format_bytes
ORACLES["logql_line_format_bytes"] = ORACLE_LOGQL_LINE_FORMAT_BYTES


def q_promql_stdvar_agg(spark, sf_dir):
    """PromQL `stdvar(...)` across series per bucket — the population
    variance outer agg, over per-service daily averages."""
    from .bench_promql import _ctx as _pctx
    from .promql.lowering import query_range

    out = query_range(
        _pctx(spark, sf_dir),
        "stdvar(avg_over_time(events_value[1d]))",
    )
    return out.select("bucket", F.round("value", 6).alias("value")).orderBy(
        "bucket")


ORACLE_PROMQL_STDVAR_AGG = """
WITH per AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         event_type AS service_name, avg(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT bucket, round(var_pop(v), 6) AS value
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["promql_stdvar_agg"] = q_promql_stdvar_agg
ORACLES["promql_stdvar_agg"] = ORACLE_PROMQL_STDVAR_AGG


def q_promql_bottomk_min(spark, sf_dir):
    """PromQL `bottomk(2, min by (...) (min_over_time(...)))` — the
    bottom-k mirror of the gated topk path, exact min picks, (value,
    label) tiebreak."""
    from .bench_promql import _ctx as _pctx
    from .promql.lowering import query_range

    out = query_range(
        _pctx(spark, sf_dir),
        "bottomk(2, min by (service_name) (min_over_time(events_value[1d])))",
    )
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value")
    ).orderBy("bucket", "service_name")


ORACLE_PROMQL_BOTTOMK_MIN = """
WITH m AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         event_type AS service_name, min(value) AS value
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT bucket, service_name, round(value, 6) AS value,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY value ASC, service_name ASC) AS rk
  FROM m
)
SELECT bucket, service_name, value FROM r WHERE rk <= 2
ORDER BY bucket, service_name
"""

QUERIES["promql_bottomk_min"] = q_promql_bottomk_min
ORACLES["promql_bottomk_min"] = ORACLE_PROMQL_BOTTOMK_MIN


def q_promql_sum_without(spark, sf_dir):
    """PromQL `sum without (service_name) (...)`: the without-form
    grouping collapses the only series label, one row per bucket."""
    from .bench_promql import _ctx as _pctx
    from .promql.lowering import query_range

    out = query_range(
        _pctx(spark, sf_dir),
        "sum without (service_name) (increase(events_value[1d]))",
    )
    return out.select("bucket", F.round("value", 6).alias("value")).orderBy(
        "bucket")


ORACLE_PROMQL_SUM_WITHOUT = """
WITH per AS (
  SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS bucket,
         event_type AS service_name,
         max_by(value, ts) - min_by(value, ts) AS inc
  FROM events GROUP BY 1, 2
)
SELECT bucket, round(sum(inc), 6) AS value
FROM per GROUP BY 1 ORDER BY 1
"""

QUERIES["promql_sum_without"] = q_promql_sum_without
ORACLES["promql_sum_without"] = ORACLE_PROMQL_SUM_WITHOUT


def q_orders_priority_weekday_mix(spark, sf_dir):
    """Order volume by (priority, ISO weekday) with within-priority
    share — staffing heatmap, integer counts."""
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy(
        "o_orderpriority",
        (F.expr("weekday(o_orderdate)") + 1).cast("int").alias("isodow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("o_orderpriority")
    return (
        cnt.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 6))
        .orderBy("o_orderpriority", "isodow")
    )


ORACLE_ORDERS_PRIORITY_WEEKDAY_MIX = """
WITH cnt AS (
  SELECT o_orderpriority, CAST(isodow(o_orderdate) AS INT) AS isodow,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, isodow, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY o_orderpriority), 6)
         AS share
FROM cnt ORDER BY 1, 2
"""

QUERIES["orders_priority_weekday_mix"] = q_orders_priority_weekday_mix
ORACLES["orders_priority_weekday_mix"] = ORACLE_ORDERS_PRIORITY_WEEKDAY_MIX


def q_doc_lang_source_matrix(spark, sf_dir):
    """Document counts and mean length per (lang, source) with the
    within-lang share — corpus composition ledger."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    w = Window.partitionBy("lang")
    return (
        cnt.select(
            "lang", "source", "docs",
            F.round(F.col("chars") / F.col("docs"), 6).alias("avg_chars"),
            F.round(F.col("docs") / F.sum("docs").over(w), 6).alias("share"),
        )
        .orderBy("lang", "source")
    )


ORACLE_DOC_LANG_SOURCE_MATRIX = """
WITH cnt AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1, 2
)
SELECT lang, source, docs,
       round(chars * 1.0 / docs, 6) AS avg_chars,
       round(docs * 1.0 / sum(docs) OVER (PARTITION BY lang), 6) AS share
FROM cnt ORDER BY 1, 2
"""

QUERIES["doc_lang_source_matrix"] = q_doc_lang_source_matrix
ORACLES["doc_lang_source_matrix"] = ORACLE_DOC_LANG_SOURCE_MATRIX


def q_event_props_k_distribution(spark, sf_dir):
    """Distribution of the json payload key `k` in decade bands per
    event type — the props column queried as data, integer-exact."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    band = (k / 10).cast("int")
    return (
        e.select("event_type", band.alias("k_decade"))
        .filter(F.col("k_decade").isNotNull())
        .groupBy("event_type", "k_decade")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("event_type", "k_decade")
    )


ORACLE_EVENT_PROPS_K_DISTRIBUTION = """
SELECT event_type,
       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS INT)
         AS k_decade,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["event_props_k_distribution"] = q_event_props_k_distribution
ORACLES["event_props_k_distribution"] = ORACLE_EVENT_PROPS_K_DISTRIBUTION


def q_customer_segment_balance_profile(spark, sf_dir):
    """Per market segment: customer count, mean balance (exact cents),
    and the share with negative balances — credit-risk profile."""
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("customers"),
            F.round(F.sum(cents) / F.count(F.lit(1)) / 100.0, 6)
            .alias("avg_balance"),
            F.round(
                F.sum((cents < 0).cast("long")) / F.count(F.lit(1)), 6
            ).alias("negative_share"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_CUSTOMER_SEGMENT_BALANCE_PROFILE = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS customers,
       round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) * 1.0
             / count(*) / 100.0, 6) AS avg_balance,
       round(sum(CASE WHEN CAST(round(c_acctbal * 100) AS BIGINT) < 0
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS negative_share
FROM customer GROUP BY 1 ORDER BY 1
"""

QUERIES["customer_segment_balance_profile"] = q_customer_segment_balance_profile
ORACLES["customer_segment_balance_profile"] = ORACLE_CUSTOMER_SEGMENT_BALANCE_PROFILE
