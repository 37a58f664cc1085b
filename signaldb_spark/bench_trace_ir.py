"""Driver-gate entries for the trace path and the Query IR pipeline,
expressed over the benchmark tables (lineitem rows play spans of their
order's trace; events carries the IR pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .ir import lower, validate
from .traceql.trace_ops import search

DAY = 86400
_BUCKET = "CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)"


def _spans_view(spark, sf_dir):
    """lineitem-as-spans: order = trace, lineitem = span; unique span id
    and nanosecond start time so truncation ordering is total."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_orderkey").alias("trace_id"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("span_id"),
        (F.col("l_shipdate").cast("timestamp").cast("double") * 1e9)
        .cast("long")
        .alias("start_time_unix_nano"),
        (F.col("l_quantity") * 1e6).cast("long").alias("duration_nanos"),
        F.col("l_shipdate").alias("timestamp"),
    )


def q_trace_search_truncation(spark, sf_dir):
    """Newest-N trace search truncation (trace.rs:534-549, 602-644):
    span-sort DESC before the span limit, then rank traces by their
    most-recent span with id tiebreak, keep 10, return their spans."""
    spans = _spans_view(spark, sf_dir)
    return search(
        spans, [], min_duration_nanos=10_000_000, limit=10, span_limit=500
    )


ORACLE_TRACE_SEARCH = """
WITH spans AS (
  SELECT l_orderkey AS trace_id,
         l_orderkey * 10 + l_linenumber AS span_id,
         CAST(epoch(l_shipdate) * 1e9 AS BIGINT) AS start_time_unix_nano,
         CAST(l_quantity * 1e6 AS BIGINT) AS duration_nanos,
         l_shipdate AS timestamp
  FROM lineitem
  WHERE CAST(l_quantity * 1e6 AS BIGINT) >= 10000000
),
limited AS (
  SELECT * FROM spans
  ORDER BY start_time_unix_nano DESC, span_id DESC
  LIMIT 500
),
ranked AS (
  SELECT trace_id, max(start_time_unix_nano) AS latest
  FROM limited GROUP BY trace_id
  ORDER BY latest DESC, trace_id DESC
  LIMIT 10
)
SELECT l.trace_id, l.span_id, l.start_time_unix_nano, l.duration_nanos, l.timestamp
FROM limited l SEMI JOIN ranked r ON l.trace_id = r.trace_id
"""


def q_ir_agg_pipeline(spark, sf_dir):
    """IR end-to-end: predicate tree (and/or/not) → bucketed aggregate →
    projection, through validate() + lower()."""
    e = load_table(spark, sf_dir, "events").withColumnRenamed("ts", "timestamp")
    doc = {
        "version": 1,
        "from": "events",
        "where": {
            "and": [
                {"field": "value", "op": "gte", "value": 10},
                {
                    "or": [
                        {"field": "event_type", "op": "eq", "value": "purchase"},
                        {"field": "event_type", "op": "eq", "value": "click"},
                    ]
                },
                {"not": {"field": "user_id", "op": "eq", "value": 0}},
            ]
        },
        "aggregate": {"op": "count", "by": ["event_type"], "step_seconds": DAY},
    }
    return lower(e, validate(doc))


ORACLE_IR_AGG = f"""
SELECT {_BUCKET} AS bucket, event_type, CAST(count(*) AS DOUBLE) AS value
FROM events
WHERE value >= 10
  AND (event_type = 'purchase' OR event_type = 'click')
  AND NOT (user_id = 0)
GROUP BY 1, 2
"""


def q_ir_extract_rank(spark, sf_dir):
    """IR extract stage (json → typed field) + filter + avg + topk."""
    e = load_table(spark, sf_dir, "events").withColumnRenamed("ts", "timestamp")
    doc = {
        "version": 1,
        "from": "events",
        "extract": [{"field": "k", "parser": "json", "source": "props", "type": "long"}],
        "where": {"field": "k", "op": "gte", "value": 50},
        "aggregate": {"op": "avg", "by": ["event_type"], "value_field": "k"},
        "rank": {"kind": "topk", "k": 3, "value": "value"},
    }
    out = lower(e, validate(doc))
    return out.select("event_type", F.round("value", 6).alias("value"))


ORACLE_IR_EXTRACT_RANK = """
WITH t AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
),
agg AS (
  SELECT event_type, avg(k) AS value FROM t WHERE k >= 50 GROUP BY event_type
)
SELECT event_type, round(value, 6) AS value
FROM agg ORDER BY value DESC, event_type ASC LIMIT 3
"""


QUERIES = {
    "trace_search_truncation": q_trace_search_truncation,
    "ir_agg_pipeline": q_ir_agg_pipeline,
    "ir_extract_rank": q_ir_extract_rank,
}

ORACLES = {
    "trace_search_truncation": ORACLE_TRACE_SEARCH,
    "ir_agg_pipeline": ORACLE_IR_AGG,
    "ir_extract_rank": ORACLE_IR_EXTRACT_RANK,
}


def q_flamegraph_rollup(spark, sf_dir):
    """Flamegraph prefix-rollup under the gate: stacks are
    [region, nation] paths weighted by revenue — every prefix gets the
    summed weight of its subtree (operators/profiles.flamegraph
    semantics expressed over the star schema)."""
    import json

    from .operators.profiles import flamegraph

    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # one "profile" row per order: a single stack with the order's price
    profiles = j.select(
        F.to_json(F.array(F.array("r_name", "n_name"))).alias("stacktraces_json"),
        F.to_json(
            F.array(
                F.struct(
                    F.lit(0).alias("stacktrace_idx"),
                    F.round("o_totalprice", 0).cast("long").alias("value"),
                )
            )
        ).alias("samples_json"),
    )
    out = flamegraph(profiles)
    return out.select("path", "depth", "frame", "value")


ORACLE_FLAMEGRAPH = """
WITH j AS (
  SELECT r_name, n_name, CAST(round(o_totalprice, 0) AS BIGINT) AS w
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT r_name AS path, 1 AS depth, r_name AS frame, sum(w) AS value
FROM j GROUP BY r_name
UNION ALL
SELECT r_name || ';' || n_name AS path, 2 AS depth, n_name AS frame, sum(w) AS value
FROM j GROUP BY r_name, n_name
"""

QUERIES["flamegraph_rollup"] = q_flamegraph_rollup
ORACLES["flamegraph_rollup"] = ORACLE_FLAMEGRAPH


def q_span_event_filter(spark, sf_dir):
    """Span-event predicate over the persisted events array
    (storage-layout.md:335, flight/schema.rs:57-68): lineitem-as-spans
    where each span carries a [message, exception|log] event list; keep
    spans with an `exception` event whose linestatus attribute is O,
    then surface the matching event's fields."""
    from .traceql.trace_ops import filter_by_event

    l = load_table(spark, sf_dir, "lineitem")
    ts = (F.col("l_orderkey") * 1000 + F.col("l_linenumber")).cast("long")
    events = F.array(
        F.struct(
            F.lit("message").alias("name"),
            ts.alias("timestamp_unix_nano"),
            F.create_map(F.lit("linestatus"), F.col("l_linestatus")).alias("attributes"),
        ),
        F.struct(
            F.when(F.col("l_returnflag") == "R", F.lit("exception"))
            .otherwise(F.lit("log"))
            .alias("name"),
            (ts + 1).alias("timestamp_unix_nano"),
            F.create_map(F.lit("linestatus"), F.col("l_linestatus")).alias("attributes"),
        ),
    )
    spans = l.select(
        F.col("l_orderkey").alias("trace_id"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("span_id"),
        events.alias("events"),
    )
    matched = filter_by_event(spans, name="exception", attr_key="linestatus", attr_value="O")
    return (
        matched.select("trace_id", "span_id", F.explode("events").alias("e"))
        .filter(F.col("e.name") == "exception")
        .select(
            "trace_id",
            "span_id",
            F.col("e.name").alias("event_name"),
            F.col("e.timestamp_unix_nano").alias("event_ts"),
            F.col("e.attributes")["linestatus"].alias("linestatus"),
        )
    )


ORACLE_SPAN_EVENT_FILTER = """
SELECT l_orderkey AS trace_id,
       l_orderkey * 10 + l_linenumber AS span_id,
       'exception' AS event_name,
       CAST(l_orderkey * 1000 + l_linenumber + 1 AS BIGINT) AS event_ts,
       l_linestatus AS linestatus
FROM lineitem
WHERE l_returnflag = 'R' AND l_linestatus = 'O'
"""

QUERIES["span_event_filter"] = q_span_event_filter
ORACLES["span_event_filter"] = ORACLE_SPAN_EVENT_FILTER
