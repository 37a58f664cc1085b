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


def q_trace_search_regex(spark, sf_dir):
    """Widened TraceQL grammar end-to-end (beyond-parity: the reference
    rejects ||, !=, regex, range and duration matchers,
    search_filter.rs:234-330): one string parses to a DNF of regex +
    numeric-range + duration + negation predicates, lowered to ONE scan
    + one filter, then the standard newest-N truncation."""
    from .traceql.trace_ops import search_traceql

    l = load_table(spark, sf_dir, "lineitem")
    spans = l.select(
        F.col("l_orderkey").alias("trace_id"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("span_id"),
        F.concat(
            F.lit("ship-"), F.col("l_returnflag"), F.lit("-"), F.col("l_linestatus")
        ).alias("span_name"),
        F.col("l_linestatus").alias("service_name"),
        (F.col("l_shipdate").cast("timestamp").cast("double") * 1e9)
        .cast("long")
        .alias("start_time_unix_nano"),
        (F.col("l_quantity") * 1e6).cast("long").alias("duration_nanos"),
        F.col("l_shipdate").alias("timestamp"),
        F.create_map(
            F.lit("qty"), F.col("l_quantity").cast("string")
        ).alias("span_attributes"),
        F.create_map(F.lit("flag"), F.col("l_returnflag")).alias(
            "resource_attributes"
        ),
    )
    q = (
        '{ name =~ "ship-[AR].*" && span.qty >= 30 && duration >= 10ms }'
        ' || { resource.flag = "N" && name != "ship-N-O" }'
    )
    return search_traceql(spans, q, limit=12, span_limit=400)


ORACLE_TRACE_SEARCH_REGEX = """
WITH spans AS (
  SELECT l_orderkey AS trace_id,
         l_orderkey * 10 + l_linenumber AS span_id,
         'ship-' || l_returnflag || '-' || l_linestatus AS span_name,
         l_linestatus AS service_name,
         CAST(epoch(l_shipdate) * 1e9 AS BIGINT) AS start_time_unix_nano,
         CAST(l_quantity * 1e6 AS BIGINT) AS duration_nanos,
         l_shipdate AS timestamp,
         CAST(l_quantity AS DOUBLE) AS qty,
         l_returnflag AS flag
  FROM lineitem
),
filtered AS (
  SELECT * FROM spans
  WHERE (regexp_matches(span_name, '^(?:ship-[AR].*)$')
         AND qty >= 30 AND duration_nanos >= 10000000)
     OR (flag = 'N' AND span_name <> 'ship-N-O')
),
limited AS (
  SELECT trace_id, span_id, span_name, service_name,
         start_time_unix_nano, duration_nanos, timestamp
  FROM filtered ORDER BY start_time_unix_nano DESC, span_id DESC LIMIT 400
),
ranked AS (
  SELECT trace_id, max(start_time_unix_nano) AS latest
  FROM limited GROUP BY trace_id
  ORDER BY latest DESC, trace_id DESC LIMIT 12
)
SELECT l.* FROM limited l SEMI JOIN ranked r ON l.trace_id = r.trace_id
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
    "trace_search_regex": q_trace_search_regex,
    "ir_agg_pipeline": q_ir_agg_pipeline,
    "ir_extract_rank": q_ir_extract_rank,
}

ORACLES = {
    "trace_search_truncation": ORACLE_TRACE_SEARCH,
    "trace_search_regex": ORACLE_TRACE_SEARCH_REGEX,
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
SELECT r_name AS path, 1 AS depth, r_name AS frame, CAST(sum(w) AS BIGINT) AS value
FROM j GROUP BY r_name
UNION ALL
SELECT r_name || ';' || n_name AS path, 2 AS depth, n_name AS frame, CAST(sum(w) AS BIGINT) AS value
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
    from .traceql.trace_ops import explode_matching_events

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
    matched = explode_matching_events(
        spans, name="exception", attr_key="linestatus", attr_value="O"
    )
    return matched.select(
        "trace_id",
        "span_id",
        F.col("event.name").alias("event_name"),
        F.col("event.timestamp_unix_nano").alias("event_ts"),
        F.col("event.attributes")["linestatus"].alias("linestatus"),
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


def _tree_spans(spark, sf_dir):
    """lineitem-as-spans with a binary-tree hierarchy: line n's parent is
    line n//2 (line 1 is the root), so traces are up to 3 levels deep and
    sibling pairs exist — exercises every structural relation. The
    synthetic lineitem has duplicate (orderkey, linenumber) keys, so the
    view aggregates to one span per key (deterministic min/max) to keep
    span_id unique within each trace."""
    l = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber")
    # One exchange for the whole family (guide §2.4 "share one
    # exchange"): hash-partition by l_orderkey BEFORE the per-span
    # dedup aggregate. HashPartitioning(l_orderkey) satisfies the
    # dedup's ClusteredDistribution(l_orderkey, l_linenumber) AND —
    # through the alias-aware projection to trace_id — every downstream
    # structural operator's per-trace groupBy/window, so the span table
    # is shuffled once instead of twice in all 12 consumers of this
    # view. At 100 TB the removed exchange carries the whole span table.
    return (
        l.repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.min("l_returnflag").alias("flag"),
            F.min("l_linestatus").alias("status"),
            F.max(F.col("l_quantity").cast("double")).alias("qty"),
        )
        .select(
            F.col("l_orderkey").alias("trace_id"),
            (F.col("l_orderkey") * 10 + ln).alias("span_id"),
            F.when(ln > 1, F.col("l_orderkey") * 10 + F.floor(ln / 2)).alias(
                "parent_span_id"
            ),
            "flag",
            "status",
            "qty",
        )
    )


_TREE_SPANS_SQL = """
  SELECT l_orderkey AS trace_id,
         l_orderkey * 10 + l_linenumber AS span_id,
         CASE WHEN l_linenumber > 1
              THEN l_orderkey * 10 + l_linenumber // 2 END AS parent_span_id,
         min(l_returnflag) AS flag, min(l_linestatus) AS status,
         max(CAST(l_quantity AS DOUBLE)) AS qty
  FROM lineitem
  GROUP BY l_orderkey, l_linenumber
"""


def q_trace_child_spans(spark, sf_dir):
    """TraceQL `{ qty > 30 } > { flag = R }`: direct-child semi-join
    (structural.child_spans; beyond-reference — search_filter.rs:240
    rejects multi-spanset queries)."""
    from .traceql.structural import child_spans

    spans = _tree_spans(spark, sf_dir)
    return child_spans(spans, F.col("qty") > 30, F.col("flag") == "R")


ORACLE_TRACE_CHILD = f"""
WITH spans AS ({_TREE_SPANS_SQL})
SELECT c.* FROM spans c
WHERE c.flag = 'R' AND EXISTS (
  SELECT 1 FROM spans p
  WHERE p.trace_id = c.trace_id AND p.span_id = c.parent_span_id
    AND p.qty > 30)
"""


def q_trace_descendant_spans(spark, sf_dir):
    """TraceQL `{ flag = R && qty > 40 } >> { status = O }`: transitive
    ancestor test via the per-trace JVM pointer-chase
    (structural.descendant_spans); oracle walks the same links with a
    recursive CTE."""
    from .traceql.structural import descendant_spans

    spans = _tree_spans(spark, sf_dir)
    # the binary-tree view is provably <= 3 links deep (line n's parent is
    # n//2, n <= 7): a depth-4 unroll is exact and 4x cheaper than the
    # operator's general-purpose default of 16
    return descendant_spans(
        spans, (F.col("flag") == "R") & (F.col("qty") > 40), F.col("status") == "O",
        max_depth=4,
    )


ORACLE_TRACE_DESCENDANT = f"""
WITH RECURSIVE spans AS ({_TREE_SPANS_SQL}),
up AS (
  SELECT trace_id, span_id, parent_span_id AS anc FROM spans
  WHERE parent_span_id IS NOT NULL
  UNION ALL
  SELECT u.trace_id, u.span_id, s.parent_span_id
  FROM up u JOIN spans s ON s.trace_id = u.trace_id AND s.span_id = u.anc
  WHERE s.parent_span_id IS NOT NULL
)
SELECT d.* FROM spans d
WHERE d.status = 'O' AND EXISTS (
  SELECT 1 FROM up u JOIN spans a
    ON a.trace_id = u.trace_id AND a.span_id = u.anc
  WHERE u.trace_id = d.trace_id AND u.span_id = d.span_id
    AND a.flag = 'R' AND a.qty > 40)
"""


def q_trace_sibling_spans(spark, sf_dir):
    """TraceQL `{ flag = A } ~ { status = O }`: same-parent different-span
    semi-join (structural.sibling_spans)."""
    from .traceql.structural import sibling_spans

    spans = _tree_spans(spark, sf_dir)
    return sibling_spans(spans, F.col("flag") == "A", F.col("status") == "O")


ORACLE_TRACE_SIBLING = f"""
WITH spans AS ({_TREE_SPANS_SQL})
SELECT r.* FROM spans r
WHERE r.status = 'O' AND r.parent_span_id IS NOT NULL AND EXISTS (
  SELECT 1 FROM spans l
  WHERE l.trace_id = r.trace_id AND l.parent_span_id = r.parent_span_id
    AND l.span_id != r.span_id AND l.flag = 'A')
"""

QUERIES["trace_child_spans"] = q_trace_child_spans
QUERIES["trace_descendant_spans"] = q_trace_descendant_spans
QUERIES["trace_sibling_spans"] = q_trace_sibling_spans
ORACLES["trace_child_spans"] = ORACLE_TRACE_CHILD
ORACLES["trace_descendant_spans"] = ORACLE_TRACE_DESCENDANT
ORACLES["trace_sibling_spans"] = ORACLE_TRACE_SIBLING


def q_trace_tag_values(spark, sf_dir):
    """Tempo tag-value discovery: distinct non-empty values of an
    unscoped attribute, sorted, capped (trace_ops.tag_values;
    tempo-api-reference.md:26,45)."""
    from .traceql.trace_ops import tag_values

    l = load_table(spark, sf_dir, "lineitem")
    spans = l.select(
        F.col("l_orderkey").alias("trace_id"),
        F.create_map(F.lit("flag"), F.col("l_returnflag")).alias("span_attributes"),
        F.create_map(F.lit("status"), F.col("l_linestatus")).alias(
            "resource_attributes"
        ),
    )
    return tag_values(spans, "unscoped", "flag", cap=1000)


ORACLE_TRACE_TAG_VALUES = """
SELECT DISTINCT l_returnflag AS value
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_returnflag <> ''
ORDER BY value LIMIT 1000
"""

QUERIES["trace_tag_values"] = q_trace_tag_values
ORACLES["trace_tag_values"] = ORACLE_TRACE_TAG_VALUES


def q_trace_tag_names(spark, sf_dir):
    """Tempo tag-name discovery: unscoped union of span + resource
    attribute keys plus the service.name intrinsic, sorted, capped
    (trace_ops.tag_names; tempo-api-reference.md:26)."""
    from .traceql.trace_ops import tag_names

    l = load_table(spark, sf_dir, "lineitem")
    spans = l.select(
        F.col("l_orderkey").alias("trace_id"),
        F.create_map(F.lit("flag"), F.col("l_returnflag")).alias("span_attributes"),
        F.create_map(F.lit("status"), F.col("l_linestatus")).alias(
            "resource_attributes"
        ),
    )
    return tag_names(spans, "unscoped", cap=1000)


ORACLE_TRACE_TAG_NAMES = """
SELECT 'flag' AS name UNION ALL SELECT 'service.name' UNION ALL SELECT 'status'
ORDER BY 1
"""

QUERIES["trace_tag_names"] = q_trace_tag_names
ORACLES["trace_tag_names"] = ORACLE_TRACE_TAG_NAMES


def q_flamegraph_diff(spark, sf_dir):
    """Differential flamegraph: 1994 vs 1995 order revenue over
    [region, nation] stacks — single pass, window tag rides the prefix
    explode so no two-flamegraph join (operators/profiles.flamegraph_diff,
    beyond-reference compare view)."""
    from .operators.profiles import flamegraph_diff

    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    profiles = j.select(
        F.col("o_orderdate").cast("timestamp").alias("timestamp"),
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
    return flamegraph_diff(
        profiles,
        "1994-01-01 00:00:00", "1994-12-31 23:59:59",
        "1995-01-01 00:00:00", "1995-12-31 23:59:59",
    )


ORACLE_FLAMEGRAPH_DIFF = """
WITH j AS (
  SELECT r_name, n_name, CAST(round(o_totalprice, 0) AS BIGINT) AS w,
         CASE WHEN o_orderdate >= '1995-01-01' THEN 1 ELSE 0 END AS wc
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE o_orderdate >= '1994-01-01' AND o_orderdate < '1996-01-01'
),
p AS (
  SELECT r_name AS path, 1 AS depth, r_name AS frame, w, wc FROM j
  UNION ALL
  SELECT r_name || ';' || n_name, 2, n_name, w, wc FROM j
)
SELECT path, depth, frame,
       CAST(sum(CASE WHEN wc = 0 THEN w ELSE 0 END) AS BIGINT) AS base_value,
       CAST(sum(CASE WHEN wc = 1 THEN w ELSE 0 END) AS BIGINT) AS comp_value,
       CAST(sum(CASE WHEN wc = 1 THEN w ELSE 0 END)
         - sum(CASE WHEN wc = 0 THEN w ELSE 0 END) AS BIGINT) AS delta
FROM p GROUP BY 1, 2, 3
"""

QUERIES["flamegraph_diff"] = q_flamegraph_diff
ORACLES["flamegraph_diff"] = ORACLE_FLAMEGRAPH_DIFF


def q_trace_spanset_agg(spark, sf_dir):
    """Tempo spanset aggregate filter `{ flag = "R" } | avg(qty) > 25`
    (structural.spanset_aggregate): per-trace aggregate over matching
    spans, one window over trace_id, no join-back."""
    from .traceql.structural import spanset_aggregate

    spans = _tree_spans(spark, sf_dir)
    out = spanset_aggregate(
        spans, F.col("flag") == "R", "avg", ">", 25.0, agg_col="qty"
    )
    return out.select(*spans.columns)


ORACLE_TRACE_SPANSET_AGG = f"""
WITH spans AS ({_TREE_SPANS_SQL}),
f AS (
  SELECT *, avg(qty) OVER (PARTITION BY trace_id) AS a
  FROM spans WHERE flag = 'R'
)
SELECT trace_id, span_id, parent_span_id, flag, status, qty
FROM f WHERE a > 25.0
"""

QUERIES["trace_spanset_agg"] = q_trace_spanset_agg
ORACLES["trace_spanset_agg"] = ORACLE_TRACE_SPANSET_AGG


def _profiles_discovery_view(spark, sf_dir):
    """Orders-as-profiles: priority plays sample_type, status plays the
    attribute map's 'status' key — exercises the column route AND the
    map route of the discovery endpoints."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderpriority").alias("sample_type"),
        F.lit("count").alias("sample_unit"),
        F.col("o_custkey").cast("string").alias("service_name"),
        F.create_map(
            F.lit("status"), F.col("o_orderstatus"),
        ).alias("profile_attributes"),
    )


def q_profile_types(spark, sf_dir):
    """/pyroscope/profile-types (profiles.profile_types)."""
    from .operators.profiles import profile_types

    return profile_types(_profiles_discovery_view(spark, sf_dir))


ORACLE_PROFILE_TYPES = """
SELECT DISTINCT o_orderpriority || ':count' AS profile_type
FROM orders WHERE o_orderpriority IS NOT NULL AND o_orderpriority != ''
ORDER BY 1 LIMIT 1000
"""


def q_profile_label_values(spark, sf_dir):
    """/pyroscope/label-values?label=status — attribute-map route
    (profiles.profile_label_values)."""
    from .operators.profiles import profile_label_values

    return profile_label_values(_profiles_discovery_view(spark, sf_dir), "status")


ORACLE_PROFILE_LABEL_VALUES = """
SELECT DISTINCT o_orderstatus AS value
FROM orders WHERE o_orderstatus IS NOT NULL AND o_orderstatus != ''
ORDER BY 1 LIMIT 1000
"""

QUERIES["profile_types"] = q_profile_types
ORACLES["profile_types"] = ORACLE_PROFILE_TYPES
QUERIES["profile_label_values"] = q_profile_label_values
ORACLES["profile_label_values"] = ORACLE_PROFILE_LABEL_VALUES


_WEEK = 7 * 86400


def q_trace_metrics_rate(spark, sf_dir):
    """TraceQL metrics `{duration >= 25ms} | rate()` per 7-day bucket
    (trace_ops.metrics_rate) — beyond the reference, whose Tempo metrics
    endpoints answer 501 (tempo.rs:1284-1304)."""
    from .traceql.trace_ops import metrics_rate

    spans = _spans_view(spark, sf_dir)
    out = metrics_rate(
        spans, F.col("duration_nanos") >= 25_000_000, _WEEK
    )
    return out.select("bucket", F.round("value", 9).alias("value"))


ORACLE_TRACE_METRICS_RATE = """
SELECT CAST(floor(epoch(l_shipdate) / 604800) * 604800 AS BIGINT) AS bucket,
       round(count(*) / 604800.0, 9) AS value
FROM lineitem
WHERE CAST(l_quantity * 1e6 AS BIGINT) >= 25000000
GROUP BY 1
"""


def q_trace_metrics_p90(spark, sf_dir):
    """TraceQL metrics `{} | quantile_over_time(duration, .9)` per 7-day
    bucket (trace_ops.metrics_quantile)."""
    from .traceql.trace_ops import metrics_quantile

    spans = _spans_view(spark, sf_dir)
    out = metrics_quantile(spans, F.lit(True), _WEEK, 0.9)
    return out.select("bucket", F.round("value", 6).alias("value"))


ORACLE_TRACE_METRICS_P90 = """
SELECT CAST(floor(epoch(l_shipdate) / 604800) * 604800 AS BIGINT) AS bucket,
       round(quantile_cont(CAST(CAST(l_quantity * 1e6 AS BIGINT) AS DOUBLE), 0.9), 6) AS value
FROM lineitem
GROUP BY 1
"""

QUERIES["trace_metrics_rate"] = q_trace_metrics_rate
ORACLES["trace_metrics_rate"] = ORACLE_TRACE_METRICS_RATE
QUERIES["trace_metrics_p90"] = q_trace_metrics_p90
ORACLES["trace_metrics_p90"] = ORACLE_TRACE_METRICS_P90


def q_trace_descendant_closure(spark, sf_dir):
    """The unbounded-depth applyInPandas descendant fallback
    (structural.descendant_spans_closure) under the SAME recursive-CTE
    oracle as the JVM pointer-chase — the Arrow-batched Python path must
    agree bit-for-bit."""
    from .traceql.structural import descendant_spans_closure

    spans = _tree_spans(spark, sf_dir)
    return descendant_spans_closure(
        spans, (F.col("flag") == "R") & (F.col("qty") > 40), F.col("status") == "O"
    )


QUERIES["trace_descendant_closure"] = q_trace_descendant_closure
ORACLES["trace_descendant_closure"] = ORACLE_TRACE_DESCENDANT


def q_service_graph(spark, sf_dir):
    """Service-map edges (trace_ops.service_graph): lineitem-as-spans
    with flag as the service — parent/child pairs crossing a "service"
    boundary, exact p50/p99 of server-side duration."""
    from .traceql.trace_ops import service_graph

    spans = _tree_spans(spark, sf_dir).select(
        "trace_id", "span_id", "parent_span_id",
        F.col("flag").alias("service_name"),
        (F.col("qty") * 1e6).cast("long").alias("duration_nanos"),
    )
    return service_graph(spans)


ORACLE_SERVICE_GRAPH = f"""
WITH spans AS ({_TREE_SPANS_SQL}),
svc AS (
  SELECT trace_id, span_id, parent_span_id, flag AS service_name,
         CAST(qty * 1e6 AS BIGINT) AS duration_nanos
  FROM spans
),
edges AS (
  SELECT p.service_name AS client, c.service_name AS server,
         CAST(c.duration_nanos AS DOUBLE) AS d
  FROM svc c JOIN svc p
    ON p.trace_id = c.trace_id AND p.span_id = c.parent_span_id
  WHERE p.service_name != c.service_name
)
SELECT client, server, CAST(count(*) AS BIGINT) AS calls,
       round(quantile_cont(d, 0.5), 6) AS p50_duration,
       round(quantile_cont(d, 0.99), 6) AS p99_duration
FROM edges GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["service_graph"] = q_service_graph
ORACLES["service_graph"] = ORACLE_SERVICE_GRAPH


def q_trace_critical_path(spark, sf_dir):
    """Per-trace critical path (structural.critical_path): deepest
    cumulative-duration ancestor chain; recursive-CTE oracle."""
    from .traceql.structural import critical_path

    spans = _tree_spans(spark, sf_dir).select(
        "trace_id", "span_id", "parent_span_id",
        (F.col("qty") * 1e6).cast("long").alias("duration_nanos"),
    )
    # the fixture is a <=3-level binary tree (line n's parent is n//2,
    # linenumber 1..7), so depth 4 bounds every ancestor chain — the
    # default 16-deep unrolled probe chase would run 4x the map lookups
    # per span for identical results (same bound the descendant-spans
    # gate already passes)
    return critical_path(spans, max_depth=4)


ORACLE_TRACE_CRITICAL_PATH = f"""
WITH RECURSIVE spans AS ({_TREE_SPANS_SQL}),
svc AS (
  SELECT trace_id, span_id, parent_span_id,
         CAST(qty * 1e6 AS BIGINT) AS d
  FROM spans
),
walk(trace_id, span_id, anc, total) AS (
  SELECT trace_id, span_id, parent_span_id, d FROM svc
  UNION ALL
  SELECT w.trace_id, w.span_id, s.parent_span_id, w.total + s.d
  FROM walk w JOIN svc s ON s.trace_id = w.trace_id AND s.span_id = w.anc
),
sums AS (
  SELECT trace_id, span_id, max(total) AS path FROM walk GROUP BY 1, 2
)
SELECT trace_id, span_id AS critical_span_id, path AS critical_path_nanos
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY trace_id ORDER BY path DESC, span_id DESC) AS rn
  FROM sums
) WHERE rn = 1
"""

QUERIES["trace_critical_path"] = q_trace_critical_path
ORACLES["trace_critical_path"] = ORACLE_TRACE_CRITICAL_PATH


def q_red_metrics(spark, sf_dir):
    """RED metrics (trace_ops.red_metrics): per 7-day bucket per
    "service" (flag), request rate + error ratio (status='F') + exact
    duration percentiles, one aggregation."""
    from .traceql.trace_ops import red_metrics

    spans = _tree_spans(spark, sf_dir).select(
        "trace_id", "span_id", F.col("flag").alias("service_name"),
        (F.col("qty") * 1e6).cast("long").alias("duration_nanos"),
        F.col("status"),
    ).join(
        _spans_view(spark, sf_dir).select("span_id", "timestamp"), "span_id"
    )
    return red_metrics(
        spans, _WEEK, error_cond=F.col("status") == "F"
    ).select(
        "bucket", "service", "requests", F.round("rate", 9).alias("rate"),
        "errors", "error_ratio", "p50_duration", "p99_duration",
    )


ORACLE_RED_METRICS = f"""
WITH spans AS ({_TREE_SPANS_SQL}),
tsv AS (
  SELECT l_orderkey * 10 + l_linenumber AS span_id, l_shipdate AS timestamp
  FROM lineitem
),
svc AS (
  SELECT CAST(floor(epoch(t.timestamp) / 604800) * 604800 AS BIGINT) AS bucket,
         s.flag AS service,
         CAST(CAST(s.qty * 1e6 AS BIGINT) AS DOUBLE) AS d,
         CASE WHEN s.status = 'F' THEN 1 ELSE 0 END AS err
  FROM spans s JOIN tsv t ON t.span_id = s.span_id
)
SELECT bucket, service, CAST(count(*) AS BIGINT) AS requests,
       round(count(*) / 604800.0, 9) AS rate,
       CAST(sum(err) AS BIGINT) AS errors,
       round(sum(err) / CAST(count(*) AS DOUBLE), 6) AS error_ratio,
       round(quantile_cont(d, 0.5), 6) AS p50_duration,
       round(quantile_cont(d, 0.99), 6) AS p99_duration
FROM svc GROUP BY 1, 2
"""

QUERIES["red_metrics"] = q_red_metrics
ORACLES["red_metrics"] = ORACLE_RED_METRICS


def q_trace_tail_sample(spark, sf_dir):
    """Tail sampling (trace_ops.tail_sample): keep whole traces that
    contain an error span (status 'F') or whose wall duration reaches
    40ms; all spans of kept traces survive."""
    from .traceql.trace_ops import tail_sample

    spans = _spans_view(spark, sf_dir).join(
        _tree_spans(spark, sf_dir).select("span_id", "status"), "span_id"
    )
    return tail_sample(
        spans, error_cond=F.col("status") == "F",
        min_trace_duration_nanos=40_000_000,
    ).select("trace_id", "span_id", "duration_nanos", "status")


ORACLE_TRACE_TAIL_SAMPLE = f"""
WITH tree AS ({_TREE_SPANS_SQL}),
spans AS (
  SELECT l.l_orderkey AS trace_id,
         l.l_orderkey * 10 + l.l_linenumber AS span_id,
         CAST(epoch(l.l_shipdate) * 1e9 AS BIGINT) AS start_time_unix_nano,
         CAST(l.l_quantity * 1e6 AS BIGINT) AS duration_nanos,
         t.status
  FROM lineitem l JOIN tree t ON t.span_id = l.l_orderkey * 10 + l.l_linenumber
),
verdict AS (
  SELECT trace_id,
         max(CASE WHEN status = 'F' THEN 1 ELSE 0 END) AS err,
         max(start_time_unix_nano + duration_nanos) - min(start_time_unix_nano) AS dur
  FROM spans GROUP BY 1
)
SELECT s.trace_id, s.span_id, s.duration_nanos, s.status
FROM spans s JOIN verdict v ON v.trace_id = s.trace_id
WHERE v.err = 1 OR v.dur >= 40000000
"""

QUERIES["trace_tail_sample"] = q_trace_tail_sample
ORACLES["trace_tail_sample"] = ORACLE_TRACE_TAIL_SAMPLE


def q_trace_linked(spark, sf_dir):
    """Span-link pivot (trace_ops.linked_traces): every non-root span
    links back to its trace's ROOT span in a sibling "workflow" trace
    (id+5000000) — the at-rest array<struct> link shape synthesized
    identically in the oracle."""
    from .traceql.trace_ops import linked_traces

    spans = _tree_spans(spark, sf_dir)
    with_links = spans.select(
        F.col("trace_id").cast("string").alias("trace_id"),
        F.col("span_id").cast("string").alias("span_id"),
        F.when(
            F.col("parent_span_id").isNotNull(),
            F.array(
                F.struct(
                    (F.col("trace_id") + 5000000).cast("string").alias("trace_id"),
                    (F.col("trace_id") * 10 + 1).cast("string").alias("span_id"),
                )
            ),
        ).otherwise(F.array().cast("array<struct<trace_id:string,span_id:string>>"))
        .alias("links"),
    )
    return linked_traces(with_links, cap=10000)


ORACLE_TRACE_LINKED = f"""
WITH spans AS ({_TREE_SPANS_SQL})
SELECT CAST(trace_id AS VARCHAR) AS trace_id,
       CAST(span_id AS VARCHAR) AS span_id,
       CAST(trace_id + 5000000 AS VARCHAR) AS linked_trace_id,
       CAST(trace_id * 10 + 1 AS VARCHAR) AS linked_span_id
FROM spans WHERE parent_span_id IS NOT NULL
ORDER BY 1, 2, 3, 4 LIMIT 10000
"""

QUERIES["trace_linked"] = q_trace_linked
ORACLES["trace_linked"] = ORACLE_TRACE_LINKED


def q_profile_self_time(spark, sf_dir):
    """Self-vs-cumulative flamegraph (profiles.flamegraph_self): each
    order contributes a [region, nation] stack (full price) AND a
    root-only [region] stack (orderkey%100), so region rows carry
    non-zero self time distinct from their subtree sum."""
    from .operators.profiles import flamegraph_self

    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # one profile ROW per (region, nation) with batched sample weights —
    # the shape real pprof ingestion produces (many samples per profile
    # document), not one row per order
    agg = j.groupBy("r_name", "n_name").agg(
        F.sum(F.round("o_totalprice", 0).cast("long")).alias("w"),
        F.sum((F.col("o_orderkey") % 100).cast("long")).alias("w2"),
    )
    profiles = agg.select(
        F.to_json(
            F.array(F.array("r_name", "n_name"), F.array("r_name"))
        ).alias("stacktraces_json"),
        F.to_json(
            F.array(
                F.struct(F.lit(0).alias("stacktrace_idx"), F.col("w").alias("value")),
                F.struct(F.lit(1).alias("stacktrace_idx"), F.col("w2").alias("value")),
            )
        ).alias("samples_json"),
    )
    out = flamegraph_self(profiles)
    return out.select("path", "depth", "frame", "value", "value_self")


ORACLE_PROFILE_SELF_TIME = """
WITH j AS (
  SELECT r_name, n_name,
         CAST(round(o_totalprice, 0) AS BIGINT) AS w,
         CAST(o_orderkey % 100 AS BIGINT) AS w2
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT r_name AS path, 1 AS depth, r_name AS frame,
       CAST(sum(w) + sum(w2) AS BIGINT) AS value, CAST(sum(w2) AS BIGINT) AS value_self
FROM j GROUP BY r_name
UNION ALL
SELECT r_name || ';' || n_name AS path, 2 AS depth, n_name AS frame,
       CAST(sum(w) AS BIGINT) AS value, CAST(sum(w) AS BIGINT) AS value_self
FROM j GROUP BY r_name, n_name
"""

QUERIES["profile_self_time"] = q_profile_self_time
ORACLES["profile_self_time"] = ORACLE_PROFILE_SELF_TIME


def q_ir_correlate(spark, sf_dir):
    """IR cross-signal correlate stage (the reference's roadmap item,
    querying-ir.md): purchases LEFT-join a per-user click profile on
    user_id, then a bucketed sum over the carried column — the IR as a
    two-source DAG."""
    e = load_table(spark, sf_dir, "events").withColumnRenamed("ts", "timestamp")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("clicks"))
    )
    doc = {
        "version": 1,
        "from": "events",
        "where": {"field": "event_type", "op": "eq", "value": "purchase"},
        "correlate": {
            "with": "user_clicks", "on": ["user_id"],
            "type": "left", "select": ["clicks"],
        },
        "aggregate": {"op": "sum", "step_seconds": DAY, "value_field": "r_clicks"},
    }
    return lower(e, validate(doc), correlate_df=clicks)


ORACLE_IR_CORRELATE = f"""
WITH uc AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT {_BUCKET} AS bucket, CAST(sum(uc.clicks) AS BIGINT) AS value
FROM events e LEFT JOIN uc USING (user_id)
WHERE e.event_type = 'purchase'
GROUP BY 1
"""

QUERIES["ir_correlate"] = q_ir_correlate
ORACLES["ir_correlate"] = ORACLE_IR_CORRELATE


def q_ir_match(spark, sf_dir):
    """IR structural `match` stage (the reference's roadmap item,
    querying-ir.md): direct-child relation with BOTH sides as IR
    predicate trees, then a bucketless count aggregate by flag."""
    doc = {
        "version": 1,
        "from": "traces",
        "match": {
            "op": ">",
            "left": {"field": "qty", "op": "gt", "value": 30},
            "right": {"field": "flag", "op": "eq", "value": "R"},
        },
        "aggregate": {"op": "count", "by": ["status"]},
    }
    return lower(_tree_spans(spark, sf_dir), validate(doc))


ORACLE_IR_MATCH = f"""
WITH spans AS ({_TREE_SPANS_SQL}),
matched AS (
  SELECT c.* FROM spans c
  WHERE c.flag = 'R' AND EXISTS (
    SELECT 1 FROM spans p
    WHERE p.trace_id = c.trace_id AND p.span_id = c.parent_span_id
      AND p.qty > 30)
)
SELECT status, CAST(count(*) AS DOUBLE) AS value
FROM matched GROUP BY 1
"""

QUERIES["ir_match"] = q_ir_match
ORACLES["ir_match"] = ORACLE_IR_MATCH


def q_trace_search_select(spark, sf_dir):
    """TraceQL select() (Tempo projection widener, beyond-parity): the
    named attribute refs come back as extra columns, computed BEFORE
    the search projection drops the attribute maps — only the selected
    keys ride through the truncation, never whole maps."""
    from .traceql.trace_ops import search_traceql

    l = load_table(spark, sf_dir, "lineitem")
    spans = l.select(
        F.col("l_orderkey").alias("trace_id"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("span_id"),
        F.concat(
            F.lit("ship-"), F.col("l_returnflag"), F.lit("-"), F.col("l_linestatus")
        ).alias("span_name"),
        F.col("l_linestatus").alias("service_name"),
        (F.col("l_shipdate").cast("timestamp").cast("double") * 1e9)
        .cast("long")
        .alias("start_time_unix_nano"),
        (F.col("l_quantity") * 1e6).cast("long").alias("duration_nanos"),
        F.col("l_shipdate").alias("timestamp"),
        F.create_map(
            F.lit("qty"), F.col("l_quantity").cast("string")
        ).alias("span_attributes"),
        F.create_map(F.lit("flag"), F.col("l_returnflag")).alias(
            "resource_attributes"
        ),
    )
    q = '{ span.qty >= 45 } | select(span.qty, resource.flag)'
    return search_traceql(spans, q, limit=12, span_limit=400)


ORACLE_TRACE_SEARCH_SELECT = """
WITH spans AS (
  SELECT l_orderkey AS trace_id,
         l_orderkey * 10 + l_linenumber AS span_id,
         'ship-' || l_returnflag || '-' || l_linestatus AS span_name,
         l_linestatus AS service_name,
         CAST(epoch(l_shipdate) * 1e9 AS BIGINT) AS start_time_unix_nano,
         CAST(l_quantity * 1e6 AS BIGINT) AS duration_nanos,
         l_shipdate AS timestamp,
         CAST(l_quantity AS VARCHAR) AS qty,
         l_returnflag AS flag
  FROM lineitem
),
filtered AS (SELECT * FROM spans WHERE CAST(qty AS DOUBLE) >= 45),
limited AS (
  SELECT trace_id, span_id, span_name, service_name,
         start_time_unix_nano, duration_nanos, timestamp,
         qty AS "span.qty", flag AS "resource.flag"
  FROM filtered ORDER BY start_time_unix_nano DESC, span_id DESC LIMIT 400
),
ranked AS (
  SELECT trace_id, max(start_time_unix_nano) AS latest
  FROM limited GROUP BY trace_id
  ORDER BY latest DESC, trace_id DESC LIMIT 12
)
SELECT l.* FROM limited l SEMI JOIN ranked r ON l.trace_id = r.trace_id
"""

QUERIES["trace_search_select"] = q_trace_search_select
ORACLES["trace_search_select"] = ORACLE_TRACE_SEARCH_SELECT


def q_trace_metrics_compare(spark, sf_dir):
    """TraceQL metrics compare() (trace_ops.metrics_compare): selection =
    slow spans (duration >= 25ms), attributes flag/status from lineitem
    columns; per attribute key the top-3 values by selection count with
    the baseline count alongside — the "what's different about the slow
    spans" panel."""
    from .traceql.trace_ops import metrics_compare

    l = load_table(spark, sf_dir, "lineitem")
    spans = l.select(
        (F.col("l_quantity") * 1e6).cast("long").alias("duration_nanos"),
        F.create_map(
            F.lit("flag"), F.col("l_returnflag"),
            F.lit("status"), F.col("l_linestatus"),
        ).alias("span_attributes"),
    )
    out = metrics_compare(
        spans, F.col("duration_nanos") >= 25_000_000, top_n=3,
        attr_cols=("span_attributes",),
    )
    return out.select("attr_key", "attr_value", "selection_count", "baseline_count")


ORACLE_TRACE_METRICS_COMPARE = """
WITH spans AS (
  SELECT CAST(l_quantity * 1e6 AS BIGINT) AS dur, l_returnflag AS flag,
         l_linestatus AS status
  FROM lineitem
), pairs AS (
  SELECT 'flag' AS attr_key, flag AS attr_value, dur FROM spans
  UNION ALL
  SELECT 'status' AS attr_key, status AS attr_value, dur FROM spans
), agg AS (
  SELECT attr_key, attr_value,
         CAST(sum(CASE WHEN dur >= 25000000 THEN 1 ELSE 0 END) AS BIGINT) AS selection_count,
         CAST(sum(CASE WHEN dur >= 25000000 THEN 0 ELSE 1 END) AS BIGINT) AS baseline_count
  FROM pairs GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY attr_key ORDER BY selection_count DESC, attr_value ASC
  ) AS rk FROM agg
)
SELECT attr_key, attr_value, selection_count, baseline_count
FROM r WHERE rk <= 3
"""

QUERIES["trace_metrics_compare"] = q_trace_metrics_compare
ORACLES["trace_metrics_compare"] = ORACLE_TRACE_METRICS_COMPARE


def q_trace_metrics_histogram(spark, sf_dir):
    """TraceQL metrics histogram_over_time(duration)
    (trace_ops.metrics_histogram): weekly power-of-two duration buckets
    — the Tempo heatmap series; log2 bucket via integer bit length,
    exact in both engines."""
    from .traceql.trace_ops import metrics_histogram

    spans = _spans_view(spark, sf_dir)
    out = metrics_histogram(spans, F.lit(True), _WEEK)
    return out.select("bucket", "le_exp", "le_nanos", "count")


ORACLE_TRACE_METRICS_HISTOGRAM = """
WITH spans AS (
  SELECT CAST(floor(epoch(l_shipdate) / 604800) * 604800 AS BIGINT) AS bucket,
         CAST(l_quantity * 1e6 AS BIGINT) AS v
  FROM lineitem
), e AS (
  SELECT bucket,
         CAST(CASE WHEN v <= 1 THEN 0
              WHEN (v & (v - 1)) = 0 THEN length(bin(v)) - 1
              ELSE length(bin(v)) END AS INT) AS le_exp
  FROM spans
)
SELECT bucket, le_exp,
       CAST(power(2.0, le_exp) AS BIGINT) AS le_nanos,
       count(*) AS count
FROM e GROUP BY 1, 2
"""

QUERIES["trace_metrics_histogram"] = q_trace_metrics_histogram
ORACLES["trace_metrics_histogram"] = ORACLE_TRACE_METRICS_HISTOGRAM


def q_flamegraph_truncate(spark, sf_dir):
    """Pyroscope max-nodes truncation (profiles.flamegraph_truncate):
    the profile_self_time flamegraph (5 region roots × 25 nation
    leaves) capped to 10 nodes; each kept node's dropped subtree
    weight collapses into a synthetic `;other` child so totals still
    roll up exactly."""
    from .operators.profiles import flamegraph_self, flamegraph_truncate

    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    agg = j.groupBy("r_name", "n_name").agg(
        F.sum(F.round("o_totalprice", 0).cast("long")).alias("w"),
        F.sum((F.col("o_orderkey") % 100).cast("long")).alias("w2"),
    )
    profiles = agg.select(
        F.to_json(
            F.array(F.array("r_name", "n_name"), F.array("r_name"))
        ).alias("stacktraces_json"),
        F.to_json(
            F.array(
                F.struct(F.lit(0).alias("stacktrace_idx"), F.col("w").alias("value")),
                F.struct(F.lit(1).alias("stacktrace_idx"), F.col("w2").alias("value")),
            )
        ).alias("samples_json"),
    )
    fg = flamegraph_self(profiles)
    return flamegraph_truncate(fg, 10).select(
        "path", "depth", "frame", "value", "value_self"
    )


ORACLE_FLAMEGRAPH_TRUNCATE = """
WITH j AS (
  SELECT r_name, n_name,
         CAST(round(o_totalprice, 0) AS BIGINT) AS w,
         CAST(o_orderkey % 100 AS BIGINT) AS w2
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
), fg AS (
  SELECT r_name AS path, 1 AS depth, r_name AS frame,
         CAST(sum(w) + sum(w2) AS BIGINT) AS value, CAST(sum(w2) AS BIGINT) AS value_self
  FROM j GROUP BY r_name
  UNION ALL
  SELECT r_name || ';' || n_name AS path, 2 AS depth, n_name AS frame,
         CAST(sum(w) AS BIGINT) AS value, CAST(sum(w) AS BIGINT) AS value_self
  FROM j GROUP BY r_name, n_name
), kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY value DESC, depth ASC, path ASC) AS rk
    FROM fg
  ) WHERE rk <= 10
), child_sums AS (
  SELECT substr(path, 1, length(path) - length(frame) - 1) AS path,
         CAST(sum(value) AS BIGINT) AS kept_children
  FROM kept WHERE depth > 1 GROUP BY 1
), others AS (
  SELECT k.path || ';other' AS path, k.depth + 1 AS depth, 'other' AS frame,
         k.value - k.value_self - coalesce(c.kept_children, 0) AS value,
         k.value - k.value_self - coalesce(c.kept_children, 0) AS value_self
  FROM kept k LEFT JOIN child_sums c ON k.path = c.path
  WHERE k.value - k.value_self - coalesce(c.kept_children, 0) > 0
)
SELECT path, depth, frame, value, value_self FROM kept
UNION ALL
SELECT path, depth, frame, value, value_self FROM others
"""

QUERIES["flamegraph_truncate"] = q_flamegraph_truncate
ORACLES["flamegraph_truncate"] = ORACLE_FLAMEGRAPH_TRUNCATE


def q_trace_tag_names_v2(spark, sf_dir):
    """Tempo /api/v2/search/tags (trace_ops.tag_names_v2): tag names
    grouped by scope — span / resource / intrinsic."""
    from .traceql.trace_ops import tag_names_v2

    l = load_table(spark, sf_dir, "lineitem")
    spans = l.select(
        F.create_map(F.lit("qty"), F.col("l_quantity").cast("string")).alias(
            "span_attributes"
        ),
        F.create_map(F.lit("flag"), F.col("l_returnflag")).alias(
            "resource_attributes"
        ),
    )
    return tag_names_v2(spans)


ORACLE_TRACE_TAG_NAMES_V2 = """
SELECT * FROM (VALUES
  ('intrinsic', 'duration'), ('intrinsic', 'kind'), ('intrinsic', 'name'),
  ('intrinsic', 'status'), ('resource', 'flag'), ('resource', 'service.name'),
  ('span', 'qty')
) t(scope, name) ORDER BY scope, name
"""

QUERIES["trace_tag_names_v2"] = q_trace_tag_names_v2
ORACLES["trace_tag_names_v2"] = ORACLE_TRACE_TAG_NAMES_V2


def q_trace_not_child(spark, sf_dir):
    """Negated structural `{ qty > 30 } !> { flag = R }` (Tempo's
    experimental not-child): flag=R spans whose direct parent does NOT
    match — the same join as `>` flipped to anti."""
    from .traceql.structural import child_spans

    spans = _tree_spans(spark, sf_dir)
    return child_spans(spans, F.col("qty") > 30, F.col("flag") == "R", negate=True)


ORACLE_TRACE_NOT_CHILD = f"""
WITH spans AS ({_TREE_SPANS_SQL})
SELECT c.* FROM spans c
WHERE c.flag = 'R' AND NOT EXISTS (
  SELECT 1 FROM spans p
  WHERE p.trace_id = c.trace_id AND p.span_id = c.parent_span_id
    AND p.qty > 30)
"""

QUERIES["trace_not_child"] = q_trace_not_child
ORACLES["trace_not_child"] = ORACLE_TRACE_NOT_CHILD


def q_trace_duration_filter(spark, sf_dir):
    """Trace-level intrinsic `{ traceDuration >= 100ms && name =~ ... }`
    (trace_ops.trace_level_filter): the duration predicate applies to
    the WHOLE trace (max end − min start) via a trace-count-sized
    verdict semi-join, composed with a normal span-level matcher, then
    the standard newest-N truncation."""
    from .traceql.trace_ops import search_traceql

    l = load_table(spark, sf_dir, "lineitem")
    spans = l.select(
        F.col("l_orderkey").alias("trace_id"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("span_id"),
        F.when(
            F.col("l_linenumber") > 1,
            F.col("l_orderkey") * 10 + F.floor(F.col("l_linenumber") / 2),
        ).alias("parent_span_id"),
        F.concat(
            F.lit("ship-"), F.col("l_returnflag"), F.lit("-"), F.col("l_linestatus")
        ).alias("span_name"),
        F.col("l_linestatus").alias("service_name"),
        (F.col("l_shipdate").cast("timestamp").cast("double") * 1e9)
        .cast("long")
        .alias("start_time_unix_nano"),
        (F.col("l_quantity") * 1e6).cast("long").alias("duration_nanos"),
        F.col("l_shipdate").alias("timestamp"),
    )
    q = '{ traceDuration >= 100ms && name =~ "ship-[AR].*" }'
    return search_traceql(spans, q, limit=12, span_limit=400)


ORACLE_TRACE_DURATION_FILTER = """
WITH spans AS (
  SELECT l_orderkey AS trace_id,
         l_orderkey * 10 + l_linenumber AS span_id,
         CASE WHEN l_linenumber > 1
              THEN l_orderkey * 10 + CAST(floor(l_linenumber / 2) AS BIGINT) END AS parent_span_id,
         'ship-' || l_returnflag || '-' || l_linestatus AS span_name,
         l_linestatus AS service_name,
         CAST(epoch(l_shipdate) * 1e9 AS BIGINT) AS start_time_unix_nano,
         CAST(l_quantity * 1e6 AS BIGINT) AS duration_nanos,
         l_shipdate AS timestamp
  FROM lineitem
),
verdict AS (
  SELECT trace_id
  FROM spans GROUP BY trace_id
  HAVING max(start_time_unix_nano + duration_nanos) - min(start_time_unix_nano)
         >= 100000000
),
filtered AS (
  SELECT s.* FROM spans s SEMI JOIN verdict v ON s.trace_id = v.trace_id
  WHERE regexp_matches(span_name, '^(?:ship-[AR].*)$')
),
limited AS (
  SELECT trace_id, span_id, span_name, service_name,
         start_time_unix_nano, duration_nanos, timestamp
  FROM filtered ORDER BY start_time_unix_nano DESC, span_id DESC LIMIT 400
),
ranked AS (
  SELECT trace_id, max(start_time_unix_nano) AS latest
  FROM limited GROUP BY trace_id
  ORDER BY latest DESC, trace_id DESC LIMIT 12
)
SELECT l.* FROM limited l SEMI JOIN ranked r ON l.trace_id = r.trace_id
"""

QUERIES["trace_duration_filter"] = q_trace_duration_filter
ORACLES["trace_duration_filter"] = ORACLE_TRACE_DURATION_FILTER
