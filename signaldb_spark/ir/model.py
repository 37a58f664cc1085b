"""Query IR: versioned JSON query document + validation.

Shape follows the reference's IR (src/common/src/query_ir/: version,
source table, predicate tree, stages) with the same validation
posture: unknown ops/stages/versions rejected up front, regex patterns
size-limited before compilation (ir_planner.rs:25-27), literal values
coerced at validation time (value.rs) so lowering never sees bad input.

Document format::

    {
      "version": 1,
      "from": "logs",
      "where": {"and": [{"field": "service_name", "op": "eq", "value": "api"},
                         {"not": {"field": "level", "op": "eq", "value": "debug"}}]},
      "extract": [{"field": "status", "parser": "json", "source": "body", "type": "long"}],
      "aggregate": {"op": "count", "by": ["service_name"], "step_seconds": 3600},
      "rank": {"kind": "topk", "k": 5, "value": "value"},
      "select": ["service_name", "value"],
      "limit": 1000
    }

Kleene/absent semantics (docs/users/querying-ir.md:120-129): an absent
field fails both ``eq`` and ``not(eq)``; only ``exists`` observes
absence. This is exactly SQL three-valued logic, so the lowering emits
plain predicates and lets Spark's NULL handling do the rest.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

MAX_REGEX_LEN = 1024
LEAF_OPS = {"eq", "ne", "gt", "gte", "lt", "lte", "in", "between", "contains", "regex", "exists"}
AGG_OPS = {"count", "sum", "avg", "min", "max", "quantile"}
PARSERS = {"json", "logfmt", "regex"}
TYPES = {"string", "long", "double", "boolean"}
SUPPORTED_VERSIONS = {1}

# ---- metric-native sub-model (the reference's query-metrics-model
# proposal, openspec/changes/query-metrics-model/proposal.md: metrics do
# not fit the flat row-set model — samples carry aggregation_temporality
# and metric_type, histograms are not scalar — so `from: "metrics"`
# routes to its own relation types instead of the generic stages).
# v1 scope started from the proposal's "minimum sound v1" — gauge + sum
# (temporality-aware rate/increase) + histogram_quantile over OTLP
# explicit buckets — and has since lifted every deferral the proposal
# listed, each with the soundness rule the proposal worried about made
# explicit:
# - exponential_histogram quantile (deferred there because the bucket
#   model was open; operators/exphist.py ships it — value-ordered CDF
#   walk over scale-based buckets, cross-scale merge by downscaling;
#   DELTA accumulation only, cumulative streams fail loudly);
# - summary quantile (φ read-back against the datapoint's stored
#   quantile anchors, INSTANT relation type; outer re-aggregation is
#   REJECTED at the wall — quantiles don't merge, the same reason
#   Prometheus documents summaries as non-aggregatable);
# - vector-matching binop (the proposal's "candidate for v1" whose
#   matching semantics were unspecified): on()/ignoring() +
#   group_left/group_right over bucket-aligned operands, both operands'
#   windows forced equal at the wall so series align by construction.
METRIC_TYPES_V1 = {"gauge", "sum", "histogram", "exponential_histogram",
                   "summary"}
METRIC_TYPES_DEFERRED: set[str] = set()
METRIC_INSTANT_FNS = {"last"}
METRIC_GAUGE_RANGE_FNS = {
    "avg_over_time", "min_over_time", "max_over_time", "sum_over_time",
    "last_over_time", "delta",
}
METRIC_SUM_RANGE_FNS = {"rate", "increase"}
METRIC_HIST_FNS = {"quantile"}
METRIC_FNS_BY_TYPE = {
    "gauge": METRIC_INSTANT_FNS | METRIC_GAUGE_RANGE_FNS,
    "sum": METRIC_INSTANT_FNS | METRIC_SUM_RANGE_FNS,
    "histogram": METRIC_HIST_FNS,
    "exponential_histogram": METRIC_HIST_FNS,
    # summary quantile is an instant read-back of stored anchors — it
    # takes step_seconds like 'last', never window_seconds
    "summary": {"quantile"},
}
METRIC_OUTER_AGGS = {"sum", "avg", "min", "max", "count"}
BINOP_ARITH_OPS = {"+", "-", "*", "/", "%", "^"}
BINOP_COMPARE_OPS = {"==", "!=", ">", "<", ">=", "<="}


class IRValidationError(ValueError):
    pass


@dataclass(frozen=True)
class Leaf:
    f: str
    op: str
    value: Any = None
    upper: Any = None  # for between


@dataclass(frozen=True)
class Node:
    kind: str  # and | or | not
    children: tuple["Pred", ...]


Pred = Leaf | Node


@dataclass(frozen=True)
class Extract:
    field_name: str
    parser: str
    source: str
    pattern: str | None
    out_type: str


@dataclass(frozen=True)
class Aggregate:
    op: str
    by: tuple[str, ...]
    step_seconds: int | None
    value_field: str | None
    quantile: float | None


@dataclass(frozen=True)
class Rank:
    kind: str  # topk | bottomk
    k: int
    value: str


@dataclass(frozen=True)
class Correlate:
    """Cross-signal join stage — the reference's IR roadmap item
    (querying-ir.md Roadmap: "a `correlate` join stage (the IR becomes
    a DAG)"), implemented here: join a second signal on shared key
    columns. ``select`` names the right-side columns carried over
    (prefixed); semi/anti bring none."""

    with_table: str
    on: tuple[str, ...]
    how: str  # inner | left | semi | anti
    select: tuple[str, ...]
    prefix: str


@dataclass(frozen=True)
class Match:
    """Structural trace matching — the reference's IR roadmap item
    (querying-ir.md Roadmap: "structural traces — a `match` stage"):
    keep spans whose side of a parent/descendant/sibling relation both
    satisfy their IR predicate trees. ``op`` ∈ ``>`` (direct child),
    ``>>`` (descendant), ``~`` (sibling)."""

    op: str
    left: Pred
    right: Pred


@dataclass(frozen=True)
class Metric:
    """Metric-native query stage (query-metrics-model proposal): the
    relation type is implied by ``fn`` — instant vector (``last``),
    range vector (windowed fns), or scalar (outer ``agg`` with no
    ``by`` and no ``step_seconds``). ``window_seconds`` buckets range
    fns (v1 is tumbling: step, when given, must equal the window —
    hopping stays on the PromQL dialect's subquery machinery);
    ``quantile`` drives bucket-based histogram quantiles."""

    name: str
    metric_type: str
    fn: str
    window_seconds: int | None
    step_seconds: int | None
    by: tuple[str, ...]
    agg: str | None
    quantile: float | None


@dataclass(frozen=True)
class MetricBinop:
    """Vector-matching arithmetic/comparison between two metric vectors
    (the proposal's 'most of real PromQL arithmetic' candidate, owned
    by query-metrics-model): the IRQuery's ``metric`` is the LEFT
    operand, ``rhs`` the right. ``on``/``ignoring`` pick the matching
    labels (mutually exclusive; neither = full series identity);
    ``group`` 'left'/'right' declares the many side of a many-to-one
    match and ``include`` copies labels from the one side. ``rhs_where``
    scopes the right operand's rows (the left operand uses the query's
    own ``where``). Both operands' bucketing is validated equal, so
    series align by construction — never nearest/interpolated."""

    op: str
    rhs: Metric
    rhs_where: Pred | None
    on: tuple[str, ...]
    ignoring: tuple[str, ...]
    group: str | None
    include: tuple[str, ...]
    bool_mode: bool


@dataclass(frozen=True)
class IRQuery:
    version: int
    source: str
    where: Pred | None
    extract: tuple[Extract, ...]
    aggregate: Aggregate | None
    rank: Rank | None
    select: tuple[str, ...]
    limit: int | None
    correlate: "Correlate | None" = None
    match: "Match | None" = None
    metric: "Metric | None" = None
    binop: "MetricBinop | None" = None


def _validate_pred(node: Any) -> Pred:
    if not isinstance(node, dict):
        raise IRValidationError(f"predicate must be an object, got {type(node).__name__}")
    if "and" in node or "or" in node:
        kind = "and" if "and" in node else "or"
        children = node[kind]
        if not isinstance(children, list) or not children:
            raise IRValidationError(f"{kind} needs a non-empty list")
        return Node(kind, tuple(_validate_pred(c) for c in children))
    if "not" in node:
        return Node("not", (_validate_pred(node["not"]),))
    f, op = node.get("field"), node.get("op")
    if not f or op not in LEAF_OPS:
        raise IRValidationError(f"bad leaf: field={f!r} op={op!r}")
    value = node.get("value")
    upper = node.get("upper")
    if op == "between" and (value is None or upper is None):
        raise IRValidationError("between needs value and upper")
    if op == "in" and not isinstance(value, list):
        raise IRValidationError("in needs a list value")
    if op == "regex":
        if not isinstance(value, str):
            raise IRValidationError("regex needs a string pattern")
        if len(value) > MAX_REGEX_LEN:
            raise IRValidationError("regex pattern too long")
        import re

        try:
            re.compile(value)
        except re.error as exc:
            raise IRValidationError(f"bad regex: {exc}") from exc
    if op == "exists" and value is not None:
        raise IRValidationError("exists takes no value")
    if op in ("gt", "gte", "lt", "lte", "between"):
        value = _coerce(value)
        upper = _coerce(upper)
    elif op in ("eq", "ne"):
        # equality only coerces unit literals (durations/bytes); plain
        # numeric strings stay strings — coercing '123' to int would
        # poison equality against string columns (ANSI cast failure)
        value = _coerce(value, units_only=True)
    return Leaf(f, op, value, upper)


_DURATION_LIT = __import__("re").compile(r"^\d+(?:\.\d+)?(ns|us|µs|ms|s|m|h|d|w|y)$")
_BYTES_LIT = __import__("re").compile(r"^\d+(?:\.\d+)?(b|kb|kib|mb|mib|gb|gib|tb|tib)$", 2)


def _coerce(value, units_only: bool = False):
    """Literal coercion at validation time (the reference's value.rs):
    duration strings normalize to nanoseconds, byte strings to raw
    bytes, numeric strings to numbers — so lowering never sees an
    un-coerced literal."""
    if not isinstance(value, str):
        return value
    from ..logql.lexer import parse_bytes, parse_duration

    if _DURATION_LIT.match(value):
        return parse_duration(value) * 1e9
    if _BYTES_LIT.match(value):
        return parse_bytes(value)
    if units_only:
        return value
    try:
        return int(value)
    except ValueError:
        try:
            return float(value)
        except ValueError:
            return value


def _metric_obj(m: dict, what: str = "metric") -> Metric:
    """Validate one metric-operand object (the query's ``metric`` or a
    binop ``rhs``) — every relation-type soundness rule from the
    proposal is enforced HERE so lowering never sees an unsound
    combination (the same posture as the rest of the IR wall)."""
    name = m.get("name")
    if not isinstance(name, str) or not name:
        raise IRValidationError(f"{what} needs a 'name'")
    mtype = m.get("type", "gauge")
    if mtype in METRIC_TYPES_DEFERRED:
        raise IRValidationError(
            f"metric type {mtype!r} is not in the IR v1 sub-model; use "
            "the PromQL dialect")
    if mtype not in METRIC_TYPES_V1:
        raise IRValidationError(f"unknown metric type {mtype!r}")
    fn = m.get(
        "fn",
        "quantile"
        if mtype in ("histogram", "exponential_histogram", "summary")
        else "last",
    )
    allowed = METRIC_FNS_BY_TYPE[mtype]
    if fn not in allowed:
        raise IRValidationError(
            f"fn {fn!r} is invalid for metric type {mtype!r} "
            f"(allowed: {sorted(allowed)})")
    window = m.get("window_seconds")
    step = m.get("step_seconds")
    for label, v in (("window_seconds", window), ("step_seconds", step)):
        if v is not None and (not isinstance(v, int) or v <= 0):
            raise IRValidationError(f"{label} must be a positive int")
    # summary quantile is an INSTANT read-back of the latest datapoint's
    # stored anchors — it steps like 'last', never windows
    is_range = fn not in METRIC_INSTANT_FNS and mtype != "summary"
    if is_range and window is None:
        raise IRValidationError(f"range fn {fn!r} needs window_seconds")
    if not is_range and window is not None:
        raise IRValidationError(
            f"instant fn {fn!r}"
            + (" over summary" if mtype == "summary" else "")
            + " takes step_seconds, not window_seconds")
    if is_range and step is not None and step != window:
        raise IRValidationError(
            "v1 range vectors are tumbling: step_seconds must equal "
            "window_seconds (hopping stays on the PromQL dialect)")
    q = m.get("quantile")
    if fn == "quantile":
        if not (isinstance(q, (int, float)) and 0 <= q <= 1):
            raise IRValidationError("quantile fn needs 0<=quantile<=1")
    elif q is not None:
        raise IRValidationError("'quantile' only applies to fn 'quantile'")
    agg = m.get("agg")
    by = tuple(m.get("by", []) or ())
    if agg is not None and agg not in METRIC_OUTER_AGGS:
        raise IRValidationError(f"unknown outer agg {agg!r}")
    if by and agg is None:
        raise IRValidationError("'by' grouping needs an outer 'agg'")
    if mtype == "summary" and agg is not None:
        raise IRValidationError(
            "summary quantiles cannot be re-aggregated across series "
            "(quantile anchors don't merge); drop 'agg'/'by'")
    return Metric(
        name, mtype, fn, window, step, by, agg,
        float(q) if q is not None else None,
    )


def _validate_metric(doc: dict) -> Metric:
    m = doc.get("metric")
    if not isinstance(m, dict):
        raise IRValidationError("from 'metrics' requires a 'metric' object")
    # generic row-set stages don't apply to the metric relation types:
    # forcing metrics through them is exactly the unsoundness the
    # proposal exists to prevent
    for stage in ("extract", "aggregate", "rank", "match", "correlate"):
        if doc.get(stage) is not None:
            raise IRValidationError(
                f"'{stage}' does not apply to metric queries; use the "
                "metric sub-model's fn/agg/by")
    return _metric_obj(m)


def _validate_binop(doc: dict, lhs: Metric) -> MetricBinop:
    """Vector-matching binop wall. The alignment rule that makes v1
    sound without nearest/interpolate semantics: both operands MUST
    share one bucketing — the rhs inherits the lhs's window/step when
    unset and is rejected when it differs."""
    b = doc.get("binop")
    if not isinstance(b, dict):
        raise IRValidationError("'binop' must be an object")
    op = b.get("op")
    if op not in BINOP_ARITH_OPS | BINOP_COMPARE_OPS:
        raise IRValidationError(
            f"unknown binop op {op!r} (arith {sorted(BINOP_ARITH_OPS)}, "
            f"compare {sorted(BINOP_COMPARE_OPS)})")
    bool_mode = bool(b.get("bool", False))
    if bool_mode and op not in BINOP_COMPARE_OPS:
        raise IRValidationError("'bool' only applies to comparison ops")
    rm = b.get("metric")
    if not isinstance(rm, dict):
        raise IRValidationError("binop needs a 'metric' object (the rhs)")
    rm = dict(rm)
    lhs_bucket = (lhs.step_seconds
                  if lhs.fn == "last" or lhs.metric_type == "summary"
                  else lhs.window_seconds)
    # bucket inheritance respects the rhs's OWN relation type: a range
    # rhs inherits the lhs window/step, an instant rhs (last, summary
    # quantile) inherits the lhs's resolved bucket as its step — so
    # rate[60] / gauge-last is expressible without the caller having to
    # null out an inherited window_seconds by hand
    rhs_type = rm.get("type", "gauge")
    rhs_fn = rm.get(
        "fn",
        "quantile"
        if rhs_type in ("histogram", "exponential_histogram", "summary")
        else "last",
    )
    if rhs_fn in METRIC_INSTANT_FNS or rhs_type == "summary":
        rm.setdefault("step_seconds", lhs_bucket)
    else:
        rm.setdefault("window_seconds", lhs.window_seconds)
        rm.setdefault("step_seconds", lhs.step_seconds)
    # inherited Nones must not re-trip the per-operand wall
    rm = {k: v for k, v in rm.items() if v is not None}
    rhs = _metric_obj(rm, what="binop rhs metric")
    rhs_bucket = (rhs.step_seconds
                  if rhs.fn == "last" or rhs.metric_type == "summary"
                  else rhs.window_seconds)
    if lhs_bucket != rhs_bucket:
        raise IRValidationError(
            f"binop operands must share one bucketing: lhs resolves to "
            f"{lhs_bucket!r}s, rhs to {rhs_bucket!r}s")
    rhs_where = (_validate_pred(b["where"])
                 if b.get("where") is not None else None)
    on = tuple(b.get("on", []) or ())
    ignoring = tuple(b.get("ignoring", []) or ())
    if on and ignoring:
        raise IRValidationError("'on' and 'ignoring' are mutually exclusive")
    for lbl in (*on, *ignoring):
        if not isinstance(lbl, str) or not lbl:
            raise IRValidationError("on/ignoring entries must be label names")
    group = b.get("group")
    if group not in (None, "left", "right"):
        raise IRValidationError("group must be 'left' or 'right'")
    include = tuple(b.get("include", []) or ())
    for lbl in include:
        if not isinstance(lbl, str) or not lbl:
            raise IRValidationError("include entries must be label names")
    if group is None and include:
        raise IRValidationError("'include' needs group 'left' or 'right'")
    if group is not None and not on:
        raise IRValidationError(
            "group_left/group_right needs explicit 'on' matching labels")
    if include:
        # 'include' copies labels from the ONE side; an aggregated one
        # side exposes only its 'by' columns, so anything else cannot be
        # resolved after the fact (same rule as 'on' above) — reject at
        # the wall instead of failing in lowering
        one = rhs if group == "left" else lhs
        if one.agg is not None and not set(include) <= set(one.by):
            raise IRValidationError(
                f"binop 'include' labels must be within the one side's "
                f"'by' grouping (include={sorted(include)}, "
                f"by={sorted(one.by)})")
    # aggregated operands expose only their 'by' labels — matching
    # labels outside them cannot be resolved after the fact
    for side, met in (("lhs", lhs), ("rhs", rhs)):
        if met.agg is not None and on and not set(on) <= set(met.by):
            raise IRValidationError(
                f"binop 'on' labels must be within the {side} 'by' "
                f"grouping (on={sorted(on)}, {side} by={sorted(met.by)})")
        if met.agg is not None and ignoring:
            raise IRValidationError(
                "'ignoring' does not apply to aggregated operands; "
                "use 'on' with labels from 'by'")
    if not on and not ignoring:
        l_agg, r_agg = lhs.agg is not None, rhs.agg is not None
        if l_agg != r_agg:
            raise IRValidationError(
                "binop between an aggregated and a raw-series operand "
                "needs explicit 'on' matching labels")
        if l_agg and set(lhs.by) != set(rhs.by):
            raise IRValidationError(
                "default vector matching needs identical 'by' label sets "
                "on both operands; use 'on' to pick the shared subset")
    return MetricBinop(op, rhs, rhs_where, on, ignoring, group, include,
                       bool_mode)


def validate(doc: dict) -> IRQuery:
    version = doc.get("version")
    if version not in SUPPORTED_VERSIONS:
        raise IRValidationError(f"unsupported version {version!r}")
    source = doc.get("from")
    if not isinstance(source, str) or not source:
        raise IRValidationError("missing 'from' table")
    metric = _validate_metric(doc) if source == "metrics" else None
    if metric is None and doc.get("metric") is not None:
        raise IRValidationError("'metric' requires from: 'metrics'")
    binop = None
    if doc.get("binop") is not None:
        if metric is None:
            raise IRValidationError("'binop' requires from: 'metrics'")
        binop = _validate_binop(doc, metric)
    where = _validate_pred(doc["where"]) if doc.get("where") is not None else None
    extract = []
    for e in doc.get("extract", []) or []:
        parser = e.get("parser")
        if parser not in PARSERS:
            raise IRValidationError(f"unknown parser {parser!r}")
        out_type = e.get("type", "string")
        if out_type not in TYPES:
            raise IRValidationError(f"unknown type {out_type!r}")
        if parser == "regex" and not e.get("pattern"):
            raise IRValidationError("regex extract needs a pattern")
        extract.append(
            Extract(e["field"], parser, e.get("source", "body"), e.get("pattern"), out_type)
        )
    agg = None
    if doc.get("aggregate") is not None:
        a = doc["aggregate"]
        if a.get("op") not in AGG_OPS:
            raise IRValidationError(f"unknown aggregate {a.get('op')!r}")
        q = a.get("quantile")
        if a["op"] == "quantile" and not (isinstance(q, (int, float)) and 0 <= q <= 1):
            raise IRValidationError("quantile needs 0<=q<=1")
        agg = Aggregate(
            a["op"],
            tuple(a.get("by", [])),
            a.get("step_seconds"),
            a.get("value_field"),
            float(q) if q is not None else None,
        )
        if agg.op != "count" and not agg.value_field:
            raise IRValidationError(f"{agg.op} needs value_field")
    rank = None
    if doc.get("rank") is not None:
        r = doc["rank"]
        if r.get("kind") not in ("topk", "bottomk"):
            raise IRValidationError("rank kind must be topk|bottomk")
        rank = Rank(r["kind"], int(r["k"]), r.get("value", "value"))
    limit = doc.get("limit")
    if limit is not None and (not isinstance(limit, int) or limit <= 0):
        raise IRValidationError("limit must be a positive int")
    corr = None
    if doc.get("correlate") is not None:
        c = doc["correlate"]
        if not isinstance(c.get("with"), str) or not c["with"]:
            raise IRValidationError("correlate needs a 'with' table")
        on = c.get("on")
        if not isinstance(on, list) or not on:
            raise IRValidationError("correlate needs non-empty 'on' keys")
        how = c.get("type", "inner")
        if how not in ("inner", "left", "semi", "anti"):
            raise IRValidationError(f"unknown correlate type {how!r}")
        sel = c.get("select", []) or []
        if how in ("semi", "anti") and sel:
            raise IRValidationError("semi/anti correlate carries no columns")
        corr = Correlate(
            c["with"], tuple(on), how, tuple(sel), c.get("prefix", "r_")
        )
    match = None
    if doc.get("match") is not None:
        mm = doc["match"]
        if mm.get("op") not in (">", ">>", "~"):
            raise IRValidationError("match op must be > | >> | ~")
        if mm.get("left") is None or mm.get("right") is None:
            raise IRValidationError("match needs left and right predicate trees")
        match = Match(mm["op"], _validate_pred(mm["left"]), _validate_pred(mm["right"]))
    return IRQuery(
        version, source, where, tuple(extract), agg, rank,
        tuple(doc.get("select", [])), limit, corr, match, metric, binop,
    )
