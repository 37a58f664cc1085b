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


def validate(doc: dict) -> IRQuery:
    version = doc.get("version")
    if version not in SUPPORTED_VERSIONS:
        raise IRValidationError(f"unsupported version {version!r}")
    source = doc.get("from")
    if not isinstance(source, str) or not source:
        raise IRValidationError("missing 'from' table")
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
        tuple(doc.get("select", [])), limit, corr, match,
    )
