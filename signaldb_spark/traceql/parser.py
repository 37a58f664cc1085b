"""TraceQL equality-subset parser + Tempo tags logfmt parser.

Scope mirrors the reference exactly (parse_traceql,
src/querier/src/query/search_filter.rs:234-330): conjunctions of
equality predicates ``{ a = "v" && b = "w" }`` with scopes ``span.`` /
``resource.`` / ``.`` and intrinsics ``name``/``status``/
``.service.name``; everything else (||, !=, ranges, regex, duration
comparisons) is rejected — parity includes rejecting what the
reference rejects.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class TraceQLError(ValueError):
    pass


@dataclass(frozen=True)
class SpanPredicate:
    scope: str  # "span" | "resource" | "intrinsic" | "unscoped"
    key: str
    value: str


_PRED_RE = re.compile(
    r'\s*(?P<lhs>[a-zA-Z_.][a-zA-Z0-9_.]*)\s*(?P<op>=~|!=|>=|<=|=|>|<)\s*'
    r'(?P<val>"(?:[^"\\]|\\.)*"|\S+)\s*'
)

INTRINSICS = {"name", "status"}

# canonical status normalization (search_filter.rs:74-85)
STATUS_MAP = {
    "ok": "Ok", "error": "Error", "unset": "Unspecified",
    "Ok": "Ok", "Error": "Error", "Unspecified": "Unspecified",
}


def parse_traceql(q: str) -> list[SpanPredicate]:
    q = q.strip()
    if not (q.startswith("{") and q.endswith("}")):
        raise TraceQLError("TraceQL query must be wrapped in { }")
    body = q[1:-1].strip()
    if not body:
        return []
    if "||" in body:
        raise TraceQLError("disjunction (||) not supported")
    preds: list[SpanPredicate] = []
    for part in body.split("&&"):
        m = _PRED_RE.fullmatch(part)
        if not m:
            raise TraceQLError(f"unparsable predicate {part.strip()!r}")
        if m.group("op") != "=":
            raise TraceQLError(f"operator {m.group('op')!r} not supported (equality only)")
        lhs, val = m.group("lhs"), m.group("val")
        if val.startswith('"'):
            val = re.sub(r"\\(.)", r"\1", val[1:-1])
        if lhs in INTRINSICS:
            if lhs == "status":
                norm = STATUS_MAP.get(val)
                if norm is None:
                    raise TraceQLError(f"unknown status {val!r}")
                val = norm
            preds.append(SpanPredicate("intrinsic", lhs, val))
        elif lhs.startswith("span."):
            preds.append(SpanPredicate("span", lhs[5:], val))
        elif lhs.startswith("resource."):
            preds.append(SpanPredicate("resource", lhs[9:], val))
        elif lhs.startswith("."):
            preds.append(SpanPredicate("unscoped", lhs[1:], val))
        else:
            raise TraceQLError(f"unscoped attribute {lhs!r} needs a leading dot")
    return preds


@dataclass(frozen=True)
class StructuralQuery:
    """``{left} OP {right}`` where OP is ``>`` (direct child), ``>>``
    (descendant), or ``~`` (sibling). Beyond-reference extension — the
    reference rejects multi-spanset queries (search_filter.rs:240-246);
    Tempo's TraceQL defines these."""

    op: str  # ">" | ">>" | "~"
    left: tuple[SpanPredicate, ...]
    right: tuple[SpanPredicate, ...]


_STRUCT_RE = re.compile(r"^(\{[^{}]*\})\s*(>>|>|~)\s*(\{[^{}]*\})$")


@dataclass(frozen=True)
class AggregateQuery:
    """``{preds} | agg(col) OP threshold`` — Tempo spanset aggregate
    filter (beyond-reference; lowered by structural.spanset_aggregate).
    ``agg_col`` is None for ``count()``."""

    preds: tuple[SpanPredicate, ...]
    agg: str  # count | sum | avg | min | max
    agg_col: str | None
    op: str  # > >= < <= = !=
    threshold: float


_AGG_RE = re.compile(
    r"^(\{[^{}]*\})\s*\|\s*(count|sum|avg|min|max)\(\s*([A-Za-z_][\w.]*)?\s*\)"
    r"\s*(>=|<=|!=|=|>|<)\s*(-?[0-9]+(?:\.[0-9]+)?)$"
)


def parse_traceql_expr(q: str) -> "list[SpanPredicate] | StructuralQuery | AggregateQuery":
    """Full-expression entry point: a single spanset (delegates to
    :func:`parse_traceql`, reference-parity rejections included), one
    structural ``{A} OP {B}`` with OP in ``>``/``>>``/``~``, or one
    spanset aggregate filter ``{A} | agg(col) op n``."""
    m = _STRUCT_RE.match(q.strip())
    if m is not None:
        return StructuralQuery(
            m.group(2),
            tuple(parse_traceql(m.group(1))),
            tuple(parse_traceql(m.group(3))),
        )
    a = _AGG_RE.match(q.strip())
    if a is not None:
        col = a.group(3)
        if col is not None and col.startswith("span."):
            col = col[len("span."):]
        return AggregateQuery(
            tuple(parse_traceql(a.group(1))),
            a.group(2),
            col,
            a.group(4),
            float(a.group(5)),
        )
    return parse_traceql(q)


def parse_tags(tags: str) -> list[SpanPredicate]:
    """Tempo logfmt ``tags`` parameter: ``key=value key2="v 2"``
    (parse_tags, search_filter.rs:184-232) — unscoped predicates."""
    preds: list[SpanPredicate] = []
    for m in re.finditer(r'([a-zA-Z_.][a-zA-Z0-9_.]*)=("(?:[^"\\]|\\.)*"|\S+)', tags):
        key, val = m.group(1), m.group(2)
        if val.startswith('"'):
            val = re.sub(r"\\(.)", r"\1", val[1:-1])
        preds.append(SpanPredicate("unscoped", key, val))
    return preds
