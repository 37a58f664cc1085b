"""Attribute query-demand registry.

Process-global counters for "this attribute key was used in a query
filter" (src/common/src/attr_demand.rs): the query entrypoints record a
hit for every matcher label that is NOT backed by a dedicated column —
exactly the keys that would benefit from materialization
(record_attr_demand, src/querier/src/query/logs.rs:1375-1378). A
maintenance cycle drains the registry and feeds
``promotion_decisions(demand=…)`` (maintenance/jobs.py), closing the
demand → stats → promotion loop the reference runs via its catalog
flusher.

Process-global by design (mirroring the reference's OnceLock registry):
lowering stays free of counter plumbing, and on a cluster each driver
records the queries it planned — the drain/flush cycle aggregates.
"""

from __future__ import annotations

import threading
from collections import Counter

DemandKey = tuple[str, str, str, str]  # (tenant, dataset, signal, attr key)

_lock = threading.Lock()
_registry: Counter = Counter()


def record(tenant: str, dataset: str, signal: str, attr_key: str) -> None:
    """One query-filter hit for an attribute key."""
    with _lock:
        _registry[(tenant, dataset, signal, attr_key)] += 1


def drain() -> dict[DemandKey, int]:
    """Take all accumulated counters, leaving the registry empty —
    callers flush the result toward promotion decisions."""
    with _lock:
        out = dict(_registry)
        _registry.clear()
    return out


def peek() -> dict[DemandKey, int]:
    with _lock:
        return dict(_registry)


def demand_map(tenant: str, dataset: str, signal: str) -> dict[str, int]:
    """Counters for one (tenant, dataset, signal) in the shape
    ``promotion_decisions`` consumes ({attr_key: hits})."""
    with _lock:
        return {
            k[3]: v
            for k, v in _registry.items()
            if k[:3] == (tenant, dataset, signal)
        }


def record_logql_query(
    query, tenant: str, dataset: str, columns: "list[str] | None" = None
) -> None:
    """Record demand for every selector matcher in a parsed LogQL query
    whose label has no dedicated column: WELL_KNOWN labels and already
    promoted ``label_<key>`` columns (pass the table's ``columns``) are
    materialized — demand for them is meaningless."""
    from ..logql.ast import (
        BinOp,
        LabelReplace,
        LogSelector,
        RangeAgg,
        VectorAgg,
    )
    from ..logql.lowering import WELL_KNOWN

    def selectors(q):
        if isinstance(q, LogSelector):
            yield q
        elif isinstance(q, RangeAgg):
            yield q.selector
        elif isinstance(q, (VectorAgg, LabelReplace)):
            yield from selectors(q.expr)
        elif isinstance(q, BinOp):
            yield from selectors(q.lhs)
            yield from selectors(q.rhs)

    materialized = set(columns or ())
    for sel in selectors(query):
        for m in sel.matchers:
            if m.label not in WELL_KNOWN and f"label_{m.label}" not in materialized:
                record(tenant, dataset, "logs", m.label)


def record_promql_query(
    expr, tenant: str, dataset: str, columns: "list[str] | None" = None
) -> None:
    """Record demand for every selector matcher in a parsed PromQL
    expression whose label falls through to the ``attributes`` map —
    the reference records at the metrics query site the same way
    (record_attr_demand, src/querier/src/query/metrics.rs:281-285)."""
    from ..promql.ast import AggExpr, BinOp, Call, VectorSelector
    from ..promql.lowering import WELL_KNOWN

    def selectors(e):
        if isinstance(e, VectorSelector):
            yield e
        elif isinstance(e, Call):
            for a in e.args:
                yield from selectors(a)
        elif isinstance(e, AggExpr):
            yield from selectors(e.expr)
        elif isinstance(e, BinOp):
            yield from selectors(e.lhs)
            yield from selectors(e.rhs)

    materialized = set(columns or ())
    for sel in selectors(expr):
        for m in sel.matchers:
            if (
                m.label not in WELL_KNOWN
                and f"label_{m.label}" not in materialized
                and m.label not in materialized
            ):
                record(tenant, dataset, "metrics", m.label)


def record_traceql_query(parsed, tenant: str, dataset: str) -> None:
    """Record demand for span/resource/unscoped attribute keys of a
    parsed TraceQL expression — the reference records at the trace
    query site (record_attr_demand, src/querier/src/query/trace.rs:
    508-517). Intrinsics and the well-known ``service.name`` have
    dedicated columns; demand for them is meaningless."""
    from ..traceql.parser import (
        AggregateQuery,
        Disjunction,
        SelectQuery,
        StructuralQuery,
    )

    def preds(p):
        if isinstance(p, Disjunction):
            for g in p.groups:
                yield from g
        elif isinstance(p, StructuralQuery):
            yield from p.left
            yield from p.right
        elif isinstance(p, (AggregateQuery, SelectQuery)):
            yield from p.preds
        else:
            yield from p

    for pred in preds(parsed):
        if pred.scope not in ("intrinsic", "trace") and pred.key != "service.name":
            record(tenant, dataset, "traces", pred.key)
    if isinstance(parsed, SelectQuery):
        # select()ed attribute refs are read demand too: a projected
        # map key benefits from promotion exactly like a filtered one
        for f in parsed.fields:
            for scope in ("span.", "resource."):
                if f.startswith(scope) and f[len(scope):] != "service.name":
                    record(tenant, dataset, "traces", f[len(scope):])
