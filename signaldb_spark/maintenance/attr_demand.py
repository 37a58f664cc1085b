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
