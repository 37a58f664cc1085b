"""Central registry merging every query battery for the driver contract."""

from __future__ import annotations

from . import (
    bench_logql,
    bench_promql,
    bench_queries,
    bench_relational,
    bench_sessions,
    bench_trace_ir,
    bench_trainingdata,
)

_MODULES = [
    bench_queries,
    bench_relational,
    bench_trainingdata,
    bench_logql,
    bench_promql,
    bench_trace_ir,
    bench_sessions,
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
