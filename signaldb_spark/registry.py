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

# Queries already hash-verified by the driver's correctness gate in rounds
# 1-2 (CORRECTNESS_r01/r02.json). The gate samples a prefix of the dict, so
# never-sampled queries are ordered FIRST to maximize cumulative driver
# evidence across rounds; these go last.
_DRIVER_VERIFIED = frozenset({
    "absent", "bottomk_per_bucket", "bytes_over_time", "calendar",
    "count_over_time", "count_values", "dedup_clusters", "dedup_exact",
    "dedup_jaccard", "dedup_minhash_lsh", "dedup_simhash", "deriv",
    "detected_fields", "distinct_discovery", "emb_cosine_topk",
    "emb_ivf_ann", "emb_lsh_ann", "first_last_over_time", "increase",
    "intersect_except", "ir_kleene", "irate", "label_replace",
    "line_filters", "logical_and", "logical_unless", "map_attr_ordered",
    "multimodal_features", "ne_matches_absent", "outer_agg",
    "point_lookup", "pricing_summary", "quantile_over_time", "rate",
    "region_revenue", "resets_changes", "scalar_value_ops",
    "semi_anti_join", "shipping_priority", "sliding_subquery",
    "sql_surface", "stddev_stdvar", "text_fingerprint", "text_lang_id",
    "text_quality", "text_tokens", "time_window_sorted", "topk_per_bucket",
    "union_by_name", "unwrap_aggs", "vector_compare", "vector_ratio",
})


def _reorder(d):
    fresh = {k: v for k, v in d.items() if k not in _DRIVER_VERIFIED}
    fresh.update({k: v for k, v in d.items() if k in _DRIVER_VERIFIED})
    return fresh


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return _reorder(out)


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _reorder(out)
