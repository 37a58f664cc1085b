"""Unified field-discovery surface (query-field-discovery proposal).

The reference scatters "what can I query?" across dialect endpoints
(Loki labels/label-values, Tempo tag values, detected-fields) and its
`query-field-discovery` proposal
(/root/reference/openspec/changes/query-field-discovery/proposal.md)
designs the consolidation: one native, tenant-scoped introspection
surface over the SAME logical namespace as the IR — available sources,
queryable fields per source with canonical types, value suggestions
scoped by time range and the predicates chosen so far, and cardinality
hints — returned in a `metadata` result envelope. The delivery-side
half of the proposal (live tail, keyset pagination) already exists in
this repo (streaming/ingest.py tail_logs; the keyset_pagination gate);
this module is the build-side half.

Design points, mirrored from the proposal's open-questions section:

- **Registry-known vs detected fields**: materialized columns come from
  the schema (origin "column"); attribute keys are DETECTED by a
  bounded sample of the attribute maps (origin "attribute") — promoted
  and unpromoted fields present uniformly, the promotion-is-only-perf
  posture. Canonical types come from the attribute type authority
  (schemas/anyvalue.AttributeTypeRegistry) for attribute fields and
  from the physical schema for columns.
- **Bounded cost**: field detection samples ``sample_rows`` rows
  (LABEL_SCAN_LIMIT posture, metrics.rs:58); value suggestion is a
  windowed distinct-count capped at ``limit`` with a deterministic
  (count desc, value asc) order. Both push the time window down to the
  scan, so partition pruning bounds the bytes read at 100 TB.
- **Predicate-scoped discovery**: ``where`` (an IR predicate tree)
  scopes value suggestions — "given these filters so far, what can I
  add next" — reusing the planner's lowering, not a parallel one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SAMPLE_ROWS = 1000
DEFAULT_VALUE_LIMIT = 100
ATTR_COLUMNS = ("log_attributes", "attributes", "span_attributes")


def describe_sources(session) -> list[dict]:
    """Available signal sources for the tenant (only tables that
    actually exist — the catalog knows without scanning data)."""
    from ..catalog import SIGNAL_TABLES

    return [
        {"source": t, "available": session.table(t) is not None}
        for t in SIGNAL_TABLES
    ]


def _value_type(spark_type: str) -> str:
    if spark_type in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if spark_type in ("double", "float"):
        return "double"
    if spark_type == "boolean":
        return "bool"
    if spark_type == "timestamp":
        return "timestamp"
    if spark_type == "binary":
        return "bytes"
    return spark_type if "<" not in spark_type else spark_type


def describe_fields(
    df: DataFrame,
    attr_registry=None,
    sample_rows: int = DEFAULT_SAMPLE_ROWS,
) -> list[dict]:
    """Queryable fields for one source: materialized columns (typed
    from the physical schema) plus attribute keys DETECTED from a
    bounded sample of the attribute maps, each with its canonical type
    from the type authority. One bounded job; key detection explodes
    only the sampled slice."""
    from ..operators.attrs import attr_keys
    from ..schemas.anyvalue import is_anyvalue_map

    out = []
    for f in df.schema.fields:
        if f.name in ATTR_COLUMNS:
            continue
        out.append({
            "field": f.name,
            "type": _value_type(f.dataType.simpleString()),
            "origin": "column",
        })
    attr_cols = [c for c in ATTR_COLUMNS if c in df.columns]
    if attr_cols:
        sampled = df.limit(sample_rows)
        keys_col = F.array_distinct(
            F.flatten(F.array(*[
                F.coalesce(attr_keys(sampled, c), F.array().cast("array<string>"))
                for c in attr_cols
            ]))
        )
        keys = sorted({
            k
            for row in sampled.select(F.explode(keys_col).alias("k"))
            .distinct().collect()
            for k in [row["k"]] if k is not None
        })
        typed = any(
            is_anyvalue_map(df.schema[c].dataType) for c in attr_cols
        )
        for k in keys:
            ctype = (attr_registry.canonical(k)
                     if attr_registry is not None else "string")
            out.append({
                "field": k,
                "type": ctype if typed or attr_registry is not None else "string",
                "origin": "attribute",
            })
    return out


def suggest_values(
    df: DataFrame,
    field: str,
    where=None,
    limit: int = DEFAULT_VALUE_LIMIT,
) -> DataFrame:
    """Value suggestions for a field, scoped by the predicates chosen
    so far: distinct values with counts, (count desc, value asc)
    deterministic, capped. The caller applies the time window BEFORE
    this function so partition pruning engages; ``where`` is an IR
    predicate tree lowered by the planner (one lowering, never a
    parallel dialect)."""
    from .planner import _field, _pred

    if where is not None:
        df = df.filter(_pred(df, where))
    return (
        df.select(_field(df, field).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("value").asc())
        .limit(limit)
    )


def field_cardinality_hints(
    df: DataFrame, fields: list[str], sample_rows: int = 10_000
) -> list[dict]:
    """Approximate distinct-value counts over a bounded sample — the
    'is this field groupable or an id?' hint the builder shows next to
    each field. HLL sketches on the sampled slice: one job, bounded
    memory, never an exact global distinct."""
    from .planner import _field

    sampled = df.limit(sample_rows)
    aggs = [
        F.approx_count_distinct(_field(sampled, f)).alias(f) for f in fields
    ]
    row = sampled.agg(*aggs).first()
    return [
        {"field": f, "approx_distinct": int(row[f] or 0),
         "sampled_rows": sample_rows}
        for f in fields
    ]
