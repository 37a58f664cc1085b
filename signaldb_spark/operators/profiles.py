"""Continuous-profiling operators: flamegraph aggregation + trace
correlation.

The reference aggregates profiles into a flamegraph tree with a
driver-side fold (src/common/src/profile/aggregation.rs:59,267 — tree
fold over stacktrace/sample JSON); here the fold is an explode of every
stack prefix + one groupBy, which distributes: a 100 TB profile corpus
aggregates with one shuffle keyed on the (bounded-cardinality) frame
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STACKS_TYPE = "array<array<string>>"
SAMPLES_TYPE = "array<struct<stacktrace_idx:int, value:long>>"


def flamegraph(profiles: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Fold sampled stacks into flamegraph rows: one row per distinct
    frame-path prefix with its summed self+child weight.

    Output: (path ';'-joined root→leaf, depth, frame, value).
    The root invariant: sum of depth-1 values == total sample weight.
    """
    group_cols = group_cols or []
    stacks = F.from_json(F.col("stacktraces_json"), STACKS_TYPE)
    samples = F.from_json(F.col("samples_json"), SAMPLES_TYPE)
    s = profiles.select(
        *group_cols, stacks.alias("stacks"), F.explode(samples).alias("sample")
    )
    stack = F.element_at(F.col("stacks"), F.col("sample.stacktrace_idx") + 1)
    s = s.select(
        *group_cols,
        stack.alias("stack"),
        F.col("sample.value").alias("weight"),
    ).filter(F.col("stack").isNotNull())
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size("stack")),
        lambda d: F.array_join(F.slice(F.col("stack"), 1, d), ";"),
    )
    p = s.select(*group_cols, "weight", F.explode(prefixes).alias("path"))
    out = (
        p.groupBy(*group_cols, "path")
        .agg(F.sum("weight").alias("value"))
        .withColumn("depth", F.size(F.split(F.col("path"), ";")))
        .withColumn("frame", F.element_at(F.split(F.col("path"), ";"), -1))
    )
    return out.select(*group_cols, "path", "depth", "frame", "value")


def flamegraph_self(profiles: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Flamegraph with BOTH cumulative and self weight per frame path —
    the "self time" column every profiler UI ranks hot frames by
    (cumulative alone can't distinguish a hot leaf from a hot subtree).

    Same single prefix-explode + ONE groupBy as :func:`flamegraph`: the
    leaf indicator (prefix depth == stack depth) rides each exploded
    row, so self = sum of weights where the prefix IS the full stack —
    no second pass, no join. Invariant: value_self(path) =
    value(path) − Σ value(direct children)."""
    group_cols = group_cols or []
    stacks = F.from_json(F.col("stacktraces_json"), STACKS_TYPE)
    samples = F.from_json(F.col("samples_json"), SAMPLES_TYPE)
    s = profiles.select(
        *group_cols, stacks.alias("stacks"), F.explode(samples).alias("sample")
    )
    stack = F.element_at(F.col("stacks"), F.col("sample.stacktrace_idx") + 1)
    s = s.select(
        *group_cols,
        stack.alias("stack"),
        F.col("sample.value").alias("weight"),
    ).filter(F.col("stack").isNotNull())
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size("stack")),
        lambda d: F.struct(
            F.array_join(F.slice(F.col("stack"), 1, d), ";").alias("path"),
            (d == F.size("stack")).cast("int").alias("is_leaf"),
        ),
    )
    p = s.select(*group_cols, "weight", F.explode(prefixes).alias("pp"))
    out = (
        p.groupBy(*group_cols, F.col("pp.path").alias("path"))
        .agg(
            F.sum("weight").alias("value"),
            F.sum(F.col("weight") * F.col("pp.is_leaf")).alias("value_self"),
        )
        .withColumn("depth", F.size(F.split(F.col("path"), ";")))
        .withColumn("frame", F.element_at(F.split(F.col("path"), ";"), -1))
    )
    return out.select(*group_cols, "path", "depth", "frame", "value", "value_self")


def find_by_trace(profiles: DataFrame, trace_id: str, span_id: str | None = None) -> DataFrame:
    """Profile↔trace correlation: equality filter on trace_id (+span)
    (find_by_trace_with_tenant, src/querier/src/query/profile.rs:402-456)."""
    out = profiles.filter(F.col("trace_id") == trace_id)
    if span_id is not None:
        out = out.filter(F.col("span_id") == span_id)
    return out


def flamegraph_diff(
    profiles: DataFrame,
    base_start,
    base_end,
    comp_start,
    comp_end,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Differential flamegraph between two time windows (the
    Parca/Pyroscope "compare" view; beyond-reference — the reference
    renders single-window flamegraphs only).

    One pass over the union of both windows: each sample is tagged with
    its window before the prefix explode, so the shuffle key stays
    (path) and both windows' weights land in the same reduce row —
    no join of two flamegraphs. Output per path: base/comp weights and
    the absolute delta; paths absent from a window report 0.
    """
    tagged = profiles.filter(
        F.col(ts_col).between(base_start, base_end)
        | F.col(ts_col).between(comp_start, comp_end)
    ).withColumn(
        "_w_comp",
        F.col(ts_col).between(comp_start, comp_end).cast("int"),
    )
    fg = flamegraph(tagged, group_cols=["_w_comp"])
    return (
        fg.groupBy("path", "depth", "frame")
        .agg(
            F.sum(F.when(F.col("_w_comp") == 0, F.col("value")).otherwise(0))
            .alias("base_value"),
            F.sum(F.when(F.col("_w_comp") == 1, F.col("value")).otherwise(0))
            .alias("comp_value"),
        )
        .withColumn("delta", F.col("comp_value") - F.col("base_value"))
    )


def profile_types(df: DataFrame, cap: int = 1000) -> DataFrame:
    """/pyroscope/profile-types (profile.rs:234-274): distinct
    "sample_type:sample_unit" strings over the window; empty sample_type
    dropped, null unit renders as empty. Single-projection distinct —
    column-pruned scan, tiny result."""
    t = F.col("sample_type")
    u = F.coalesce(F.col("sample_unit"), F.lit(""))
    return (
        df.filter(t.isNotNull() & (t != ""))
        .select(F.concat_ws(":", t, u).alias("profile_type"))
        .distinct()
        .orderBy("profile_type")
        .limit(cap)
    )


def profile_label_names(
    df: DataFrame, attr_col: str = "profile_attributes", cap: int = 1000
) -> DataFrame:
    """/pyroscope/label-names (profile.rs:278-322): "service_name" plus
    every attribute-map key, deduped/sorted/capped. The reference samples
    LABEL_SCAN_LIMIT attribute documents driver-side (it cannot sort Map
    columns in Arrow's row format); exploding map keys in-engine needs
    no sampling cap to stay bounded."""
    keys = df.select(F.explode(F.map_keys(F.col(attr_col))).alias("label"))
    fixed = df.sparkSession.createDataFrame([("service_name",)], "label string")
    return (
        keys.unionByName(fixed)
        .filter(F.col("label").isNotNull() & (F.col("label") != ""))
        .distinct()
        .orderBy("label")
        .limit(cap)
    )


def profile_label_values(
    df: DataFrame, label: str, attr_col: str = "profile_attributes", cap: int = 1000
) -> DataFrame:
    """/pyroscope/label-values (profile.rs:324-380): service_name routes
    to its dedicated column, anything else to the attribute map value;
    distinct non-empty, sorted, capped."""
    if not label:
        raise ValueError("label name must not be empty")
    col = (
        F.col("service_name") if label == "service_name" else F.col(attr_col)[label]
    )
    return (
        df.select(col.cast("string").alias("value"))
        .filter(F.col("value").isNotNull() & (F.col("value") != ""))
        .distinct()
        .orderBy("value")
        .limit(cap)
    )


def flamegraph_truncate(
    fg: DataFrame, max_nodes: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Pyroscope-style node cap (its ``max-nodes`` / ``truncate`` render
    option): keep the ``max_nodes`` heaviest frame paths and collapse
    each kept node's dropped subtree weight into a synthetic
    ``<path>;other`` child, so totals still roll up exactly.

    Input must be :func:`flamegraph_self` output (needs ``value_self``:
    other = value − value_self − Σ kept direct children). Ranking by
    (value DESC, depth ASC, path ASC) is prefix-closed — in a
    cumulative flamegraph value(parent) ≥ value(child), and the
    depth tiebreak puts a parent before an equal-valued child — so the
    kept set is always a valid tree. The ranking window partitions on
    ``group_cols``; within one flamegraph the row count is bounded by
    distinct frame paths, which is what keeps a global-ish window
    acceptable here (profile trees, not event streams)."""
    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("value").desc(), F.col("depth").asc(), F.col("path").asc()
    )
    kept = (
        fg.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_nodes)
        .drop("_rk")
    )
    parent = F.when(
        F.col("depth") > 1,
        F.expr("substring(path, 1, length(path) - length(frame) - 1)"),
    )
    child_sums = (
        kept.filter(F.col("depth") > 1)
        .select(*group_cols, parent.alias("path"), "value")
        .groupBy(*group_cols, "path")
        .agg(F.sum("value").alias("_kept_children"))
    )
    with_other = kept.join(child_sums, [*group_cols, "path"], "left")
    other_val = F.col("value") - F.col("value_self") - F.coalesce(
        "_kept_children", F.lit(0)
    )
    others = with_other.filter(other_val > 0).select(
        *group_cols,
        F.concat(F.col("path"), F.lit(";other")).alias("path"),
        (F.col("depth") + 1).alias("depth"),
        F.lit("other").alias("frame"),
        other_val.alias("value"),
        other_val.alias("value_self"),
    )
    return kept.unionByName(others)
