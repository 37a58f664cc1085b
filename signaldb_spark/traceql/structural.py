"""TraceQL structural operators: parent/child ``>``, ancestor/descendant
``>>``, sibling ``~``.

Beyond-reference extension: the reference rejects structural spanset
expressions outright (search_filter.rs:240-246 — "only a single { ... }
spanset is supported"), but Tempo's TraceQL defines them and trace
debugging needs them. Semantics follow Tempo: ``{A} > {B}`` returns the
spans matching B whose *direct parent* matches A; ``{A} >> {B}`` the
spans matching B with *any ancestor* matching A; ``{A} ~ {B}`` the spans
matching B that share a parent with a *different* span matching A.

Scale design:
- ``>`` and ``~`` are single-hop: plain semi-joins on (trace_id, parent
  link) — hash-partitioned, both sides pre-filtered so only matching
  spans shuffle.
- ``>>`` needs the transitive closure of parent links. Rather than N
  iterative join rounds (N shuffles of the span set), we shuffle ONCE on
  trace_id, build each trace's parent map with ``map_from_entries``, and
  chase pointers with a depth-unrolled ``element_at`` chain — entirely
  JVM-side whole-stage codegen, no Python in the loop. Traces are
  naturally bounded (spans-per-trace is small relative to the corpus) so
  the per-trace map fits comfortably; a 1000-executor layout
  parallelizes across traces. ``descendant_spans_closure`` keeps an
  Arrow-batched ``applyInPandas`` variant for pathological depth
  (deeper than ``max_depth`` links).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def structural_search(spans: DataFrame, sq, depth_bound: int | None = None) -> DataFrame:
    """Lower a parsed :class:`~.parser.StructuralQuery` against a span
    table (the flatten_otlp_traces schema): fold each side's predicates
    with AND via trace_ops.predicate_expr, then dispatch on the op.
    ``depth_bound``: documented max parent-chain depth for the corpus;
    None measures it (see descendant_spans_routed)."""
    from .trace_ops import predicate_expr

    def _fold(preds) -> Column:
        cond = F.lit(True)
        for p in preds:
            cond = cond & predicate_expr(spans, p)
        return cond

    left, right = _fold(sq.left), _fold(sq.right)
    neg = sq.op.startswith("!")
    op = sq.op.lstrip("!")
    if op == ">":
        return child_spans(spans, left, right, negate=neg)
    if op == ">>":
        return descendant_spans_routed(
            spans, left, right, negate=neg, depth_bound=depth_bound
        )
    if op == "~":
        return sibling_spans(spans, left, right, negate=neg)
    raise ValueError(f"unknown structural op {sq.op!r}")


def aggregate_search(spans: DataFrame, aq) -> DataFrame:
    """Lower a parsed :class:`~.parser.AggregateQuery`: fold the spanset
    predicates, then apply the per-trace aggregate filter."""
    from .trace_ops import predicate_expr

    cond = F.lit(True)
    for p in aq.preds:
        cond = cond & predicate_expr(spans, p)
    # TraceQL spells equality `=`; SPANSET_OPS carries both spellings
    return spanset_aggregate(spans, cond, aq.agg, aq.op, aq.threshold, aq.agg_col)


def child_spans(
    spans: DataFrame, parent_cond: Column, child_cond: Column, negate: bool = False
) -> DataFrame:
    """``{parent_cond} > {child_cond}`` — spans matching child_cond whose
    direct parent matches parent_cond, in the same trace. ``negate``
    (Tempo's experimental ``!>``): child_cond spans whose parent does
    NOT match — the same join flipped to anti."""
    parents = (
        spans.filter(parent_cond)
        .select(F.col("trace_id").alias("_p_trace"), F.col("span_id").alias("_p_span"))
        .distinct()
    )
    children = spans.filter(child_cond)
    return children.join(
        parents,
        (children["trace_id"] == parents["_p_trace"])
        & (children["parent_span_id"] == parents["_p_span"]),
        "leftanti" if negate else "leftsemi",
    )


def sibling_spans(
    spans: DataFrame, left_cond: Column, right_cond: Column, negate: bool = False
) -> DataFrame:
    """``{left_cond} ~ {right_cond}`` — spans matching right_cond that
    share a parent with a DIFFERENT span matching left_cond; ``!~``
    flips to the anti form (no such sibling)."""
    left = (
        spans.filter(left_cond)
        .filter(F.col("parent_span_id").isNotNull())
        .select(
            F.col("trace_id").alias("_l_trace"),
            F.col("parent_span_id").alias("_l_parent"),
            F.col("span_id").alias("_l_span"),
        )
    )
    right = spans.filter(right_cond)
    if not negate:
        # positive form: a root span has no siblings, so it can never
        # match. The NEGATED form must KEEP root spans — "no matching
        # sibling" is trivially true for them (the anti join's null
        # parent never equals _l_parent, so they survive naturally;
        # pre-filtering them out here was the bug)
        right = right.filter(F.col("parent_span_id").isNotNull())
    return right.join(
        left,
        (right["trace_id"] == left["_l_trace"])
        & (right["parent_span_id"] == left["_l_parent"])
        & (right["span_id"] != left["_l_span"]),
        "leftanti" if negate else "leftsemi",
    )


def descendant_spans(
    spans: DataFrame,
    ancestor_cond: Column,
    descendant_cond: Column,
    max_depth: int = 16,
    negate: bool = False,
) -> DataFrame:
    """``{ancestor_cond} >> {descendant_cond}`` — spans matching
    descendant_cond with any transitive ancestor (up to ``max_depth``
    parent links) matching ancestor_cond.

    One shuffle (groupBy trace_id); the closure is a depth-unrolled
    pointer chase through a per-trace ``map_from_entries`` parent map —
    all JVM expressions, no UDF."""
    data_cols = [c for c in spans.columns if c != "trace_id"]
    marked = spans.withColumn("_is_anc", ancestor_cond.cast("boolean")).withColumn(
        "_is_desc", descendant_cond.cast("boolean")
    )
    agg = marked.groupBy("trace_id").agg(
        F.collect_list(
            F.struct(*data_cols, F.col("_is_anc"), F.col("_is_desc"))
        ).alias("_ss")
    )
    ss = F.col("_ss")
    # array_distinct before map_from_entries: a replayed/duplicated span
    # (same span_id + parent twice in one trace — ingestion does not
    # dedup) would otherwise abort the query with DUPLICATED_MAP_KEY
    # under Spark's default dedup policy. Same id with CONTRADICTORY
    # parents remains a loud error — that is corrupt data, not replay.
    parent_map = F.map_from_entries(
        F.array_distinct(
            F.transform(ss, lambda s: F.struct(s["span_id"], s["parent_span_id"]))
        )
    )
    # ancestor membership as a map, not an array: each chase hop is then
    # an O(1) map probe instead of an O(|ancestors|) array scan — the
    # per-span cost drops from depth×|anc| to depth
    anc_map = F.map_from_entries(
        F.array_distinct(
            F.transform(
                F.filter(ss, lambda s: F.coalesce(s["_is_anc"], F.lit(False))),
                lambda s: F.struct(s["span_id"], F.lit(True)),
            )
        )
    )
    agg = agg.withColumn("_pm", parent_map).withColumn("_anc", anc_map)

    def _has_matching_ancestor(s) -> Column:
        cur = s["span_id"]
        hit = F.lit(False)
        for _ in range(max_depth):
            cur = F.element_at(F.col("_pm"), cur)
            hit = hit | F.coalesce(
                F.element_at(F.col("_anc"), cur), F.lit(False)
            )
        return hit

    matched = F.filter(
        ss,
        lambda s: F.coalesce(s["_is_desc"], F.lit(False))
        & (~_has_matching_ancestor(s) if negate else _has_matching_ancestor(s)),
    )
    return (
        agg.select("trace_id", F.explode(matched).alias("_s"))
        .select("trace_id", *[F.col(f"_s.{c}").alias(c) for c in data_cols])
        .select(*spans.columns)
    )


JVM_UNROLL_CAP = 16  # descendant_spans' default expression-unroll depth


def corpus_exceeds_depth(spans: DataFrame, cap: int = JVM_UNROLL_CAP) -> bool:
    """Exact routing probe: does ANY span have a parent chain longer
    than ``cap``? Chases ``cap`` hops through the same per-trace
    ``map_from_entries`` parent map the JVM unroll uses and checks
    whether anything is still un-rooted — one groupBy on trace_id (the
    identical shuffle the routed query performs next) over three short
    columns, reduced to a single boolean."""
    agg = (
        spans.select("trace_id", "span_id", "parent_span_id")
        .groupBy("trace_id")
        .agg(F.collect_list(F.struct("span_id", "parent_span_id")).alias("_ss"))
        .withColumn(
            "_pm",
            F.map_from_entries(
                F.transform(
                    F.col("_ss"), lambda s: F.struct(s["span_id"], s["parent_span_id"])
                )
            ),
        )
    )

    def _deep(s) -> Column:
        cur = s["span_id"]
        for _ in range(cap):
            cur = F.element_at(F.col("_pm"), cur)
        return cur.isNotNull()

    row = (
        agg.select(F.exists("_ss", _deep).alias("_d")).agg(F.max("_d")).first()
    )
    return bool(row[0])


def descendant_spans_routed(
    spans: DataFrame,
    ancestor_cond: Column,
    descendant_cond: Column,
    negate: bool = False,
    depth_bound: int | None = None,
) -> DataFrame:
    """``>>`` with measured depth routing: the JVM depth-unrolled chase
    (descendant_spans) whenever the corpus' parent chains fit the
    unroll cap, the Arrow closure only when they measurably don't — so
    the Python fallback cannot be selected by accident at scale, and a
    deep corpus cannot be silently truncated at 16 hops.

    ``depth_bound`` short-circuits the probe with a documented bound
    (e.g. an SDK-enforced max span depth); None runs
    :func:`corpus_exceeds_depth` — one extra trace_id-shuffled job,
    scan-shaped, before the query itself."""
    if depth_bound is not None:
        use_jvm = depth_bound <= JVM_UNROLL_CAP
    else:
        use_jvm = not corpus_exceeds_depth(spans)
    if use_jvm:
        return descendant_spans(
            spans, ancestor_cond, descendant_cond, negate=negate
        )
    pos = descendant_spans_closure(spans, ancestor_cond, descendant_cond)
    if not negate:
        return pos
    # anti form over the closure: descendant-matching spans minus the
    # positive matches, joined on the span identity
    return spans.filter(descendant_cond).join(
        pos.select("trace_id", "span_id").distinct(),
        ["trace_id", "span_id"],
        "leftanti",
    )


def descendant_spans_closure(
    spans: DataFrame, ancestor_cond: Column, descendant_cond: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """Unbounded-depth ``>>`` via an Arrow-batched closure — the
    fallback when trace depth can exceed ``descendant_spans``'s unroll
    cap. The walk is memoized so each parent chain is traversed once per
    trace.

    Traces are grouped into ``n_buckets`` hash buckets and the Python
    function runs once per BUCKET, grouping by trace in pandas inside —
    per-group ``applyInPandas`` on naturally-tiny trace groups pays one
    Python/Arrow round-trip per trace (measured ~3.5 ms each: 15k traces
    → ~50 s); bucketing amortizes that to one round-trip per bucket
    while keeping the same single shuffle."""
    marked = (
        spans.withColumn("_is_anc", ancestor_cond.cast("boolean"))
        .withColumn("_is_desc", descendant_cond.cast("boolean"))
        .withColumn("_b", F.pmod(F.xxhash64("trace_id"), F.lit(n_buckets)))
    )
    out_schema = spans.schema

    def _bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # one keyed dict for the whole bucket — (trace, span) keys keep
        # traces independent without per-trace pandas slicing (15k
        # groupby slices cost ~10 s/bucket-set; one pass is ~free)
        t = pdf["trace_id"].tolist()
        s = pdf["span_id"].tolist()
        p = pdf["parent_span_id"].tolist()
        is_anc = pdf["_is_anc"].fillna(False).tolist()
        is_desc = pdf["_is_desc"].fillna(False).tolist()
        parent: dict = {}
        anc: set = set()
        for i in range(len(t)):
            pi = p[i]
            parent[(t[i], s[i])] = None if pi is None or pd.isna(pi) else (t[i], pi)
            if is_anc[i]:
                anc.add((t[i], s[i]))
        memo: dict = {}

        def has_anc(key) -> bool:
            chain = []
            on_chain = set()  # cycle guard: corrupt parent pointers
            cur = parent.get(key)
            hit = False
            while cur is not None:
                if cur in anc:
                    hit = True
                    break
                if cur in memo:
                    hit = memo[cur]
                    break
                if cur in on_chain:
                    # A->B->A parent cycle (corrupt/reparented data):
                    # no true ancestor was found along it — terminate
                    # instead of walking forever
                    break
                chain.append(cur)
                on_chain.add(cur)
                cur = parent.get(cur)
            for c in chain:
                memo[c] = hit
            return hit

        keep = [
            bool(is_desc[i]) and has_anc((t[i], s[i])) for i in range(len(t))
        ]
        return pdf.loc[keep].drop(columns=["_is_anc", "_is_desc", "_b"])

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(marked.sparkSession)
    return marked.groupBy("_b").applyInPandas(_bucket, schema=out_schema)


SPANSET_AGGS = {
    "count": lambda c: F.count(F.lit(1)),  # cast-free: .over() must wrap the bare aggregate
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
}

SPANSET_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def spanset_aggregate(
    spans: DataFrame,
    cond: Column,
    agg: str,
    op: str,
    threshold: float,
    agg_col: str | None = None,
) -> DataFrame:
    """Tempo spanset aggregate filter ``{cond} | agg(col) op threshold``
    (e.g. ``{ span.flag = "R" } | avg(span.qty) > 25``): per trace,
    aggregate over the spans matching ``cond``; traces whose aggregate
    satisfies the predicate return their matching spans.

    Filter-first then ONE window over trace_id — the aggregate is
    computed only over already-matching spans and no join back to the
    corpus is needed; a single shuffle on trace_id, the same key every
    other per-trace operator shuffles on (exchange reuse applies when
    composed).
    """
    if agg not in SPANSET_AGGS:
        raise ValueError(f"unsupported spanset aggregate {agg!r}")
    if op not in SPANSET_OPS:
        raise ValueError(f"unsupported spanset comparison {op!r}")
    if agg != "count" and agg_col is None:
        raise ValueError(f"spanset aggregate {agg!r} needs agg_col")
    if agg_col is None:
        field = F.lit(1)
    elif agg_col in spans.columns:
        # direct callers pass physical columns ("qty", "duration_nanos")
        field = F.col(agg_col)
    else:
        # parsed fields route like select(): intrinsics ("duration" →
        # duration_nanos), scoped/unscoped attribute refs through the
        # layout-aware lookup; attribute strings compare numerically
        from .trace_ops import select_field_expr

        field = select_field_expr(agg_col, spans).try_cast("double")
    agg_expr = SPANSET_AGGS[agg](field)
    w = Window.partitionBy("trace_id")
    return (
        spans.filter(cond)
        .withColumn("_agg", agg_expr.over(w))
        .filter(SPANSET_OPS[op](F.col("_agg"), F.lit(threshold)))
        .drop("_agg")
    )


def critical_path(
    spans: DataFrame,
    duration_col: str = "duration_nanos",
    max_depth: int = 16,
) -> DataFrame:
    """Per-trace critical path: the span whose ancestor chain (itself +
    every transitive parent) carries the largest summed duration — the
    first thing a latency investigation wants from a trace. Beyond the
    reference, which has no trace analytics at all.

    Same single-shuffle layout as ``descendant_spans``: one groupBy on
    trace_id, per-trace parent and duration maps, a depth-unrolled
    O(1)-probe chase per span, then an in-row array max. Ties break to
    the highest span id (mirrored exactly in the oracle).

    Output: (trace_id, critical_span_id, critical_path_nanos).
    """
    agg = spans.groupBy("trace_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_id"),
                F.col("parent_span_id"),
                F.col(duration_col).cast("long").alias("_d"),
            )
        ).alias("_ss")
    )
    ss = F.col("_ss")
    # array_distinct: replayed duplicate spans must not abort with
    # DUPLICATED_MAP_KEY (same rule as the descendant maps above)
    pm = F.map_from_entries(
        F.array_distinct(
            F.transform(ss, lambda s: F.struct(s["span_id"], s["parent_span_id"]))
        )
    )
    dm = F.map_from_entries(
        F.array_distinct(
            F.transform(ss, lambda s: F.struct(s["span_id"], s["_d"]))
        )
    )
    agg = agg.withColumn("_pm", pm).withColumn("_dm", dm)

    def _path_sum(s):
        total = s["_d"]
        cur = s["span_id"]
        for _ in range(max_depth):
            cur = F.try_element_at(F.col("_pm"), cur)
            total = total + F.coalesce(
                F.try_element_at(F.col("_dm"), cur), F.lit(0).cast("long")
            )
        return total

    best = F.array_max(
        F.transform(ss, lambda s: F.struct(_path_sum(s).alias("p"), s["span_id"]))
    )
    return agg.select(
        "trace_id",
        best["span_id"].alias("critical_span_id"),
        best["p"].alias("critical_path_nanos"),
    )
