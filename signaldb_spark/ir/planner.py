"""IR → DataFrame lowering (the Spark ir_planner).

Mirrors src/querier/src/query/ir_planner.rs: extract stages first (one
derived column per field, cast to the declared type — the reference's
``ir_extract`` UDF becomes built-in expressions here, ir_planner.rs:
471-497), then the predicate tree (Kleene NULL semantics are plain
Spark SQL semantics, :631-795), then aggregate (:522-597), rank
(:509-520), curated projection (:797) and the row cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import timeseries as ts
from .model import Aggregate, Extract, IRQuery, Leaf, Node, Pred

_LOGFMT_RE = r"([a-zA-Z_][a-zA-Z0-9_]*)=([^\s\"]+)"

MAX_ROWS_DEFAULT = 1_000_000


def _extract_col(e: Extract) -> Column:
    src = F.col(e.source)
    if e.parser == "json":
        raw = F.get_json_object(src, f"$.{e.field_name}")
    elif e.parser == "logfmt":
        from ..operators.attrs import logfmt_value

        # shared first-occurrence, quoted-value-aware extraction — a
        # repeated key in one line must not abort the query via
        # DUPLICATED_MAP_KEY (Spark's default map dedup policy)
        raw = logfmt_value(src, e.field_name)
    else:  # regex
        raw = F.nullif(F.regexp_extract(src, e.pattern, 1), F.lit(""))
    if e.out_type == "string":
        return raw
    return raw.try_cast({"long": "long", "double": "double", "boolean": "boolean"}[e.out_type])


def _field(df: DataFrame, name: str) -> Column:
    if name in df.columns:
        return F.col(name)
    # attribute-map fallback chain (promotion-invariant resolution: the
    # same IR works whether a key is materialized or still in the map);
    # record-level maps win, resource-level resolves last — the traces.v3
    # typed layout makes resource_attributes a first-class predicate home
    candidates = [c for c in ("log_attributes", "attributes",
                              "span_attributes", "resource_attributes")
                  if c in df.columns]
    if not candidates:
        return F.lit(None).cast("string")
    from ..operators.attrs import attr_value

    cols = [attr_value(df, c, name) for c in candidates]
    return F.coalesce(*cols) if len(cols) > 1 else cols[0]


def _numeric_field(df: DataFrame, name: str) -> Column | None:
    """Typed numeric view of an attribute (otel-native-schema layout):
    when the backing map is a typed AnyValue map, numeric predicates
    read the int/double HOME directly — longs compare in codegen, and a
    string residue under a numeric key reads NULL (row dropped, Kleene)
    instead of poisoning the scan with an ANSI cast error. Returns None
    for materialized columns and legacy layouts (their existing cast
    semantics stand)."""
    if name in df.columns:
        return None
    from ..operators.attrs import attr_number

    cols = [
        c
        for c in (
            attr_number(df, ac, name)
            for ac in ("log_attributes", "attributes",
                       "span_attributes", "resource_attributes")
            if ac in df.columns
        )
        if c is not None
    ]
    if not cols:
        return None
    return F.coalesce(*cols) if len(cols) > 1 else cols[0]


def _pred(df: DataFrame, p: Pred) -> Column:
    if isinstance(p, Node):
        if p.kind == "and":
            out = _pred(df, p.children[0])
            for c in p.children[1:]:
                out = out & _pred(df, c)
            return out
        if p.kind == "or":
            out = _pred(df, p.children[0])
            for c in p.children[1:]:
                out = out | _pred(df, c)
            return out
        return ~_pred(df, p.children[0])  # NOT: NULL stays NULL → row dropped (Kleene)
    col = _field(df, p.f)
    if (
        p.op in ("eq", "ne", "gt", "gte", "lt", "lte", "between")
        and isinstance(p.value, (int, float))
        and not isinstance(p.value, bool)
    ):
        typed = _numeric_field(df, p.f)
        if typed is not None:
            col = typed
    if p.op == "exists":
        return col.isNotNull()
    if p.op == "eq":
        return col == p.value
    if p.op == "ne":
        return col != p.value  # NULL-absent rows fail (Kleene), unlike LogQL !=
    if p.op == "gt":
        return col > p.value
    if p.op == "gte":
        return col >= p.value
    if p.op == "lt":
        return col < p.value
    if p.op == "lte":
        return col <= p.value
    if p.op == "in":
        return col.isin(*p.value)
    if p.op == "between":
        return col.between(p.value, p.upper)
    if p.op == "contains":
        return col.contains(p.value)
    if p.op == "regex":
        return col.rlike(p.value)
    raise ValueError(p.op)


def _aggregate(df: DataFrame, a: Aggregate, ts_col: str) -> DataFrame:
    value = F.col(a.value_field) if a.value_field else None
    exprs = {
        "count": lambda: F.count(F.lit(1)).cast("double"),
        "sum": lambda: F.sum(value),
        "avg": lambda: F.avg(value),
        "min": lambda: F.min(value),
        "max": lambda: F.max(value),
        "quantile": lambda: F.percentile(value, F.lit(a.quantile)),
    }
    agg = exprs[a.op]().alias("value")
    keys = list(a.by)
    if a.step_seconds:
        df = ts.with_bucket(df, ts_col, a.step_seconds)
        keys = ["bucket", *keys]
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def lower(
    df: DataFrame, q: IRQuery, ts_col: str = "timestamp", max_rows: int = MAX_ROWS_DEFAULT,
    correlate_df: DataFrame | None = None,
) -> DataFrame:
    for e in q.extract:
        df = df.withColumn(e.field_name, _extract_col(e))
    if q.where is not None:
        df = df.filter(_pred(df, q.where))
    if q.match is not None:
        # structural trace match (the reference's IR roadmap item):
        # delegate to the TraceQL structural lowering — the span table
        # must carry trace_id/span_id/parent_span_id
        from ..traceql.structural import child_spans, descendant_spans, sibling_spans

        left = _pred(df, q.match.left)
        right = _pred(df, q.match.right)
        fn = {">": child_spans, ">>": descendant_spans, "~": sibling_spans}[q.match.op]
        df = fn(df, left, right)
    if q.correlate is not None:
        # cross-signal correlate stage (the reference's IR roadmap item):
        # plain equi-join on the shared keys — scale follows the normal
        # join rules (broadcast small side / hash otherwise); semi/anti
        # carry no right-side columns by construction
        if correlate_df is None:
            raise ValueError(
                f"query correlates with {q.correlate.with_table!r}: pass correlate_df"
            )
        c = q.correlate
        if c.how in ("semi", "anti"):
            df = df.join(
                correlate_df.select(*c.on).distinct(), list(c.on),
                "left_semi" if c.how == "semi" else "left_anti",
            )
        else:
            right = correlate_df.select(
                *c.on, *[F.col(s).alias(f"{c.prefix}{s}") for s in c.select]
            )
            if c.select:
                # many-to-one guard: one right row per key set
                right = right.groupBy(*c.on).agg(
                    *[
                        F.min(f"{c.prefix}{s}").alias(f"{c.prefix}{s}")
                        for s in c.select
                    ]
                )
            else:
                right = right.distinct()
            df = df.join(right, list(c.on), c.how)
    if q.aggregate is not None:
        df = _aggregate(df, q.aggregate, ts_col)
    if q.rank is not None:
        order = F.col(q.rank.value).desc() if q.rank.kind == "topk" else F.col(q.rank.value).asc()
        tiebreaks = [F.col(c).asc() for c in df.columns if c != q.rank.value]
        df = df.orderBy(order, *tiebreaks).limit(q.rank.k)
    if q.select:
        df = df.select(*q.select)
    return df.limit(q.limit if q.limit is not None else max_rows)
