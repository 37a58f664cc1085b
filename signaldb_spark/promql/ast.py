"""PromQL AST (engine-neutral), modeled on the reference's QueryPlan
shapes (src/querier/src/query/promql.rs:344-377: Single | BinaryVector |
BinaryCompare | BinaryLogical | Subquery) but kept as an expression tree
the lowering walks."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LabelMatcher:
    label: str
    op: str  # = != =~ !~
    value: str


@dataclass(frozen=True)
class VectorSelector:
    metric: str | None  # None = only matchers ({__name__=~"..."} form)
    matchers: tuple[LabelMatcher, ...] = ()
    range_seconds: float | None = None  # set for m[5m]
    offset_seconds: float = 0.0
    subquery: tuple[float, float] | None = None  # (range, resolution)
    at_epoch: float | None = None  # @ modifier: evaluate at pinned instant


@dataclass(frozen=True)
class Call:
    """Function call: rate(...), histogram_quantile(...), abs(...),
    clamp(...), absent(...), vector(...), time(), calendar fns..."""

    fn: str
    args: tuple["Expr", ...]


@dataclass(frozen=True)
class AggExpr:
    op: str  # sum avg min max count group stddev stdvar quantile topk bottomk count_values
    expr: "Expr"
    grouping: tuple[str, ...] = ()
    without: bool = False
    param: float | str | None = None  # quantile φ / topk k / count_values label


@dataclass(frozen=True)
class BinOp:
    op: str
    lhs: "Expr"
    rhs: "Expr"
    bool_mode: bool = False
    on: tuple[str, ...] | None = None
    ignoring: tuple[str, ...] | None = None
    group_side: str | None = None  # "left"/"right": many-to-one matching
    # group_left(lbl, …): labels COPIED from the "one" side onto result
    # rows (prometheus operators.md "many-to-one matching")
    group_labels: tuple[str, ...] = ()


@dataclass(frozen=True)
class NumberLit:
    value: float


Expr = VectorSelector | Call | AggExpr | BinOp | NumberLit
