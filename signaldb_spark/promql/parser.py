"""PromQL recursive-descent parser.

The reference delegates parsing to the ``promql-parser`` crate and only
writes the lowering (promql.rs:40); we write both, reusing the LogQL
tokenizer. Covers: vector selectors with matchers and ``metric{...}``
form, range selectors ``[5m]``, ``offset``, subqueries ``[1h:5m]``,
function calls, aggregations with by/without and parameterized
topk/bottomk/quantile/count_values, full binary-operator precedence
with on/ignoring + bool.
"""

from __future__ import annotations

from ..logql.lexer import LogQLSyntaxError, Token, parse_duration, tokenize
from .ast import AggExpr, BinOp, Call, Expr, LabelMatcher, NumberLit, VectorSelector

AGG_OPS = {
    "sum", "avg", "min", "max", "count", "group", "stddev", "stdvar",
    "quantile", "topk", "bottomk", "count_values", "limitk", "limit_ratio",
}

RANGE_FNS = {
    "rate", "increase", "delta", "irate", "idelta", "deriv", "resets",
    "changes", "avg_over_time", "min_over_time", "max_over_time",
    "sum_over_time", "count_over_time", "last_over_time",
    "present_over_time", "absent_over_time", "stddev_over_time",
    "stdvar_over_time", "quantile_over_time", "mad_over_time",
    "predict_linear", "holt_winters", "double_exponential_smoothing",
    # Prometheus 3.x experimental: first sample / timestamp-of pickers
    "first_over_time", "ts_of_max_over_time", "ts_of_min_over_time",
    "ts_of_last_over_time",
}

VALUE_FNS = {
    "abs", "ceil", "floor", "round", "sqrt", "exp", "ln", "log2",
    "log10", "sgn", "clamp", "clamp_min", "clamp_max",
    # trigonometric battery (Prometheus 2.31+)
    "sin", "cos", "tan", "asin", "acos", "atan",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
    "deg", "rad",
}

OTHER_FNS = {
    "histogram_quantile", "histogram_count", "histogram_sum",
    "histogram_avg", "histogram_stddev", "histogram_stdvar",
    "histogram_fraction", "absent", "vector", "scalar", "time", "pi",
    "sort_by_label", "sort_by_label_desc",
    "timestamp", "label_replace", "label_join", "sort", "sort_desc",
    "day_of_week", "day_of_month", "day_of_year", "days_in_month",
    "hour", "minute", "month", "year",
}

FUNCTIONS = RANGE_FNS | VALUE_FNS | OTHER_FNS

COMPARE_OPS = {"==", "!=", ">", ">=", "<", "<="}


class _P:
    def __init__(self, toks: list[Token]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise LogQLSyntaxError(f"expected {text or kind}, got {t.text!r} at {t.pos}")
        return t

    def accept(self, kind: str, text: str | None = None) -> Token | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    # precedence ladder (PromQL): or < and/unless < compare < +- < */% < ^

    def parse(self) -> Expr:
        e = self.parse_or()
        self.expect("EOF")
        return e

    def parse_or(self) -> Expr:
        lhs = self.parse_and()
        while self.peek().kind == "IDENT" and self.peek().text == "or":
            self.next()
            on, ig, group_side, gl = self._matching()
            lhs = BinOp("or", lhs, self.parse_and(), on=on, ignoring=ig, group_side=group_side, group_labels=gl)
        return lhs

    def parse_and(self) -> Expr:
        lhs = self.parse_cmp()
        while self.peek().kind == "IDENT" and self.peek().text in ("and", "unless"):
            op = self.next().text
            on, ig, group_side, gl = self._matching()
            lhs = BinOp(op, lhs, self.parse_cmp(), on=on, ignoring=ig, group_side=group_side, group_labels=gl)
        return lhs

    def parse_cmp(self) -> Expr:
        lhs = self.parse_addsub()
        while self.peek().kind == "OP" and self.peek().text in COMPARE_OPS:
            op = self.next().text
            bool_mode = bool(self.accept("IDENT", "bool"))
            on, ig, group_side, gl = self._matching()
            lhs = BinOp(op, lhs, self.parse_addsub(), bool_mode=bool_mode, on=on, ignoring=ig, group_side=group_side, group_labels=gl)
        return lhs

    def parse_addsub(self) -> Expr:
        lhs = self.parse_muldiv()
        while self.peek().kind == "OP" and self.peek().text in ("+", "-"):
            op = self.next().text
            on, ig, group_side, gl = self._matching()
            lhs = BinOp(op, lhs, self.parse_muldiv(), on=on, ignoring=ig, group_side=group_side, group_labels=gl)
        return lhs

    def parse_muldiv(self) -> Expr:
        # atan2 is a binary OPERATOR in PromQL (same precedence as *),
        # not a function call (prometheus docs: operators.md)
        lhs = self.parse_unary()
        while (self.peek().kind == "OP" and self.peek().text in ("*", "/", "%")) or (
            self.peek().kind == "IDENT" and self.peek().text == "atan2"
        ):
            op = self.next().text
            on, ig, group_side, gl = self._matching()
            lhs = BinOp(op, lhs, self.parse_unary(), on=on, ignoring=ig, group_side=group_side, group_labels=gl)
        return lhs

    def parse_unary(self) -> Expr:
        # unary minus binds LOOSER than ^ (Prometheus: -2^2 == -4)
        if self.accept("OP", "-"):
            return BinOp("-", NumberLit(0.0), self.parse_unary())
        if self.accept("OP", "+"):
            return self.parse_unary()
        return self.parse_pow()

    def parse_pow(self) -> Expr:
        lhs = self.parse_postfix()
        if self.peek().kind == "OP" and self.peek().text == "^":
            self.next()
            on, ig, group_side, gl = self._matching()
            return BinOp("^", lhs, self.parse_unary(), on=on, ignoring=ig, group_side=group_side, group_labels=gl)  # right-assoc
        return lhs

    def parse_postfix(self) -> Expr:
        e = self.parse_primary()
        # range selector / subquery / offset attach to selectors & exprs
        while True:
            if self.peek().kind == "OP" and self.peek().text == "[":
                self.next()
                dur = parse_duration(self.expect("DURATION").text)
                if self.accept("OP", ":"):
                    step_tok = self.accept("DURATION")
                    step = parse_duration(step_tok.text) if step_tok else 0.0
                    self.expect("OP", "]")
                    if isinstance(e, VectorSelector):
                        e = VectorSelector(e.metric, e.matchers, e.range_seconds,
                                           e.offset_seconds, subquery=(dur, step),
                                           at_epoch=e.at_epoch)
                    else:
                        e = Call("__subquery__", (e, NumberLit(dur), NumberLit(step)))
                else:
                    self.expect("OP", "]")
                    if not isinstance(e, VectorSelector):
                        raise LogQLSyntaxError("range selector on non-selector")
                    e = VectorSelector(e.metric, e.matchers, dur, e.offset_seconds,
                                       at_epoch=e.at_epoch)
            elif self.peek().kind == "IDENT" and self.peek().text == "offset":
                self.next()
                off = parse_duration(self.expect("DURATION").text)
                if not isinstance(e, VectorSelector):
                    raise LogQLSyntaxError("offset on non-selector")
                e = VectorSelector(e.metric, e.matchers, e.range_seconds, off, e.subquery, e.at_epoch)
            elif self.peek().kind == "OP" and self.peek().text == "@":
                self.next()
                if self.peek().kind == "IDENT" and self.peek().text in ("start", "end"):
                    # @ start() / @ end(): resolved against the query
                    # window at lowering time (promql-functions.md:31)
                    which = self.next().text
                    self.expect("OP", "(")
                    self.expect("OP", ")")
                    at: "float | str" = which
                else:
                    at = float(self.expect("NUMBER").text)
                if not isinstance(e, VectorSelector):
                    raise LogQLSyntaxError("@ on non-selector")
                e = VectorSelector(e.metric, e.matchers, e.range_seconds, e.offset_seconds, e.subquery, at)
            else:
                break
        return e

    def parse_primary(self) -> Expr:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return NumberLit(float(t.text))
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.parse_or()
            self.expect("OP", ")")
            return e
        if t.kind == "OP" and t.text == "{":
            return VectorSelector(None, tuple(self._matchers()))
        if t.kind != "IDENT":
            raise LogQLSyntaxError(f"unexpected {t.text!r} at {t.pos}")
        name = t.text
        if name in AGG_OPS:
            return self._agg()
        if name in FUNCTIONS:
            return self._call()
        # bare metric name, optionally with matchers
        self.next()
        matchers: tuple[LabelMatcher, ...] = ()
        if self.peek().kind == "OP" and self.peek().text == "{":
            matchers = tuple(self._matchers())
        return VectorSelector(name, matchers)

    def _matchers(self) -> list[LabelMatcher]:
        self.expect("OP", "{")
        out: list[LabelMatcher] = []
        if not self.accept("OP", "}"):
            while True:
                label = self.expect("IDENT").text
                op = self.next()
                if op.kind != "OP" or op.text not in ("=", "!=", "=~", "!~"):
                    raise LogQLSyntaxError(f"bad matcher op at {op.pos}")
                out.append(LabelMatcher(label, op.text, self.expect("STRING").text))
                if self.accept("OP", ","):
                    continue
                self.expect("OP", "}")
                break
        return out

    def _matching(self):
        on = ig = group_side = None
        group_labels: tuple[str, ...] = ()
        t = self.peek()
        if t.kind == "IDENT" and t.text in ("on", "ignoring"):
            self.next()
            labels = self._label_list()
            if t.text == "on":
                on = labels
            else:
                ig = labels
            g = self.peek()
            if g.kind == "IDENT" and g.text in ("group_left", "group_right"):
                self.next()
                group_side = "left" if g.text == "group_left" else "right"
                if self.peek().kind == "OP" and self.peek().text == "(":
                    group_labels = self._label_list()
        return on, ig, group_side, group_labels

    def _label_list(self) -> tuple[str, ...]:
        self.expect("OP", "(")
        labels: list[str] = []
        if not self.accept("OP", ")"):
            while True:
                labels.append(self.expect("IDENT").text)
                if self.accept("OP", ","):
                    continue
                self.expect("OP", ")")
                break
        return tuple(labels)

    def _agg(self) -> AggExpr:
        op = self.next().text
        grouping: tuple[str, ...] = ()
        without = False
        t = self.peek()
        if t.kind == "IDENT" and t.text in ("by", "without"):
            without = t.text == "without"
            self.next()
            grouping = self._label_list()
        self.expect("OP", "(")
        param: float | str | None = None
        if op in ("topk", "bottomk", "quantile", "limitk", "limit_ratio"):
            neg = bool(self.accept("OP", "-"))  # limit_ratio(-0.3, m): complement
            param = float(self.expect("NUMBER").text)
            if neg:
                param = -param
            self.expect("OP", ",")
        elif op == "count_values":
            param = self.expect("STRING").text
            self.expect("OP", ",")
        expr = self.parse_or()
        self.expect("OP", ")")
        t = self.peek()
        if not grouping and t.kind == "IDENT" and t.text in ("by", "without"):
            without = t.text == "without"
            self.next()
            grouping = self._label_list()
        return AggExpr(op, expr, grouping, without, param)

    def _call(self) -> Call:
        name = self.next().text
        self.expect("OP", "(")
        args: list[Expr] = []
        if not self.accept("OP", ")"):
            while True:
                if self.peek().kind == "STRING":
                    args.append(_Str(self.next().text))  # label args
                else:
                    args.append(self.parse_or())
                if self.accept("OP", ","):
                    continue
                self.expect("OP", ")")
                break
        return Call(name, tuple(args))


class _Str(str):
    """String argument wrapper (label_replace/label_join args)."""


def parse(query: str) -> Expr:
    return _P(tokenize(query)).parse()
