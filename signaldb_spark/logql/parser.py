"""LogQL recursive-descent parser → AST.

Grammar coverage mirrors the reference parser's surface
(src/logql/src/parser.rs: log queries with matchers, line filters,
parser stages, label filters, unwrap; metric queries with range
aggregations, vector aggregations with by/without, topk/bottomk,
binary operator precedence tiers, on/ignoring vector matching, bool
modifier, label_replace, vector()) — implemented fresh.

Precedence (loosest→tightest), as in PromQL/LogQL:
  or  <  and/unless  <  comparisons  <  +-  <  */%  <  ^(right-assoc)
"""

from __future__ import annotations

from .ast import (
    BinOp,
    LabelFilter,
    LabelReplace,
    LineFilter,
    LogSelector,
    Matcher,
    MetricExpr,
    ParserStage,
    Query,
    RangeAgg,
    Scalar,
    VectorAgg,
    VectorLit,
)
from .lexer import LogQLSyntaxError, Token, parse_bytes, parse_duration, tokenize

RANGE_FNS = {
    "count_over_time": "count",
    "rate": "rate",
    "bytes_over_time": "bytes",
    "bytes_rate": "bytes_rate",
    "sum_over_time": "sum",
    "avg_over_time": "avg",
    "min_over_time": "min",
    "max_over_time": "max",
    "first_over_time": "first",
    "last_over_time": "last",
    "stddev_over_time": "stddev",
    "stdvar_over_time": "stdvar",
    "quantile_over_time": "quantile",
    "absent_over_time": "absent",
    # Prometheus-style counter rate over an unwrapped label (Loki docs:
    # "rate_counter — per-second rate of the values in the interval")
    "rate_counter": "rate_counter",
}

VECTOR_AGGS = {
    "sum", "avg", "min", "max", "count", "stddev", "stdvar",
    "topk", "bottomk", "approx_topk", "sort", "sort_desc",
}

PARSER_STAGES = {
    "json", "logfmt", "regexp", "pattern", "unpack", "decolorize",
    "line_format", "label_format", "drop", "keep", "distinct",
}

COMPARE_OPS = {"==", "!=", ">", ">=", "<", "<="}
_LABEL_FILTER_OPS = {"=", "==", "!=", ">", ">=", "<", "<=", "=~", "!~"}


class _P:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

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

    # ------------------------------------------------------------- entry

    def parse_query(self) -> Query:
        if self.peek().kind == "OP" and self.peek().text == "{":
            sel = self.parse_selector_pipeline()
            self.expect("EOF")
            return sel
        expr = self.parse_or()
        self.expect("EOF")
        return expr

    # ------------------------------------------------- log selector side

    def parse_selector_pipeline(self) -> LogSelector:
        matchers = self.parse_matchers()
        line_filters: list[LineFilter] = []
        stages: list[ParserStage] = []
        label_filters: list[LabelFilter] = []
        unwrap: str | None = None
        unwrap_fn: str | None = None
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("|=", "|~", "|>"):
                self.next()
                line_filters.append(self._line_filter_value(t.text))
            elif t.kind == "OP" and t.text in ("!=", "!~", "!>") and (
                self.peek(1).kind == "STRING"
                or (self.peek(1).kind == "IDENT" and self.peek(1).text == "ip")
            ):
                self.next()
                line_filters.append(self._line_filter_value(t.text))
            elif t.kind == "OP" and t.text == "|":
                self.next()
                nxt = self.peek()
                if nxt.kind == "IDENT" and nxt.text == "unwrap":
                    self.next()
                    name = self.expect("IDENT").text
                    if name in ("duration", "duration_seconds", "bytes") and (
                        self.peek().kind == "OP" and self.peek().text == "("
                    ):
                        self.next()
                        unwrap_fn = name
                        unwrap = self.expect("IDENT").text
                        self.expect("OP", ")")
                    else:
                        unwrap = name
                elif nxt.kind == "IDENT" and nxt.text in PARSER_STAGES:
                    self.next()
                    arg = None
                    if nxt.text == "label_format":
                        arg = self.parse_label_format_pairs()
                    elif nxt.text in ("drop", "keep", "distinct"):
                        arg = self.parse_ident_list()
                    elif self.peek().kind == "STRING":
                        arg = self.next().text
                    stages.append(ParserStage(nxt.text, arg))
                elif nxt.kind == "IDENT":
                    label_filters.append(self.parse_label_filter())
                else:
                    raise LogQLSyntaxError(f"unexpected token after | at {nxt.pos}")
            else:
                break
        return LogSelector(
            tuple(matchers), tuple(line_filters), tuple(stages), tuple(label_filters),
            unwrap, unwrap_fn
        )

    def parse_label_format_pairs(self) -> tuple:
        """``label_format dst=src, other="{{.a}}-{{.b}}"`` → a tuple of
        (dst, kind, value) with kind ``ref`` (rename) or ``tmpl``
        (template render), mirroring Loki's two label_format forms."""
        pairs = []
        while True:
            dst = self.expect("IDENT").text
            self.expect("OP", "=")
            t = self.next()
            if t.kind == "STRING":
                pairs.append((dst, "tmpl", t.text))
            elif t.kind == "IDENT":
                pairs.append((dst, "ref", t.text))
            else:
                raise LogQLSyntaxError(f"bad label_format value at {t.pos}")
            if not self.accept("OP", ","):
                return tuple(pairs)

    def parse_ident_list(self) -> tuple:
        names = [self.expect("IDENT").text]
        while self.accept("OP", ","):
            names.append(self.expect("IDENT").text)
        return tuple(names)

    def parse_matchers(self) -> list[Matcher]:
        self.expect("OP", "{")
        matchers: list[Matcher] = []
        if not self.accept("OP", "}"):
            while True:
                label = self.expect("IDENT").text
                op = self.next()
                if op.kind != "OP" or op.text not in ("=", "!=", "=~", "!~"):
                    raise LogQLSyntaxError(f"bad matcher op {op.text!r} at {op.pos}")
                value = self.expect("STRING").text
                matchers.append(Matcher(label, op.text, value))
                if self.accept("OP", ","):
                    continue
                self.expect("OP", "}")
                break
        return matchers

    def _line_filter_value(self, op: str) -> LineFilter:
        """STRING, or ``ip("…")`` for ``|=``/``!=`` (Loki ip matcher)."""
        t = self.peek()
        if t.kind == "IDENT" and t.text == "ip" and op in ("|=", "!="):
            self.next()
            self.expect("OP", "(")
            val = self.expect("STRING").text
            self.expect("OP", ")")
            return LineFilter(op, val, is_ip=True)
        return LineFilter(op, self.expect("STRING").text)

    def parse_label_filter(self) -> LabelFilter:
        label = self.expect("IDENT").text
        op = self.next()
        if op.kind != "OP" or op.text not in _LABEL_FILTER_OPS:
            raise LogQLSyntaxError(f"bad label-filter op {op.text!r} at {op.pos}")
        v = self.next()
        if v.kind == "IDENT" and v.text == "ip" and op.text in ("=", "==", "!="):
            self.expect("OP", "(")
            val = self.expect("STRING").text
            self.expect("OP", ")")
            return LabelFilter(label, op.text, val, is_ip=True)
        if v.kind == "STRING":
            return LabelFilter(label, op.text, v.text)
        if v.kind == "NUMBER":
            return LabelFilter(label, op.text, float(v.text))
        if v.kind == "DURATION":
            # normalized to seconds; ordered comparisons on unwrapped
            # durations use ns in the reference — we normalize to ns to
            # match (logql.rs:293-309)
            return LabelFilter(label, op.text, parse_duration(v.text) * 1e9, unit="duration")
        if v.kind == "BYTES":
            return LabelFilter(label, op.text, parse_bytes(v.text), unit="bytes")
        raise LogQLSyntaxError(f"bad label-filter value {v.text!r} at {v.pos}")

    # ------------------------------------------------ metric expressions

    def parse_or(self) -> MetricExpr:
        lhs = self.parse_and()
        while self.peek().kind == "IDENT" and self.peek().text == "or":
            self.next()
            on, ignoring, group_side = self.parse_matching()
            lhs = BinOp("or", lhs, self.parse_and(), on=on, ignoring=ignoring, group_side=group_side)
        return lhs

    def parse_and(self) -> MetricExpr:
        lhs = self.parse_compare()
        while self.peek().kind == "IDENT" and self.peek().text in ("and", "unless"):
            op = self.next().text
            on, ignoring, group_side = self.parse_matching()
            lhs = BinOp(op, lhs, self.parse_compare(), on=on, ignoring=ignoring, group_side=group_side)
        return lhs

    def parse_compare(self) -> MetricExpr:
        lhs = self.parse_addsub()
        while self.peek().kind == "OP" and self.peek().text in COMPARE_OPS:
            op = self.next().text
            bool_mode = bool(self.accept("IDENT", "bool"))
            on, ignoring, group_side = self.parse_matching()
            lhs = BinOp(op, lhs, self.parse_addsub(), bool_mode=bool_mode, on=on, ignoring=ignoring, group_side=group_side)
        return lhs

    def parse_addsub(self) -> MetricExpr:
        lhs = self.parse_muldiv()
        while self.peek().kind == "OP" and self.peek().text in ("+", "-"):
            op = self.next().text
            on, ignoring, group_side = self.parse_matching()
            lhs = BinOp(op, lhs, self.parse_muldiv(), on=on, ignoring=ignoring, group_side=group_side)
        return lhs

    def parse_muldiv(self) -> MetricExpr:
        lhs = self.parse_unary()
        while self.peek().kind == "OP" and self.peek().text in ("*", "/", "%"):
            op = self.next().text
            on, ignoring, group_side = self.parse_matching()
            lhs = BinOp(op, lhs, self.parse_unary(), on=on, ignoring=ignoring, group_side=group_side)
        return lhs

    def parse_unary(self) -> MetricExpr:
        # unary minus binds looser than ^ (-2^2 == -4, as Prometheus)
        if self.accept("OP", "-"):
            inner = self.parse_unary()
            return BinOp("-", Scalar(0.0), inner)
        return self.parse_pow()

    def parse_pow(self) -> MetricExpr:
        lhs = self.parse_primary()
        if self.peek().kind == "OP" and self.peek().text == "^":
            self.next()
            on, ignoring, group_side = self.parse_matching()
            return BinOp("^", lhs, self.parse_unary(), on=on, ignoring=ignoring, group_side=group_side)  # right-assoc
        return lhs

    def parse_matching(self):
        on = ignoring = group_side = None
        t = self.peek()
        if t.kind == "IDENT" and t.text in ("on", "ignoring"):
            self.next()
            labels = self._label_list()
            if t.text == "on":
                on = labels
            else:
                ignoring = labels
            g = self.peek()
            if g.kind == "IDENT" and g.text in ("group_left", "group_right"):
                self.next()
                group_side = "left" if g.text == "group_left" else "right"
                if self.peek().kind == "OP" and self.peek().text == "(":
                    self._label_list()
        return on, ignoring, group_side

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

    def parse_primary(self) -> MetricExpr:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return Scalar(float(t.text))
        if t.kind == "OP" and t.text == "(":
            self.next()
            inner = self.parse_or()
            self.expect("OP", ")")
            return inner
        if t.kind != "IDENT":
            raise LogQLSyntaxError(f"unexpected token {t.text!r} at {t.pos}")
        name = t.text
        if name in RANGE_FNS:
            return self.parse_range_agg()
        if name in VECTOR_AGGS:
            return self.parse_vector_agg()
        if name == "label_replace":
            return self.parse_label_replace()
        if name == "vector":
            self.next()
            self.expect("OP", "(")
            v = float(self.expect("NUMBER").text)
            self.expect("OP", ")")
            return VectorLit(v)
        raise LogQLSyntaxError(f"unknown function {name!r} at {t.pos}")

    def parse_range_agg(self) -> RangeAgg:
        fn = RANGE_FNS[self.next().text]
        self.expect("OP", "(")
        param = None
        if fn == "quantile":
            param = float(self.expect("NUMBER").text)
            self.expect("OP", ",")
        sel = self.parse_selector_pipeline()
        self.expect("OP", "[")
        dur = self.expect("DURATION").text
        self.expect("OP", "]")
        offset = 0.0
        if self.accept("IDENT", "offset"):
            offset = parse_duration(self.expect("DURATION").text)
        self.expect("OP", ")")
        return RangeAgg(fn, sel, parse_duration(dur), param, offset)

    def parse_vector_agg(self) -> VectorAgg:
        op = self.next().text
        grouping: tuple[str, ...] = ()
        without = False
        t = self.peek()
        if t.kind == "IDENT" and t.text in ("by", "without"):
            without = t.text == "without"
            self.next()
            grouping = self._label_list()
        self.expect("OP", "(")
        param = None
        if op in ("topk", "bottomk", "approx_topk"):
            param = float(self.expect("NUMBER").text)
            self.expect("OP", ",")
        expr = self.parse_or()
        self.expect("OP", ")")
        t = self.peek()
        if not grouping and t.kind == "IDENT" and t.text in ("by", "without"):
            without = t.text == "without"
            self.next()
            grouping = self._label_list()
        return VectorAgg(op, expr, grouping, without, param)

    def parse_label_replace(self) -> LabelReplace:
        self.next()
        self.expect("OP", "(")
        expr = self.parse_or()
        self.expect("OP", ",")
        dst = self.expect("STRING").text
        self.expect("OP", ",")
        replacement = self.expect("STRING").text
        self.expect("OP", ",")
        src = self.expect("STRING").text
        self.expect("OP", ",")
        regex = self.expect("STRING").text
        self.expect("OP", ")")
        return LabelReplace(expr, dst, replacement, src, regex)


def parse(query: str) -> Query:
    return _P(tokenize(query)).parse_query()
