"""LogQL tokenizer.

Hand-written scanner covering the reference grammar's token surface
(src/logql/src/lexer.rs: strings with escapes, durations, bytes units,
numbers, multi-char operators) — written fresh against the LogQL
language spec.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "by", "without", "on", "ignoring", "bool", "and", "or", "unless",
    "unwrap", "offset", "group_left", "group_right",
}

# longest-first multi-char operators
OPERATORS = [
    "|=", "|~", "|>", "!=", "!~", "!>", "=~", ">=", "<=", "==", "^", ">", "<", "=",
    "{", "}", "(", ")", "[", "]", ",", "|", "+", "-", "*", "/", "%",
    "@", ":",  # PromQL @-modifier and subquery separator
]

_DURATION_RE = re.compile(r"(?:\d+(?:\.\d+)?(?:ns|us|µs|ms|s|m|h|d|w|y))+")
_BYTES_RE = re.compile(r"\d+(?:\.\d+)?(?:b|kib|kb|mib|mb|gib|gb|tib|tb)", re.IGNORECASE)
_NUMBER_RE = re.compile(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?")
# colons inside identifiers (never leading, always followed by more
# ident chars) admit Prometheus recording-rule names like job:cpu:sum
# without swallowing the subquery separator in m[1h:5m]
_IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*(?::[a-zA-Z0-9_]+)*")

_DUR_UNITS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
    "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0, "y": 31536000.0,
}
_BYTE_UNITS = {
    "b": 1, "kb": 1000, "kib": 1024, "mb": 1000**2, "mib": 1024**2,
    "gb": 1000**3, "gib": 1024**3, "tb": 1000**4, "tib": 1024**4,
}


def parse_duration(text: str) -> float:
    """Go-style duration → seconds (normalization point; the reference
    normalizes literals at lowering, logql.rs:293-309)."""
    total = 0.0
    for m in re.finditer(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d|w|y)", text):
        total += float(m.group(1)) * _DUR_UNITS[m.group(2)]
    return total


def parse_bytes(text: str) -> float:
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([a-zA-Z]+)", text)
    return float(m.group(1)) * _BYTE_UNITS[m.group(2).lower()]


@dataclass(frozen=True)
class Token:
    kind: str  # OP IDENT STRING NUMBER DURATION BYTES EOF
    text: str
    pos: int


class LogQLSyntaxError(ValueError):
    pass


def tokenize(s: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c in "\"'`":
            j = i + 1
            buf = []
            while j < n and s[j] != c:
                if s[j] == "\\" and c != "`" and j + 1 < n:
                    esc = s[j + 1]
                    known = {"n": "\n", "t": "\t", "\\": "\\", '"': '"', "'": "'"}
                    # unknown escapes (e.g. regex \d) pass through intact
                    buf.append(known.get(esc, "\\" + esc))
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            if j >= n:
                raise LogQLSyntaxError(f"unterminated string at {i}")
            out.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if c.isdigit():
            m = _BYTES_RE.match(s, i)
            if m and not _is_duration_start(s, i):
                out.append(Token("BYTES", m.group(0), i))
                i = m.end()
                continue
            m = _DURATION_RE.match(s, i)
            if m and _is_duration_start(s, i):
                out.append(Token("DURATION", m.group(0), i))
                i = m.end()
                continue
            m = _NUMBER_RE.match(s, i)
            out.append(Token("NUMBER", m.group(0), i))
            i = m.end()
            continue
        for op in OPERATORS:
            if s.startswith(op, i):
                out.append(Token("OP", op, i))
                i += len(op)
                break
        else:
            m = _IDENT_RE.match(s, i)
            if not m:
                raise LogQLSyntaxError(f"unexpected character {c!r} at {i}")
            out.append(Token("IDENT", m.group(0), i))
            i = m.end()
    out.append(Token("EOF", "", n))
    return out


def _is_duration_start(s: str, i: int) -> bool:
    m = _NUMBER_RE.match(s, i)
    if not m:
        return False
    rest = s[m.end():]
    return bool(re.match(r"(ns|us|µs|ms|s|m|h|d|w|y)(?![a-zA-Z])", rest))
