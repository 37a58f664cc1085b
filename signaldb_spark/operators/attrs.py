"""Layout-aware attribute access, shared by every dialect lowering.

The reference went through two storage layouts for attribute columns:
legacy (ONE serialized JSON string per row — the substring-predicate
era, logql.rs:330-361 / search_filter.rs:157-170) and the current
map layout. Tables of either era must answer the same matchers. The
dtype decides at plan time, so the native map fast path pays nothing
for the compat, and the legacy route extracts the key EXACTLY via
get_json_object (strictly better than the reference's documented
serialized-fragment over-match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attr_value(df: DataFrame, attr_col: str, key: str) -> Column:
    """``attr_col[key]`` for map columns, ``get_json_object`` (bracket
    path form — dotted keys like ``http.method`` are single map keys,
    not nesting) for legacy string columns, NULL when the column is
    absent entirely. Typed AnyValue maps (the otel-native-schema
    layout, schemas/anyvalue.py) return the DISPLAY string — the value
    ``Map<String,String>`` would have stored — so string matchers stay
    layout-invariant across all three eras; typed reads go through
    :func:`attr_typed` / :func:`attr_number`."""
    try:
        dtype = df.schema[attr_col].dataType
    except KeyError:
        return F.lit(None).cast("string")
    if isinstance(dtype, T.StringType):
        return F.get_json_object(F.col(attr_col), f"$['{key}']")
    from ..schemas.anyvalue import anyvalue_display, is_anyvalue_map

    if is_anyvalue_map(dtype):
        return anyvalue_display(F.element_at(F.col(attr_col), key))
    return F.element_at(F.col(attr_col), key)


def attr_typed(df: DataFrame, attr_col: str, key: str) -> Column | None:
    """The explicit RAW accessor for typed AnyValue maps
    (typed-attribute-storage spec: residue content is read through a
    raw retrieval returning the original AnyValue, never coerced).
    Returns None when the column is not a typed map."""
    try:
        dtype = df.schema[attr_col].dataType
    except KeyError:
        return None
    from ..schemas.anyvalue import is_anyvalue_map

    if not is_anyvalue_map(dtype):
        return None
    return F.element_at(F.col(attr_col), key)


def attr_number(df: DataFrame, attr_col: str, key: str) -> Column | None:
    """Canonical NUMERIC read from a typed AnyValue map: the int or
    double home as a double, NULL for everything else — a string
    residue ``'abc'`` under an int-canonical key reads NULL here (never
    an ANSI cast error, never a coerced residue). None when the column
    is not a typed map (legacy layouts keep their existing cast
    semantics)."""
    v = attr_typed(df, attr_col, key)
    if v is None:
        return None
    from ..schemas.anyvalue import anyvalue_read

    return anyvalue_read(v, "number")


def attr_keys(df: DataFrame, attr_col: str) -> Column:
    """The attribute KEY array — map_keys for map columns; legacy
    string columns parse through from_json first (discovery endpoints
    need the key set, which get_json_object cannot enumerate). Absent
    columns resolve to an empty array."""
    try:
        dtype = df.schema[attr_col].dataType
    except KeyError:
        return F.array().cast("array<string>")
    col = F.col(attr_col)
    if isinstance(dtype, T.StringType):
        col = F.from_json(col, T.MapType(T.StringType(), T.StringType()))
    return F.map_keys(col)


# Loki-grammar logfmt: keys are identifiers; values are either a
# double-quoted string (backslash escapes allowed, spaces preserved)
# or a bare run up to the next whitespace. The quoted alternative is
# what makes msg="hello world" extractable at all. The quoted branch is
# the UNROLLED-LOOP form [^"\\]*(?:\\.[^"\\]*)* — the naive
# (?:[^"\\]|\\.)* alternation backtracks per character and measured 3x
# slower end-to-end on the logfmt extraction gate.
LOGFMT_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)=("[^"\\]*(?:\\.[^"\\]*)*"|[^\s"]+)'


def logfmt_value(src: Column, key: str) -> Column:
    """The value of ``key`` in a logfmt-formatted string column —
    FIRST occurrence wins, quoted values are unquoted and unescaped.

    ONE anchored ``regexp_extract`` per (row, key): the key is escaped
    into the pattern, so the scan never materializes the full pair
    arrays (a two-``regexp_extract_all`` + array_position formulation
    measured ~3x this cost on the extraction gate). Deliberately not a
    map build either: a line with a repeated key ("a=1 b=2 a=3") makes
    map construction throw DUPLICATED_MAP_KEY under Spark's default
    dedup policy, aborting the whole query for one malformed line; the
    first regex match resolves duplicates to the first occurrence and
    absent keys to NULL (the rows Loki tags __error__ or leaves
    unlabeled — never a query abort)."""
    import re as _re

    # Tokenized scan, not a bare `\skey=` probe: the lazy loop consumes
    # whole tokens (k=v pairs INCLUDING their quoted values, else a bare
    # \S+ run) before each probe, so a `key=...` embedded in another
    # key's quoted value (msg="conn addr=10.0.0.1") is consumed with
    # that value and never matches — Loki's tokenizer yields absent
    # there, and so does this. The probe is attempted first at every
    # token boundary (lazy *?), so the FIRST real occurrence still wins,
    # and a first occurrence with an EMPTY unquoted value (`key= `)
    # matches empty instead of falling through to a later occurrence.
    # The token alternation is ATOMIC (?>…): without it, a quoted pair
    # as the LAST token (no trailing space) backtracks into \S+, which
    # re-splits the quoted value mid-way and exposes its innards to the
    # probe. Atomicity locks the maximal-munch token, keeping the scan
    # linear too. Bare values are any non-space run NOT starting with a
    # quote (go-logfmt: quotes only open a value at its first byte).
    bare = r'(?!")\S*'
    quoted = r'"[^"\\]*(?:\\.[^"\\]*)*"'
    pair_tok = rf'[A-Za-z_][A-Za-z0-9_]*=(?:{quoted}|{bare})'
    pat = (
        r'^\s*'
        rf'(?:(?>{pair_tok}|\S+)\s+)*?'
        rf'{_re.escape(key)}='
        rf'({quoted}|{bare})'
    )
    raw = F.nullif(F.regexp_extract(src, pat, 1), F.lit(""))
    # unquote on the cheap path: literal prefix/suffix probes, the
    # escape-stripping regex runs only on actually-quoted values
    quoted = raw.startswith('"') & raw.endswith('"')
    inner = F.substr(raw, F.lit(2), F.length(raw) - 2)
    return F.when(
        quoted, F.regexp_replace(inner, r"\\(.)", "$1")
    ).otherwise(raw)
