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
    absent entirely."""
    try:
        dtype = df.schema[attr_col].dataType
    except KeyError:
        return F.lit(None).cast("string")
    if isinstance(dtype, T.StringType):
        return F.get_json_object(F.col(attr_col), f"$['{key}']")
    return F.element_at(F.col(attr_col), key)


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
