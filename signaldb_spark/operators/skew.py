"""Skew-aware aggregation: salting for hot group keys.

At 100 TB a single hot series (one service emitting most of the logs)
lands its entire (bucket, series) group on one reducer. AQE's skew-join
handling covers joins; for aggregations the classic fix is a two-phase
salted aggregate: partial-aggregate on (key, salt), then final on (key).
Correct for any algebraic aggregate expressed as (partial, merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALTED_AGGS = {
    # partial expr, merge expr over the partial column
    "count": (lambda v: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    value: Column | str | None,
    agg: str = "count",
    salt_buckets: int = 16,
    out: str = "value",
) -> DataFrame:
    """Two-phase aggregation with a random salt in the first shuffle.

    Phase 1 shuffles on (keys..., salt) — the hot key spreads over
    ``salt_buckets`` reducers; phase 2 merges the (at most
    ``salt_buckets``) partials per key, a tiny shuffle.
    """
    partial_fn, merge_fn = SALTED_AGGS[agg]
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = (
        salted.groupBy(*keys, "_salt").agg(partial_fn(v).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(merge_fn(F.col("_partial")).alias(out))


def salted_avg(
    df: DataFrame, keys: list[str], value: str, salt_buckets: int = 16, out: str = "value"
) -> DataFrame:
    """avg via salted (sum, count) partials — the decomposition pattern
    for non-trivially-mergeable aggregates."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value).alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    return partial.groupBy(*keys).agg(
        (F.sum("_s") / F.sum("_c")).alias(out)
    )
