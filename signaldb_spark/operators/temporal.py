"""Temporal joins Spark lacks natively: as-of (nearest-event) join.

The classic implementation is a range join (l.ts >= r.ts AND l.ts - d <=
r.ts), which Catalyst executes as a broadcast-nested-loop or an
inequality sort-merge with per-row scans — quadratic in the worst case
and never the plan you want at 100 TB. This implementation uses the
union trick instead: tag both sides, union them, and run ONE window
pass per key ordered by time carrying the last-seen right payload
forward. Cost is a single shuffle on the join keys plus a sort within
each partition — the same complexity as a regular sort-merge join, with
no pair blowup. Skewed keys behave like any windowed aggregation
(salting applies if one key dominates).

DuckDB expresses the same semantics natively (ASOF JOIN), which is what
the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the nearest right row of the same key:
    ``backward`` = latest right with right.ts <= left.ts (a right row AT
    the left timestamp matches); ``forward`` = earliest right with
    right.ts >= left.ts. ``tolerance_seconds`` nulls the match when the
    nearest row is further away than the tolerance.

    Output: every left row (and column) + each non-key right column as
    ``<right_prefix><name>`` (the right timestamp as
    ``<right_prefix><right_ts>``), null when unmatched. Right rows must
    be unique per (keys, right_ts); pre-aggregate ties upstream so the
    match is deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(
                F.struct(F.col(right_ts), *payload_cols).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("_r"),
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType.simpleString()
        ).alias("_l"),
        F.struct(F.col(right_ts), *payload_cols).alias("_r"),
    )
    u = l.unionByName(r)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts (_src 0 < 1), so a
        # same-timestamp right row is visible to the left row's window
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_src")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("_r", ignorenulls=True).over(w)
        in_tol = (
            F.unix_micros(F.col("_l")[left_ts]) - F.unix_micros(F.col("_match")[right_ts])
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        ) if tolerance_seconds is not None else None
    else:
        # left rows sort BEFORE right rows at equal ts: flip the tag so
        # _src ordering still puts the match inside the left row's frame
        u = u.withColumn("_src", 1 - F.col("_src"))
        w = (
            Window.partitionBy(*keys)
            .orderBy("_ts", "_src")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("_r", ignorenulls=True).over(w)
        in_tol = (
            F.unix_micros(F.col("_match")[right_ts]) - F.unix_micros(F.col("_l")[left_ts])
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        ) if tolerance_seconds is not None else None
    matched = u.withColumn("_match", match).filter(F.col("_l").isNotNull())
    if in_tol is not None:
        matched = matched.withColumn(
            "_match", F.when(in_tol, F.col("_match"))
        )
    out_right = [
        F.col("_match")[c].alias(f"{right_prefix}{c}") for c in [right_ts, *payload_cols]
    ]
    return matched.select(
        *[F.col("_l")[c].alias(c) for c in left.columns], *out_right
    )
