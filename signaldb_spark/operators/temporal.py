"""Temporal joins Spark lacks natively: as-of (nearest-event) join and
bucketed interval (range) join.

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
    slice_seconds: int | None = None,
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

    ``slice_seconds`` is the skew escape hatch: the default single
    window per key serializes a hot key onto one task (salting cannot
    apply — as-of needs the key's full timeline in order). With a slice
    width set, windows run per (key, time-slice) and a per-key carry of
    the last-known right payload crosses slice boundaries over the tiny
    (key, slice) spine — per-task work is bounded by events per slice,
    and the result is IDENTICAL to the unsliced form (property-tested).
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
    backward = direction == "backward"
    if not backward:
        # left rows sort BEFORE right rows at equal ts: flip the tag so
        # _src ordering still puts the match inside the left row's frame
        u = u.withColumn("_src", 1 - F.col("_src"))
    if slice_seconds is None:
        part = [*keys]
        carry = None
    else:
        # Skew-proof two-pass: window per (key, time-slice) so a hot key
        # spreads across slices, then carry the last-known right payload
        # across slice boundaries via a per-key window over the TINY
        # (key, slice) spine — rows = slices per key, not events per key.
        u = u.withColumn(
            "_slice",
            F.floor(F.unix_micros(F.col("_ts")) / F.lit(int(slice_seconds) * 1_000_000)),
        )
        part = [*keys, "_slice"]
        spine = u.select(*keys, "_slice").distinct()
        pick = F.max_by if backward else F.min_by
        rt = (
            u.filter(F.col("_r").isNotNull())
            .groupBy(*keys, "_slice")
            .agg(pick(F.col("_r"), F.struct("_ts", "_src")).alias("_sr"))
        )
        sp = spine.join(rt, [*keys, "_slice"], "left")
        if backward:
            w_carry = (
                Window.partitionBy(*keys)
                .orderBy("_slice")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            carry_col = F.last("_sr", ignorenulls=True).over(w_carry)
        else:
            w_carry = (
                Window.partitionBy(*keys)
                .orderBy("_slice")
                .rowsBetween(1, Window.unboundedFollowing)
            )
            carry_col = F.first("_sr", ignorenulls=True).over(w_carry)
        carried = sp.select(*keys, "_slice", carry_col.alias("_carry"))
        u = u.join(carried, [*keys, "_slice"], "left")
        carry = F.col("_carry")
    if backward:
        w = (
            Window.partitionBy(*part)
            .orderBy("_ts", "_src")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # right rows sort BEFORE left rows at equal ts (_src 0 < 1), so a
        # same-timestamp right row is visible to the left row's window
        match = F.last("_r", ignorenulls=True).over(w)
        in_tol = (
            F.unix_micros(F.col("_l")[left_ts]) - F.unix_micros(F.col("_match")[right_ts])
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        ) if tolerance_seconds is not None else None
    else:
        w = (
            Window.partitionBy(*part)
            .orderBy("_ts", "_src")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("_r", ignorenulls=True).over(w)
        in_tol = (
            F.unix_micros(F.col("_match")[right_ts]) - F.unix_micros(F.col("_l")[left_ts])
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        ) if tolerance_seconds is not None else None
    if carry is not None:
        match = F.coalesce(match, carry)
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


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """``direction='nearest'`` as-of (pandas merge_asof parity): the
    closer of the latest-at-or-before and earliest-at-or-after right
    rows per left row; equal distance prefers the backward match.

    Same union trick as :func:`asof_join`, but BOTH frames ride one
    window spec (same partition + sort) so Spark evaluates them in a
    single WindowExec — still exactly one shuffle on the keys, no range
    join. A same-timestamp right row is only visible to the backward
    frame; that is fine, it wins the tie at distance zero anyway."""
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    r_struct_t = right.select(
        F.struct(F.col(right_ts), *payload_cols).alias("s")
    ).schema["s"].dataType.simpleString()
    l_struct_t = left.select(
        F.struct(*left.columns).alias("s")
    ).schema["s"].dataType.simpleString()
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        F.struct(F.col(right_ts), *payload_cols).alias("_r"),
    )
    u = l.unionByName(r)
    wb = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_src")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = F.last("_r", ignorenulls=True).over(wb)
    fwd = F.first("_r", ignorenulls=True).over(wf)
    u = (
        u.withColumn("_b", back)
        .withColumn("_f", fwd)
        .filter(F.col("_l").isNotNull())
    )
    lt = F.unix_micros(F.col("_l")[left_ts])
    dist_b = lt - F.unix_micros(F.col("_b")[right_ts])
    dist_f = F.unix_micros(F.col("_f")[right_ts]) - lt
    match = (
        F.when(F.col("_b").isNull(), F.col("_f"))
        .when(F.col("_f").isNull(), F.col("_b"))
        .when(dist_f < dist_b, F.col("_f"))
        .otherwise(F.col("_b"))  # tie -> backward
    )
    matched = u.withColumn("_match", match)
    if tolerance_seconds is not None:
        dist = F.abs(
            F.unix_micros(F.col("_match")[right_ts]) - lt
        )
        matched = matched.withColumn(
            "_match",
            F.when(dist <= F.lit(int(tolerance_seconds) * 1_000_000), F.col("_match")),
        )
    out_right = [
        F.col("_match")[c].alias(f"{right_prefix}{c}") for c in [right_ts, *payload_cols]
    ]
    return matched.select(
        *[F.col("_l")[c].alias(c) for c in left.columns], *out_right
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    before_seconds: int = 3600,
    after_seconds: int = 0,
) -> DataFrame:
    """Batch interval join: all (left, right) pairs of the same key with
    ``right.ts ∈ [left.ts - before, left.ts + after]`` — the batch
    counterpart of streaming.stream_interval_join (the reference has
    neither; its correlation queries are point-id joins).

    Scale shape: a naive range join degenerates to
    broadcast-nested-loop / per-row scans in Catalyst. Here both sides
    hash into time buckets of width ``before + after`` (floored at 1s):
    each RIGHT row replicates into the ≤2 buckets its match window can
    intersect, then an EQUI-join on (keys, bucket) + the exact interval
    filter runs as a plain shuffled hash join — one shuffle per side,
    pair work bounded by events per bucket, no nested loop. Right-side
    columns must already be disambiguated (no shared names besides
    ``keys``).
    """
    width = max(int(before_seconds + after_seconds), 1)
    l = left.withColumn(
        "_bucket", F.floor(F.col(left_ts).cast("double") / width).cast("long")
    )
    r_lo = F.floor((F.col(right_ts).cast("double") - after_seconds) / width).cast("long")
    r_hi = F.floor((F.col(right_ts).cast("double") + before_seconds) / width).cast("long")
    r = right.withColumn("_bucket", F.explode(F.sequence(r_lo, r_hi)))
    cond = (
        (F.col(right_ts).cast("double") >= F.col(left_ts).cast("double") - before_seconds)
        & (F.col(right_ts).cast("double") <= F.col(left_ts).cast("double") + after_seconds)
    )
    return l.join(r, [*keys, "_bucket"]).filter(cond).drop("_bucket")
