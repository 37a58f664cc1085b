"""Query-side support for OTLP exponential (Prometheus "native")
histograms — beyond the reference, which persists them at rest
(schema_transform.rs:1493; storage-layout.md:555-588) but has no query
path that reads them.

An exponential histogram with scale s has base = 2^(2^-s); positive
bucket index i covers (base^i, base^(i+1)], negative bucket index i
covers [-base^(i+1), -base^i). Datapoints store dense
``positive_bucket_counts`` / ``negative_bucket_counts`` arrays starting
at their offsets plus a ``zero_count``. The quantile merges all
datapoints of a series, walks the cumulative distribution in value
order — negative buckets (most negative first), the zero bucket, then
positive buckets — and interpolates linearly inside the crossing
bucket (classic histogram_quantile semantics applied to exponential
bounds).

Shape at 100 TB: one explode to (series, side, idx, count) longs, one
groupBy per (series, side, idx) with map-side partial sums, one groupBy
per series collecting the (tiny — ≤ ~320 buckets) per-series
distribution, then the quantile is a single F.aggregate fold over the
value-ordered bucket array. No window beyond the series key, no
self-joins; the fold runs on already-reduced data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exphist_quantile(
    df: DataFrame,
    phi: float,
    series_cols: list[str],
    scale_col: str = "scale",
    zero_col: str = "zero_count",
    pos_offset_col: str = "positive_offset",
    pos_counts_col: str = "positive_bucket_counts",
    neg_offset_col: str | None = "negative_offset",
    neg_counts_col: str | None = "negative_bucket_counts",
    out: str = "value",
) -> DataFrame:
    """φ-quantile per series from at-rest exponential-histogram rows.

    rank = φ·total over the value-ordered CDF (negatives, zero bucket,
    positives); a rank landing in the zero bucket returns 0.0. Series
    whose scale varies between datapoints are merged by DOWNSCALING to
    the series' minimum scale — bucket i at scale s maps exactly onto
    bucket floor(i / 2^(s-m)) at coarser scale m (each coarse bucket is
    the union of 2^(s-m) fine buckets), the same merge Prometheus and
    the OTLP SDKs perform when scales differ. Pass ``neg_*_col=None``
    for tables without a negative side.
    """
    zeros = df.groupBy(*series_cols).agg(
        F.sum(zero_col).cast("double").alias("_z"),
        F.min(scale_col).alias("_scale"),
    )
    w = Window.partitionBy(*series_cols)
    # downscale each datapoint's indexes to the series min scale BEFORE
    # merging: floor-division by 2^(s-m) (exact integer arithmetic; for
    # negative indexes floor ≠ truncate, hence an arithmetic shift on
    # longs). The min scale rides a window over the series key — the
    # same shuffle the bucket merge needs anyway, no join back.
    with_ds = df.withColumn("_ds", F.col(scale_col) - F.min(scale_col).over(w))

    def _side(offset_col: str, counts_col: str, side: int) -> DataFrame:
        return (
            with_ds.select(
                *series_cols,
                "_ds",
                F.lit(side).alias("_side"),
                F.col(offset_col).alias("_off"),
                F.posexplode_outer(counts_col).alias("_pos", "_cnt"),
            )
            .filter(F.col("_cnt") != 0)
            .groupBy(
                *series_cols,
                "_side",
                F.expr(
                    "CAST(shiftright(CAST(_off + _pos AS LONG), _ds) AS INT)"
                ).alias("_i"),
            )
            .agg(F.sum("_cnt").cast("double").alias("_c"))
            # negative per-datapoint counts are legal inputs (the
            # rate-mode last − first delta encodes the subtrahend as
            # negated rows); only the per-bucket NET must be kept, and
            # a zero net is dropped so the fold never divides by it
            .filter(F.col("_c") != 0)
        )

    sides = _side(pos_offset_col, pos_counts_col, 1)
    if neg_offset_col is not None and neg_counts_col is not None \
            and neg_offset_col in df.columns and neg_counts_col in df.columns:
        sides = _side(neg_offset_col, neg_counts_col, -1).unionByName(sides)
    # value order inside one sortable struct: negatives first (most
    # negative = highest idx first → ord = -i), then positives (ord = i);
    # the zero bucket is the fold's initial accumulator, correct because
    # every negative value < 0 < every positive value and the fold walks
    # (side, ord) ascending — but ONLY if negatives accumulate BEFORE
    # zero, so the init carries just the negative+zero boundary: we fold
    # negatives with cum starting at 0, add z between sides, then
    # positives. Encoded by folding the sorted array with a side-aware
    # step that injects z when crossing from side -1 to side 1.
    dist = sides.groupBy(*series_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_side").alias("_s"),
                    F.when(F.col("_side") < 0, -F.col("_i")).otherwise(F.col("_i")).alias("_o"),
                    F.col("_i").alias("_i"),
                    F.col("_c").alias("_c"),
                )
            )
        ).alias("_d")
    )
    merged = zeros.join(dist, list(series_cols), "left")
    e2 = F.pow(F.lit(2.0), -F.col("_scale"))  # 2^-scale; |bound| = 2^(i·2^-scale)
    neg_total = F.coalesce(
        F.aggregate(
            F.filter(F.col("_d"), lambda s: s["_s"] < 0),
            F.lit(0.0),
            lambda a, s: a + s["_c"],
        ),
        F.lit(0.0),
    )
    total = F.col("_z") + F.coalesce(
        F.aggregate(F.col("_d"), F.lit(0.0), lambda a, s: a + s["_c"]), F.lit(0.0)
    )
    rank = F.lit(phi) * total

    def _bounds(s: Column) -> tuple[Column, Column]:
        mag_lo = F.pow(F.lit(2.0), s["_i"] * e2)
        mag_hi = F.pow(F.lit(2.0), (s["_i"] + 1) * e2)
        lower = F.when(s["_s"] < 0, -mag_hi).otherwise(mag_lo)
        upper = F.when(s["_s"] < 0, -mag_lo).otherwise(mag_hi)
        return lower, upper

    def _step(acc: Column, s: Column) -> Column:
        # crossing from the negative side to the positive side passes
        # through the zero bucket: its count joins the cumulative first
        cum_in = F.when(
            (s["_s"] > 0) & ~acc["zeroed"], acc["cum"] + F.col("_z")
        ).otherwise(acc["cum"])
        zeroed = acc["zeroed"] | (s["_s"] > 0)
        newcum = cum_in + s["_c"]
        lower, upper = _bounds(s)
        hit = acc["val"].isNull() & (newcum >= rank)
        # a rank consumed by the zero bucket itself resolves to 0.0
        zero_hit = acc["val"].isNull() & (s["_s"] > 0) & ~acc["zeroed"] & (cum_in >= rank)
        val = (
            F.when(zero_hit, F.lit(0.0))
            .when(hit, lower + (upper - lower) * (rank - cum_in) / s["_c"])
            .otherwise(acc["val"])
        )
        return F.struct(newcum.alias("cum"), val.alias("val"), zeroed.alias("zeroed"))

    acc0 = F.struct(
        F.lit(0.0).alias("cum"),
        F.lit(None).cast("double").alias("val"),
        F.lit(False).alias("zeroed"),
    )
    empty = F.array().cast("array<struct<_s:int,_o:int,_i:int,_c:double>>")
    folded = F.aggregate(
        F.coalesce(F.col("_d"), empty), acc0, _step, lambda a: a["val"]
    )
    # ranks that fall inside [negatives, negatives+zero] when there are
    # no positive buckets (the fold never crosses sides) resolve here
    value = (
        F.when(total <= 0, F.lit(None).cast("double"))
        .when(folded.isNotNull(), folded)
        .when(rank <= neg_total + F.col("_z"), F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
    )
    return merged.select(*series_cols, value.alias(out))


def exphist_rate_quantile(
    df: DataFrame,
    phi: float,
    series_cols: list[str],
    ts_col: str = "timestamp",
    step_seconds: int = 3600,
    scale_col: str = "scale",
    zero_col: str = "zero_count",
    pos_offset_col: str = "positive_offset",
    pos_counts_col: str = "positive_bucket_counts",
    neg_offset_col: str | None = "negative_offset",
    neg_counts_col: str | None = "negative_bucket_counts",
    out: str = "value",
) -> DataFrame:
    """histogram_quantile(φ, rate(exp_hist[step])) for CUMULATIVE
    exponential histograms — the Prometheus native-histogram rate path.

    Per (step bucket, series) the rate distribution is (last − first)
    element-wise over the sparse (side, idx) domain. Rather than a
    bespoke delta walk, the subtrahend is encoded as the first
    datapoint with NEGATED counts and unioned with the last; the
    standard merge in :func:`exphist_quantile` then nets per-bucket
    deltas (dropping zero nets), downscales mixed scales, and folds the
    CDF exactly as the at-rest path does. Steps with a single datapoint
    (no increase) net to zero mass and return no row.

    Counter resets: a cumulative histogram restarting within a step
    makes last − first negative, which would corrupt the CDF. Reset
    detection mirrors Prometheus's native-histogram rules: total
    observation count decreasing, zero count decreasing, ANY individual
    bucket decreasing (offset-aligned element-wise compare — at equal
    scales directly; across a legitimate scale decrease by first
    merging the finer snapshot's buckets down, the same
    downscale-then-compare Prometheus's detectReset performs), or the
    scale INCREASING (SDKs only lower resolution as range grows; a
    finer scale means a restart). Detected resets drop the subtrahend and use the
    LAST datapoint's distribution as the increase — the post-reset
    value. NOTE the documented undercount: with >2 datapoints in a
    step, the pre-reset increase (first → pre-reset peak) is discarded,
    so the step's rate can be lower than Prometheus, which sums
    reset-corrected adjacent deltas; first/last snapshots cannot see
    the peak."""
    keep = [scale_col, zero_col, pos_offset_col, pos_counts_col]
    if neg_offset_col is not None and neg_offset_col in df.columns:
        keep += [neg_offset_col, neg_counts_col]
    b = df.withColumn(
        "bucket",
        (F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds) * step_seconds).cast(
            "long"
        ),
    )
    snap = F.struct(*[F.col(c).alias(c) for c in keep])
    ends = b.groupBy("bucket", *series_cols).agg(
        F.max_by(snap, F.col(ts_col)).alias("_last"),
        F.min_by(snap, F.col(ts_col)).alias("_first"),
    )

    def _tot(side: str) -> Column:
        t = F.col(f"{side}.{zero_col}").cast("double") + F.coalesce(
            F.aggregate(
                F.col(f"{side}.{pos_counts_col}"),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            F.lit(0.0),
        )
        if neg_counts_col is not None and neg_offset_col in df.columns:
            t = t + F.coalesce(
                F.aggregate(
                    F.col(f"{side}.{neg_counts_col}"),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                F.lit(0.0),
            )
        return t

    scale_l, scale_f = F.col(f"_last.{scale_col}"), F.col(f"_first.{scale_col}")
    # Element-wise bucket-decrease check, scale-aware in ONE fold: when
    # _first is FINER (scale_f > scale_l — the legitimate SDK downscale
    # direction) its buckets merge down to _last's scale before
    # comparing (Prometheus detectReset downscales the higher
    # resolution first); at equal scales the same formula degenerates
    # to the plain offset-aligned compare (_dsd = 0 → one-element
    # slices). Downscale groups 2^d CONTIGUOUS fine indices per coarse
    # bucket, so each coarse sum is a slice-sum — no explode.
    ends = ends.withColumn(
        "_dsd", (scale_f - scale_l).cast("int")
    ).withColumn(
        "_p2", F.expr("CAST(pow(2, greatest(_dsd, 0)) AS BIGINT)")
    )

    def _down_bucket_decreased(off_col: str, counts_col: str) -> Column:
        arr_f = F.col(f"_first.{counts_col}")
        off_f = F.col(f"_first.{off_col}").cast("long")
        arr_l = F.col(f"_last.{counts_col}")
        off_l = F.col(f"_last.{off_col}").cast("long")
        n = F.coalesce(F.size(arr_f), F.lit(0))
        p2 = F.col("_p2")

        # Equal-scale fast path (_dsd = 0 — by far the common case: SDKs
        # rarely rescale within one step): the general fold below would
        # degenerate to a length-1 slice + aggregate PER BUCKET, paying
        # a slice allocation and a fold setup per element. One
        # offset-aligned index transform + exists does the same compare
        # in a single array pass. (r5 bench: this fold was the
        # exphist_rate_quantile +58% regression; hoisting the
        # degenerate case recovers it.)
        eq_flags = F.transform(
            arr_f,
            lambda x, i: x.cast("double")
            > F.coalesce(
                F.get(arr_l, (off_f + i - off_l).cast("int")), F.lit(0)
            ).cast("double"),
        )
        dec_equal = F.coalesce(F.exists(eq_flags, lambda b: b), F.lit(False))

        jlo = F.floor(off_f / p2)
        jhi = F.floor((off_f + n - 1) / p2)
        seq = F.when(n > 0, F.sequence(jlo, jhi)).otherwise(
            F.array().cast("array<bigint>")
        )

        def _dec(j) -> Column:
            lo = F.greatest(j * p2, off_f)
            hi = F.least((j + 1) * p2 - 1, off_f + n - 1)
            first_sum = F.aggregate(
                F.slice(arr_f, (lo - off_f + 1).cast("int"), (hi - lo + 1).cast("int")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            last_at = F.coalesce(
                F.when(j - off_l >= 0, F.get(arr_l, (j - off_l).cast("int"))),
                F.lit(0),
            ).cast("double")
            return first_sum > last_at

        dec_general = F.coalesce(F.exists(seq, _dec), F.lit(False))
        # The fast path needs BOTH offsets non-null: F.get(arr, null)
        # coalesces to 0, so a malformed null-offset row would flag a
        # reset on any positive first bucket while the general fold's
        # null sequence coalesces to no-reset. Route degenerate rows to
        # the general fold so both branches agree on them.
        return F.when(
            (F.col("_dsd") == 0) & off_f.isNotNull() & off_l.isNotNull(),
            dec_equal,
        ).otherwise(dec_general)

    bucket_dec = _down_bucket_decreased(pos_offset_col, pos_counts_col)
    if neg_offset_col is not None and neg_offset_col in df.columns:
        bucket_dec = bucket_dec | _down_bucket_decreased(neg_offset_col, neg_counts_col)
    reset = (
        (_tot("_last") < _tot("_first"))
        | (F.col(f"_last.{zero_col}") < F.col(f"_first.{zero_col}"))
        | (scale_l > scale_f)  # resolution can only rise after a restart
        # when(): If evaluates lazily per row, so the fold only runs on
        # rows whose scales admit a comparison
        | F.when(scale_f >= scale_l, bucket_dec).otherwise(F.lit(False))
    )
    ends = ends.withColumn("_reset", reset).drop("_dsd", "_p2")
    # ONE pass over the agg output: each (bucket, series) row explodes
    # to [last, negated-first-unless-reset] — a union of two selects
    # over the same aggregate would compute the groupBy twice (the two
    # branches project differently, so the exchange is not reusable).
    neg_struct = F.struct(
        F.col(f"_first.{scale_col}").alias(scale_col),
        (-F.col(f"_first.{zero_col}")).alias(zero_col),
        F.col(f"_first.{pos_offset_col}").alias(pos_offset_col),
        F.transform(F.col(f"_first.{pos_counts_col}"), lambda x: -x).alias(
            pos_counts_col
        ),
        *(
            [
                F.col(f"_first.{neg_offset_col}").alias(neg_offset_col),
                F.transform(F.col(f"_first.{neg_counts_col}"), lambda x: -x).alias(
                    neg_counts_col
                ),
            ]
            if neg_offset_col is not None and neg_offset_col in df.columns
            else []
        ),
    )
    union = (
        ends.select(
            "bucket",
            *series_cols,
            F.explode(
                F.array(
                    F.col("_last"),
                    F.when(~F.col("_reset"), neg_struct),
                )
            ).alias("_s"),
        )
        .filter(F.col("_s").isNotNull())
        .select("bucket", *series_cols, F.col("_s.*"))
    )
    q = exphist_quantile(
        union,
        phi,
        ["bucket", *series_cols],
        scale_col=scale_col,
        zero_col=zero_col,
        pos_offset_col=pos_offset_col,
        pos_counts_col=pos_counts_col,
        neg_offset_col=neg_offset_col if neg_offset_col in union.columns else None,
        neg_counts_col=neg_counts_col if (neg_counts_col or "") in union.columns else None,
        out=out,
    )
    return q.filter(F.col(out).isNotNull())
