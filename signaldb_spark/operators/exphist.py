"""Query-side support for OTLP exponential (Prometheus "native")
histograms — beyond the reference, which persists them at rest
(schema_transform.rs:1493; storage-layout.md:555-588) but has no query
path that reads them.

An exponential histogram with scale s has base = 2^(2^-s); positive
bucket index i covers (base^i, base^(i+1)]. Datapoints store a dense
``positive_bucket_counts`` array starting at ``positive_offset`` plus a
``zero_count``. The quantile merges all datapoints of a series
(element-wise by absolute index — offsets may differ between points),
walks the cumulative distribution, and interpolates linearly inside the
crossing bucket (classic histogram_quantile semantics applied to
exponential bounds).

Shape at 100 TB: one explode to (series, idx, count) longs, one groupBy
per (series, idx) with map-side partial sums, one groupBy per series
collecting the (tiny — ≤ ~160 buckets) per-series distribution, then
the quantile is a single F.aggregate fold over the sorted bucket array.
No window functions, no self-joins; the fold runs on already-reduced
data.
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
    offset_col: str = "positive_offset",
    counts_col: str = "positive_bucket_counts",
    out: str = "value",
) -> DataFrame:
    """φ-quantile per series from at-rest exponential-histogram rows.

    rank = φ·(zero_count + Σ bucket counts); rank within the zero bucket
    returns 0.0; otherwise the first bucket whose cumulative count
    reaches rank is linearly interpolated. Series whose scale varies
    between datapoints are merged by DOWNSCALING to the series' minimum
    scale — bucket i at scale s maps exactly onto bucket
    floor(i / 2^(s-m)) at coarser scale m (each coarse bucket is the
    union of 2^(s-m) fine buckets), the same merge Prometheus and the
    OTLP SDKs perform when scales differ.
    """
    zeros = df.groupBy(*series_cols).agg(
        F.sum(zero_col).cast("double").alias("_z"),
        F.min(scale_col).alias("_scale"),
    )
    # downscale each datapoint's indexes to the series min scale BEFORE
    # merging: floor-division by 2^(s-m) (exact integer arithmetic; for
    # negative indexes floor ≠ truncate, hence an arithmetic shift on
    # longs). The min scale rides a window over the series key — the
    # same shuffle the bucket merge needs anyway, no join back.
    w = Window.partitionBy(*series_cols)
    buckets = (
        df.withColumn("_ds", F.col(scale_col) - F.min(scale_col).over(w))
        .select(
            *series_cols,
            "_ds",
            F.col(offset_col).alias("_off"),
            F.posexplode_outer(counts_col).alias("_pos", "_cnt"),
        )
        .filter(F.col("_cnt") > 0)
        .groupBy(
            *series_cols,
            F.expr("CAST(shiftright(CAST(_off + _pos AS LONG), _ds) AS INT)").alias("_i"),
        )
        .agg(F.sum("_cnt").cast("double").alias("_c"))
    )
    dist = buckets.groupBy(*series_cols).agg(
        F.array_sort(F.collect_list(F.struct("_i", "_c"))).alias("_d")
    )
    merged = zeros.join(dist, list(series_cols), "left")
    e2 = F.pow(F.lit(2.0), -F.col("_scale"))  # 2^-scale; bucket bound = 2^(i·2^-scale)
    total = F.col("_z") + F.coalesce(
        F.aggregate(F.col("_d"), F.lit(0.0), lambda a, s: a + s["_c"]), F.lit(0.0)
    )
    rank = F.lit(phi) * total

    def _step(acc: Column, s: Column) -> Column:
        newcum = acc["cum"] + s["_c"]
        lower = F.pow(F.lit(2.0), s["_i"] * e2)
        upper = F.pow(F.lit(2.0), (s["_i"] + 1) * e2)
        hit = acc["val"].isNull() & (newcum >= rank)
        val = F.when(
            hit, lower + (upper - lower) * (rank - acc["cum"]) / s["_c"]
        ).otherwise(acc["val"])
        return F.struct(newcum.alias("cum"), val.alias("val"))

    acc0 = F.struct(
        F.col("_z").alias("cum"), F.lit(None).cast("double").alias("val")
    )
    folded = F.aggregate(
        F.coalesce(F.col("_d"), F.array().cast("array<struct<_i:int,_c:double>>")),
        acc0,
        _step,
        lambda a: a["val"],
    )
    value = (
        F.when(total <= 0, F.lit(None).cast("double"))
        .when(rank <= F.col("_z"), F.lit(0.0))
        .otherwise(folded)
    )
    return merged.select(*series_cols, value.alias(out))
