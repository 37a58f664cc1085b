"""Query-side support for OTLP summary metrics — beyond the reference,
which persists summary datapoints (schema_transform.rs:1698;
storage-layout.md:573-588) but has no query path over them.

A summary datapoint carries pre-computed quantile anchors
(``quantile_values: array<struct<quantile, value>>``). The only
faithful query is a read-back: take each series' LATEST datapoint
(instant-query semantics) and evaluate φ against the stored anchors —
exact hit returns the anchor, between anchors interpolates linearly,
outside the anchor range clamps to the nearest anchor. Re-aggregating
summaries across series is statistically invalid (quantiles don't
merge) and is deliberately not offered — the same reason Prometheus
documents summaries as non-aggregatable.

Shape at 100 TB: one groupBy per series (max_by timestamp), then pure
array expressions over the tiny anchor list. No explode, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summary_quantile(
    df: DataFrame,
    phi: float,
    series_cols: list[str],
    ts_col: str = "timestamp",
    qv_col: str = "quantile_values",
    out: str = "value",
) -> DataFrame:
    """φ read-back per series from the latest summary datapoint."""
    latest = df.groupBy(*series_cols).agg(
        F.array_sort(F.max_by(F.col(qv_col), F.col(ts_col))).alias("_qv")
    )
    p = F.lit(float(phi))
    lo = F.try_element_at(F.filter(F.col("_qv"), lambda s: s["quantile"] <= p), F.lit(-1))
    hi = F.try_element_at(F.filter(F.col("_qv"), lambda s: s["quantile"] >= p), F.lit(1))
    value = (
        F.when(F.size(F.col("_qv")) == 0, F.lit(None).cast("double"))
        .when(lo.isNull(), hi["value"])
        .when(hi.isNull(), lo["value"])
        .when(hi["quantile"] == lo["quantile"], lo["value"])
        .otherwise(
            lo["value"]
            + (hi["value"] - lo["value"])
            * (p - lo["quantile"])
            / (hi["quantile"] - lo["quantile"])
        )
    )
    return latest.select(*series_cols, value.alias(out))
