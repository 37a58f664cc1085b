"""Prometheus metadata endpoints: /api/v1/labels, /api/v1/label/<x>/values,
/api/v1/series.

Spark analog of get_labels / get_label_values / get_series
(src/querier/src/query/metrics.rs:1489-1646). Identity rules mirror the
reference: series identity is ``__name__`` (metric_name) and ``job``
(service_name); other labels resolve through the attributes map. Cap is
LABEL_SCAN_LIMIT = 1000 (metrics.rs:58) — the reference truncates the
ROWS it scans before deduping driver-side; here the distinct/sort/limit
all run in-engine, so the cap bounds the RESULT deterministically
(sorted ascending, like the reference's BTreeSet ordering) instead of
sampling arbitrarily. Strictly more useful at 100 TB: the scan prunes to
the window partitions, the dedup is a shuffle on a tiny projection, and
no unbounded data reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ast import VectorSelector
from .lowering import WELL_KNOWN, PromCtx, apply_selector, scan_union
from .parser import parse

LABEL_SCAN_LIMIT = 1000


def _window(ctx: PromCtx, df: DataFrame) -> DataFrame:
    return df.filter(F.col("timestamp").between(ctx.start, ctx.end))


def prom_labels(ctx: PromCtx, cap: int = LABEL_SCAN_LIMIT) -> DataFrame:
    """Distinct label names in the window: the well-known ``__name__``/
    ``job`` pair plus every attribute key present (metrics.rs:1489-1529)."""
    spark = ctx.spark
    static = spark.createDataFrame([("__name__",), ("job",)], "label string")
    base = scan_union(ctx)
    if base is None:
        return static.orderBy("label").limit(cap)
    keys = (
        _window(ctx, base)
        .select(F.explode(F.map_keys(F.col("attributes"))).alias("label"))
        .filter(F.col("label") != "")
    )
    return static.unionByName(keys).distinct().orderBy("label").limit(cap)


def prom_label_values(ctx: PromCtx, label: str, cap: int = LABEL_SCAN_LIMIT) -> DataFrame:
    """Distinct non-empty values of one label (metrics.rs:1531-1598):
    ``__name__``/``job``/``service`` route to their columns, anything
    else reads the attributes map."""
    if not label:
        raise ValueError("label name must not be empty")
    base = scan_union(ctx)
    spark = ctx.spark
    if base is None:
        return spark.createDataFrame([], "value string")
    df = _window(ctx, base)
    if label in WELL_KNOWN:
        col = F.col(WELL_KNOWN[label])
    else:
        col = F.element_at(F.col("attributes"), label)
    return (
        df.select(col.cast("string").alias("value"))
        .filter(F.col("value").isNotNull() & (F.col("value") != ""))
        .distinct()
        .orderBy("value")
        .limit(cap)
    )


def prom_series(ctx: PromCtx, selector: str, cap: int = LABEL_SCAN_LIMIT) -> DataFrame:
    """Distinct series identities matching a selector
    (metrics.rs:1599-1646): one row per (__name__, job), non-empty,
    sorted, capped."""
    expr = parse(selector.strip())
    if not isinstance(expr, VectorSelector):
        raise ValueError("series discovery expects a plain selector")
    base = scan_union(ctx)
    spark = ctx.spark
    if base is None:
        return spark.createDataFrame([], "`__name__` string, job string")
    df = apply_selector(ctx, expr, _window(ctx, base))
    return (
        df.select(
            F.col("metric_name").alias("__name__"), F.col("service_name").alias("job")
        )
        .filter(
            F.col("__name__").isNotNull() & (F.col("__name__") != "")
            & F.col("job").isNotNull() & (F.col("job") != "")
        )
        .distinct()
        .orderBy("__name__", "job")
        .limit(cap)
    )


def metric_metadata(
    spark,
    tables: "dict[str, DataFrame | None]",
    cap: int = LABEL_SCAN_LIMIT,
) -> DataFrame:
    """Prometheus ``/api/v1/metadata``: metric name → type. The store
    itself is the metadata source — a metric's type IS the signal table
    it lands in (gauge/counter/histogram/exponential-histogram/summary,
    the OTLP→table routing of schemas.rs) — so this is a union of tiny
    distinct-name projections, no metadata sidecar to drift."""
    type_names = {
        "metrics_gauge": "gauge",
        "metrics_sum": "counter",
        "metrics_histogram": "histogram",
        "metrics_exponential_histogram": "histogram",
        "metrics_summary": "summary",
    }
    parts = []
    for table, df in tables.items():
        if df is None or table not in type_names:
            continue
        parts.append(
            df.select(F.col("metric_name").alias("metric"))
            .distinct()
            .withColumn("type", F.lit(type_names[table]))
        )
    if not parts:
        return spark.createDataFrame([], "metric string, type string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct().orderBy("metric", "type").limit(cap)


def tsdb_status(ctx: PromCtx, top_n: int = 10) -> DataFrame:
    """Prometheus ``/api/v1/status/tsdb`` analog: series-cardinality
    analysis — per metric name, the count of distinct (service, labels)
    series — the panel operators use to hunt cardinality explosions.
    One distinct-project + one count per metric; top-N by count."""
    df = scan_union(ctx)
    if df is None:
        return ctx.spark.createDataFrame([], "metric string, series_count long")
    label_cols = [c for c in df.columns if c.startswith("label_")]
    series = df.select("metric_name", "service_name", *label_cols).distinct()
    return (
        series.groupBy(F.col("metric_name").alias("metric"))
        .agg(F.count(F.lit(1)).alias("series_count"))
        .orderBy(F.col("series_count").desc(), F.col("metric").asc())
        .limit(top_n)
    )
