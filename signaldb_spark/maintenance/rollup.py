"""Metric downsampling: continuous-aggregate rollups + hybrid reads.

The at-scale answer to long-range metric queries: a maintenance job
pre-aggregates closed raw partitions into per-series coarse buckets
(count/sum/min/max — the mergeable stats), and the query path reads the
rollup for the old part of the window and raw samples only for the
recent tail. A 90-day dashboard query then scans ~90×series rollup rows
instead of every raw sample — the scan cost tracks series count, not
ingest volume. The reference has no rollup tier (its long-range queries
re-scan raw parquet); this is a beyond-reference extension in the
Timescale/Mimir continuous-aggregate mold, expressed as two ordinary
partial+final aggregations.

Correctness contract: count/sum/min/max are associative, so re-bucketing
rollup rows to any step that is a multiple of ``bucket_seconds`` is
EXACT (avg = sum/count reconstructs); the hybrid read is exact when the
raw/rollup split lands on a bucket boundary, which ``hybrid_stats``
enforces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.timeseries import bucket

SERIES_COLS = ["metric_name", "service_name"]


def _canonical_attrs(attr_col: str) -> F.Column:
    """Deterministic string identity for an attribute map: sorted
    entries → JSON. Maps aren't comparable group keys in Spark; this is
    the standard canonicalization (sort is on the struct's leading key
    field, unique within a map by construction)."""
    return F.to_json(F.sort_array(F.map_entries(F.col(attr_col))))


def rollup_metrics(
    df: DataFrame,
    bucket_seconds: int = 3600,
    attr_col: str = "attributes",
) -> DataFrame:
    """Aggregate raw samples to one row per (bucket, series): the
    rollup-build job, one partial+final shuffle over the raw scan. Run
    per closed partition by the compactor loop; idempotent because the
    output is a pure function of the input partition."""
    attr_key = _canonical_attrs(attr_col)
    return (
        df.groupBy(
            bucket("timestamp", bucket_seconds).alias("bucket"),
            *SERIES_COLS,
            attr_key.alias("attr_key"),
        )
        .agg(
            F.first(F.col(attr_col)).alias(attr_col),
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )


def hybrid_stats(
    raw: DataFrame,
    rollup: DataFrame,
    start,
    end,
    split,
    step_seconds: int,
    bucket_seconds: int = 3600,
    attr_col: str = "attributes",
) -> DataFrame:
    """Per-(step-bucket, series) count/sum/min/max/avg over [start, end),
    reading the rollup for [start, split) and raw samples for
    [split, end). ``split`` must align to ``bucket_seconds`` and
    ``step_seconds`` must be a multiple of it — then the hybrid result
    is exactly the full-raw aggregation."""
    if step_seconds % bucket_seconds != 0:
        raise ValueError("step must be a multiple of the rollup bucket")
    split_epoch = F.unix_timestamp(F.lit(split).cast("timestamp"))
    attr_key = _canonical_attrs(attr_col)
    raw_part = (
        raw.filter(
            (F.col("timestamp") >= split)
            & (F.col("timestamp") >= start)
            & (F.col("timestamp") < end)
        )
        .groupBy(
            bucket("timestamp", step_seconds).alias("bucket"),
            *SERIES_COLS,
            attr_key.alias("attr_key"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    roll_part = (
        rollup.filter(
            (F.col("bucket") < split_epoch)
            & (F.col("bucket") >= F.unix_timestamp(F.lit(start).cast("timestamp")))
            & (F.col("bucket") < F.unix_timestamp(F.lit(end).cast("timestamp")))
        )
        .groupBy(
            ((F.floor(F.col("bucket") / step_seconds)) * step_seconds)
            .cast("long")
            .alias("bucket"),
            *SERIES_COLS,
            "attr_key",
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("vsum").alias("vsum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
    merged = (
        raw_part.unionByName(roll_part)
        .groupBy("bucket", *SERIES_COLS, "attr_key")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("vsum").alias("vsum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
    return merged.withColumn("vavg", F.col("vsum") / F.col("cnt"))


def append_rollup(
    df: DataFrame,
    rollup_path: str,
    bucket_seconds: int = 3600,
    attr_col: str = "attributes",
) -> None:
    """Incremental (streaming) rollup maintenance: aggregate ONE ingest
    batch and append its partial rollup rows. Batches may straddle
    buckets and arrive late — correctness needs no read-modify-write
    because the stats are mergeable: ``read_rollup`` re-merges all
    partial rows per (bucket, series) exactly. The write is append-only
    (object-store friendly), partitioned by the bucket's day for
    long-range partition pruning."""
    from ..storage.manifest import stats_visible_writes

    out = rollup_metrics(df, bucket_seconds, attr_col).withColumn(
        "date_day", F.to_date(F.timestamp_seconds(F.col("bucket")))
    )
    # µs-encoded timestamps regardless of the embedder session: INT96
    # records no parquet stats, which would disable row-group skipping
    # on later time-ranged rollup reads
    with stats_visible_writes(df.sparkSession):
        out.write.mode("append").partitionBy("date_day").parquet(rollup_path)


def read_rollup(spark, rollup_path: str, attr_col: str = "attributes") -> DataFrame:
    """Merged rollup view over the append-only partials: one row per
    (bucket, series) with fully-combined stats — the DataFrame
    ``hybrid_stats`` consumes. The merge is a partial+final aggregation
    over already-tiny rows; at 100 TB the partials stay small because
    each is one batch × series, and compaction can fold them offline
    with this same expression."""
    raw = spark.read.parquet(rollup_path)
    return raw.groupBy("bucket", *SERIES_COLS, "attr_key").agg(
        F.first(F.col(attr_col)).alias(attr_col),
        F.sum("cnt").alias("cnt"),
        F.sum("vsum").alias("vsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )


def rollup_cascade(rollup: DataFrame, coarse_seconds: int) -> DataFrame:
    """Re-bucket rollup rows to a coarser step — the downsample cascade
    (hourly → daily → weekly tiers, Timescale/Mimir style). EXACT
    because count/sum/min/max compose associatively; ``coarse_seconds``
    must be a multiple of the input's bucket step (bucket labels are
    epoch-floored, so the coarse floor of an aligned fine bucket equals
    the coarse floor of its raw samples). One partial+final aggregation
    over ROLLUP rows — each cascade tier's build cost tracks series
    count × fine buckets, never raw ingest volume."""
    coarse = (F.floor(F.col("bucket") / coarse_seconds) * coarse_seconds).cast("long")
    return (
        rollup.groupBy(
            coarse.alias("bucket"), *SERIES_COLS, "attr_key"
        )
        .agg(
            F.first("attributes").alias("attributes"),
            F.sum("cnt").alias("cnt"),
            F.sum("vsum").alias("vsum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )
