"""Structured Streaming ingest: the WAL→writer→Iceberg pipeline of the
reference collapsed onto Spark's own machinery.

Reference path (docs/architecture/overview.md:127-148): OTLP → acceptor
WAL → writer transform → writer WAL → 5s drain → coalesced Iceberg
commit. In Spark, checkpointing + ``foreachBatch`` replaces BOTH WALs
(exactly-once via the streaming checkpoint + idempotent append), the
trigger interval IS the commit coalescing, ``withWatermark`` is the
``partition_lateness`` gate, and ``processAllAvailable`` / availableNow
gives read-your-writes (the Flight ``do_action("flush")`` analog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import signal_table_path
from ..sources.otlp import OTLP_LOGS_SCHEMA, flatten_otlp_logs, with_dead_letter_flag

# parquet bloom filters on point-lookup columns, mirroring the
# reference's table properties (src/common/src/schema/mod.rs:69-105:
# trace_id/span_id fpp 0.01) — config, not code (SURVEY §4.1)
BLOOM_WRITE_OPTIONS = {
    "parquet.bloom.filter.enabled#trace_id": "true",
    "parquet.bloom.filter.enabled#span_id": "true",
    "parquet.bloom.filter.expected.ndv#trace_id": "50000",
    "parquet.compression": "zstd",
}

SORT_ORDERS = {
    # compaction/write clustering (rewriter.rs:591-616)
    "traces": ["timestamp", "trace_id"],
    "logs": ["timestamp", "service_name", "severity_text"],
    "metrics_gauge": ["timestamp", "metric_name", "service_name"],
    "metrics_sum": ["timestamp", "metric_name", "service_name"],
    "metrics_histogram": ["timestamp", "metric_name", "service_name"],
}


def write_batch(df: DataFrame, table_path: str, table: str, batch_id: int | None = None) -> None:
    """(date_day, hour)-partitioned append used by foreachBatch — the
    absolute-hour partitioning of the reference's Hour(timestamp) spec
    (hour-of-day alone would collide across days and break
    retention/compaction units).

    Idempotency: with ``batch_id`` set, the batch writes to a staging
    dir then moves files into the partition tree under
    batch-deterministic names; a replayed batch rewrites the same file
    names (os.replace), so the at-least-once replay of foreachBatch
    cannot duplicate rows. Without batch_id this is a plain append.
    Sorting within partitions applies the table's clustering order at
    write time so even pre-compaction files scan well."""
    import os
    import shutil

    sort_cols = [c for c in SORT_ORDERS.get(table, []) if c in df.columns]
    # guard the empty list: sortWithinPartitions() with zero columns
    # raises CANNOT_BE_EMPTY, so a frame carrying none of the table's
    # sort columns would crash the sink instead of writing unsorted
    from ..storage.manifest import stats_visible_writes

    sorted_df = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    if batch_id is None:
        writer = sorted_df.write.mode("append").partitionBy("date_day", "hour")
        for k, v in BLOOM_WRITE_OPTIONS.items():
            writer = writer.option(k, v)
        with stats_visible_writes(df.sparkSession):
            writer.parquet(table_path)
        return
    marker = os.path.join(table_path, f"_batch_{batch_id}_done")
    if os.path.exists(marker):
        return
    staging = os.path.join(table_path, "_staging", f"batch-{batch_id}")
    writer = sorted_df.write.mode("overwrite").partitionBy("date_day", "hour")
    for k, v in BLOOM_WRITE_OPTIONS.items():
        writer = writer.option(k, v)
    with stats_visible_writes(df.sparkSession):
        writer.parquet(staging)
    # a crashed earlier attempt may have moved MORE files than this
    # replay produces (parallelism change, speculative tasks): sweep the
    # batch's files table-wide first so the replay fully supersedes it.
    # NEVER descend into the manifest store's data/ (or the hot store):
    # manifest-committed files share the batch-{id}- naming, and a
    # checkpoint replayed with use_manifest flipped off would otherwise
    # unlink files the manifest still references. Legacy hive layouts
    # only contain date_day=*/hour=* dirs, so the exclusion is inert.
    prefix = f"batch-{batch_id}-"
    for root, dirs, files in os.walk(table_path):
        dirs[:] = [
            d for d in dirs
            if not d.startswith("_") and d not in ("data", "hot")
        ]
        for f in files:
            if f.startswith(prefix) and f.endswith(".parquet"):
                os.unlink(os.path.join(root, f))
    # move files under deterministic names: replay overwrites, never dupes
    for root, _dirs, files in os.walk(staging):
        rel = os.path.relpath(root, staging)
        for i, f in enumerate(sorted(files)):
            if not f.endswith(".parquet"):
                continue
            dest_dir = os.path.join(table_path, rel)
            os.makedirs(dest_dir, exist_ok=True)
            os.replace(
                os.path.join(root, f),
                os.path.join(dest_dir, f"batch-{batch_id}-{i:05d}.parquet"),
            )
    shutil.rmtree(staging, ignore_errors=True)
    open(marker, "w").close()


def dead_letter_path(base: str, tenant: str, dataset: str, signal: str) -> str:
    return os.path.join(base, tenant, dataset, "dead_letter", signal)


def write_dead_letters(
    dead: DataFrame, base: str, tenant: str, dataset: str, signal: str,
    batch_id: int, reason: str = "undecodable payload",
    payload_col: str = "value",
) -> None:
    """Preserve undecodable payloads verbatim with a reason instead of
    wedging or silently dropping the batch — the WAL dead-letter
    directory analog (src/common/src/wal/mod.rs:806 `dead_letter`:
    raw bytes preserved, entry marked processed). Written per-batch
    with mode=overwrite so an at-least-once replay of the same batch
    cannot duplicate entries."""
    out = dead.select(
        F.col(payload_col).alias("payload"),
        F.lit(reason).alias("reason"),
        F.lit(batch_id).alias("batch_id"),
    )
    out.write.mode("overwrite").parquet(
        os.path.join(dead_letter_path(base, tenant, dataset, signal), f"batch-{batch_id}")
    )


def split_schema_violations(df: DataFrame, table: str):
    """(good, bad) split on the at-rest schema's NON-NULLABLE columns.

    A batch that decodes fine but violates a required column — the
    issue-#1060 poison, a metrics_sum datapoint with a null value — is a
    DETERMINISTIC writer refusal: retrying cannot help, and letting it
    fail the whole drain would shadow every batch queued behind it. The
    violating rows split off for the dead-letter sink; everything else
    commits. ``bad`` is None when the table declares no required columns
    (or none are present in the frame)."""
    from functools import reduce

    from ..schemas.signal_schemas import SCHEMAS

    schema = SCHEMAS.get(table)
    if schema is None:
        return df, None
    required = [f.name for f in schema.fields
                if not f.nullable and f.name in df.columns]
    if not required:
        return df, None
    violated = reduce(lambda a, b: a | b,
                      [F.col(c).isNull() for c in required])
    return df.filter(~violated), df.filter(violated)


def read_dead_letters(
    spark: SparkSession, base: str, tenant: str, dataset: str, signal: str
) -> DataFrame | None:
    path = dead_letter_path(base, tenant, dataset, signal)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(os.path.join(path, "batch-*"))


def _charge_ingest(rate_limiter, tenant: str, batch_df: DataFrame, size_col) -> None:
    """Charge a micro-batch against the tenant's ingest rate budgets
    BEFORE any decode/commit work — each source payload is one acceptor
    request (k files in a batch = k requests, charged atomically) plus
    its payload bytes, mirroring the reference's per-HTTP-body check
    (src/acceptor/src/handler/prometheus_handler.rs:119-124). A
    rejection raises :class:`..ratelimit.RateLimitExceeded` out of
    foreachBatch, so the checkpoint does NOT advance and the batch
    retries later — the 429-and-retry contract remote_write clients
    already implement.

    The charge is clamped to bucket capacity (``clamp_to_capacity``):
    unlike the reference's external HTTP clients — which chunk bodies,
    so a single request never exceeds ``rate × burst`` — our file
    source re-presents the IDENTICAL batch on every retry, so a batch
    priced above capacity would otherwise 429-loop forever and wedge
    the checkpoint. Clamping means an oversized batch waits for a full
    bucket, drains it completely, and commits — drain liveness is
    preserved and the long-run rate still converges to the configured
    limit. Size ``burst_seconds`` so ``rate × burst ≥`` the max batch
    cost (requests: ≥ maxFilesPerTrigger=16) to keep the clamp
    inactive in normal operation."""
    if rate_limiter is None:
        return
    stats = batch_df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(size_col).alias("b")
    ).first()
    n = int(stats["n"] or 0)
    if n:
        rate_limiter.check_ingest(tenant, int(stats["b"] or 0), requests=n,
                                  clamp_to_capacity=True)


def ingest_otlp_logs_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    tenant: str = "acme",
    dataset: str = "prod",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    use_manifest: bool = True,
    usage_tracker=None,
    rate_limiter=None,
):
    """File-source OTLP/JSON ingest → hour-partitioned logs table.
    (No watermark parameter: ``withWatermark`` is a no-op inside
    foreachBatch — event-time lateness gating lives in the maintenance
    partition-close check, ``is_partition_closed``.)

    ``usage_tracker`` (a :class:`..storage.quota.StorageUsageTracker`)
    gates each micro-batch on the tenant's ``max_storage_bytes`` quota —
    the acceptor-side rejection of storage_usage.rs (issue #610).
    Enforcement is eventually consistent by design: the tracker's cached
    usage decides, never a hot-path recount.

    ``available_now=True`` drains everything then stops (read-your-writes
    for tests / batch backfill); ``False`` runs continuous micro-batches
    (the 5s WAL drain analog is the default trigger).

    ``use_manifest=True`` (the DEFAULT — the reference gets the same
    semantics from Iceberg everywhere, storage-layout.md:45-96) commits
    each micro-batch through the snapshot-manifest protocol
    (storage.write_batch_manifest): the object-store-safe path — readers
    see atomic snapshots, replays that produce different file counts stay
    idempotent, crashed attempts are orphans for expire_snapshots.
    ``use_manifest=False`` opts out to deterministic-rename marker files,
    which assume POSIX rename atomicity (local-FS only)."""
    table_path = signal_table_path(base, tenant, dataset, "logs")
    checkpoint = checkpoint_dir or os.path.join(base, "_checkpoints", tenant, dataset, "logs")
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "16")
        .load(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # rate limit first (ratelimit.rs order: 429 rate before 429 quota)
        _charge_ingest(rate_limiter, tenant, batch_df, F.octet_length("value"))
        if usage_tracker is not None:
            usage_tracker.check_ingest(tenant)  # raises StorageQuotaExceeded
        # split poison payloads off the batch BEFORE flattening: the raw
        # line is preserved in the dead-letter sink and the batch itself
        # is marked processed by the checkpoint — one bad payload cannot
        # wedge the drain loop (processor.rs:125-127 semantics)
        flagged = with_dead_letter_flag(batch_df, OTLP_LOGS_SCHEMA).cache()
        try:
            dead = flagged.filter(F.col("_dead"))
            good = flagged.filter(~F.col("_dead")).drop("_dead")
            # (no withWatermark here: foreachBatch hands us a batch df
            # where it is a no-op — event-time lateness gating lives in
            # the maintenance partition-close check, is_partition_closed)
            flat = flatten_otlp_logs(good, json_col="value")
            if use_manifest:
                from ..storage import write_batch_manifest

                write_batch_manifest(flat, table_path, "logs", batch_id=batch_id)
            else:
                write_batch(flat, table_path, "logs", batch_id=batch_id)
            if dead.limit(1).count():
                write_dead_letters(dead, base, tenant, dataset, "logs", batch_id)
        finally:
            # unpersist on ALL exits: an exception mid-write otherwise
            # pins the cached block, and at-least-once retries stack a
            # fresh leaked copy per attempt
            flagged.unpersist()

    return _drain_stream(
        raw.writeStream.foreachBatch(sink), checkpoint, available_now
    )


def live_severity_counts(
    spark: SparkSession, source_dir: str, window: str = "1 minute", watermark: str = "10 minutes"
):
    """Live windowed aggregation over the ingest stream — the capability
    the reference explicitly lacks (live tail, overview.md:247): a
    watermarked tumbling-window count per (service, severity)."""
    raw = spark.readStream.format("text").load(source_dir)
    flat = flatten_otlp_logs(raw, json_col="value")
    return (
        flat.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window), "service_name", "severity_text")
        .count()
    )


def deduped_stream(
    df: DataFrame,
    id_cols: list[str],
    ts_col: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once-by-key dedup for at-least-once upstreams.

    The reference's WAL replay re-delivers whole entries and relies on
    batch-idempotent writes
    (tests-integration/tests/writer/wal_replay_idempotency.rs); that
    dedupes a replayed BATCH but not a re-sent RECORD (an OTLP client
    retry after a partial ack). This drops any record whose ``id_cols``
    were already seen within the event-time watermark using Spark's
    per-key state store: state is evicted past the watermark, so memory
    is bounded by (keys arriving per watermark window), not stream
    history — the property that keeps it viable at 100 TB/day.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "timestamp",
    right_ts: str = "r_timestamp",
    before_seconds: int = 300,
    after_seconds: int = 0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join on keys within an event-time interval:
    right.ts ∈ [left.ts - before, left.ts + after].

    Both sides carry watermarks and the join condition bounds the two
    event times against each other — exactly the shape Spark requires to
    EXPIRE join state: each side's buffered rows are dropped once the
    other side's watermark passes the interval bound, so state is
    bounded by (arrival rate × (watermark + interval)), never by stream
    history. Right-side columns must already be disambiguated (no shared
    names besides ``key_cols``).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = None
    for k in key_cols:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {before_seconds} SECONDS"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {after_seconds} SECONDS"))
    )
    joined = l.join(r, cond, "inner")
    for k in key_cols:
        joined = joined.drop(r[k])
    return joined


def _drain_stream(writer, checkpoint: str, available_now: bool):
    writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="5 seconds").start()


def ingest_otlp_traces_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    tenant: str = "acme",
    dataset: str = "prod",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    use_manifest: bool = True,
    rate_limiter=None,
):
    """File-source OTLP/JSON trace ingest → hour-partitioned traces
    table — the span half of the acceptor→writer pipeline
    (overview.md:127-148), same manifest-committed exactly-once sink as
    the logs stream."""
    from ..sources.otlp import OTLP_TRACES_SCHEMA, flatten_otlp_traces

    table_path = signal_table_path(base, tenant, dataset, "traces")
    checkpoint = checkpoint_dir or os.path.join(
        base, "_checkpoints", tenant, dataset, "traces"
    )
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "16")
        .load(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _charge_ingest(rate_limiter, tenant, batch_df, F.octet_length("value"))
        flagged = with_dead_letter_flag(batch_df, OTLP_TRACES_SCHEMA).cache()
        try:
            dead = flagged.filter(F.col("_dead"))
            good = flagged.filter(~F.col("_dead")).drop("_dead")
            flat = flatten_otlp_traces(good, json_col="value")
            if use_manifest:
                from ..storage import write_batch_manifest

                write_batch_manifest(flat, table_path, "traces", batch_id=batch_id)
            else:
                write_batch(flat, table_path, "traces", batch_id=batch_id)
            if dead.limit(1).count():
                write_dead_letters(dead, base, tenant, dataset, "traces", batch_id)
        finally:
            flagged.unpersist()

    return _drain_stream(raw.writeStream.foreachBatch(sink), checkpoint, available_now)


def ingest_otlp_metrics_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    tenant: str = "acme",
    dataset: str = "prod",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    use_manifest: bool = True,
    rate_limiter=None,
):
    """File-source OTLP/JSON metrics ingest: one stream, per-type
    routing inside the batch — gauge/sum/histogram/exp-histogram/summary
    datapoints land in their own hour-partitioned tables in the SAME
    micro-batch (conversion_metrics target_table routing,
    src/writer/src/conversion_metrics.rs), every table committed through
    the manifest protocol under one batch id so a replay is a no-op on
    all of them."""
    from ..sources.otlp import OTLP_METRICS_SCHEMA, flatten_otlp_metrics

    checkpoint = checkpoint_dir or os.path.join(
        base, "_checkpoints", tenant, dataset, "metrics"
    )
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "16")
        .load(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _charge_ingest(rate_limiter, tenant, batch_df, F.octet_length("value"))
        flagged = with_dead_letter_flag(batch_df, OTLP_METRICS_SCHEMA).cache()
        parsed = None
        try:
            dead = flagged.filter(F.col("_dead"))
            good = flagged.filter(~F.col("_dead")).drop("_dead")
            # parse ONCE per batch: the five-kind routing fans out to
            # five table writes, and without the persisted base each
            # write would re-run from_json over the whole batch — at
            # ingest scale a 5x decode tax (sources/otlp.py metric_base)
            from ..sources.otlp import metric_base, route_metric_base

            parsed = metric_base(good, "value").persist()
            tables = route_metric_base(parsed)
            for table, df in tables.items():
                # deterministic refusals (null in a required column) split
                # to the dead-letter sink BEFORE the commit — a poison
                # batch must not wedge the drain or shadow batches behind
                df, violations = split_schema_violations(df, table)
                if violations is not None and violations.limit(1).count():
                    write_dead_letters(
                        violations.select(F.to_json(F.struct("*")).alias("value")),
                        base, tenant, dataset, table, batch_id,
                        reason="required column is null",
                    )
                table_path = signal_table_path(base, tenant, dataset, table)
                if use_manifest:
                    from ..storage import write_batch_manifest

                    write_batch_manifest(df, table_path, table, batch_id=batch_id)
                else:
                    write_batch(df, table_path, table, batch_id=batch_id)
            if dead.limit(1).count():
                write_dead_letters(dead, base, tenant, dataset, "metrics", batch_id)
        finally:
            if parsed is not None:
                parsed.unpersist()
            flagged.unpersist()

    return _drain_stream(raw.writeStream.foreachBatch(sink), checkpoint, available_now)


def ingest_otlp_traces_pb_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    tenant: str = "acme",
    dataset: str = "prod",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    rate_limiter=None,
):
    """OTLP *protobuf* trace ingest — see :func:`ingest_otlp_pb_stream`
    (this is the signal="traces" form, kept as the named entry point)."""
    return ingest_otlp_pb_stream(
        spark, source_dir, base, "traces", tenant=tenant, dataset=dataset,
        checkpoint_dir=checkpoint_dir, available_now=available_now,
        rate_limiter=rate_limiter,
    )


def ingest_otlp_pb_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    signal: str,
    tenant: str = "acme",
    dataset: str = "prod",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    rate_limiter=None,
):
    """Generic OTLP protobuf ingest: binaryFile stream of wire bodies →
    pure-Python decode → JVM flatten → manifest commit, for any signal.
    ``signal`` ∈ traces / logs / metrics; metrics route all five
    datapoint kinds to their own tables inside the SAME micro-batch,
    every table committed under one batch id (a replay no-ops on all)."""
    import json

    from ..sources import otlp, otlp_pb
    from ..storage import write_batch_manifest

    parse_fn = {
        "traces": otlp_pb.parse_trace_request,
        "logs": otlp_pb.parse_logs_request,
        "metrics": otlp_pb.parse_metrics_request,
    }[signal]
    checkpoint = checkpoint_dir or os.path.join(
        base, "_checkpoints", tenant, dataset, f"{signal}_pb"
    )
    raw = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", "16")
        .load(source_dir)
    )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(spark)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            vals, dead = [], []
            for p in pdf["content"]:
                try:
                    vals.append(json.dumps(parse_fn(bytes(p))))
                except Exception:
                    dead.append(bytes(p).hex())
            yield pd.DataFrame(
                {
                    "value": vals + [None] * len(dead),
                    "_dead_payload": [None] * len(vals) + dead,
                }
            )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # wire bodies charge their on-the-wire length (the binaryFile
        # `length` column), BEFORE the decode spends any executor work
        _charge_ingest(rate_limiter, tenant, batch_df, F.col("length"))
        decoded = batch_df.select("content").mapInPandas(
            decode, "value string, _dead_payload string"
        ).cache()
        parsed = None
        try:
            good = decoded.filter(F.col("value").isNotNull())
            dead = decoded.filter(F.col("_dead_payload").isNotNull())
            if signal == "traces":
                tables = {"traces": otlp.flatten_otlp_traces(good, json_col="value")}
            elif signal == "logs":
                tables = {"logs": otlp.flatten_otlp_logs(good, json_col="value")}
            else:
                # parse once per batch — the five-table fan-out must not
                # re-run from_json (and here the pprof-style Python
                # decode above it) five times
                parsed = otlp.metric_base(good, "value").persist()
                tables = otlp.route_metric_base(parsed)
            for table, df in tables.items():
                # the SAME deterministic-refusal split the JSON metrics
                # path performs: a decodable datapoint violating a
                # required column (issue-#1060 poison) dead-letters
                # instead of committing as a bad row — bad rows must not
                # differ by ingest path
                df, violations = split_schema_violations(df, table)
                if violations is not None and violations.limit(1).count():
                    write_dead_letters(
                        violations.select(F.to_json(F.struct("*")).alias("value")),
                        base, tenant, dataset, table, batch_id,
                        reason="required column is null",
                    )
                write_batch_manifest(
                    df, signal_table_path(base, tenant, dataset, table), table,
                    batch_id=batch_id,
                )
            if dead.limit(1).count():
                write_dead_letters(
                    dead.select(F.col("_dead_payload").alias("value")),
                    base, tenant, dataset, signal, batch_id,
                )
        finally:
            if parsed is not None:
                parsed.unpersist()
            decoded.unpersist()

    return _drain_stream(
        raw.writeStream.foreachBatch(sink), checkpoint, available_now
    )


def ingest_remote_write_stream(
    spark: SparkSession,
    source_dir: str,
    base: str,
    tenant: str = "acme",
    dataset: str = "prod",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    rate_limiter=None,
):
    """Prometheus remote_write ingest: binaryFile stream of
    snappy+protobuf WriteRequest bodies (the POST /api/v1/write payload,
    acceptor prometheus_handler.rs) → pure-Python wire decode → JVM
    flatten → manifest commit. Float samples route to gauge/sum by the
    counter-suffix heuristic; native histograms (Prometheus ≥2.40) land
    in metrics_exponential_histogram — all tables committed under ONE
    batch id, so a replay no-ops on all of them. Corrupt payloads
    dead-letter instead of poisoning the stream."""
    from ..sources import remote_write as rw
    from ..storage import write_batch_manifest

    checkpoint = checkpoint_dir or os.path.join(
        base, "_checkpoints", tenant, dataset, "remote_write"
    )
    raw = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", "16")
        .load(source_dir)
    )

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(spark)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            vals, dead = [], []
            for p in pdf["content"]:
                try:
                    vals.append(rw.decode_snappy_protobuf(bytes(p)))
                except Exception:
                    dead.append(bytes(p).hex())
            yield pd.DataFrame(
                {
                    "value": vals + [None] * len(dead),
                    "_dead_payload": [None] * len(vals) + dead,
                }
            )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _charge_ingest(rate_limiter, tenant, batch_df, F.col("length"))
        decoded = batch_df.select("content").mapInPandas(
            decode, "value string, _dead_payload string"
        ).cache()
        try:
            good = decoded.filter(F.col("value").isNotNull())
            dead = decoded.filter(F.col("_dead_payload").isNotNull())
            for table, df in rw.flatten_remote_write(good).items():
                # same deterministic-refusal split as every other metric
                # ingest path (null required column → dead letter)
                df, violations = split_schema_violations(df, table)
                if violations is not None and violations.limit(1).count():
                    write_dead_letters(
                        violations.select(F.to_json(F.struct("*")).alias("value")),
                        base, tenant, dataset, table, batch_id,
                        reason="required column is null",
                    )
                write_batch_manifest(
                    df, signal_table_path(base, tenant, dataset, table), table,
                    batch_id=batch_id,
                )
            if dead.limit(1).count():
                write_dead_letters(
                    dead.select(F.col("_dead_payload").alias("value")),
                    base, tenant, dataset, "remote_write", batch_id,
                )
        finally:
            decoded.unpersist()

    return _drain_stream(
        raw.writeStream.foreachBatch(sink), checkpoint, available_now
    )


def deduplicated_log_stream(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "10 minutes",
):
    """OTLP log stream with re-sent records dropped (see
    :func:`deduped_stream` for the state-bounding argument). The record
    identity is the FULL row: time, stream, trace/span correlation,
    severity, body, and a JSON rendering of the attribute map (maps
    cannot key a dedup directly; a verbatim re-send renders its
    attributes identically) — two genuinely distinct records that share
    a body do NOT collapse.

    Returns the unstarted deduplicated streaming DataFrame; compose
    with any sink (the ingest writers, memory for tests)."""
    from ..sources.otlp import flatten_otlp_logs

    raw = spark.readStream.format("text").load(source_dir)
    df = flatten_otlp_logs(raw, json_col="value").withColumn(
        "_attr_sig", F.to_json("log_attributes")
    )
    out = deduped_stream(
        df,
        ["timestamp", "service_name", "trace_id", "span_id",
         "severity_text", "body", "_attr_sig"],
        watermark=watermark,
    )
    return out.drop("_attr_sig")


def tail_logs(
    spark: SparkSession,
    source_dir: str,
    query: str = '{service_name=~".+"}',
):
    """Loki ``/loki/api/v1/tail`` analog — LIVE tail of the ingest
    stream with the full LogQL selector pipeline applied (matchers,
    line filters, parser-stage label filters). The reference explicitly
    lacks live tail (overview.md:247); here the same filter expressions
    the batch path lowers run unchanged on the streaming DataFrame —
    one definition of the selector semantics for both.

    Returns an unstarted streaming DataFrame; callers pick the sink
    (memory for tests, console/websocket push for a UI)."""
    from ..logql.lowering import (
        label_filter_expr,
        line_filter_expr,
        matcher_expr,
    )
    from ..logql.parser import parse as logql_parse
    from ..sources.otlp import flatten_otlp_logs

    sel = logql_parse(query)
    if not hasattr(sel, "matchers"):
        # a metric expression parsed — tail streams log LINES only
        raise ValueError(
            f"tail takes a log selector, not a metric query: {query!r}"
        )
    raw = spark.readStream.format("text").load(source_dir)
    df = flatten_otlp_logs(raw, json_col="value")
    for m in sel.matchers:
        df = df.filter(matcher_expr(df, sel, m))
    for lf in sel.line_filters:
        df = df.filter(line_filter_expr(lf))
    for lf in sel.label_filters:
        df = df.filter(label_filter_expr(df, sel, lf))
    # output/transform stages (line_format, decolorize, unpack,
    # drop/keep) execute exactly like the batch path — tail output for
    # a pipeline must match query output for the same expression.
    # `| distinct` needs a global window, which a live stream cannot
    # provide — reject it loudly instead of an obscure planner error.
    from ..logql.lowering import _apply_output_stages

    if any(s.name == "distinct" and s.arg for s in sel.stages):
        raise ValueError("'| distinct' is not supported on a live tail")
    df = _apply_output_stages(df, sel)
    return df.select(
        "timestamp", "service_name", "severity_text", "body", "log_attributes"
    )
