"""Write-path micro-benchmarks: the ingest-side hot steps the read-path
headline queries never touch — OTLP JSON decode/flatten, the manifest
append commit, the hot-store ack → hybrid-read visibility round-trip,
and a partition compaction rewrite.

Mirrors the read/write coverage contract of the reference's
performance-benchmarking-suite change (openspec/changes/
performance-benchmarking-suite/proposal.md: acceptor OTLP decode, writer
append, WAL round-trip, compaction throughput — its complaint is
exactly that the active write paths had zero benchmark coverage).
Numbers ride the bench.py JSON line under ``write_paths`` so the
per-round driver capture tracks them alongside the query headline.
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

# one resource batch with two log records — duplicated row-wise to reach
# the target decode volume, the shape an acceptor sees from a busy SDK
_OTLP_PAYLOAD = json.dumps({
    "resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "api"}},
            {"key": "deployment.environment", "value": {"stringValue": "prod"}},
        ]},
        "scopeLogs": [{
            "scope": {"name": "bench", "version": "1"},
            "logRecords": [
                {
                    "timeUnixNano": "1704067200000000000",
                    "observedTimeUnixNano": "1704067200000000000",
                    "severityText": "INFO", "severityNumber": 9,
                    "body": {"stringValue": "request handled in 12ms"},
                    "attributes": [
                        {"key": "http.status", "value": {"intValue": "200"}},
                        {"key": "user", "value": {"stringValue": "u1"}},
                    ],
                    "traceId": "ab" * 16, "spanId": "cd" * 8,
                },
                {
                    "timeUnixNano": "1704067201000000000",
                    "observedTimeUnixNano": "1704067201000000000",
                    "severityText": "ERROR", "severityNumber": 17,
                    "body": {"stringValue": "downstream timeout"},
                    "attributes": [
                        {"key": "http.status", "value": {"intValue": "504"}},
                    ],
                    "traceId": "ef" * 16, "spanId": "12" * 8,
                },
            ],
        }],
    }]
})


# one resource batch carrying all FIVE metric kinds — the routing shape
# flatten_otlp_metrics fans out to its five target tables
_OTLP_METRICS_PAYLOAD = json.dumps({
    "resourceMetrics": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "api"}},
        ]},
        "scopeMetrics": [{
            "scope": {"name": "bench", "version": "1"},
            "metrics": [
                {"name": "cpu_usage", "unit": "1", "gauge": {"dataPoints": [
                    {"timeUnixNano": "1704067200000000000",
                     "asDouble": 0.42,
                     "attributes": [{"key": "core",
                                     "value": {"stringValue": "0"}}]},
                ]}},
                {"name": "requests_total", "unit": "1", "sum": {
                    "aggregationTemporality": 2, "isMonotonic": True,
                    "dataPoints": [
                        {"timeUnixNano": "1704067200000000000",
                         "asInt": "1234"},
                    ]}},
                {"name": "latency_ms", "histogram": {
                    "aggregationTemporality": 2, "dataPoints": [
                        {"timeUnixNano": "1704067200000000000",
                         "count": "7", "sum": 55.0,
                         "bucketCounts": ["1", "4", "2"],
                         "explicitBounds": [10.0, 50.0]},
                    ]}},
                {"name": "latency_exp", "exponentialHistogram": {
                    "aggregationTemporality": 2, "dataPoints": [
                        {"timeUnixNano": "1704067200000000000",
                         "count": "5", "sum": 40.0, "scale": 2,
                         "zeroCount": "1",
                         "positive": {"offset": 3,
                                      "bucketCounts": ["2", "2"]},
                         "negative": {"offset": 0, "bucketCounts": []}},
                    ]}},
                {"name": "gc_pause", "summary": {"dataPoints": [
                    {"timeUnixNano": "1704067200000000000",
                     "count": "9", "sum": 12.5,
                     "quantileValues": [
                         {"quantile": 0.5, "value": 1.0},
                         {"quantile": 0.99, "value": 4.2}]},
                ]}},
            ],
        }],
    }]
})


def run(spark: SparkSession, n_payloads: int = 20_000) -> dict:
    """Measure the four write-path steps once each; returns a flat dict
    of seconds (plus decoded row counts so throughput is computable).
    Kept to a few seconds total — this rides every bench run."""
    from .sources.otlp import flatten_otlp_logs
    from .storage.hot import HotStore, flush_hot, hybrid_read
    from .storage.manifest import compact_partition_manifest, write_batch_manifest

    out: dict[str, float | int] = {"decode_payloads": n_payloads}

    raw = spark.range(n_payloads).select(F.lit(_OTLP_PAYLOAD).alias("value"))
    t0 = time.perf_counter()
    flat = flatten_otlp_logs(raw)
    flat.write.mode("overwrite").format("noop").save()
    out["otlp_decode_s"] = round(time.perf_counter() - t0, 3)
    out["decoded_rows"] = n_payloads * 2

    # metrics five-kind routing: one payload carries all five kinds;
    # the fan-out writes five typed tables (gauge/sum/histogram/
    # exp-histogram/summary). Measure the PRODUCTION sink strategy
    # (streaming/ingest.py:458): parse once into metric_base, persist,
    # then route — the five writes re-scan the cached parsed frame
    # instead of re-deriving each from raw JSON (which would parse the
    # payloads five times).
    from .sources.otlp import metric_base, route_metric_base

    n_metrics = n_payloads // 4
    mraw = spark.range(n_metrics).select(
        F.lit(_OTLP_METRICS_PAYLOAD).alias("value"))
    t0 = time.perf_counter()
    parsed = metric_base(mraw).persist()
    try:
        for df in route_metric_base(parsed).values():
            df.write.mode("overwrite").format("noop").save()
    finally:
        parsed.unpersist()
    out["metrics_route_s"] = round(time.perf_counter() - t0, 3)
    out["metrics_route_rows"] = n_metrics * 5  # one point per kind

    # pprof wire decode: gzip'd protobuf bodies → stacktrace/sample JSON
    # via the Arrow-batched mapInPandas path the profile source uses
    import gzip as _gzip

    from .sources.pprof import decode_pprof_profiles, encode_pprof

    body = _gzip.compress(encode_pprof({
        "sample_types": [{"type": "cpu", "unit": "nanoseconds"}],
        "stacktraces": [["main", "handler", "db_query"],
                        ["main", "handler", "serialize"]],
        "samples": [{"stacktrace_idx": 0, "value": 120},
                    {"stacktrace_idx": 1, "value": 45}],
    }))
    n_profiles = n_payloads // 10
    # warm the Python-worker/Arrow path first (one tiny decode): the
    # pool spins up lazily and its multi-second cold start would read
    # as decode cost; steady-state throughput is the tracked number
    warm = spark.range(32).select(F.lit(body).alias("payload"))
    decode_pprof_profiles(warm).write.mode("overwrite").format("noop").save()
    praw = spark.range(n_profiles).select(F.lit(body).alias("payload"))
    t0 = time.perf_counter()
    decode_pprof_profiles(praw).write.mode("overwrite").format("noop").save()
    out["pprof_decode_s"] = round(time.perf_counter() - t0, 3)
    out["pprof_payloads"] = n_profiles

    # Prometheus remote_write wire decode: snappy + WriteRequest proto
    # (pure-Python codecs) → JSON → the JVM flatten — the fifth ingest
    # format, so every write path has a round-over-round number
    from .sources.remote_write import (
        decode_write_requests,
        encode_write_request,
        flatten_remote_write,
        snappy_compress_literal,
    )

    rw_body = snappy_compress_literal(encode_write_request({"timeseries": [
        {"labels": [{"name": "__name__", "value": "http_requests_total"},
                    {"name": "job", "value": "api"}],
         "samples": [{"value": 42.0, "timestamp": 1704067200000},
                     {"value": 43.0, "timestamp": 1704067260000}]},
        {"labels": [{"name": "__name__", "value": "mem_bytes"},
                    {"name": "job", "value": "api"}],
         "samples": [{"value": 512.5, "timestamp": 1704067200000}]},
    ]}))
    n_rw = n_payloads // 10
    rw_warm = spark.range(32).select(F.lit(rw_body).alias("payload"))
    decode_write_requests(rw_warm).write.mode("overwrite").format("noop").save()
    rw_raw = spark.range(n_rw).select(F.lit(rw_body).alias("payload"))
    t0 = time.perf_counter()
    routed_rw = flatten_remote_write(decode_write_requests(rw_raw))
    for df in routed_rw.values():
        df.write.mode("overwrite").format("noop").save()
    out["remote_write_s"] = round(time.perf_counter() - t0, 3)
    out["remote_write_payloads"] = n_rw

    tmp = tempfile.mkdtemp(prefix="bench_write_")
    table = f"{tmp}/logs"
    try:
        batch = flatten_otlp_logs(raw)
        t0 = time.perf_counter()
        write_batch_manifest(batch.repartition(8), table, "logs", batch_id=1)
        out["manifest_append_s"] = round(time.perf_counter() - t0, 3)

        hot_df = flatten_otlp_logs(
            spark.range(1_000).select(F.lit(_OTLP_PAYLOAD).alias("value"))
        )
        t0 = time.perf_counter()
        HotStore(table).ack(hot_df)
        visible = hybrid_read(spark, table).count()
        flush_hot(spark, table, "logs")
        out["hot_roundtrip_s"] = round(time.perf_counter() - t0, 3)
        out["hot_visible_rows"] = int(visible)

        row = batch.select("date_day", "hour").first()
        t0 = time.perf_counter()
        compact_partition_manifest(
            spark, table, "logs", str(row["date_day"]), int(row["hour"])
        )
        out["compact_partition_s"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
