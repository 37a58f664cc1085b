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
