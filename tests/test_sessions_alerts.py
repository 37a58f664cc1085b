"""Streaming session assembly + stateful alerting tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from signaldb_spark.streaming.sessions import (
    alert_for_state,
    assemble_trace_sessions,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _span(trace, span, parent, svc, start_s, dur_s=1, status=0):
    start = T0 + dt.timedelta(seconds=start_s)
    return (trace, span, parent, svc, start, start + dt.timedelta(seconds=dur_s), status)


SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, service_name string,"
    " timestamp timestamp, end_timestamp timestamp, status_code int"
)


def test_trace_sessions_batch(spark):
    """Batch mode: spans within `gap` of each other form one session per
    trace; a quiet period splits a reused trace id into two sessions."""
    rows = [
        _span("t1", "a", None, "api", 0),
        _span("t1", "b", "a", "db", 2, status=2),
        _span("t1", "c", "a", "cache", 5),
        # same trace id again after a long gap → separate session
        _span("t1", "d", None, "api", 300),
        _span("t2", "x", None, "web", 10, dur_s=4),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    got = {
        (r.trace_id, r.session_start): r
        for r in assemble_trace_sessions(df, gap="30 seconds").collect()
    }
    s1 = got[("t1", T0)]
    assert s1.span_count == 3 and s1.has_error and s1.root_service == "api"
    assert s1.started_at == T0 and s1.ended_at == T0 + dt.timedelta(seconds=6)
    s2 = got[("t1", T0 + dt.timedelta(seconds=300))]
    assert s2.span_count == 1 and not s2.has_error
    s3 = got[("t2", T0 + dt.timedelta(seconds=10))]
    assert s3.span_count == 1 and s3.ended_at == T0 + dt.timedelta(seconds=14)


def test_trace_sessions_stream_append(spark, tmp_path_factory):
    """Streaming append mode: a session emits once the watermark passes
    its close — spans from batch 1 complete when batch 2's later
    timestamps advance the watermark."""
    src = tmp_path_factory.mktemp("spans_src")
    early = [_span("t1", "a", None, "api", 0), _span("t1", "b", "a", "db", 3)]
    late = [_span("t9", "z", None, "web", 3600)]
    df_schema = SPAN_SCHEMA

    def write(name, rows):
        import json as _json

        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps({
                    "trace_id": r[0], "span_id": r[1], "parent_span_id": r[2],
                    "service_name": r[3], "timestamp": r[4].isoformat(),
                    "end_timestamp": r[5].isoformat(), "status_code": r[6],
                }) + "\n")

    write("a.jsonl", early)
    write("b.jsonl", late)
    from pyspark.sql import types as T_

    schema = T_.StructType([
        T_.StructField("trace_id", T_.StringType()),
        T_.StructField("span_id", T_.StringType()),
        T_.StructField("parent_span_id", T_.StringType()),
        T_.StructField("service_name", T_.StringType()),
        T_.StructField("timestamp", T_.TimestampType()),
        T_.StructField("end_timestamp", T_.TimestampType()),
        T_.StructField("status_code", T_.IntegerType()),
    ])
    stream = (
        spark.readStream.format("json").schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    out = assemble_trace_sessions(stream, gap="30 seconds", watermark="1 minute")
    q = (
        out.writeStream.format("memory").queryName("trace_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {r.trace_id: r for r in spark.sql("SELECT * FROM trace_sessions").collect()}
    assert "t1" in rows  # closed by the watermark jump
    assert rows["t1"].span_count == 2 and rows["t1"].root_service == "api"


def test_alert_for_state_batch_transitions(spark):
    """inactive → pending → firing after `for` holds; one recovery
    sample resets everything (Prometheus `for:` semantics)."""
    rows = []
    # breach at t=0..240s every 60s: pending at 0, firing at 120 (for=2m)
    for i, v in enumerate([1.0, 9.0, 9.5, 9.9, 0.5, 9.0, 9.1]):
        rows.append(("cpu|api", T0 + dt.timedelta(seconds=60 * i), v))
    df = spark.createDataFrame(rows, "series_key string, bucket timestamp, value double")
    out = alert_for_state(df, threshold=5.0, for_duration="2 minutes")
    states = [r.state for r in out.orderBy("bucket").collect()]
    assert states == [
        "inactive",  # 1.0
        "pending",   # 9.0 breach begins
        "pending",   # 9.5 held 60s < 120s
        "firing",    # 9.9 held 120s
        "inactive",  # 0.5 recovery resets
        "pending",   # 9.0 new breach
        "pending",   # 9.1 held only 60s
    ]
    firing = [r for r in out.collect() if r.state == "firing"]
    assert firing[0].active_since == T0 + dt.timedelta(seconds=60)


def test_alert_for_state_stream_carries_state(spark, tmp_path_factory):
    """State survives micro-batch boundaries: a breach that starts in
    batch 1 fires in batch 2 without re-observing the start."""
    import json as _json

    src = tmp_path_factory.mktemp("alerts_src")
    b1 = [("cpu|api", T0, 9.0), ("cpu|api", T0 + dt.timedelta(seconds=60), 9.2)]
    b2 = [("cpu|api", T0 + dt.timedelta(seconds=120), 9.4),
          ("cpu|web", T0 + dt.timedelta(seconds=120), 1.0)]
    import os as _os

    for i, (name, rows) in enumerate([("a.jsonl", b1), ("b.jsonl", b2)]):
        with open(src / name, "w") as fh:
            for k, ts, v in rows:
                fh.write(_json.dumps({"series_key": k, "bucket": ts.isoformat(), "value": v}) + "\n")
        # distinct mtimes pin the file-source processing order (a before b)
        _os.utime(src / name, (1700000000 + i * 10, 1700000000 + i * 10))
    from pyspark.sql import types as T_

    schema = T_.StructType([
        T_.StructField("series_key", T_.StringType()),
        T_.StructField("bucket", T_.TimestampType()),
        T_.StructField("value", T_.DoubleType()),
    ])
    stream = (
        spark.readStream.format("json").schema(schema)
        .option("maxFilesPerTrigger", "1").load(str(src))
    )
    out = alert_for_state(stream, threshold=5.0, for_duration="2 minutes")
    q = (
        out.writeStream.format("memory").queryName("alert_states")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM alert_states ORDER BY bucket, series_key").collect()
    api = [r.state for r in rows if r.series_key == "cpu|api"]
    assert api == ["pending", "pending", "firing"]  # fired across the batch boundary
    assert [r.state for r in rows if r.series_key == "cpu|web"] == ["inactive"]
