"""Result shapers: matrix/log/trace DataFrames → API response JSON.

Driver-side counterparts of the reference's router shaping
(batches_to_matrix src/router/src/endpoints/logql.rs:483,
batches_to_streams :638, instant-vector reduce promql.rs:458, Tempo
trace JSON). These consume SMALL result DataFrames (post-aggregation /
post-limit) — the heavy lifting stayed in the engine; collect here is
bounded by the same caps the reference applies.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def matrix_to_prom(df: DataFrame, value_col: str = "value") -> dict[str, Any]:
    """(bucket, labels..., value) matrix → Prometheus matrix envelope
    ``{"status":"success","data":{"resultType":"matrix","result":[...]}}``."""
    label_cols = [c for c in df.columns if c not in ("bucket", value_col)]
    series: dict[tuple, list] = {}
    for row in df.collect():
        key = tuple((c, row[c]) for c in label_cols if row[c] is not None)
        series.setdefault(key, []).append([int(row["bucket"]), str(row[value_col])])
    result = [
        {"metric": dict(key), "values": sorted(vals)}
        for key, vals in sorted(series.items())
    ]
    return {"status": "success", "data": {"resultType": "matrix", "result": result}}


def matrix_to_instant_vector(df: DataFrame, value_col: str = "value") -> dict[str, Any]:
    """Instant query: reduce each series to its latest sample
    (instant-vector reduce, promql.rs:458)."""
    label_cols = [c for c in df.columns if c not in ("bucket", value_col)]
    latest: dict[tuple, tuple] = {}
    for row in df.collect():
        key = tuple((c, row[c]) for c in label_cols if row[c] is not None)
        cur = latest.get(key)
        if cur is None or row["bucket"] > cur[0]:
            latest[key] = (int(row["bucket"]), str(row[value_col]))
    result = [
        {"metric": dict(k), "value": [b, v]} for k, (b, v) in sorted(latest.items())
    ]
    return {"status": "success", "data": {"resultType": "vector", "result": result}}


def logs_to_loki_streams(df: DataFrame, direction: str = "backward") -> dict[str, Any]:
    """Log rows → Loki streams envelope: one stream per label set,
    values as [ns_timestamp, line] (batches_to_streams, logql.rs:638).
    ``direction`` orders each stream's values — Loki's contract is that
    forward queries return entries ascending in time; hardcoding
    newest-first handed forward-paginating clients reversed batches."""
    streams: dict[tuple, list] = {}
    for row in df.collect():
        labels = {"service_name": row["service_name"]}
        if row["severity_text"] is not None:
            labels["level"] = row["severity_text"]
        key = tuple(sorted(labels.items()))
        # µs-exact and naive-as-UTC: float seconds * 1e9 loses precision,
        # and datetime.timestamp() on naive values applies the OS zone
        import calendar

        ts_ = row["timestamp"]
        ns = (calendar.timegm(ts_.timetuple()) * 1_000_000 + ts_.microsecond) * 1000
        streams.setdefault(key, []).append([str(ns), row["body"] or ""])
    result = [
        {"stream": dict(k), "values": sorted(v, reverse=direction == "backward")}
        for k, v in sorted(streams.items())
    ]
    return {"status": "success", "data": {"resultType": "streams", "result": result}}


def trace_to_tempo(assembled_row) -> dict[str, Any]:
    """One assemble_hierarchy row → Tempo-style trace JSON with nested
    span hierarchy built from parent_span_id (client-side half of
    build_span_hierarchy, trace.rs:311-376)."""
    spans = [s.asDict() for s in assembled_row["spans"]]
    by_id = {s["span_id"]: {**s, "children": []} for s in spans}
    roots = []
    for s in by_id.values():
        parent = s.get("parent_span_id")
        if parent and parent in by_id:
            by_id[parent]["children"].append(s)
        else:
            roots.append(s)
    return {
        "traceID": assembled_row["trace_id"],
        "startTimeUnixNano": str(assembled_row["trace_start_unix_nano"]),
        "endTimeUnixNano": str(assembled_row["trace_end_unix_nano"]),
        "spanCount": assembled_row["span_count"],
        "spans": roots,
    }


def error_envelope(message: str, error_type: str = "bad_data") -> dict[str, Any]:
    """Prometheus/Loki error envelope (docs/users/logql-reference.md:249-264).

    DELIBERATE CONTRACT: the façade uses this shape for errors on EVERY
    surface, including Tempo/Pyroscope routes whose reference analogs
    return a bare (HTTP status, message) pair (tempo.rs:777,
    pyroscope.rs:239-246). The façade returns dicts, not HTTP
    responses, so the status code is carried as ``errorType``
    ("not_found", "timeout", "too_many_requests", "bad_data", …) — the
    same information the reference's StatusCode conveys, in one uniform
    shape a caller can always pattern-match on ``status == "error"``.
    An HTTP adapter mapping errorType back to a status code recovers
    the reference's wire behavior exactly."""
    return {"status": "error", "errorType": error_type, "error": message}
