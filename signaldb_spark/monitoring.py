"""Self-monitoring: the engine's own query telemetry, dogfooded.

The reference instruments its services with OTLP and exports the spans
through its own ingest pipeline into a ``_system`` tenant (the
self-monitoring epic, src/common/src/self_monitoring/ — integration
criteria in tests-integration/tests/self_monitoring.rs):

- spans land in the system tenant and are queryable with the SAME trace
  surface users get (the dogfooding loop works end to end),
- an anti-loop guard keeps ``_system`` requests from re-instrumenting
  themselves (suppress.rs),
- a configured sampling ratio is respected,
- W3C ``traceparent`` context propagates, so parent/child spans share a
  trace.

This module is that loop with the OTLP SDK removed: the façade proxy
times each endpoint call, builds a span ROW in the traces at-rest schema
(schemas/signal_schemas.py), and flushes batches through the same
manifest-commit sink ingest uses. The spans are then queryable with
search/TraceQL like any tenant's traces.

Scale: spans buffer driver-side (bounded by ``max_buffer``) and flush as
ONE small batch through the normal write path — monitoring adds no
per-query Spark jobs, only a timer and a list append.
"""

from __future__ import annotations

import re
import secrets
import time
import zlib
from datetime import datetime, timezone

SYSTEM_TENANT = "_system"
SYSTEM_DATASET = "monitoring"
SERVICE_NAME = "signaldb-spark"

_TRACEPARENT = re.compile(
    r"^00-([0-9a-f]{32})-([0-9a-f]{16})-[0-9a-f]{2}$"
)


def parse_traceparent(header: str | None) -> tuple[str, str] | None:
    """W3C traceparent → (trace_id, parent_span_id); None if absent or
    malformed (a bad header must not break the query it rode in on)."""
    if not header:
        return None
    m = _TRACEPARENT.match(header.strip().lower())
    return (m.group(1), m.group(2)) if m else None


class SelfMonitor:
    """Buffers query spans for the system tenant; flushes through the
    manifest sink."""

    def __init__(self, spark, base: str, sample_ratio: float = 1.0,
                 max_buffer: int = 1000):
        self.spark = spark
        self.base = base
        self.sample_ratio = sample_ratio
        self.max_buffer = max_buffer
        self._rows: list[dict] = []
        self._batch = 0

    # ------------------------------------------------------------ record

    def should_sample(self, trace_id: str) -> bool:
        """Deterministic trace-scoped sampling: every span of a trace
        gets the same verdict, so sampled traces stay complete."""
        if self.sample_ratio >= 1.0:
            return True
        if self.sample_ratio <= 0.0:
            return False
        h = zlib.crc32(trace_id.encode()) / 2**32
        return h < self.sample_ratio

    def record_span(self, endpoint: str, tenant: str, dataset: str,
                    start_ns: int, end_ns: int, status_code: str = "OK",
                    status_message: str | None = None,
                    traceparent: str | None = None) -> str | None:
        """One span for one endpoint call. Returns the server span's
        W3C ``traceresponse`` value (docs/users/response-trace-context.md
        — the span id is the SERVER's own span; the final flag reflects
        the sampling decision) or None when suppressed by the anti-loop
        guard: queries FROM the system tenant are never re-instrumented
        (suppress.rs), without which the dogfooding loop monitors itself
        forever."""
        if tenant == SYSTEM_TENANT:
            return None
        ctx = parse_traceparent(traceparent)
        trace_id = ctx[0] if ctx else secrets.token_hex(16)
        parent = ctx[1] if ctx else ""
        span_id = secrets.token_hex(8)
        if not self.should_sample(trace_id):
            return f"00-{trace_id}-{span_id}-00"  # sampled out
        ts = datetime.fromtimestamp(start_ns / 1e9, tz=timezone.utc) \
            .replace(tzinfo=None)
        self._rows.append({
            "trace_id": trace_id,
            "span_id": span_id,
            "parent_span_id": parent,
            "span_name": endpoint,
            "service_name": SERVICE_NAME,
            "start_time_unix_nano": start_ns,
            "end_time_unix_nano": end_ns,
            "duration_nanos": end_ns - start_ns,
            "span_kind": "SPAN_KIND_SERVER",
            "status_code": "STATUS_CODE_ERROR" if status_code == "ERROR"
                           else "STATUS_CODE_OK",
            "status_message": status_message,
            "is_root": parent == "",
            "span_attributes": {"tenant": tenant, "dataset": dataset},
            "resource_attributes": {"service.name": SERVICE_NAME},
            "events": [], "links": [],
            "trace_state": None, "scope_name": "signaldb_spark.api",
            "scope_version": None, "scope_attributes": {},
            "timestamp": ts,
            "date_day": ts.date(),
            "hour": ts.hour,
            "label_environment": None,
        })
        if len(self._rows) >= self.max_buffer:
            self.flush()
        return f"00-{trace_id}-{span_id}-01"

    # ------------------------------------------------------------- flush

    def flush(self) -> int:
        """Write buffered spans into the system tenant's traces table
        through the SAME manifest sink ingest uses; returns rows written."""
        if not self._rows:
            return 0
        from .catalog import signal_table_path
        from .schemas.signal_schemas import TRACES
        from .storage import write_batch_manifest

        rows, self._rows = self._rows, []
        df = self.spark.createDataFrame(rows, TRACES)
        path = signal_table_path(self.base, SYSTEM_TENANT, SYSTEM_DATASET,
                                 "traces")
        self._batch += 1
        write_batch_manifest(
            df, path, "traces",
            batch_id=f"selfmon-{self._batch}-{secrets.token_hex(4)}",
        )
        return len(rows)

    # -------------------------------------------------------- instrument

    def instrument(self, api):
        """Wrap a SignalDBAPI so every public endpoint call records a
        span (endpoint name, duration, error status from the envelope).
        Pass ``traceparent=...`` to any wrapped call to join an incoming
        trace — the kwarg is consumed here, not forwarded."""
        return _MonitoredAPI(api, self)


class _MonitoredAPI:
    def __init__(self, api, monitor: SelfMonitor):
        self._api = api
        self._monitor = monitor
        #: the HTTP Server-Timing / traceresponse analog for the LAST
        #: call (docs/users/response-trace-context.md): the server
        #: span's context + total stage duration, for client-side
        #: correlation without a transport layer
        self.last_server_timing: dict | None = None

    def __getattr__(self, name: str):
        target = getattr(self._api, name)
        if name.startswith("_") or not callable(target):
            return target

        def wrapped(*args, traceparent: str | None = None, **kwargs):
            t0 = time.time_ns()
            try:
                out = target(*args, **kwargs)
                err = isinstance(out, dict) and out.get("status") == "error"
                t1 = time.time_ns()
                ctx = self._monitor.record_span(
                    name, self._api.tenant, self._api.dataset,
                    t0, t1,
                    status_code="ERROR" if err else "OK",
                    status_message=(out.get("error") if err else None),
                    traceparent=traceparent,
                )
                self.last_server_timing = None if ctx is None else {
                    "traceresponse": ctx,
                    "total_ms": round((t1 - t0) / 1e6, 3),
                }
                return out
            except Exception as e:
                self._monitor.record_span(
                    name, self._api.tenant, self._api.dataset,
                    t0, time.time_ns(), status_code="ERROR",
                    status_message=str(e), traceparent=traceparent,
                )
                raise

        return wrapped
