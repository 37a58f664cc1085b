"""Streaming trace assembly and stateful alerting.

Two capability upgrades over the reference's batch-only read path
(overview.md:247 explicitly defers live processing):

- ``assemble_traces_stream``: spans arrive incrementally; a trace is
  "complete" once no new span has arrived for ``gap`` of event time.
  That is exactly a session window keyed by trace_id — Spark's native
  ``session_window`` + watermark closes the session and emits one
  summary row per trace in append mode. Spark-first: no custom state
  management, distributed by key, late spans within the watermark
  reopen nothing (they extend the session before it closes).

- ``alert_for_state``: Prometheus alerting-rule semantics
  (``for: <duration>`` — public Prometheus behavior): a series whose
  value breaches the threshold enters *pending*; if the breach holds
  continuously for the ``for`` duration it transitions to *firing*;
  any non-breaching sample resets to *inactive*. A three-state machine
  per series with memory of when the breach began — NOT expressible as
  a windowed aggregation, so this is the custom-stateful-operator path:
  ``applyInPandasWithState`` with per-key GroupState, Arrow-batched.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def assemble_trace_sessions(
    spans: DataFrame, gap: str = "30 seconds", watermark: str = "1 minute"
) -> DataFrame:
    """Session-windowed trace summaries: one row per (trace, session)
    with span count, error flag, duration and root service — emitted
    when the session closes (no span for ``gap``). Works identically on
    a batch DataFrame (for backfill) and a stream (append mode)."""
    withw = (
        spans.withWatermark("timestamp", watermark)
        if spans.isStreaming
        else spans
    )
    return (
        withw.groupBy(
            F.session_window("timestamp", gap).alias("session"),
            F.col("trace_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("span_count"),
            F.min("timestamp").alias("started_at"),
            F.max("end_timestamp").alias("ended_at"),
            F.max((F.col("status_code") == 2).cast("int")).cast("boolean").alias("has_error"),
            F.min_by("service_name", F.when(F.col("parent_span_id").isNull(), 0).otherwise(1)).alias(
                "root_service"
            ),
        )
        .select(
            F.col("trace_id"),
            F.col("session.start").alias("session_start"),
            "span_count",
            "started_at",
            "ended_at",
            "has_error",
            "root_service",
        )
    )


ALERT_OUTPUT = T.StructType(
    [
        T.StructField("series_key", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("state", T.StringType()),  # inactive | pending | firing
        T.StructField("active_since", T.TimestampType()),
    ]
)

ALERT_STATE = T.StructType(
    [
        T.StructField("pending_since_us", T.LongType()),
        T.StructField("firing", T.BooleanType()),
    ]
)


def _alert_fn(threshold: float, for_seconds: float):
    """Build the per-key stateful function. State = when the current
    continuous breach began + whether we already fired; a non-breaching
    sample clears it (Prometheus resets pending AND firing on any
    recovery sample)."""

    def fn(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values("bucket")
        if state.exists:
            pending_since_us, firing = state.get
        else:
            pending_since_us, firing = None, False
        out = []
        for _, r in rows.iterrows():
            ts: pd.Timestamp = r["bucket"]
            ts_us = int(ts.value // 1000)
            breaching = r["value"] > threshold
            if not breaching:
                pending_since_us, firing = None, False
                st = "inactive"
            else:
                if pending_since_us is None:
                    pending_since_us = ts_us
                else:
                    # out-of-order breach sample (late batch): the breach
                    # started no later than the earliest breaching ts
                    pending_since_us = min(pending_since_us, ts_us)
                if firing or ts_us - pending_since_us >= for_seconds * 1_000_000:
                    firing = True
                    st = "firing"
                else:
                    st = "pending"
            out.append(
                {
                    "series_key": key[0],
                    "bucket": ts,
                    "value": float(r["value"]),
                    "state": st,
                    "active_since": (
                        pd.Timestamp(pending_since_us, unit="us")
                        if pending_since_us is not None
                        else None
                    ),
                }
            )
        state.update((pending_since_us, firing))
        yield pd.DataFrame(out)

    return fn


def alert_for_state(
    series: DataFrame,
    threshold: float,
    for_duration: str = "5 minutes",
    key_col: str = "series_key",
) -> DataFrame:
    """Evaluate Prometheus ``for:``-style alert state over a keyed
    stream of (series_key, bucket, value) samples.

    Per-key state machine via ``applyInPandasWithState`` (Arrow-batched,
    distributed by series key — the canonical custom-stateful-operator
    shape). Deterministic within a key because samples are sorted by
    bucket inside each group. Also runs on a batch DataFrame through
    ``applyInPandas`` with the same function body, so backfilled
    evaluation matches live evaluation bit-for-bit."""
    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(series.sparkSession)
    for_seconds = _parse_duration(for_duration)
    fn = _alert_fn(threshold, for_seconds)
    grouped = series.select(
        F.col(key_col).alias("series_key"), "bucket", F.col("value").cast("double")
    ).groupBy("series_key")
    if series.isStreaming:
        return grouped.applyInPandasWithState(
            fn, ALERT_OUTPUT, ALERT_STATE, "append", GroupStateTimeout.NoTimeout
        )

    def batch_fn(key, pdf):
        class _NoState:
            exists = False
            get = None

            def update(self, _):
                pass

        return pd.concat(list(fn(key, [pdf], _NoState())))

    return grouped.applyInPandas(batch_fn, ALERT_OUTPUT)


def _parse_duration(s: str) -> float:
    n, unit = s.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return float(n) * mult
