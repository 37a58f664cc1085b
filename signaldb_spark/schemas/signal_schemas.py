"""Persisted signal-table schemas (SURVEY §1.4 / FIXTURES §A).

Re-expressed natively: attribute maps are ``map<string,string>`` (not
legacy JSON strings), histogram bounds/counts are ``array<double>``
(not JSON), span events/links are ``array<struct>`` at rest. Hour
partitioning is a directory layout on a column derived from
``timestamp``, so a filter on ``timestamp`` prunes partitions natively
— no dual-bound trick needed (reference: trace.rs:117-170).

Reference schema sources: schemas.toml:14-120 (traces/logs),
docs/architecture/storage-layout.md:317-588 (all tables),
src/common/src/iceberg/schemas.rs:491 (metrics/profiles enum).
"""

from __future__ import annotations

from pyspark.sql import types as T

_S = T.StringType()
_L = T.LongType()
_I = T.IntegerType()
_D = T.DoubleType()
_B = T.BooleanType()
_TS = T.TimestampType()
_MAP = T.MapType(_S, _S)


def _f(name, dtype, nullable=True):
    return T.StructField(name, dtype, nullable)


SPAN_EVENT = T.StructType(
    [
        _f("name", _S),
        _f("time_unix_nano", _L),
        _f("attributes", _MAP),
    ]
)

SPAN_LINK = T.StructType(
    [
        _f("trace_id", _S),
        _f("span_id", _S),
        _f("attributes", _MAP),
    ]
)

TRACES = T.StructType(
    [
        _f("trace_id", _S, False),
        _f("span_id", _S, False),
        _f("parent_span_id", _S),
        _f("span_name", _S, False),
        _f("service_name", _S, False),
        _f("start_time_unix_nano", _L, False),
        _f("end_time_unix_nano", _L, False),
        _f("duration_nanos", _L, False),
        _f("span_kind", _S, False),
        _f("status_code", _S, False),
        _f("status_message", _S),
        _f("is_root", _B, False),
        _f("span_attributes", _MAP),
        _f("resource_attributes", _MAP),
        _f("events", T.ArrayType(SPAN_EVENT)),
        _f("links", T.ArrayType(SPAN_LINK)),
        _f("trace_state", _S),
        _f("scope_name", _S),
        _f("scope_version", _S),
        _f("scope_attributes", _MAP),
        _f("timestamp", _TS, False),
        _f("date_day", T.DateType(), False),
        _f("hour", _I, False),
        _f("label_environment", _S),
    ]
)

LOGS = T.StructType(
    [
        _f("timestamp", _TS, False),
        _f("observed_timestamp", _TS),
        _f("trace_id", _S),
        _f("span_id", _S),
        _f("trace_flags", _I),
        _f("severity_text", _S),
        _f("severity_number", _I),
        _f("service_name", _S, False),
        _f("body", _S),
        _f("scope_name", _S),
        _f("scope_version", _S),
        _f("resource_attributes", _MAP),
        _f("scope_attributes", _MAP),
        _f("log_attributes", _MAP),
        _f("attr_tokens", T.ArrayType(_S)),
        _f("label_namespace", _S),
        _f("date_day", T.DateType(), False),
        _f("hour", _I, False),
    ]
)

_METRIC_COMMON = [
    _f("timestamp", _TS, False),
    _f("start_timestamp", _TS),
    _f("service_name", _S, False),
    _f("metric_name", _S, False),
    _f("metric_description", _S),
    _f("metric_unit", _S),
    _f("flags", _I),
    _f("resource_attributes", _MAP),
    _f("scope_attributes", _MAP),
    _f("attributes", _MAP),
    _f("exemplars", _S),
    _f("date_day", T.DateType(), False),
    _f("hour", _I, False),
]

METRICS_GAUGE = T.StructType([*_METRIC_COMMON, _f("value", _D, False)])

METRICS_SUM = T.StructType(
    [
        *_METRIC_COMMON,
        _f("value", _D, False),
        _f("aggregation_temporality", _I, False),
        _f("is_monotonic", _B, False),
    ]
)

METRICS_HISTOGRAM = T.StructType(
    [
        *_METRIC_COMMON,
        _f("count", _L, False),
        _f("sum", _D),
        _f("min", _D),
        _f("max", _D),
        _f("bucket_counts", T.ArrayType(_D), False),
        _f("explicit_bounds", T.ArrayType(_D), False),
        _f("aggregation_temporality", _I, False),
    ]
)

PROFILES = T.StructType(
    [
        _f("profile_id", _S, False),
        _f("timestamp", _TS, False),
        _f("duration_nano", _L),
        _f("sample_type_type", _S),
        _f("sample_type_unit", _S),
        _f("period", _L),
        _f("service_name", _S, False),
        _f("stacktraces_json", _S),
        _f("samples_json", _S),
        _f("resource_attributes", _MAP),
        _f("attributes", _MAP),
        _f("trace_id", _S),
        _f("span_id", _S),
        _f("date_day", T.DateType(), False),
        _f("hour", _I, False),
    ]
)

# Exponential histogram / summary at-rest schemas: the column set the
# OTLP flattener emits (sources/otlp.py flatten_otlp_metrics;
# schema_transform.rs:1493/:1698, storage-layout.md:555-588) — pinned
# equal to the flattener output by tests/test_schema_resolver.py.
METRICS_EXPONENTIAL_HISTOGRAM = T.StructType(
    [
        _f("timestamp", _TS, False),
        _f("service_name", _S, False),
        _f("metric_name", _S, False),
        _f("count", _L),
        _f("sum", _D),
        _f("min", _D),
        _f("max", _D),
        _f("scale", _I),
        _f("zero_count", _L),
        _f("positive_offset", _I),
        _f("positive_bucket_counts", T.ArrayType(_L)),
        _f("negative_offset", _I),
        _f("negative_bucket_counts", T.ArrayType(_L)),
        _f("flags", _I),
        _f("aggregation_temporality", _I),
        _f("zero_threshold", _D),
        _f("attributes", _MAP),
        _f("date_day", T.DateType(), False),
        _f("hour", _I, False),
    ]
)

QUANTILE_VALUE = T.StructType([_f("quantile", _D), _f("value", _D)])

METRICS_SUMMARY = T.StructType(
    [
        _f("timestamp", _TS, False),
        _f("service_name", _S, False),
        _f("metric_name", _S, False),
        _f("count", _L),
        _f("sum", _D),
        _f("quantile_values", T.ArrayType(QUANTILE_VALUE)),
        _f("flags", _I),
        _f("attributes", _MAP),
        _f("date_day", T.DateType(), False),
        _f("hour", _I, False),
    ]
)

SCHEMAS = {
    "traces": TRACES,
    "logs": LOGS,
    "metrics_gauge": METRICS_GAUGE,
    "metrics_sum": METRICS_SUM,
    "metrics_histogram": METRICS_HISTOGRAM,
    "metrics_exponential_histogram": METRICS_EXPONENTIAL_HISTOGRAM,
    "metrics_summary": METRICS_SUMMARY,
    "profiles": PROFILES,
}
