"""OTLP JSON → flat signal rows.

The Spark analog of the reference's edge conversion
(src/common/src/flight/conversion/conversion_logs.rs,
conversion_traces.rs: OTLP protobuf → Arrow batches, one row per
record/span with resource/scope context denormalized in). Here the wire
format is OTLP/JSON (the public OTLP encoding); the nested
resource→scope→record lists flatten via ``explode`` so conversion is
pure Catalyst — no Python in the ingest hot path.

Also computes the write-side derived columns the reference's writer
adds (src/writer/src/schema_transform.rs): ``timestamp`` from
``time_unix_nano``, ``date_day``/``hour`` partition columns, and the
``attr_tokens`` key=value containment-token array (:557-567) that
exists purely so a parquet bloom filter can prune attribute equality
predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KV = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField(
            "value",
            T.StructType(
                [
                    T.StructField("stringValue", T.StringType()),
                    T.StructField("intValue", T.StringType()),
                    T.StructField("doubleValue", T.DoubleType()),
                    T.StructField("boolValue", T.BooleanType()),
                    # OTLP/JSON encodes BytesValue as base64 — parsed
                    # here so the typed layout can preserve it AS BYTES
                    # (the otel-native-schema extract_value fidelity
                    # fix; the reference degrades bytes to a possibly
                    # invalid UTF-8 string, conversion_common.rs)
                    T.StructField("bytesValue", T.StringType()),
                ]
            ),
        ),
    ]
)

OTLP_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", T.ArrayType(_KV))]),
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType()),
                                                    T.StructField("version", T.StringType()),
                                                ]
                                            ),
                                        ),
                                        T.StructField(
                                            "logRecords",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("timeUnixNano", T.StringType()),
                                                        T.StructField("observedTimeUnixNano", T.StringType()),
                                                        T.StructField("severityText", T.StringType()),
                                                        T.StructField("severityNumber", T.IntegerType()),
                                                        T.StructField(
                                                            "body",
                                                            T.StructType(
                                                                [T.StructField("stringValue", T.StringType())]
                                                            ),
                                                        ),
                                                        T.StructField("attributes", T.ArrayType(_KV)),
                                                        T.StructField("traceId", T.StringType()),
                                                        T.StructField("spanId", T.StringType()),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attrs_to_map(col: Column) -> Column:
    """OTLP attribute list → map<string,string> (any-value stringified)."""
    entries = F.transform(
        col,
        lambda kv: F.struct(
            kv["key"].alias("key"),
            F.coalesce(
                kv["value"]["stringValue"],
                kv["value"]["intValue"],
                kv["value"]["doubleValue"].cast("string"),
                kv["value"]["boolValue"].cast("string"),
            ).alias("value"),
        ),
    )
    return F.when(col.isNull(), F.expr("map()").cast("map<string,string>")).otherwise(
        F.map_from_entries(entries)
    )


def _attrs_to_anyvalue_map(col: Column) -> Column:
    """OTLP attribute list → typed ``map<string,any_value>`` (the
    otel-native-schema layout): each sent scalar lands in its OWN typed
    home — int64 parsed from OTLP/JSON's string carrier with integer
    exactness (a double round-trip corrupts above 2^53), bytes decoded
    from base64 to real binary, distinguishable from strings. Order of
    the coalesce follows OTLP AnyValue field precedence; exactly one
    payload field is non-null per value."""
    from ..schemas.anyvalue import (
        ANY_VALUE_MAP,
        av_bool,
        av_bytes,
        av_double,
        av_int,
        av_string,
    )

    def one(kv):
        v = kv["value"]
        return F.struct(
            kv["key"].alias("key"),
            F.coalesce(
                F.when(v["stringValue"].isNotNull(), av_string(v["stringValue"])),
                F.when(v["intValue"].isNotNull(),
                       av_int(v["intValue"].try_cast("long"))),
                F.when(v["doubleValue"].isNotNull(), av_double(v["doubleValue"])),
                F.when(v["boolValue"].isNotNull(), av_bool(v["boolValue"])),
                F.when(v["bytesValue"].isNotNull(),
                       av_bytes(F.unbase64(v["bytesValue"]))),
            ).alias("value"),
        )

    entries = F.filter(F.transform(col, one), lambda e: e["value"].isNotNull())
    return F.when(col.isNull(), F.lit(None).cast(ANY_VALUE_MAP)).otherwise(
        F.map_from_entries(entries)
    )


def flatten_otlp_logs(raw: DataFrame, json_col: str = "value",
                      typed_attrs: bool = False) -> DataFrame:
    """OTLP/JSON log payloads → flat logs rows (works on batch and
    streaming DataFrames alike — pure explode/select).

    ``typed_attrs=True`` emits the logs.v2 typed-attribute layout:
    ``log_attributes`` as ``map<string,any_value>`` with each sent
    scalar preserved in its typed home (``http.response.status_code=200``
    stays an int64; bytes stay bytes). attr_tokens and the materialized
    label derive from the DISPLAY strings so bloom pruning and label
    routing stay layout-invariant."""
    parsed = raw.select(F.from_json(F.col(json_col), OTLP_LOGS_SCHEMA).alias("p"))
    rl = parsed.select(F.explode("p.resourceLogs").alias("rl"))
    sl = rl.select(
        F.col("rl.resource.attributes").alias("res_attrs"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    rec = sl.select(
        "res_attrs",
        F.col("sl.scope.name").alias("scope_name"),
        F.col("sl.scope.version").alias("scope_version"),
        F.explode("sl.logRecords").alias("r"),
    )
    res_map = _attrs_to_map(F.col("res_attrs"))
    attr_map = _attrs_to_map(F.col("r.attributes"))
    if typed_attrs:
        from ..schemas.anyvalue import anyvalue_display

        typed_map = _attrs_to_anyvalue_map(F.col("r.attributes"))
        stored_attrs = typed_map.alias("log_attributes")
        tokens = F.transform(
            F.map_entries(typed_map),
            lambda e: F.concat_ws("=", e["key"], anyvalue_display(e["value"])),
        ).alias("attr_tokens")
        label_ns = anyvalue_display(
            F.element_at(typed_map, "namespace")
        ).alias("label_namespace")
    else:
        stored_attrs = attr_map.alias("log_attributes")
        tokens = F.transform(
            F.map_entries(attr_map), lambda e: F.concat_ws("=", e["key"], e["value"])
        ).alias("attr_tokens")
        label_ns = attr_map["namespace"].alias("label_namespace")
    # Integer `div`, not float `/`: at 2024+ epochs (~1.7e18 ns) doubles
    # carry ±128ns error, truncating to the wrong microsecond.
    ts = F.timestamp_micros(F.expr("CAST(r.timeUnixNano AS LONG) div 1000"))
    return rec.select(
        ts.alias("timestamp"),
        F.timestamp_micros(
            F.expr("CAST(r.observedTimeUnixNano AS LONG) div 1000")
        ).alias("observed_timestamp"),
        F.col("r.traceId").alias("trace_id"),
        F.col("r.spanId").alias("span_id"),
        F.lit(None).cast("int").alias("trace_flags"),
        F.col("r.severityText").alias("severity_text"),
        F.col("r.severityNumber").alias("severity_number"),
        F.coalesce(res_map["service.name"], F.lit("unknown")).alias("service_name"),
        F.col("r.body.stringValue").alias("body"),
        F.col("scope_name"),
        F.col("scope_version"),
        res_map.alias("resource_attributes"),
        F.lit(None).cast("map<string,string>").alias("scope_attributes"),
        stored_attrs,
        tokens,
        label_ns,
        F.to_date(ts).alias("date_day"),
        F.hour(ts).alias("hour"),
    )


OTLP_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", T.ArrayType(_KV))]),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType()),
                                                    T.StructField("version", T.StringType()),
                                                ]
                                            ),
                                        ),
                                        T.StructField(
                                            "spans",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("traceId", T.StringType()),
                                                        T.StructField("spanId", T.StringType()),
                                                        T.StructField("parentSpanId", T.StringType()),
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("kind", T.IntegerType()),
                                                        T.StructField("startTimeUnixNano", T.StringType()),
                                                        T.StructField("endTimeUnixNano", T.StringType()),
                                                        T.StructField("attributes", T.ArrayType(_KV)),
                                                        T.StructField("traceState", T.StringType()),
                                                        T.StructField(
                                                            "events",
                                                            T.ArrayType(
                                                                T.StructType(
                                                                    [
                                                                        T.StructField("timeUnixNano", T.StringType()),
                                                                        T.StructField("name", T.StringType()),
                                                                        T.StructField("attributes", T.ArrayType(_KV)),
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "links",
                                                            T.ArrayType(
                                                                T.StructType(
                                                                    [
                                                                        T.StructField("traceId", T.StringType()),
                                                                        T.StructField("spanId", T.StringType()),
                                                                        T.StructField("attributes", T.ArrayType(_KV)),
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "status",
                                                            T.StructType(
                                                                [
                                                                    T.StructField("code", T.IntegerType()),
                                                                    T.StructField("message", T.StringType()),
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

# OTLP SpanKind / StatusCode enums → storage strings
_SPAN_KINDS = ["UNSPECIFIED", "INTERNAL", "SERVER", "CLIENT", "PRODUCER", "CONSUMER"]
_STATUS_CODES = ["Unspecified", "Ok", "Error"]


def flatten_otlp_traces(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """OTLP/JSON trace payloads → flat span rows (the conversion_traces
    analog: renames, enum decoding, computed timestamp/duration and
    partition columns — schema_transform.rs:115 transform_trace_v1_to_v2)."""
    parsed = raw.select(F.from_json(F.col(json_col), OTLP_TRACES_SCHEMA).alias("p"))
    rs = parsed.select(F.explode("p.resourceSpans").alias("rs"))
    ss = rs.select(
        F.col("rs.resource.attributes").alias("res_attrs"),
        F.explode("rs.scopeSpans").alias("ss"),
    )
    sp = ss.select(
        "res_attrs",
        F.col("ss.scope.name").alias("scope_name"),
        F.col("ss.scope.version").alias("scope_version"),
        F.explode("ss.spans").alias("s"),
    )
    res_map = _attrs_to_map(F.col("res_attrs"))
    attr_map = _attrs_to_map(F.col("s.attributes"))
    start = F.col("s.startTimeUnixNano").cast("long")
    end = F.col("s.endTimeUnixNano").cast("long")
    ts = F.timestamp_micros(F.expr("CAST(s.startTimeUnixNano AS LONG) div 1000"))
    kind_arr = F.array(*[F.lit(k) for k in _SPAN_KINDS])
    status_arr = F.array(*[F.lit(s) for s in _STATUS_CODES])
    return sp.select(
        F.col("s.traceId").alias("trace_id"),
        F.col("s.spanId").alias("span_id"),
        F.nullif(F.col("s.parentSpanId"), F.lit("")).alias("parent_span_id"),
        F.col("s.name").alias("span_name"),
        F.coalesce(res_map["service.name"], F.lit("unknown")).alias("service_name"),
        start.alias("start_time_unix_nano"),
        end.alias("end_time_unix_nano"),
        (end - start).alias("duration_nanos"),
        F.element_at(kind_arr, F.coalesce(F.col("s.kind"), F.lit(0)) + 1).alias("span_kind"),
        F.element_at(status_arr, F.coalesce(F.col("s.status.code"), F.lit(0)) + 1).alias(
            "status_code"
        ),
        F.col("s.status.message").alias("status_message"),
        (F.nullif(F.col("s.parentSpanId"), F.lit("")).isNull()).alias("is_root"),
        attr_map.alias("span_attributes"),
        res_map.alias("resource_attributes"),
        # Span events/links persisted at rest (flight/schema.rs:57-84,
        # storage-layout.md:335-336) — attributes as map, not JSON string,
        # per the repo's map-only design.
        F.transform(
            F.col("s.events"),
            lambda e: F.struct(
                e["name"].alias("name"),
                e["timeUnixNano"].cast("long").alias("timestamp_unix_nano"),
                _attrs_to_map(e["attributes"]).alias("attributes"),
            ),
        ).alias("events"),
        F.transform(
            F.col("s.links"),
            lambda l: F.struct(
                l["traceId"].alias("trace_id"),
                l["spanId"].alias("span_id"),
                _attrs_to_map(l["attributes"]).alias("attributes"),
            ),
        ).alias("links"),
        F.col("s.traceState").alias("trace_state"),
        F.col("scope_name"),
        F.col("scope_version"),
        ts.alias("timestamp"),
        F.to_date(ts).alias("date_day"),
        F.hour(ts).alias("hour"),
    )


def with_dead_letter_flag(raw: DataFrame, schema, json_col: str = "value") -> DataFrame:
    """Tag undecodable payload lines instead of silently dropping them:
    rows whose JSON fails to produce any signal container are routed to
    a dead-letter count/sink by the caller."""
    parsed = F.from_json(F.col(json_col), schema)
    return raw.withColumn("_dead", parsed.isNull() | (F.to_json(parsed) == F.lit("{}")))


# OTLP/JSON exemplar attached to a data point (extract_exemplars,
# src/common/src/flight/conversion/conversion_metrics.rs:1318-1383)
_EXEMPLAR = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("asDouble", T.DoubleType()),
        T.StructField("asInt", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("traceId", T.StringType()),
        T.StructField("filteredAttributes", T.ArrayType(_KV)),
    ]
)

OTLP_METRICS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceMetrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", T.ArrayType(_KV))]),
                        ),
                        T.StructField(
                            "scopeMetrics",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "metrics",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("name", T.StringType()),
                                                        T.StructField("unit", T.StringType()),
                                                        T.StructField(
                                                            "gauge",
                                                            T.StructType(
                                                                [T.StructField("dataPoints", T.ArrayType(
                                                                    _NUM_DP := T.StructType([
                                                                        T.StructField("timeUnixNano", T.StringType()),
                                                                        T.StructField("asDouble", T.DoubleType()),
                                                                        T.StructField("asInt", T.StringType()),
                                                                        T.StructField("attributes", T.ArrayType(_KV)),
                                                                        T.StructField("exemplars", T.ArrayType(_EXEMPLAR)),
                                                                    ])
                                                                ))]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "sum",
                                                            T.StructType(
                                                                [
                                                                    T.StructField("dataPoints", T.ArrayType(_NUM_DP)),
                                                                    T.StructField("aggregationTemporality", T.IntegerType()),
                                                                    T.StructField("isMonotonic", T.BooleanType()),
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "histogram",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "dataPoints",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField("timeUnixNano", T.StringType()),
                                                                                    T.StructField("count", T.StringType()),
                                                                                    T.StructField("sum", T.DoubleType()),
                                                                                    T.StructField("bucketCounts", T.ArrayType(T.StringType())),
                                                                                    T.StructField("explicitBounds", T.ArrayType(T.DoubleType())),
                                                                                    T.StructField("attributes", T.ArrayType(_KV)),
                                                                                    T.StructField("exemplars", T.ArrayType(_EXEMPLAR)),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    ),
                                                                    T.StructField("aggregationTemporality", T.IntegerType()),
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "exponentialHistogram",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "dataPoints",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField("timeUnixNano", T.StringType()),
                                                                                    T.StructField("count", T.StringType()),
                                                                                    T.StructField("sum", T.DoubleType()),
                                                                                    T.StructField("min", T.DoubleType()),
                                                                                    T.StructField("max", T.DoubleType()),
                                                                                    T.StructField("scale", T.IntegerType()),
                                                                                    T.StructField("zeroCount", T.StringType()),
                                                                                    T.StructField(
                                                                                        "positive",
                                                                                        _EXP_BUCKETS := T.StructType(
                                                                                            [
                                                                                                T.StructField("offset", T.IntegerType()),
                                                                                                T.StructField("bucketCounts", T.ArrayType(T.StringType())),
                                                                                            ]
                                                                                        ),
                                                                                    ),
                                                                                    T.StructField("negative", _EXP_BUCKETS),
                                                                                    T.StructField("zeroThreshold", T.DoubleType()),
                                                                                    T.StructField("flags", T.IntegerType()),
                                                                                    T.StructField("attributes", T.ArrayType(_KV)),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    ),
                                                                    T.StructField("aggregationTemporality", T.IntegerType()),
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "summary",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "dataPoints",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField("timeUnixNano", T.StringType()),
                                                                                    T.StructField("count", T.StringType()),
                                                                                    T.StructField("sum", T.DoubleType()),
                                                                                    T.StructField(
                                                                                        "quantileValues",
                                                                                        T.ArrayType(
                                                                                            T.StructType(
                                                                                                [
                                                                                                    T.StructField("quantile", T.DoubleType()),
                                                                                                    T.StructField("value", T.DoubleType()),
                                                                                                ]
                                                                                            )
                                                                                        ),
                                                                                    ),
                                                                                    T.StructField("flags", T.IntegerType()),
                                                                                    T.StructField("attributes", T.ArrayType(_KV)),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    ),
                                                                ]
                                                            ),
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _metric_base(raw: DataFrame, json_col: str):
    parsed = raw.select(F.from_json(F.col(json_col), OTLP_METRICS_SCHEMA).alias("p"))
    rm = parsed.select(F.explode("p.resourceMetrics").alias("rm"))
    sm = rm.select(
        F.col("rm.resource.attributes").alias("res_attrs"),
        F.explode("rm.scopeMetrics").alias("sm"),
    )
    return sm.select("res_attrs", F.explode("sm.metrics").alias("m"))


def _exemplars_json(dp_exemplars):
    """Data-point exemplars → the reference's at-rest JSON blob
    (extract_exemplars, conversion_metrics.rs:1318-1383): array of
    {time_unix_nano, value, filtered_attributes, trace_id, span_id},
    NULL when the point carries none. to_json drops null fields, which
    matches the reference's omit-if-empty trace/span ids."""
    shaped = F.transform(
        dp_exemplars,
        lambda e: F.struct(
            e["timeUnixNano"].cast("long").alias("time_unix_nano"),
            F.coalesce(e["asDouble"], e["asInt"].cast("double")).alias("value"),
            _attrs_to_map(e["filteredAttributes"]).alias("filtered_attributes"),
            e["traceId"].alias("trace_id"),
            e["spanId"].alias("span_id"),
        ),
    )
    return F.when(F.size(dp_exemplars) > 0, F.to_json(shaped))


def flatten_otlp_metrics(raw: DataFrame, json_col: str = "value") -> dict[str, DataFrame]:
    """OTLP/JSON metrics → one flat DataFrame per target table.

    The reference explodes data points per metric type and routes each
    to its own table (conversion_metrics.rs: one row per point,
    ``target_table`` routing). Returns {'metrics_gauge': df,
    'metrics_sum': df, 'metrics_histogram': df,
    'metrics_exponential_histogram': df, 'metrics_summary': df} — all
    five reference target tables.

    Each returned frame re-derives from the raw JSON, so writing all
    five parses the payloads five times. Bounded writers (a
    foreachBatch sink) should parse once instead:
    :func:`route_metric_base` over a persisted :func:`metric_base`.
    """
    return route_metric_base(metric_base(raw, json_col))


def metric_base(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """The parsed per-metric frame (one row per OTLP metric, data
    points unexploded) the five kind routers branch from. Persist this
    in bounded sinks so the five-table fan-out parses the JSON once —
    at ingest scale the re-parse, not the routing, is the cost."""
    return _metric_base(raw, json_col)


def route_metric_base(base: DataFrame) -> dict[str, DataFrame]:
    """Five-kind routing over an already-parsed :func:`metric_base`
    frame (conversion_metrics.rs target_table routing)."""
    res_map = _attrs_to_map(F.col("res_attrs"))

    def num_points(kind: str):
        df = base.filter(F.col(f"m.{kind}").isNotNull()).select(
            "res_attrs",
            F.col("m.name").alias("metric_name"),
            F.col("m.unit").alias("metric_unit"),
            F.col(f"m.{kind}").alias("k"),
            F.explode(F.col(f"m.{kind}.dataPoints")).alias("dp"),
        )
        ts = F.timestamp_micros(F.expr("CAST(dp.timeUnixNano AS LONG) div 1000"))
        value = F.coalesce(F.col("dp.asDouble"), F.col("dp.asInt").cast("double"))
        cols = [
            ts.alias("timestamp"),
            F.coalesce(_attrs_to_map(F.col("res_attrs"))["service.name"], F.lit("unknown")).alias(
                "service_name"
            ),
            F.col("metric_name"),
            F.col("metric_unit"),
            value.alias("value"),
            _attrs_to_map(F.col("dp.attributes")).alias("attributes"),
            _exemplars_json(F.col("dp.exemplars")).alias("exemplars"),
            F.to_date(ts).alias("date_day"),
            F.hour(ts).alias("hour"),
        ]
        if kind == "sum":
            cols += [
                F.col("k.aggregationTemporality").alias("aggregation_temporality"),
                F.coalesce(F.col("k.isMonotonic"), F.lit(False)).alias("is_monotonic"),
            ]
        return df.select(*cols)

    hist_base = base.filter(F.col("m.histogram").isNotNull()).select(
        "res_attrs",
        F.col("m.name").alias("metric_name"),
        F.col("m.histogram.aggregationTemporality").alias("aggregation_temporality"),
        F.explode("m.histogram.dataPoints").alias("dp"),
    )
    hts = F.timestamp_micros(F.expr("CAST(dp.timeUnixNano AS LONG) div 1000"))
    hist = hist_base.select(
        hts.alias("timestamp"),
        F.coalesce(_attrs_to_map(F.col("res_attrs"))["service.name"], F.lit("unknown")).alias(
            "service_name"
        ),
        F.col("metric_name"),
        F.col("dp.count").cast("long").alias("count"),
        F.col("dp.sum").alias("sum"),
        F.transform(F.col("dp.bucketCounts"), lambda c: c.cast("double")).alias("bucket_counts"),
        F.col("dp.explicitBounds").alias("explicit_bounds"),
        F.col("aggregation_temporality"),
        _attrs_to_map(F.col("dp.attributes")).alias("attributes"),
        _exemplars_json(F.col("dp.exemplars")).alias("exemplars"),
        F.to_date(hts).alias("date_day"),
        F.hour(hts).alias("hour"),
    )
    # Exponential histogram / summary flatteners (schema_transform.rs:1493
    # transform_metrics_exp_histogram, :1698 transform_metrics_summary;
    # storage-layout.md:555-588). Bucket lists stay typed arrays rather
    # than the reference's JSON strings — Spark reads them natively.
    exp_base = base.filter(F.col("m.exponentialHistogram").isNotNull()).select(
        "res_attrs",
        F.col("m.name").alias("metric_name"),
        F.col("m.exponentialHistogram.aggregationTemporality").alias("aggregation_temporality"),
        F.explode("m.exponentialHistogram.dataPoints").alias("dp"),
    )
    ets = F.timestamp_micros(F.expr("CAST(dp.timeUnixNano AS LONG) div 1000"))
    exp_hist = exp_base.select(
        ets.alias("timestamp"),
        F.coalesce(_attrs_to_map(F.col("res_attrs"))["service.name"], F.lit("unknown")).alias(
            "service_name"
        ),
        F.col("metric_name"),
        F.col("dp.count").cast("long").alias("count"),
        F.col("dp.sum").alias("sum"),
        F.col("dp.min").alias("min"),
        F.col("dp.max").alias("max"),
        F.col("dp.scale").alias("scale"),
        F.col("dp.zeroCount").cast("long").alias("zero_count"),
        F.col("dp.positive.offset").alias("positive_offset"),
        F.transform(F.col("dp.positive.bucketCounts"), lambda c: c.cast("long")).alias(
            "positive_bucket_counts"
        ),
        F.col("dp.negative.offset").alias("negative_offset"),
        F.transform(F.col("dp.negative.bucketCounts"), lambda c: c.cast("long")).alias(
            "negative_bucket_counts"
        ),
        F.col("dp.flags").alias("flags"),
        F.col("aggregation_temporality"),
        F.col("dp.zeroThreshold").alias("zero_threshold"),
        _attrs_to_map(F.col("dp.attributes")).alias("attributes"),
        F.to_date(ets).alias("date_day"),
        F.hour(ets).alias("hour"),
    )
    sum_base = base.filter(F.col("m.summary").isNotNull()).select(
        "res_attrs",
        F.col("m.name").alias("metric_name"),
        F.explode("m.summary.dataPoints").alias("dp"),
    )
    sts = F.timestamp_micros(F.expr("CAST(dp.timeUnixNano AS LONG) div 1000"))
    summary = sum_base.select(
        sts.alias("timestamp"),
        F.coalesce(_attrs_to_map(F.col("res_attrs"))["service.name"], F.lit("unknown")).alias(
            "service_name"
        ),
        F.col("metric_name"),
        F.col("dp.count").cast("long").alias("count"),
        F.col("dp.sum").alias("sum"),
        F.col("dp.quantileValues").alias("quantile_values"),
        F.col("dp.flags").alias("flags"),
        _attrs_to_map(F.col("dp.attributes")).alias("attributes"),
        F.to_date(sts).alias("date_day"),
        F.hour(sts).alias("hour"),
    )
    return {
        "metrics_gauge": num_points("gauge"),
        "metrics_sum": num_points("sum"),
        "metrics_histogram": hist,
        "metrics_exponential_histogram": exp_hist,
        "metrics_summary": summary,
    }


OTLP_PROFILES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceProfiles",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", T.ArrayType(_KV))]),
                        ),
                        T.StructField(
                            "scopeProfiles",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "profiles",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField("profileId", T.StringType()),
                                                        T.StructField("timeUnixNano", T.StringType()),
                                                        T.StructField("durationNano", T.StringType()),
                                                        T.StructField("sampleTypeType", T.StringType()),
                                                        T.StructField("sampleTypeUnit", T.StringType()),
                                                        T.StructField("period", T.StringType()),
                                                        # dictionary-resolved self-contained rows
                                                        # (the reference resolves OTLP dictionary
                                                        # tables at the edge, conversion_profiles.rs)
                                                        T.StructField(
                                                            "stacktraces",
                                                            T.ArrayType(T.ArrayType(T.StringType())),
                                                        ),
                                                        T.StructField(
                                                            "samples",
                                                            T.ArrayType(
                                                                T.StructType(
                                                                    [
                                                                        T.StructField("stacktraceIdx", T.IntegerType()),
                                                                        T.StructField("value", T.LongType()),
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                        T.StructField("attributes", T.ArrayType(_KV)),
                                                        T.StructField("traceId", T.StringType()),
                                                        T.StructField("spanId", T.StringType()),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def flatten_otlp_profiles(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """OTLP/JSON profile payloads → flat profile rows with
    self-contained stacktraces/samples JSON columns (the reference
    resolves the OTLP dictionary tables into self-contained rows at
    conversion time, conversion_profiles.rs)."""
    parsed = raw.select(F.from_json(F.col(json_col), OTLP_PROFILES_SCHEMA).alias("p"))
    rp = parsed.select(F.explode("p.resourceProfiles").alias("rp"))
    sp = rp.select(
        F.col("rp.resource.attributes").alias("res_attrs"),
        F.explode("rp.scopeProfiles").alias("sp"),
    )
    pr = sp.select("res_attrs", F.explode("sp.profiles").alias("pr"))
    res_map = _attrs_to_map(F.col("res_attrs"))
    ts = F.timestamp_micros(F.expr("CAST(pr.timeUnixNano AS LONG) div 1000"))
    samples_json = F.to_json(
        F.transform(
            F.col("pr.samples"),
            lambda s: F.struct(
                s["stacktraceIdx"].alias("stacktrace_idx"), s["value"].alias("value")
            ),
        )
    )
    return pr.select(
        F.col("pr.profileId").alias("profile_id"),
        ts.alias("timestamp"),
        F.col("pr.durationNano").cast("long").alias("duration_nano"),
        F.col("pr.sampleTypeType").alias("sample_type_type"),
        F.col("pr.sampleTypeUnit").alias("sample_type_unit"),
        F.col("pr.period").cast("long").alias("period"),
        F.coalesce(res_map["service.name"], F.lit("unknown")).alias("service_name"),
        F.to_json(F.col("pr.stacktraces")).alias("stacktraces_json"),
        samples_json.alias("samples_json"),
        res_map.alias("resource_attributes"),
        _attrs_to_map(F.col("pr.attributes")).alias("attributes"),
        F.col("pr.traceId").alias("trace_id"),
        F.col("pr.spanId").alias("span_id"),
        F.to_date(ts).alias("date_day"),
        F.hour(ts).alias("hour"),
    )
