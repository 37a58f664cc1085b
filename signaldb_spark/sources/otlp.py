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


def flatten_otlp_logs(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """OTLP/JSON log payloads → flat logs rows (works on batch and
    streaming DataFrames alike — pure explode/select)."""
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
    ts = F.timestamp_micros(
        (F.col("r.timeUnixNano").cast("long") / 1000).cast("long")
    )
    return rec.select(
        ts.alias("timestamp"),
        F.timestamp_micros(
            (F.col("r.observedTimeUnixNano").cast("long") / 1000).cast("long")
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
        attr_map.alias("log_attributes"),
        F.transform(
            F.map_entries(attr_map), lambda e: F.concat_ws("=", e["key"], e["value"])
        ).alias("attr_tokens"),
        attr_map["namespace"].alias("label_namespace"),
        F.to_date(ts).alias("date_day"),
        F.hour(ts).alias("hour"),
    )
