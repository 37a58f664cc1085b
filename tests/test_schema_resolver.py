"""Versioned-schema resolver (schemas/resolver.py — the
schema_parser.rs + schemas.toml machinery as data): inheritance,
position-preserving renames, computed additions, Spark-schema
rendering with label/attr_tokens appendage, and live-DataFrame
migration between versions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from signaldb_spark.schemas.resolver import SchemaRegistry, builtin_registry
from signaldb_spark.schemas.signal_schemas import (
    LOGS,
    METRICS_GAUGE,
    METRICS_SUM,
    TRACES,
)

REG = builtin_registry()


# ------------------------------------------------- at-rest parity pins
# signal_schemas.py stays the source of truth; the registry must render
# byte-identical StructTypes so the two can never drift apart.

def test_traces_v2_renders_the_at_rest_schema():
    got = REG.resolve("traces", "v2").to_spark_schema(labels=["environment"])
    assert got == TRACES


def test_logs_v1_renders_the_at_rest_schema():
    assert REG.resolve("logs", "v1").to_spark_schema() == LOGS


def test_metrics_render_the_at_rest_schemas():
    assert REG.resolve("metrics_gauge", "v1").to_spark_schema() == METRICS_GAUGE
    assert REG.resolve("metrics_sum", "v1").to_spark_schema() == METRICS_SUM


# ------------------------------------------------------ resolution rules

def test_rename_preserves_position_and_inheritance_order():
    v1 = REG.resolve("traces", "v1")
    v2 = REG.resolve("traces", "v2")
    assert v1.field_names()[3] == "name"
    assert v2.field_names()[3] == "span_name"  # renamed in place
    # additions append after every inherited field
    assert v2.field_names()[-3:] == ["timestamp", "date_day", "hour"]
    assert v2.partition_by == ["date_day", "hour"]


def test_computed_fields_surface():
    v2 = REG.resolve("traces", "v2")
    computed = {f.name: f.computed for f in v2.computed_fields()}
    assert computed == {
        "timestamp": "start_time_unix_nano",
        "date_day": "date_from_timestamp",
        "hour": "hour_from_timestamp",
    }


def test_current_version_reads_metadata():
    assert REG.current_version("traces") == "v2"
    assert REG.current_version("logs") == "v1"


def test_unknown_table_and_version_raise():
    with pytest.raises(ValueError, match="unknown table"):
        REG.resolve("nope")
    with pytest.raises(ValueError, match="unknown version"):
        REG.resolve("traces", "v99")


def test_attr_tokens_variant_appends_optional_list_column():
    got = REG.resolve("metrics_gauge").to_spark_schema(attr_tokens=True)
    last = got.fields[-1]
    assert last.name == "attr_tokens" and last.nullable
    assert got.fields[:-1] == list(METRICS_GAUGE.fields)


# ---------------------------------------------------------- TOML parsing

FAKE_TOML = """
[metadata]
current_traces_version = "v3"

[traces.v1]
fields = [
    { name = "trace_id", type = "string", required = true },
    { name = "name", type = "string", required = true },
    { name = "start_time_unix_nano", type = "uint64", required = true },
]

[traces.v2]
inherits = "v1"
field_renames = [ { from = "name", to = "span_name" } ]
field_additions = [
    { name = "timestamp", type = "timestamp_ns", required = true, computed = "start_time_unix_nano" },
]

[traces.v3]
inherits = "v2"
field_renames = [ { from = "span_name", to = "operation_name" } ]
field_additions = [
    { name = "date_day", type = "date", required = true, computed = "date_from_timestamp" },
    { name = "region", type = "string" },
]
partition_by = ["date_day"]
"""


def test_toml_registry_resolves_transitive_inheritance():
    reg = SchemaRegistry.from_toml(FAKE_TOML)
    assert reg.current_version("traces") == "v3"
    v3 = reg.resolve("traces")
    assert v3.field_names() == [
        "trace_id", "operation_name", "start_time_unix_nano",
        "timestamp", "date_day", "region",
    ]
    assert v3.partition_by == ["date_day"]
    sch = v3.to_spark_schema()
    assert [f.dataType.simpleString() for f in sch.fields] == [
        "string", "string", "bigint", "timestamp", "date", "string",
    ]


# ------------------------------------------------------ golden migration

def test_migrate_v1_dataframe_to_v3(spark):
    """The golden upgrade: a frame written at traces-v1 reads back at
    v3 — renames replayed in inheritance order, computed additions
    derived, plain additions arriving as typed NULLs."""
    reg = SchemaRegistry.from_toml(FAKE_TOML)
    df = spark.createDataFrame(
        [("t1", "GET /", 1704067200_000_000_000)],
        "trace_id string, name string, start_time_unix_nano long",
    )
    out = reg.migrate(df, "traces", "v1", "v3")
    assert out.columns == [
        "trace_id", "operation_name", "start_time_unix_nano",
        "timestamp", "date_day", "region",
    ]
    row = out.first()
    assert row.operation_name == "GET /"
    assert row.timestamp == dt.datetime(2024, 1, 1, 0, 0)
    assert row.date_day == dt.date(2024, 1, 1)
    assert row.region is None


def test_migrate_rejects_non_ancestor(spark):
    reg = SchemaRegistry.from_toml(FAKE_TOML)
    df = spark.range(1)
    with pytest.raises(ValueError, match="does not inherit"):
        reg.migrate(df, "traces", "v3", "v2")


def test_migrate_noop_when_versions_equal(spark):
    reg = SchemaRegistry.from_toml(FAKE_TOML)
    df = spark.createDataFrame([("t1",)], "trace_id string")
    assert reg.migrate(df, "traces", "v3", "v3").columns == ["trace_id"]


def test_versions_sort_naturally_past_v9():
    reg = SchemaRegistry({
        "t": {f"v{i}": {"fields": [{"name": "a", "type": "string"}]}
              for i in (1, 2, 9, 10, 11)},
    })
    assert reg.versions("t") == ["v1", "v2", "v9", "v10", "v11"]
    assert reg.current_version("t") == "v11"


def test_computed_nanos_division_is_integer_exact(spark):
    """A nano timestamp with sub-256ns structure must not shift by a
    microsecond through a float divide (long->double rounds near 2^60)."""
    reg = SchemaRegistry.from_toml(FAKE_TOML)
    nanos = 1704067200123456789  # ...456.789 us
    df = spark.createDataFrame(
        [("t1", "GET /", nanos)],
        "trace_id string, name string, start_time_unix_nano long",
    )
    row = reg.migrate(df, "traces", "v1", "v2").first()
    assert row.timestamp.microsecond == 123456


def test_exp_histogram_and_summary_schemas_match_flattener(spark):
    """SCHEMAS must cover EVERY table the flatteners emit — a
    provisioned-but-empty exp-histogram/summary table answers queries in
    exactly the column set flatten_otlp_metrics produces (names + types;
    nullability is writer-determined)."""
    import json

    from signaldb_spark.schemas.signal_schemas import SCHEMAS
    from signaldb_spark.sources.otlp import flatten_otlp_metrics

    req = {
        "resourceMetrics": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}}]},
            "scopeMetrics": [{"metrics": [
                {"name": "lat", "exponentialHistogram": {
                    "aggregationTemporality": 2,
                    "dataPoints": [{
                        "timeUnixNano": "1704067200000000000",
                        "count": "5", "sum": 10.0, "scale": 3,
                        "zeroCount": "1",
                        "positive": {"offset": 0, "bucketCounts": ["2", "2"]},
                        "negative": {"offset": 0, "bucketCounts": []},
                        "zeroThreshold": 1e-9, "flags": 0, "attributes": [],
                    }]}},
                {"name": "rpc", "summary": {"dataPoints": [{
                    "timeUnixNano": "1704067200000000000",
                    "count": "4", "sum": 8.0,
                    "quantileValues": [{"quantile": 0.5, "value": 2.0}],
                    "flags": 0, "attributes": [],
                }]}},
            ]}],
        }]
    }
    raw = spark.createDataFrame([(json.dumps(req),)], "value string")
    out = flatten_otlp_metrics(raw)
    for table in ("metrics_exponential_histogram", "metrics_summary"):
        got = [(f.name, f.dataType.simpleString()) for f in out[table].schema.fields]
        want = [(f.name, f.dataType.simpleString()) for f in SCHEMAS[table].fields]
        assert got == want, (table, got, want)


def test_all_persisted_tables_render_at_rest_schemas():
    """EVERY table in SCHEMAS has a registry declaration rendering the
    byte-identical StructType — the schemas-as-data story covers the
    whole persisted surface, not just the first four tables."""
    from signaldb_spark.schemas.signal_schemas import SCHEMAS

    assert set(REG.tables()) == set(SCHEMAS)
    for table, want in SCHEMAS.items():
        labels = ["environment"] if table == "traces" else None
        ver = REG.current_version(table)
        got = REG.resolve(table, ver).to_spark_schema(labels=labels) \
            if labels else REG.resolve(table, ver).to_spark_schema()
        assert got == want, table


# ---------------------------------------------------------------------------
# typed attribute values (otel-native-schema proposal: typed substrate,
# type authority, lossless residue, bytes fidelity)


def test_logs_v2_retypes_attributes_to_anyvalue():
    from signaldb_spark.schemas.anyvalue import ANY_VALUE_MAP

    v2 = REG.resolve("logs", "v2")
    f = {x.name: x for x in v2.fields}["log_attributes"]
    assert f.type == "map<string,any_value>"
    # position preserved: retype changes the type, not the layout
    assert v2.field_names() == REG.resolve("logs", "v1").field_names()
    spark_schema = v2.to_spark_schema()
    assert spark_schema["log_attributes"].dataType == ANY_VALUE_MAP
    # current stays v1 until a deployment opts in
    assert REG.current_version("logs") == "v1"


def test_migrate_golden_stringified_to_typed(spark):
    """The golden migration: a v1 row with stringified attributes
    upgrades to v2 with http.response.status_code=200 surviving AS AN
    INT (the proposal's headline example), an off-type value retained
    losslessly as string residue, and unregistered keys defaulting to
    string."""
    import datetime as dt

    from signaldb_spark.schemas.anyvalue import AttributeTypeRegistry

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), "api",
             {"http.response.status_code": "200", "retry": "true",
              "latency_ms": "12.5", "note": "hello"}),
            (dt.datetime(2024, 1, 1), "api",
             {"http.response.status_code": "abc"}),  # off-type → residue
            (dt.datetime(2024, 1, 1), "api", None),
        ],
        "timestamp timestamp, service_name string, log_attributes map<string,string>",
    )
    reg = AttributeTypeRegistry(config={"retry": "bool", "latency_ms": "double"})
    out = REG.migrate(df, "logs", "v1", "v2", attr_types=reg.assignments())
    rows = out.select("log_attributes").collect()
    a0 = rows[0]["log_attributes"]
    sc = a0["http.response.status_code"]
    assert sc["type"] == "int" and sc["int"] == 200 and sc["str"] is None
    assert a0["retry"]["type"] == "bool" and a0["retry"]["bool"] is True
    assert a0["latency_ms"]["type"] == "double" and a0["latency_ms"]["dbl"] == 12.5
    assert a0["note"]["type"] == "string" and a0["note"]["str"] == "hello"
    # off-type: retained losslessly in the residue, NOT dropped, NOT
    # coerced into the int home
    bad = rows[1]["log_attributes"]["http.response.status_code"]
    assert bad["type"] == "string" and bad["str"] == "abc" and bad["int"] is None
    assert rows[2]["log_attributes"] is None


def test_type_authority_precedence_and_monotonicity():
    """Canonical type per (level, key): config beats semconv beats
    observed; first observation establishes, later conflicts never
    retype; levels are independent field identities."""
    from signaldb_spark.schemas.anyvalue import AttributeTypeRegistry

    reg = AttributeTypeRegistry(config={"custom.flag": "bool"})
    # config tier wins regardless of observations
    assert reg.observe("custom.flag", "string") == "bool"
    # semconv hint beats the observed type
    assert reg.observe("http.response.status_code", "string") == "int"
    # observed establishes for unknown keys...
    assert reg.observe("myapp.count", "int") == "int"
    # ...and is MONOTONIC: a later conflicting observation cannot flip it
    assert reg.observe("myapp.count", "string") == "int"
    assert reg.canonical("myapp.count") == "int"
    # attribute level is part of the field identity
    assert reg.observe("myapp.count", "double", level="resource") == "double"
    assert reg.canonical("myapp.count", level="resource") == "double"
    assert reg.canonical("myapp.count") == "int"
    # persistence round-trip keeps establishments
    reg2 = AttributeTypeRegistry.from_dict(reg.to_dict())
    assert reg2.canonical("myapp.count") == "int"
    assert reg2.canonical("custom.flag") == "bool"


def test_typed_reads_never_coerce_residue(spark):
    """typed-attribute-storage spec: a canonical-typed read returns the
    typed value or NULL — never a coerced residue; the raw accessor
    returns the original AnyValue."""
    from signaldb_spark.operators.attrs import attr_number, attr_typed, attr_value
    from signaldb_spark.schemas.anyvalue import AttributeTypeRegistry
    from signaldb_spark.schemas.resolver import builtin_registry

    import datetime as dt

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), "api", {"code": "200"}),
            (dt.datetime(2024, 1, 1), "api", {"code": "oops"}),
        ],
        "timestamp timestamp, service_name string, log_attributes map<string,string>",
    )
    reg = AttributeTypeRegistry(config={"code": "int"})
    t = builtin_registry().migrate(df, "logs", "v1", "v2",
                                   attr_types=reg.assignments())
    rows = t.select(
        attr_number(t, "log_attributes", "code").alias("n"),
        attr_typed(t, "log_attributes", "code").alias("raw"),
        attr_value(t, "log_attributes", "code").alias("display"),
    ).collect()
    assert rows[0]["n"] == 200.0 and rows[0]["display"] == "200"
    # residue: numeric read is NULL (not an ANSI cast error, not 0);
    # the raw accessor still returns the original value losslessly
    assert rows[1]["n"] is None
    assert rows[1]["raw"]["str"] == "oops" and rows[1]["display"] == "oops"


def test_otlp_typed_ingest_preserves_bytes_and_ints(spark):
    """The extract_value fidelity fix (otel-native-schema phase 1):
    BytesValue survives as BYTES distinguishable from a string, int64
    survives integer-exact beyond 2^53, and the display/token surfaces
    stay layout-invariant."""
    import base64
    import json

    from signaldb_spark.sources.otlp import flatten_otlp_logs

    big = 9007199254740995  # 2^53 + 3: double round-trip would corrupt
    payload = json.dumps({
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}}]},
            "scopeLogs": [{
                "scope": {"name": "t", "version": "1"},
                "logRecords": [{
                    "timeUnixNano": "1704067200000000000",
                    "observedTimeUnixNano": "1704067200000000000",
                    "severityText": "INFO", "severityNumber": 9,
                    "body": {"stringValue": "hello"},
                    "attributes": [
                        {"key": "http.response.status_code",
                         "value": {"intValue": "200"}},
                        {"key": "big", "value": {"intValue": str(big)}},
                        {"key": "blob",
                         "value": {"bytesValue": base64.b64encode(
                             b"\xde\xad\xbe\xef").decode()}},
                        {"key": "who", "value": {"stringValue": "deadbeef"}},
                    ],
                    "traceId": "ab" * 16, "spanId": "cd" * 8,
                }],
            }],
        }]
    })
    raw = spark.createDataFrame([(payload,)], "value string")
    out = flatten_otlp_logs(raw, typed_attrs=True).collect()[0]
    attrs = out["log_attributes"]
    assert attrs["http.response.status_code"]["type"] == "int"
    assert attrs["http.response.status_code"]["int"] == 200
    assert attrs["big"]["int"] == big  # integer-exact past 2^53
    assert attrs["blob"]["type"] == "bytes"
    assert bytes(attrs["blob"]["bytes"]) == b"\xde\xad\xbe\xef"
    # bytes are DISTINGUISHABLE from a string whose display collides
    assert attrs["who"]["type"] == "string" and attrs["who"]["bytes"] is None
    assert "http.response.status_code=200" in out["attr_tokens"]
    assert "blob=deadbeef" in out["attr_tokens"]  # hex display, not UTF-8


def test_ir_numeric_predicate_uses_typed_home(spark):
    """An IR `gt` over a typed int attribute compares LONGS: matching
    rows pass, a string residue under the same key reads NULL and drops
    (Kleene) instead of ANSI-poisoning the scan — impossible on the
    stringified layout."""
    import datetime as dt

    from signaldb_spark.ir import lower, validate
    from signaldb_spark.schemas.anyvalue import AttributeTypeRegistry
    from signaldb_spark.schemas.resolver import builtin_registry

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), "api", {"http.response.status_code": "500"}),
            (dt.datetime(2024, 1, 1), "api", {"http.response.status_code": "200"}),
            (dt.datetime(2024, 1, 1), "api", {"http.response.status_code": "n/a"}),
            (dt.datetime(2024, 1, 1), "api", None),
        ],
        "timestamp timestamp, service_name string, log_attributes map<string,string>",
    )
    t = builtin_registry().migrate(
        df, "logs", "v1", "v2",
        attr_types=AttributeTypeRegistry().assignments())
    q = validate({
        "version": 1, "from": "logs",
        "where": {"field": "http.response.status_code", "op": "gt", "value": 400},
        "select": ["service_name"],
    })
    assert lower(t, q).count() == 1


def test_traces_v3_retypes_span_and_resource_attributes():
    from signaldb_spark.schemas.anyvalue import ANY_VALUE_MAP

    v3 = REG.resolve("traces", "v3")
    by = {x.name: x for x in v3.fields}
    assert by["span_attributes"].type == "map<string,any_value>"
    assert by["resource_attributes"].type == "map<string,any_value>"
    # position preserved: retype changes types, not the layout
    assert v3.field_names() == REG.resolve("traces", "v2").field_names()
    ss = v3.to_spark_schema()
    assert ss["span_attributes"].dataType == ANY_VALUE_MAP
    assert ss["resource_attributes"].dataType == ANY_VALUE_MAP
    # current stays v2 until a deployment opts in
    assert REG.current_version("traces") == "v2"


def test_migrate_traces_v2_to_v3_typed(spark):
    """The traces cutover mirrors logs: one type authority across
    signals, so span_attributes AND resource_attributes retype in one
    migration with the same assignments — typed homes for canonical
    matches, string residue for off-type values."""
    import datetime as dt

    from signaldb_spark.schemas.anyvalue import AttributeTypeRegistry

    df = spark.createDataFrame(
        [
            ("t1", "s1", "GET /", "api",
             {"http.response.status_code": "503", "peer": "db"},
             {"process.pid": "42", "host": "h1"},
             dt.datetime(2024, 1, 1)),
            ("t2", "s2", "GET /", "api",
             {"http.response.status_code": "n/a"},  # residue
             None,
             dt.datetime(2024, 1, 1)),
        ],
        "trace_id string, span_id string, span_name string, "
        "service_name string, span_attributes map<string,string>, "
        "resource_attributes map<string,string>, timestamp timestamp",
    )
    out = REG.migrate(df, "traces", "v2", "v3",
                      attr_types=AttributeTypeRegistry().assignments())
    rows = out.orderBy("trace_id").collect()
    sc = rows[0]["span_attributes"]["http.response.status_code"]
    assert sc["type"] == "int" and sc["int"] == 503 and sc["str"] is None
    pid = rows[0]["resource_attributes"]["process.pid"]
    assert pid["type"] == "int" and pid["int"] == 42
    host = rows[0]["resource_attributes"]["host"]
    assert host["type"] == "string" and host["str"] == "h1"
    bad = rows[1]["span_attributes"]["http.response.status_code"]
    assert bad["type"] == "string" and bad["str"] == "n/a" and bad["int"] is None
    assert rows[1]["resource_attributes"] is None


def test_metrics_gauge_v2_typed_attributes(spark):
    """The third signal under the one type authority: metrics_gauge.v2
    retypes datapoint attributes to the AnyValue map; migration routes
    config-typed keys into typed homes."""
    import datetime as dt

    from signaldb_spark.schemas.anyvalue import ANY_VALUE_MAP, AttributeTypeRegistry

    v2 = REG.resolve("metrics_gauge", "v2")
    f = {x.name: x for x in v2.fields}["attributes"]
    assert f.type == "map<string,any_value>"
    assert v2.to_spark_schema()["attributes"].dataType == ANY_VALUE_MAP
    assert REG.current_version("metrics_gauge") == "v1"
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), "api", "g", 1.0, {"shard": "3"})],
        "timestamp timestamp, service_name string, metric_name string, "
        "value double, attributes map<string,string>",
    )
    out = REG.migrate(
        df, "metrics_gauge", "v1", "v2",
        attr_types=AttributeTypeRegistry(config={"shard": "int"}).assignments(),
    )
    a = out.first()["attributes"]["shard"]
    assert a["type"] == "int" and a["int"] == 3
