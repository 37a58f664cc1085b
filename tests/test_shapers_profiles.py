"""Result shapers + profiles/flamegraph tests."""

from __future__ import annotations

import pytest

from signaldb_spark.catalog import optional_table
from signaldb_spark.operators.profiles import find_by_trace, flamegraph
from signaldb_spark.shapers import (
    error_envelope,
    logs_to_loki_streams,
    matrix_to_instant_vector,
    matrix_to_prom,
    trace_to_tempo,
)
from signaldb_spark.testing import write_signal_tables


@pytest.fixture(scope="module")
def base(spark, tmp_path_factory):
    b = str(tmp_path_factory.mktemp("shaper_signals"))
    write_signal_tables(spark, b)
    return b


def test_matrix_to_prom_shape(spark):
    df = spark.createDataFrame(
        [(100, "api", 1.0), (200, "api", 2.0), (100, "web", 3.0)],
        "bucket long, service_name string, value double",
    )
    env = matrix_to_prom(df)
    assert env["status"] == "success"
    assert env["data"]["resultType"] == "matrix"
    api = next(r for r in env["data"]["result"] if r["metric"]["service_name"] == "api")
    assert api["values"] == [[100, "1.0"], [200, "2.0"]]


def test_instant_vector_latest(spark):
    df = spark.createDataFrame(
        [(100, "api", 1.0), (200, "api", 2.0)],
        "bucket long, service_name string, value double",
    )
    env = matrix_to_instant_vector(df)
    assert env["data"]["result"][0]["value"] == [200, "2.0"]


def test_loki_streams(spark, base):
    logs = optional_table(spark, base, "acme", "prod", "logs").limit(50)
    env = logs_to_loki_streams(logs)
    assert env["data"]["resultType"] == "streams"
    for stream in env["data"]["result"]:
        assert "service_name" in stream["stream"]
        ts_order = [v[0] for v in stream["values"]]
        assert ts_order == sorted(ts_order, reverse=True)


def test_tempo_trace_hierarchy(spark, base):
    from signaldb_spark.traceql.trace_ops import assemble_hierarchy, find_by_id

    traces = optional_table(spark, base, "acme", "prod", "traces")
    tid = traces.filter("is_root").select("trace_id").first().trace_id
    row = assemble_hierarchy(find_by_id(traces, tid)).first()
    doc = trace_to_tempo(row)
    assert doc["traceID"] == tid and doc["spanCount"] >= 1
    # exactly one root; all non-roots nested beneath it
    assert len(doc["spans"]) == 1
    root = doc["spans"][0]
    def count(n):
        return 1 + sum(count(c) for c in n["children"])
    assert count(root) == doc["spanCount"]


def test_error_envelope():
    env = error_envelope("parse error: unexpected token")
    assert env["status"] == "error" and env["errorType"] == "bad_data"


def test_flamegraph_invariants(spark, base):
    profiles = optional_table(spark, base, "acme", "prod", "profiles")
    fg = flamegraph(profiles)
    rows = fg.collect()
    assert rows
    root_total = sum(r.value for r in rows if r.depth == 1)
    # every stack is rooted at 'main' → depth-1 total == total weight
    import json

    total = 0
    for r in profiles.select("samples_json").collect():
        total += sum(s["value"] for s in json.loads(r.samples_json))
    assert root_total == total
    assert all(r.frame == r.path.split(";")[-1] for r in rows)
    # parent weight >= sum of children
    by_path = {r.path: r.value for r in rows}
    for path, v in by_path.items():
        children = [x for p, x in by_path.items() if p.startswith(path + ";") and p.count(";") == path.count(";") + 1]
        assert v >= sum(children) or not children


def test_flamegraph_grouped_by_service(spark, base):
    profiles = optional_table(spark, base, "acme", "prod", "profiles")
    fg = flamegraph(profiles, group_cols=["service_name"]).collect()
    services = {r.service_name for r in fg}
    assert len(services) >= 2


def test_profile_trace_correlation(spark, base):
    profiles = optional_table(spark, base, "acme", "prod", "profiles")
    some = profiles.filter("trace_id IS NOT NULL").first()
    hits = find_by_trace(profiles, some.trace_id).collect()
    assert hits and all(h.trace_id == some.trace_id for h in hits)


def test_flatten_otlp_profiles_to_flamegraph(spark):
    """The fourth conversion path: OTLP profile payload → flat rows →
    flamegraph, end to end."""
    import json

    from signaldb_spark.sources.otlp import flatten_otlp_profiles

    payload = json.dumps({
        "resourceProfiles": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "api"}}]},
            "scopeProfiles": [{
                "profiles": [{
                    "profileId": "ab" * 16,
                    "timeUnixNano": "1704067200000000000",
                    "durationNano": "10000000000",
                    "sampleTypeType": "cpu", "sampleTypeUnit": "nanoseconds",
                    "period": "10000000",
                    "stacktraces": [["main", "serve", "db"], ["main", "gc"]],
                    "samples": [{"stacktraceIdx": 0, "value": 70},
                                 {"stacktraceIdx": 1, "value": 30}],
                    "attributes": [], "traceId": "cd" * 16, "spanId": "ef" * 8,
                }]
            }]
        }]
    })
    raw = spark.createDataFrame([(payload,)], "value string")
    rows = flatten_otlp_profiles(raw).collect()
    assert len(rows) == 1 and rows[0].service_name == "api"
    assert rows[0].profile_id == "ab" * 16 and rows[0].period == 10000000
    fg = {r.path: r.value for r in flamegraph(flatten_otlp_profiles(raw)).collect()}
    assert fg["main"] == 100 and fg["main;serve;db"] == 70 and fg["main;gc"] == 30


def test_flamegraph_truncate_rollup_invariant(spark):
    """After truncation every kept parent still satisfies
    value == value_self + Σ children (kept + other)."""
    from pyspark.sql import functions as F

    from signaldb_spark.operators.profiles import flamegraph_self, flamegraph_truncate

    rows = []
    for i in range(6):
        stacks = [["root", f"f{i}", f"g{i}"], ["root", f"f{i}"]]
        samples = [
            {"stacktrace_idx": 0, "value": 10 + i},
            {"stacktrace_idx": 1, "value": 3},
        ]
        import json

        rows.append((json.dumps(stacks), json.dumps(samples)))
    profiles = spark.createDataFrame(
        rows, "stacktraces_json string, samples_json string"
    )
    fg = flamegraph_self(profiles)
    cut = flamegraph_truncate(fg, 7)
    got = cut.collect()
    assert len(got) <= 7 + 7  # kept + at most one other per kept node
    by_path = {r.path: r for r in got}
    # prefix closure: every kept path's parent is present
    for p in by_path:
        if ";" in p:
            parent = p.rsplit(";", 1)[0]
            assert parent in by_path, f"orphan {p}"
    # roll-up: value == value_self + sum(children values)
    for p, r in by_path.items():
        kids = [c for c in by_path.values() if c.path.rsplit(";", 1)[0] == p and c.path != p]
        if kids:
            assert r.value == r.value_self + sum(k.value for k in kids), p


def test_pprof_wire_roundtrip_to_flamegraph(spark):
    """pprof protobuf wire → decode → flamegraph_self, end to end with
    no pprof/protobuf library. Samples are encoded leaf-first with
    packed location/value lists (as real pprof emits); the decoder
    reverses to root-first stacks."""
    import gzip

    from signaldb_spark.operators.profiles import flamegraph_self
    from signaldb_spark.sources.pprof import (
        decode_pprof_profiles,
        encode_pprof,
        parse_pprof,
    )

    profile = {
        "sample_types": [{"type": "cpu", "unit": "nanoseconds"}],
        "stacktraces": [["main", "work", "hot"], ["main", "work"], ["main"]],
        "samples": [
            {"stacktrace_idx": 0, "value": 70},
            {"stacktrace_idx": 1, "value": 20},
            {"stacktrace_idx": 2, "value": 10},
            {"stacktrace_idx": 0, "value": 5},
        ],
    }
    wire = encode_pprof(profile)
    decoded = parse_pprof(wire)
    assert decoded["stacktraces"][0] == ["main", "work", "hot"]
    assert decoded["sample_types"] == [{"type": "cpu", "unit": "nanoseconds"}]
    assert [s["value"] for s in decoded["samples"]] == [70, 20, 10, 5]

    raw = spark.createDataFrame(
        [(bytearray(gzip.compress(wire)),)], "payload binary"
    )
    fg = flamegraph_self(decode_pprof_profiles(raw))
    rows = {r.path: r for r in fg.collect()}
    assert rows["main"].value == 105 and rows["main"].value_self == 10
    assert rows["main;work"].value == 95 and rows["main;work"].value_self == 20
    assert rows["main;work;hot"].value == 75 and rows["main;work;hot"].value_self == 75
