"""Endpoint façade e2e: every reference HTTP endpoint's dispatch runs
against the generated signal tables and returns the right envelope —
the "a reference user could switch" surface in one object."""

from __future__ import annotations

import pytest

from signaldb_spark.api import SignalDBAPI
from signaldb_spark.testing import write_signal_tables

START, END = "2024-01-01 00:00:00", "2024-01-01 04:00:00"


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("api_signals"))
    write_signal_tables(spark, base)
    return SignalDBAPI(spark, base, "acme", "prod")


def test_prom_query_range_matrix(api):
    out = api.prom_query_range(
        "sum by (service_name) (rate(http_requests_total[10m]))", START, END, 600
    )
    assert out["status"] == "success"
    assert out["data"]["resultType"] == "matrix" and out["data"]["result"]
    first = out["data"]["result"][0]
    assert "metric" in first and first["values"]


def test_prom_query_instant_vector(api):
    out = api.prom_query("process_cpu_usage", "2024-01-01 00:45:00", lookback_s=3600)
    assert out["status"] == "success"
    assert out["data"]["resultType"] == "vector" and out["data"]["result"]


def test_prom_query_error_envelope(api):
    out = api.prom_query_range("no_such_function(up[5m])", START, END, 600)
    assert out["status"] == "error" and out["error"]


def test_prom_discovery(api):
    labels = api.prom_labels(START, END)
    assert labels["status"] == "success" and "__name__" in labels["data"]
    values = api.prom_label_values("__name__", START, END)
    assert "process_cpu_usage" in values["data"]
    series = api.prom_series('{__name__="process_cpu_usage"}', START, END)
    assert series["status"] == "success" and series["data"]
    meta = api.prom_metadata()
    assert meta["data"]["process_cpu_usage"][0]["type"] == "gauge"
    assert meta["data"]["http_requests_total"][0]["type"] == "counter"


def test_loki_streams_and_matrix(api):
    streams = api.loki_query_range('{service_name="api"} |= "error"', START, END)
    assert streams["data"]["resultType"] == "streams"
    assert all(
        s["stream"]["service_name"] == "api" for s in streams["data"]["result"]
    )
    matrix = api.loki_query_range(
        'sum by (service_name) (count_over_time({service_name="api"}[1h]))',
        START, END, 3600,
    )
    assert matrix["data"]["resultType"] == "matrix" and matrix["data"]["result"]


def test_loki_instant_and_discovery(api):
    inst = api.loki_query(
        'sum(count_over_time({service_name="api"}[5m]))', END, lookback_s=3600
    )
    assert inst["data"]["resultType"] == "vector"
    labels = api.loki_labels()
    assert labels["status"] == "success" and labels["data"]
    series = api.loki_series()
    assert series["status"] == "success" and series["data"]


def test_tempo_trace_and_search(api, spark):
    found = api.tempo_search(tags="", limit=3)
    assert found["traces"]
    tid = found["traces"][0]["traceID"]
    trace = api.tempo_trace(tid)
    assert trace["traceID"] == tid and trace["spanCount"] >= 1 and trace["spans"]
    missing = api.tempo_trace("ffffffffffffffffffffffffffffffff")
    assert missing["status"] == "error"


def test_tempo_traceql_search_and_tags(api):
    out = api.tempo_search(q='{ duration >= 0ns }', limit=2, spss=1)
    assert out["traces"] and all(
        len(t["spanSet"]["spans"]) <= 1 for t in out["traces"]
    )
    tags = api.tempo_tags()
    assert "tagNames" in tags and tags["tagNames"]
    v2 = api.tempo_tags_v2()
    scopes = {s["name"] for s in v2["scopes"]}
    assert "intrinsic" in scopes
    vals = api.tempo_tag_values("service.name")
    assert vals["tagValues"]


def test_pyroscope_render_with_truncation(api):
    full = api.pyroscope_render()
    assert full["flamegraph"]
    cut = api.pyroscope_render(max_nodes=5)
    kept = [r for r in cut["flamegraph"] if r["frame"] != "other"]
    assert len(kept) <= 5


def test_ir_and_sql(api):
    ir = api.ir_query(
        {
            "version": 1,
            "from": "logs",
            "where": {"field": "service_name", "op": "eq", "value": "api"},
            "select": ["service_name", "body"],
            "limit": 5,
        }
    )
    assert ir["status"] == "success" and len(ir["data"]) == 5
    assert all(r["service_name"] == "api" for r in ir["data"])
    sql = api.sql("SELECT count(*) AS n FROM logs")
    assert sql["status"] == "success" and sql["data"][0]["n"] > 0
    bad = api.ir_query({"version": 99, "from": "logs"})
    assert bad["status"] == "error"
