"""Unified field-discovery surface (the reference's
query-field-discovery proposal): sources / fields / values /
cardinality through the façade's `describe` endpoint, metadata
envelope, bounded sampling, predicate-scoped value suggestions."""

from __future__ import annotations

import pytest

from signaldb_spark.api import SignalDBAPI


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    from signaldb_spark.testing import write_signal_tables

    base = str(tmp_path_factory.mktemp("discovery_base"))
    write_signal_tables(spark, base)
    return SignalDBAPI(spark, base, "acme", "prod")


def test_describe_sources(api):
    out = api.query_describe({"describe": "sources"})
    assert out["status"] == "success"
    assert out["data"]["resultType"] == "metadata"
    rows = {r["source"]: r["available"] for r in out["data"]["result"]}
    assert rows["logs"] is True and rows["traces"] is True
    # profiles table exists in the fixture; a never-written source
    # would read False — availability is a catalog lookup, not a scan
    assert "metrics_gauge" in rows


def test_describe_fields_columns_and_detected_attributes(api):
    out = api.query_describe({"describe": "fields", "from": "logs"})
    assert out["status"] == "success"
    fields = {f["field"]: f for f in out["data"]["result"]}
    # materialized columns, typed from the physical schema
    assert fields["service_name"] == {
        "field": "service_name", "type": "string", "origin": "column"}
    assert fields["severity_number"]["type"] == "int"
    assert fields["timestamp"]["type"] == "timestamp"
    # attribute keys DETECTED from the bounded sample, origin-tagged —
    # promoted and unpromoted present uniformly
    for k in ("status", "duration_ms", "env"):
        assert fields[k]["origin"] == "attribute", k
    # the physical attribute-map columns never leak as fields
    assert "log_attributes" not in fields


def test_describe_fields_uses_type_authority(api):
    from signaldb_spark.schemas.anyvalue import AttributeTypeRegistry

    reg = AttributeTypeRegistry(config={"status": "int",
                                        "duration_ms": "double"})
    out = api.query_describe({"describe": "fields", "from": "logs"},
                             attr_registry=reg)
    fields = {f["field"]: f for f in out["data"]["result"]}
    assert fields["status"]["type"] == "int"
    assert fields["duration_ms"]["type"] == "double"
    assert fields["env"]["type"] == "string"


def test_describe_values_scoped_and_capped(api):
    rng = {"from": "2024-01-01T00:00:00Z", "to": "2024-12-31T00:00:00Z"}
    out = api.query_describe({
        "describe": "values", "from": "logs", "field": "env", "range": rng,
    })
    assert out["status"] == "success"
    vals = {r["value"]: r["count"] for r in out["data"]["result"]}
    assert set(vals) == {"prod", "staging"} and all(v > 0 for v in vals.values())
    # predicate-scoped: "given these filters so far, what can I add
    # next" — error-severity rows only
    scoped = api.query_describe({
        "describe": "values", "from": "logs", "field": "env", "range": rng,
        "where": {"field": "severity_text", "op": "eq", "value": "error"},
    })
    svals = {r["value"]: r["count"] for r in scoped["data"]["result"]}
    assert sum(svals.values()) < sum(vals.values())
    # cap respected with deterministic (count desc, value asc) order
    capped = api.query_describe({
        "describe": "values", "from": "logs", "field": "status",
        "range": rng, "limit": 2,
    })
    rows = capped["data"]["result"]
    assert len(rows) == 2
    assert rows[0]["count"] >= rows[1]["count"]
    assert rows[0]["value"] == "200"  # 3x weighted in the fixture


def test_describe_cardinality_hints(api):
    out = api.query_describe({
        "describe": "cardinality", "from": "logs",
        "fields": ["service_name", "env", "trace_id"],
    })
    hints = {h["field"]: h["approx_distinct"] for h in out["data"]["result"]}
    assert 1 <= hints["env"] <= 3          # two values
    assert hints["service_name"] <= 10     # bounded vocabulary
    assert hints["trace_id"] > 100         # id-like: high cardinality


def test_describe_error_paths(api):
    out = api.query_describe({"describe": "fields", "from": "nope"})
    assert out["status"] == "error" and out["errorType"] == "not_found"
    out = api.query_describe({"describe": "teapot", "from": "logs"})
    assert out["status"] == "error" and "unknown describe mode" in out["error"]
    out = api.query_describe({"describe": "values", "from": "logs"})
    assert out["status"] == "error" and "needs a 'field'" in out["error"]
    out = api.query_describe({
        "describe": "values", "from": "logs", "field": "env",
        "where": {"field": "env", "op": "explode"},
    })
    assert out["status"] == "error" and out["errorType"] == "bad_data"
