"""Per-tenant token-bucket rate limiting (reference
src/common/src/ratelimit.rs semantics): refill arithmetic, per-tenant
isolation, override-beats-default, and the enforcement points — ingest
micro-batch rejection with checkpoint retry, FairQueryRunner admission,
and the façade's too_many_requests envelope."""

from __future__ import annotations

import json

import pytest

from signaldb_spark.ratelimit import RateLimitExceeded, TenantRateLimiter


# ------------------------------------------------------------- unit layer
# Deterministic clock: every check passes an explicit `now` (the
# reference's injectable-Instant seam).


def test_unlimited_by_default():
    limiter = TenantRateLimiter()
    for _ in range(10_000):
        limiter.check_ingest("acme", 1_000_000, now=0.0)
    limiter.check_query("acme", now=0.0)


def test_query_rate_is_enforced_and_refills():
    limiter = TenantRateLimiter(
        {"max_query_requests_per_sec": 4, "burst_seconds": 1.0}
    )
    for _ in range(4):
        limiter.check_query("acme", now=0.0)
    with pytest.raises(RateLimitExceeded) as e:
        limiter.check_query("acme", now=0.0)
    assert e.value.kind == "query_requests" and e.value.tenant_id == "acme"
    assert "query request rate" in str(e.value)
    # half a second refills two tokens
    for _ in range(2):
        limiter.check_query("acme", now=0.5)
    with pytest.raises(RateLimitExceeded):
        limiter.check_query("acme", now=0.5)


def test_query_rate_unlimited_when_unset_even_with_ingest_limits():
    limiter = TenantRateLimiter(
        {"max_ingest_requests_per_sec": 1, "burst_seconds": 1.0}
    )
    limiter.check_ingest("acme", 0, now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, now=0.0)
    for _ in range(1_000):
        limiter.check_query("acme", now=0.0)


def test_query_and_ingest_budgets_are_independent():
    limiter = TenantRateLimiter(
        {
            "max_ingest_requests_per_sec": 2,
            "max_query_requests_per_sec": 2,
            "burst_seconds": 1.0,
        }
    )
    limiter.check_query("acme", now=0.0)
    limiter.check_query("acme", now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_query("acme", now=0.0)
    # the exhausted query budget must not consume ingest tokens
    limiter.check_ingest("acme", 0, now=0.0)
    limiter.check_ingest("acme", 0, now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, now=0.0)


def test_request_rate_is_enforced_and_refills():
    limiter = TenantRateLimiter(
        {"max_ingest_requests_per_sec": 10, "burst_seconds": 1.0}
    )
    for _ in range(10):
        limiter.check_ingest("acme", 0, now=0.0)
    with pytest.raises(RateLimitExceeded) as e:
        limiter.check_ingest("acme", 0, now=0.0)
    assert e.value.kind == "requests"
    # half a second refills five tokens
    for _ in range(5):
        limiter.check_ingest("acme", 0, now=0.5)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, now=0.5)


def test_byte_rate_is_enforced():
    limiter = TenantRateLimiter(
        {"max_ingest_bytes_per_sec": 1_000, "burst_seconds": 1.0}
    )
    limiter.check_ingest("acme", 900, now=0.0)
    with pytest.raises(RateLimitExceeded) as e:
        limiter.check_ingest("acme", 200, now=0.0)
    assert e.value.kind == "bytes"
    assert "ingest byte rate" in str(e.value)


def test_tenants_have_independent_budgets():
    limiter = TenantRateLimiter(
        {"max_ingest_requests_per_sec": 1, "burst_seconds": 1.0}
    )
    limiter.check_ingest("acme", 0, now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, now=0.0)
    # a different tenant still has its own budget
    limiter.check_ingest("globex", 0, now=0.0)


def test_per_tenant_override_beats_default():
    limiter = TenantRateLimiter(
        {"max_ingest_requests_per_sec": 1, "burst_seconds": 1.0},
        {"vip": {"max_ingest_requests_per_sec": 100, "burst_seconds": 1.0}},
    )
    for _ in range(100):
        limiter.check_ingest("vip", 0, now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("vip", 0, now=0.0)
    # non-override tenants use the default
    limiter.check_ingest("acme", 0, now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, now=0.0)


def test_burst_default_and_floor():
    # default burst_seconds is 2.0: a fresh bucket holds 2s of budget
    limiter = TenantRateLimiter({"max_query_requests_per_sec": 5})
    for _ in range(10):
        limiter.check_query("acme", now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_query("acme", now=0.0)
    # burst_seconds below 1.0 is floored to 1.0 (ratelimit.rs .max(1.0))
    low = TenantRateLimiter(
        {"max_query_requests_per_sec": 3, "burst_seconds": 0.1}
    )
    for _ in range(3):
        low.check_query("acme", now=0.0)
    with pytest.raises(RateLimitExceeded):
        low.check_query("acme", now=0.0)


def test_tokens_cap_at_burst():
    limiter = TenantRateLimiter(
        {"max_ingest_requests_per_sec": 2, "burst_seconds": 1.0}
    )
    limiter.check_ingest("acme", 0, now=0.0)
    limiter.check_ingest("acme", 0, now=0.0)
    # a long idle period refills to burst (2), never beyond
    limiter.check_ingest("acme", 0, now=100.0)
    limiter.check_ingest("acme", 0, now=100.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, now=100.0)


def test_micro_batch_requests_charge_atomically():
    """k payloads in one micro-batch cost k request tokens in one call."""
    limiter = TenantRateLimiter(
        {"max_ingest_requests_per_sec": 10, "burst_seconds": 1.0}
    )
    limiter.check_ingest("acme", 0, requests=8, now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, requests=3, now=0.0)
    limiter.check_ingest("acme", 0, requests=2, now=0.0)


def test_clamp_to_capacity_admits_oversized_batch():
    """A batch priced above rate×burst can never pass an unclamped
    check (refill caps at burst) — the permanent-stall shape. With
    clamp_to_capacity the oversized batch waits for a FULL bucket,
    drains it, and is admitted, so the ingest drain stays live."""
    limiter = TenantRateLimiter(
        {"max_ingest_requests_per_sec": 4, "burst_seconds": 1.0}
    )
    # unclamped: 16 requests > capacity 4 → rejected even on a full
    # bucket, and forever after no matter how long the refill runs
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, requests=16, now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, requests=16, now=1_000.0)
    # clamped: the same batch charges at capacity and commits
    limiter.check_ingest("acme", 0, requests=16, now=2_000.0,
                         clamp_to_capacity=True)
    # ...and it really drained the whole bucket: the next request is
    # rejected until tokens refill
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, now=2_000.0)
    limiter.check_ingest("acme", 0, now=2_000.25)  # 0.25s = 1 token
    # a partially-full bucket still rejects the oversized batch — the
    # clamp is capacity, not current tokens, so the long-run rate holds
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 0, requests=16, now=2_000.3,
                             clamp_to_capacity=True)


def test_clamp_applies_to_byte_dimension_too():
    limiter = TenantRateLimiter(
        {"max_ingest_bytes_per_sec": 1_000, "burst_seconds": 1.0}
    )
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 50_000, now=0.0)
    limiter.check_ingest("acme", 50_000, now=10.0, clamp_to_capacity=True)
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("acme", 1, now=10.0)


def test_from_admin_builds_overrides(tmp_path):
    from signaldb_spark.admin import TenantCatalog

    store = TenantCatalog(str(tmp_path))
    store.create_tenant("acme", "Acme")
    store.create_tenant("vip", "VIP")
    store.set_tenant_limits("vip", max_query_requests_per_sec=100,
                            burst_seconds=1.0)
    # non-rate limits alone must NOT create an override (the tenant
    # keeps the defaults for its rates)
    store.set_tenant_limits("acme", max_datasets=3)
    limiter = TenantRateLimiter.from_admin(
        store, {"max_query_requests_per_sec": 1, "burst_seconds": 1.0}
    )
    assert "vip" in limiter.overrides and "acme" not in limiter.overrides
    limiter.check_query("acme", now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_query("acme", now=0.0)
    for _ in range(100):
        limiter.check_query("vip", now=0.0)


def test_from_admin_burst_only_tenant_keeps_default_rates(tmp_path):
    """Tuning burst_seconds ALONE must not become a wholesale override
    (that would silently lift every default limit for the tenant): the
    burst tune is merged onto the defaults instead."""
    from signaldb_spark.admin import TenantCatalog

    store = TenantCatalog(str(tmp_path))
    store.create_tenant("bursty", "Bursty")
    store.set_tenant_limits("bursty", burst_seconds=3.0)
    limiter = TenantRateLimiter.from_admin(
        store, {"max_query_requests_per_sec": 2, "burst_seconds": 1.0}
    )
    # the default RATE still applies — 2/s — but with the tenant's own
    # 3s burst: a fresh bucket holds 6 tokens, not 2, and not infinity
    for _ in range(6):
        limiter.check_query("bursty", now=0.0)
    with pytest.raises(RateLimitExceeded):
        limiter.check_query("bursty", now=0.0)
    # with NO defaults, the burst tune is still RECORDED (never
    # silently dropped) but carries no rate keys, so the tenant stays
    # unlimited exactly like the defaults
    bare = TenantRateLimiter.from_admin(store)
    assert bare.overrides == {"bursty": {"burst_seconds": 3.0}}
    for _ in range(1000):
        bare.check_query("bursty", now=0.0)


def test_from_admin_partial_rate_override_keeps_default_ingest(tmp_path):
    """A tenant tuning ONE rate key must keep the defaults for the
    others: overrides replace defaults wholesale at runtime, so
    from_admin merges the partial set onto a copy of the defaults —
    otherwise lifting the query rate would silently lift the ingest
    limits too."""
    from signaldb_spark.admin import TenantCatalog

    store = TenantCatalog(str(tmp_path))
    store.create_tenant("q", "Q")
    store.set_tenant_limits("q", max_query_requests_per_sec=100)
    limiter = TenantRateLimiter.from_admin(
        store, {"max_query_requests_per_sec": 1,
                "max_ingest_requests_per_sec": 1,
                "burst_seconds": 1.0}
    )
    for _ in range(100):
        limiter.check_query("q", now=0.0)  # tuned key lifted
    limiter.check_ingest("q", 0, now=0.0)  # default ingest limit kept
    with pytest.raises(RateLimitExceeded):
        limiter.check_ingest("q", 0, now=0.0)


def test_admin_validates_rate_limits(tmp_path):
    """Fractional rates survive as floats (0.5 req/s is a slow rate,
    not a zero-capacity bucket); zero/negative rates are rejected."""
    from signaldb_spark.admin import AdminError, TenantCatalog

    store = TenantCatalog(str(tmp_path))
    store.create_tenant("t", "T")
    store.set_tenant_limits("t", max_query_requests_per_sec=0.5,
                            burst_seconds=2.0)
    assert store.limits_for("t")["max_query_requests_per_sec"] == 0.5
    limiter = TenantRateLimiter.from_admin(store)
    limiter.check_query("t", now=0.0)  # burst = 0.5*2 = 1 token
    with pytest.raises(RateLimitExceeded):
        limiter.check_query("t", now=0.0)
    limiter.check_query("t", now=2.0)  # 2s refills one token at 0.5/s
    for bad in (0, -1, -0.5):
        with pytest.raises(AdminError):
            store.set_tenant_limits("t", max_ingest_requests_per_sec=bad)
        with pytest.raises(AdminError):
            store.set_tenant_limits("t", burst_seconds=bad)
    with pytest.raises(AdminError):
        store.set_tenant_limits("t", max_datasets=-1)
    # non-numeric values surface as validation_error, never a raw
    # TypeError/ValueError out of the coercion
    for bad in ("fast", [1], {"x": 1}):
        with pytest.raises(AdminError) as ei:
            store.set_tenant_limits("t", max_ingest_requests_per_sec=bad)
        assert ei.value.code == "validation_error"
        with pytest.raises(AdminError) as ei:
            store.set_tenant_limits("t", max_datasets=bad)
        assert ei.value.code == "validation_error"


# ------------------------------------------------- enforcement points


def test_runner_admission_charges_query_token(spark):
    """FairQueryRunner.run rejects at admission — before the concurrency
    slot — and the rejection does not burn a slot."""
    from signaldb_spark.execution import FairQueryRunner

    limiter = TenantRateLimiter(
        {"max_query_requests_per_sec": 2, "burst_seconds": 1.0}
    )
    runner = FairQueryRunner(spark, max_concurrent_per_tenant=1,
                             rate_limiter=limiter)
    assert runner.run("acme", lambda: 1) == 1
    assert runner.run("acme", lambda: 2) == 2
    with pytest.raises(RateLimitExceeded):
        runner.run("acme", lambda: 3)
    # another tenant is unaffected (per-tenant buckets)
    assert runner.run("globex", lambda: 4) == 4
    # the rejected call held no slot: the semaphore is still at full
    # capacity (a second acquire would raise TenantOverConcurrency if
    # the failed run leaked its slot)
    assert runner._sem("acme")._value == 1


def test_facade_maps_rate_limit_to_too_many_requests(spark, tmp_path):
    """The guarded façade surfaces the limiter rejection as the 429
    envelope (router query_rate_layer, src/router/src/lib.rs:131-135)."""
    from signaldb_spark.api import SignalDBAPI
    from signaldb_spark.execution import FairQueryRunner

    limiter = TenantRateLimiter(
        {"max_query_requests_per_sec": 1, "burst_seconds": 1.0}
    )
    runner = FairQueryRunner(spark, rate_limiter=limiter)
    api = SignalDBAPI(spark, str(tmp_path), "acme", "prod", runner=runner)
    assert api._guarded(lambda: {"status": "success"})["status"] == "success"
    out = api._guarded(lambda: {"status": "success"})
    assert out["status"] == "error"
    assert out["errorType"] == "too_many_requests"
    assert "acme" in out["error"] and "query request rate" in out["error"]


def test_ingest_stream_rejected_then_retries(spark, tmp_path):
    """A rate-limited micro-batch fails the drain WITHOUT advancing the
    checkpoint; re-running once the budget refills commits the same
    batch exactly once — the 429-retry contract."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from signaldb_spark.catalog import optional_table
    from signaldb_spark.streaming.ingest import ingest_otlp_logs_stream

    src = tmp_path / "src"
    src.mkdir()
    base = str(tmp_path / "base")
    payload = json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {"attributes": [
                        {"key": "service.name", "value": {"stringValue": "api"}}
                    ]},
                    "scopeLogs": [
                        {
                            "scope": {"name": "t", "version": "1"},
                            "logRecords": [
                                {
                                    "timeUnixNano": "1704067200000000000",
                                    "observedTimeUnixNano": "1704067200000000000",
                                    "severityText": "INFO",
                                    "severityNumber": 9,
                                    "body": {"stringValue": "hello"},
                                    "attributes": [],
                                    "traceId": "ab" * 16,
                                    "spanId": "cd" * 8,
                                }
                            ],
                        }
                    ],
                }
            ]
        }
    )
    (src / "a.jsonl").write_text(payload)

    class Exhausted:
        """Limiter double with no budget, then unlimited."""

        def __init__(self):
            self.open = False

        def check_ingest(self, tenant, n_bytes, requests=1, now=None,
                         clamp_to_capacity=False):
            if not self.open:
                raise RateLimitExceeded(tenant, "bytes")

    limiter = Exhausted()
    with pytest.raises(StreamingQueryException) as e:
        ingest_otlp_logs_stream(spark, str(src), base, rate_limiter=limiter)
    assert "ingest byte rate" in str(e.value)
    assert optional_table(spark, base, "acme", "prod", "logs") is None
    # budget refilled: the SAME checkpoint retries the batch and commits
    limiter.open = True
    ingest_otlp_logs_stream(spark, str(src), base, rate_limiter=limiter)
    logs = optional_table(spark, base, "acme", "prod", "logs")
    assert logs is not None and logs.count() == 1
