"""Per-tenant token-bucket rate limiting.

Behavior parity with the reference's `TenantRateLimiter`
(src/common/src/ratelimit.rs): rate×burst token buckets keyed by tenant
id, three independent dimensions — ingest requests/sec, ingest
bytes/sec, query-API requests/sec — with limits coming from the global
defaults plus optional per-tenant overrides
(src/common/src/config/mod.rs:729-761 `TenantLimits`). Unset limits
mean unlimited, so deployments without limit configuration are
unaffected; `burst_seconds` (default 2.0, floor 1.0) controls how many
seconds' worth of budget a tenant may consume in a burst, and a fresh
bucket starts FULL (`tokens = burst`), matching the reference's
`TokenBucket::new`.

Enforcement points mirror the reference's:

- ingest (`check_ingest`): the OTLP / remote_write micro-batch sinks in
  streaming/ingest.py charge one request token per source payload plus
  the payload bytes before committing a batch, the Spark analog of the
  acceptor checking each HTTP body before decoding
  (src/acceptor/src/handler/prometheus_handler.rs:119-124,
  src/acceptor/src/services/otlp_log_service.rs:79-90). A rejected
  batch raises :class:`RateLimitExceeded` — the 429 analog — and the
  checkpoint does NOT advance, so the batch retries after backoff
  exactly like a 429'd remote_write client.
- query (`check_query`): `execution.FairQueryRunner.run` charges one
  query token at admission, before the concurrency slot — the router's
  query_rate_layer middleware position (src/router/src/lib.rs:122-138),
  which runs after auth and before the handler. The façade maps the
  rejection to the `too_many_requests` error envelope.

The check itself is one dict lookup plus a short per-tenant lock — no
Spark machinery, safe on any hot path. Buckets are created from the
tenant's limits on first use (limits snapshotted at creation, matching
the reference's `or_insert_with`).
"""

from __future__ import annotations

import threading
import time

# Limit keys understood by the limiter (config TenantLimits fields).
RATE_LIMIT_KEYS = (
    "max_ingest_requests_per_sec",
    "max_ingest_bytes_per_sec",
    "max_query_requests_per_sec",
    "burst_seconds",
)

DEFAULT_BURST_SECONDS = 2.0


class RateLimitExceeded(Exception):
    """A tenant exceeded one of its rate budgets (HTTP 429 analog).

    ``kind`` is one of ``"requests"``, ``"bytes"``,
    ``"query_requests"`` — the dimension that rejected the request
    (ratelimit.rs `RateLimitKind`)."""

    _WHAT = {
        "requests": "request rate",
        "bytes": "ingest byte rate",
        "query_requests": "query request rate",
    }

    def __init__(self, tenant_id: str, kind: str):
        self.tenant_id = tenant_id
        self.kind = kind
        super().__init__(
            f"tenant '{tenant_id}' exceeded its {self._WHAT[kind]} limit; "
            "retry later or raise the tenant's limits"
        )


class _TokenBucket:
    """``rate`` tokens/second, holding at most ``burst`` tokens; starts
    full. Refill-then-take, no partial acquisition."""

    __slots__ = ("rate", "burst", "tokens", "last_refill")

    def __init__(self, rate: float, burst: float, now: float):
        self.rate = float(rate)
        self.burst = float(burst)
        self.tokens = float(burst)
        self.last_refill = now

    def try_acquire(self, cost: float, now: float,
                    clamp: bool = False) -> bool:
        if clamp:
            # A cost above the bucket's full capacity could NEVER be
            # admitted (refill caps at burst), so callers that must make
            # progress — the micro-batch ingest sinks, whose retry loop
            # re-presents the identical batch forever — charge it AT
            # capacity: the oversized item waits for a completely full
            # bucket, drains it, and is admitted. Liveness over
            # precision; the per-HTTP-request reference never hits this
            # because remote_write clients chunk their bodies.
            cost = min(cost, self.burst)
        elapsed = max(0.0, now - self.last_refill)
        self.tokens = min(self.tokens + elapsed * self.rate, self.burst)
        self.last_refill = now
        if self.tokens >= cost:
            self.tokens -= cost
            return True
        return False


class _TenantBuckets:
    """Buckets for one tenant; ``None`` means that dimension is
    unlimited. One lock per tenant so tenants never contend."""

    __slots__ = ("lock", "requests", "bytes", "query_requests")

    def __init__(self, limits: dict, now: float):
        self.lock = threading.Lock()
        burst_secs = max(1.0, float(limits.get("burst_seconds") or DEFAULT_BURST_SECONDS))

        def bucket(key):
            rate = limits.get(key)
            if rate is None:
                return None
            rate = float(rate)
            return _TokenBucket(rate, rate * burst_secs, now)

        self.requests = bucket("max_ingest_requests_per_sec")
        self.bytes = bucket("max_ingest_bytes_per_sec")
        self.query_requests = bucket("max_query_requests_per_sec")


class TenantRateLimiter:
    """Per-tenant ingest + query rate limiter.

    ``defaults`` and each override are plain dicts with any of the
    :data:`RATE_LIMIT_KEYS`; a tenant listed in ``overrides`` uses its
    override INSTEAD of the defaults (not merged — ratelimit.rs
    `limits_for` returns one or the other), so a VIP override lifting
    one limit also lifts unlisted ones unless restated.

    ``now`` arguments take a monotonic-seconds float for deterministic
    tests (the reference's injectable-`Instant` seam); production calls
    omit it and get ``time.monotonic()``.
    """

    def __init__(self, defaults: dict | None = None,
                 overrides: dict[str, dict] | None = None):
        self.defaults = dict(defaults or {})
        self.overrides = {k: dict(v) for k, v in (overrides or {}).items()}
        self._buckets: dict[str, _TenantBuckets] = {}
        self._lock = threading.Lock()

    @classmethod
    def from_admin(cls, store, defaults: dict | None = None) -> "TenantRateLimiter":
        """Build from an :class:`admin.TenantCatalog`:
        every tenant with at least one :data:`RATE_LIMIT_KEYS` entry in
        its stored limits gets an override (the `[[auth.tenants]].limits`
        analog). Because runtime ``limits_for`` returns override OR
        defaults wholesale (ratelimit.rs `limits_for`), EVERY partial
        tune — one rate key, or only ``burst_seconds`` — is merged onto
        a copy of the defaults here; a wholesale replacement would
        silently lift the tenant's unlisted default limits."""
        overrides = {}
        for t in store.list_tenants():
            lim = t.get("limits") or {}
            rates = {k: lim[k] for k in RATE_LIMIT_KEYS if k in lim}
            if rates:
                overrides[t["id"]] = {**(defaults or {}), **rates}
        return cls(defaults, overrides)

    def limits_for(self, tenant_id: str) -> dict:
        return self.overrides.get(tenant_id, self.defaults)

    def _bucket_entry(self, tenant_id: str, now: float) -> _TenantBuckets:
        with self._lock:
            entry = self._buckets.get(tenant_id)
            if entry is None:
                entry = _TenantBuckets(self.limits_for(tenant_id), now)
                self._buckets[tenant_id] = entry
            return entry

    def check_ingest(self, tenant_id: str, n_bytes: int,
                     requests: int = 1, now: float | None = None,
                     clamp_to_capacity: bool = False) -> None:
        """Charge ``requests`` ingest requests totalling ``n_bytes``
        payload bytes, raising :class:`RateLimitExceeded` if either the
        request-rate or byte-rate budget is exhausted. ``requests``
        covers the micro-batch case — k source files in one batch are k
        acceptor requests, charged atomically. Request tokens spent
        before a byte-rate rejection stay spent (the reference charges
        the dimensions sequentially too).

        ``clamp_to_capacity=True`` caps each dimension's cost at its
        bucket's full capacity, guaranteeing a batch whose cost exceeds
        ``rate × burst_seconds`` is still eventually admissible (after a
        full refill) instead of 429-retrying the identical batch
        forever. The streaming sinks pass it; deployments should still
        size ``burst_seconds`` so ``rate × burst ≥`` the max batch cost
        (e.g. request rate × burst ≥ maxFilesPerTrigger) to keep the
        clamp inactive in normal operation."""
        limits = self.limits_for(tenant_id)
        if (limits.get("max_ingest_requests_per_sec") is None
                and limits.get("max_ingest_bytes_per_sec") is None):
            return
        if now is None:
            now = time.monotonic()
        entry = self._bucket_entry(tenant_id, now)
        with entry.lock:
            if entry.requests is not None and not entry.requests.try_acquire(
                    float(requests), now, clamp=clamp_to_capacity):
                raise RateLimitExceeded(tenant_id, "requests")
            if entry.bytes is not None and not entry.bytes.try_acquire(
                    float(n_bytes), now, clamp=clamp_to_capacity):
                raise RateLimitExceeded(tenant_id, "bytes")

    def check_query(self, tenant_id: str, now: float | None = None) -> None:
        """Charge one query-API request, raising
        :class:`RateLimitExceeded` if the query budget is exhausted.
        The query bucket is independent of the ingest buckets."""
        limits = self.limits_for(tenant_id)
        if limits.get("max_query_requests_per_sec") is None:
            return
        if now is None:
            now = time.monotonic()
        entry = self._bucket_entry(tenant_id, now)
        with entry.lock:
            if not entry.query_requests.try_acquire(1.0, now):
                raise RateLimitExceeded(tenant_id, "query_requests")
