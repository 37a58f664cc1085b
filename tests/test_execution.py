"""Query-execution contract (execution.py): deadline cancellation that
actually stops the work, per-tenant fair pools and bounded concurrency,
and incremental result delivery — the querier-execution-model parity."""

from __future__ import annotations

import threading
import time

import pytest

from signaldb_spark.execution import (
    FairQueryRunner,
    QueryDeadlineExceeded,
    TenantOverConcurrency,
    stream_rows,
)


def test_deadline_cancels_server_side(spark):
    runner = FairQueryRunner(spark, default_timeout_s=2.0)

    def heavy():
        # ~10^10-row crossJoin count: far beyond the 2s budget
        return spark.range(100_000).crossJoin(spark.range(100_000)).count()

    t0 = time.time()
    with pytest.raises(QueryDeadlineExceeded) as ei:
        runner.run("acme", heavy)
    elapsed = time.time() - t0
    assert ei.value.tenant == "acme" and ei.value.seconds == 2.0
    # the deadline fired on budget (not after the query finished), and
    # the cancel unwound promptly — CPU is not still burning
    assert elapsed < 20


def test_fast_query_returns_value_and_pool_is_tenant_scoped(spark):
    runner = FairQueryRunner(spark, default_timeout_s=30.0)

    def thunk():
        pool = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        return pool, spark.range(10).count()

    pool, n = runner.run("tenant-a", thunk)
    assert pool == "tenant-a" and n == 10
    # the calling thread's properties are untouched (thread-local)
    assert spark.sparkContext.getLocalProperty("spark.scheduler.pool") in (None, "")


def test_bounded_per_tenant_concurrency(spark):
    runner = FairQueryRunner(spark, max_concurrent_per_tenant=1,
                             default_timeout_s=30.0)
    release = threading.Event()
    started = threading.Event()

    def slow():
        started.set()
        release.wait(20)
        return 1

    holder: list = []
    t = threading.Thread(
        target=lambda: holder.append(runner.run("acme", slow)), daemon=True
    )
    t.start()
    assert started.wait(10)
    # same tenant at the limit: attributable, immediate rejection
    with pytest.raises(TenantOverConcurrency):
        runner.run("acme", lambda: 2)
    # a DIFFERENT tenant is not head-of-line blocked
    assert runner.run("other", lambda: 3) == 3
    release.set()
    t.join(20)
    assert holder == [1]
    # the slot is free again
    assert runner.run("acme", lambda: 4) == 4


def test_slow_to_cancel_worker_keeps_holding_its_slot(spark):
    """The WORKER owns the concurrency slot: when a cancelled query
    outlives the cancel grace, the tenant's slot stays held until the
    worker actually dies — the bound is a real bound, not one the
    deadline path can leak past (ADVICE round 5)."""
    runner = FairQueryRunner(spark, max_concurrent_per_tenant=1,
                             default_timeout_s=0.2, cancel_grace_s=0.1)
    done = threading.Event()

    def stubborn():
        # pure-Python sleep: cancelJobGroup cannot interrupt it, so the
        # worker outlives the grace join — the slow-to-cancel case
        time.sleep(1.5)
        done.set()
        return 1

    with pytest.raises(QueryDeadlineExceeded):
        runner.run("acme", stubborn)
    # the worker thread is still alive past the grace: the slot is HELD
    assert not done.is_set()
    with pytest.raises(TenantOverConcurrency):
        runner.run("acme", lambda: 2)
    # once the worker finally unwinds, its finally releases the slot
    assert done.wait(10)
    time.sleep(0.1)
    assert runner.run("acme", lambda: 3) == 3


def test_wedged_worker_slot_is_force_reclaimed(spark):
    """A thunk that never unwinds (cancelJobGroup cannot interrupt
    non-Spark Python) must not zero the tenant's concurrency forever:
    after slot_reclaim_s the watchdog force-releases the slot —
    bounded, documented over-concurrency instead of a permanent
    lockout (round-6 self-review finding)."""
    runner = FairQueryRunner(spark, max_concurrent_per_tenant=1,
                             default_timeout_s=0.2, cancel_grace_s=0.1,
                             slot_reclaim_s=0.5)

    def wedged():
        time.sleep(30)  # far beyond reclaim; thread outlives the test
        return 1

    with pytest.raises(QueryDeadlineExceeded):
        runner.run("acme", wedged)
    # immediately after the deadline the slot is still held
    with pytest.raises(TenantOverConcurrency):
        runner.run("acme", lambda: 2)
    # ... but the watchdog reclaims it after slot_reclaim_s
    time.sleep(0.8)
    assert runner.run("acme", lambda: 3) == 3
    # and when the wedged worker EVENTUALLY dies, release_once keeps the
    # semaphore balanced (BoundedSemaphore would raise on double release
    # — later runs still work)
    assert runner.run("acme", lambda: 4) == 4


def test_errors_propagate_attributably(spark):
    runner = FairQueryRunner(spark, default_timeout_s=10.0)

    def boom():
        raise ValueError("bad query")

    with pytest.raises(ValueError, match="bad query"):
        runner.run("acme", boom)


def test_stream_rows_incremental(spark):
    df = spark.range(1000).repartition(8)
    it = stream_rows(df)
    first = next(it)
    assert set(first) == {"id"}
    rest = sum(1 for _ in it)
    assert rest == 999
