"""Salted aggregation + tenant session tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from signaldb_spark.catalog import load_table
from signaldb_spark.operators.skew import salted_aggregate, salted_avg
from signaldb_spark.tenancy import TenantSession
from signaldb_spark.testing import write_signal_tables

SF = "/root/testdata/sf0.001"


def test_salted_count_matches_plain(spark):
    e = load_table(spark, SF, "events")
    plain = {
        (r.event_type): r.n
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r.event_type): r.value
        for r in salted_aggregate(e, ["event_type"], None, "count").collect()
    }
    assert salted == plain


def test_salted_sum_and_avg_match_plain(spark):
    e = load_table(spark, SF, "events")
    plain = {
        r.event_type: (round(r.s, 6), round(r.a, 6))
        for r in e.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.avg("value").alias("a"))
        .collect()
    }
    s = {
        r.event_type: round(r.value, 6)
        for r in salted_aggregate(e, ["event_type"], "value", "sum").collect()
    }
    a = {
        r.event_type: round(r.value, 6)
        for r in salted_avg(e, ["event_type"], "value").collect()
    }
    assert {k: v[0] for k, v in plain.items()} == s
    assert {k: v[1] for k, v in plain.items()} == a


def test_salted_spreads_hot_key(spark):
    """The phase-1 shuffle key must include the salt: a single hot key
    produces multiple partial rows."""
    e = load_table(spark, SF, "events")
    hot = e.withColumn("k", F.lit("hot"))
    salted = hot.withColumn("_salt", (F.rand(seed=42) * 16).cast("int"))
    partials = salted.groupBy("k", "_salt").count().count()
    assert partials > 4  # hot key spread over multiple salt buckets


@pytest.fixture(scope="module")
def tenant_base(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("tenants"))
    write_signal_tables(spark, base, tenant="acme", dataset="prod")
    return base


def test_tenant_session_views_and_cap(spark, tenant_base):
    ts = TenantSession(spark, tenant_base, "acme", "prod")
    assert ts.table("logs") is not None
    n = ts.sql("SELECT count(*) AS n FROM logs").collect()[0].n
    assert n == 2000
    qualified = ts.sql("SELECT count(*) AS n FROM acme_prod_logs").collect()[0].n
    assert qualified == n
    capped = ts.sql("SELECT * FROM logs", max_rows=10)
    assert capped.count() == 10


def test_missing_tenant_resolves_empty(spark, tenant_base):
    ts = TenantSession(spark, tenant_base, "ghost", "nowhere")
    assert ts.table("logs") is None


def test_no_cross_tenant_leak(spark, tmp_path_factory):
    """Two tenant sessions in one SparkSession: each sql() call resolves
    unqualified names to ITS OWN tenant, regardless of construction or
    call order (the register-once design leaked here)."""
    base = str(tmp_path_factory.mktemp("two_tenants"))
    write_signal_tables(spark, base, tenant="acme", dataset="prod")
    # globex gets a different row count by filtering
    from signaldb_spark.catalog import optional_table, signal_table_path

    acme_logs = optional_table(spark, base, "acme", "prod", "logs")
    acme_logs.filter("service_name = 'api'").write.mode("overwrite").partitionBy(
        "date_day", "hour"
    ).parquet(signal_table_path(base, "globex", "prod", "logs"))

    a = TenantSession(spark, base, "acme", "prod")
    g = TenantSession(spark, base, "globex", "prod")  # constructed after a
    n_a = a.sql("SELECT count(*) AS n FROM logs").collect()[0].n
    n_g = g.sql("SELECT count(*) AS n FROM logs").collect()[0].n
    assert n_a == 2000 and n_g < n_a
    # interleave again: a's view must re-pin to acme
    assert a.sql("SELECT count(*) AS n FROM logs").collect()[0].n == 2000
