"""Mechanics of tools/scale_probe.py at toy scale (factor=2, sf0.001).

The probe's *numbers* only mean something at sf0.1+ (per-job overhead
swamps toy runs), so this pins the machinery instead: replication
preserves row multiplicity, keys stay disjoint across copies, scaled
tables load through the catalog, and the summary shape is stable.
"""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from scale_probe import build_scaled, run_probe  # noqa: E402

from signaldb_spark.catalog import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("probe") / "x2")
    build_scaled(spark, SF, out, factor=2)
    return out


def test_replication_doubles_facts_and_keeps_keys_disjoint(spark, scaled_dir):
    for table, key in [
        ("lineitem", "l_orderkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        base = load_table(spark, SF, table)
        scaled = load_table(spark, scaled_dir, table)
        assert scaled.count() == 2 * base.count(), table
        if table != "lineitem":  # lineitem keys repeat per line number
            assert (
                scaled.select(key).distinct().count()
                == 2 * base.select(key).distinct().count()
            ), table


def test_dims_not_replicated(spark, scaled_dir):
    assert (
        load_table(spark, scaled_dir, "region").count()
        == load_table(spark, SF, "region").count()
    )


def test_join_fanout_preserved(spark, scaled_dir):
    """Every scaled order still finds its lineitems: the orderkey offset
    is applied consistently on both sides."""
    li = load_table(spark, scaled_dir, "lineitem")
    o = load_table(spark, scaled_dir, "orders")
    matched = o.join(li, o.o_orderkey == li.l_orderkey, "leftsemi").count()
    base_matched = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "leftsemi",
        )
        .count()
    )
    assert matched == 2 * base_matched


def test_documents_salted_against_degenerate_dup_groups(spark, scaled_dir):
    docs = load_table(spark, scaled_dir, "documents")
    assert docs.select("text").distinct().count() == docs.count() or (
        # base data may itself contain duplicate texts; the invariant is
        # that replication did not HALVE distinctness
        docs.select("text").distinct().count()
        > load_table(spark, SF, "documents").select("text").distinct().count()
    )


def test_run_probe_summary_shape(spark, scaled_dir, tmp_path):
    lines = []
    summary = run_probe(
        spark,
        src=SF,
        out=os.path.dirname(scaled_dir),
        factor=2,
        probe_queries=["pricing_summary", "text_quality"],
        emit=lines.append,
    )
    assert summary["metric"] == "scale_probe"
    assert summary["verdict"] in ("linear", "SUPERLINEAR")
    assert set(summary["queries"]) == {"pricing_summary", "text_quality"}
    for q in summary["queries"].values():
        assert q["t_1x_sec"] > 0 and q["t_2x_sec"] > 0 and q["efficiency"] > 0
    # every emitted line is one parseable JSON object
    assert [json.loads(l) for l in lines][-1] == summary


def test_skew_build_concentrates_hot_keys(spark, tmp_path_factory):
    """Skew tier: ~50% of lineitem rows land in one giant trace and ~50%
    of events on one hot event_type — without collapsing span ids into
    a quadratic join blowup."""
    from scale_probe import HOT_TRACE_KEY

    out = str(tmp_path_factory.mktemp("probe_skew") / "x2skew")
    build_scaled(spark, SF, out, factor=2, skew=True)

    li = load_table(spark, out, "lineitem")
    total = li.count()
    hot = li.filter(F.col("l_orderkey") == HOT_TRACE_KEY).count()
    assert hot == total // 2
    # span ids inside the hot trace keep roughly the base duplicate
    # rate (composite-key derivation), not a handful of mega-duplicates
    base_li = load_table(spark, SF, "lineitem")
    base_distinct = (
        base_li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("s")
        ).distinct().count()
    )
    hot_distinct = (
        li.filter(F.col("l_orderkey") == HOT_TRACE_KEY)
        .select(F.col("l_linenumber").alias("s")).distinct().count()
    )
    assert hot_distinct >= base_distinct

    ev = load_table(spark, out, "events")
    hot_ev = ev.filter(F.col("event_type") == "hot_event").count()
    assert hot_ev == ev.count() // 2


def test_run_probe_skew_tier_shape(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("probe_skew_run"))
    lines = []
    summary = run_probe(
        spark, src=SF, out=out, factor=2,
        probe_queries=["salted_agg"], emit=lines.append, skew=True,
    )
    assert summary["skew"] is True
    assert os.path.isdir(os.path.join(out, "x2skew"))
    assert set(summary["queries"]) == {"salted_agg"}
    assert summary["verdict"] in ("linear", "SUPERLINEAR")
