"""Physical-plan regression tests: the optimizations SURVEY §4.1 calls
out must actually appear in the plans — pushdown reaching parquet,
column pruning, broadcast for dims, partition pruning on the hour
layout, and shuffle-free bucketed joins for the co-location strategy.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from signaldb_spark.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark):
    p = plan(all_queries()["pricing_summary"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_column_pruning(spark):
    p = plan(all_queries()["point_lookup"](spark, SF_DIR))
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" not in read and "l_orderkey" in read
    assert "EqualTo(l_orderkey,1)" in p


def test_dims_broadcast(spark):
    p = plan(all_queries()["shipping_priority"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p


def test_partition_pruning_on_hour_layout(spark, tmp_path_factory):
    """A timestamp filter on the hour-partitioned signal layout must
    prune partitions (the reference needs a dual-bound trick for this;
    our layout derives the partition from the same column)."""
    from signaldb_spark.catalog import optional_table, signal_table_path
    from signaldb_spark.testing import write_signal_tables

    base = str(tmp_path_factory.mktemp("prune_signals"))
    write_signal_tables(spark, base)
    logs = spark.read.parquet(signal_table_path(base, "acme", "prod", "logs"))
    pruned = logs.filter(F.col("hour") == 1)
    p = plan(pruned.select("service_name"))
    # partition filter appears as PartitionFilters, not a data filter
    assert "PartitionFilters" in p and "hour" in p.split("PartitionFilters", 1)[1][:200]


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Co-located join strategy for the 100 TB fact-fact join: bucket
    both sides on the join key → SortMergeJoin without Exchange."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from signaldb_spark.catalog import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        od = load_table(spark, SF_DIR, "orders")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
        od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("od_b")
        j = spark.table("li_b").join(
            spark.table("od_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = plan(j.select("l_orderkey", "o_totalprice"))
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # co-located: zero shuffle
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS od_b")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_aggregation_is_partial_then_final(spark):
    p = plan(all_queries()["count_over_time"](spark, SF_DIR))
    # two HashAggregates around one Exchange = map-side combine
    assert p.count("HashAggregate") >= 2 and "Exchange" in p


def test_near_dup_operators_have_no_cartesian(spark):
    """The near-dup family must block (band/bucket equi-joins), never
    cross-join: a CartesianProduct or BroadcastNestedLoopJoin here is
    O(n²) and dead at 100 TB."""
    for name in ("dedup_simhash", "emb_near_dup", "dedup_minhash_lsh", "emb_ivf_ann"):
        p = plan(all_queries()[name](spark, SF_DIR))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_jaccard_candidate_pairs_are_df_bounded(spark):
    """With the df cap engaged, a hot shingle in d docs contributes at
    most cap² candidate pairs instead of d²: a corpus where every doc
    shares one ubiquitous shingle must produce zero candidates once the
    shingle's df exceeds the cap."""
    from signaldb_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"common shingle words unique{i} tail{i} end{i}") for i in range(30)],
        "doc_id long, text string",
    )
    # 'common shingle words' appears in all 30 docs; cap of 10 drops it,
    # and no other shingle is shared → zero pairs survive
    out = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.01, max_shingle_df=10)
    assert out.count() == 0
    exact = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.01, max_shingle_df=None)
    assert exact.count() > 0


def test_connected_components_multihop_chain(spark):
    """A 4-node chain needs label propagation across multiple rounds
    (diameter 3); a separate 2-cycle must stay its own cluster, and
    every member labels with the component min id."""
    from signaldb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (50, 60), (60, 50)],
        "id_a long, id_b long",
    )
    want = {
        10: (10, 4), 20: (10, 4), 30: (10, 4), 40: (10, 4),
        50: (50, 2), 60: (50, 2),
    }
    got = {r.id: (r.cluster_id, r.cluster_size) for r in connected_components(pairs).collect()}
    assert got == want
    # distributed pointer-jumping path (driver_threshold=0) must agree
    dist = {
        r.id: (r.cluster_id, r.cluster_size)
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert dist == want


def test_connected_components_distributed_lineage_truncated(spark):
    """The hash-min/pointer-jump loop must checkpoint each round: a
    64-node chain (diameter 63) needs ~6 rounds, deep enough that a
    cache-only loop — whose plan references the previous round ~4x via
    union + propagation join + pointer-jump self-join — would unroll to
    ~4^6 operator nodes and stall/OOM Catalyst before converging."""
    import time

    from signaldb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    t0 = time.monotonic()
    out = connected_components(pairs, driver_threshold=0)
    rows = {r.id: (r.cluster_id, r.cluster_size) for r in out.collect()}
    elapsed = time.monotonic() - t0
    assert rows == {i: (0, 64) for i in range(64)}
    # lineage pin: the label table feeding the final window is a
    # checkpoint scan, not the unrolled iteration tree
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 20_000, f"plan grew to {len(plan)} chars"
    assert "LogicalRDD" in plan
    # flat-iteration ceiling: ~6 truncated rounds run in seconds on
    # local[32]; the exponential-plan regime dies long before this
    assert elapsed < 120, f"distributed CC took {elapsed:.1f}s"


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """When the session has a checkpoint dir, the CC loop uses RELIABLE
    checkpoints (blocks on shared storage survive executor loss — the
    dynamic-allocation / spot-decommission deployment) and still
    converges to the same clusters with a truncated plan."""
    from signaldb_spark.operators.dedup import connected_components

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(31)], "id_a long, id_b long"
        )
        out = connected_components(pairs, driver_threshold=0)
        rows = {r.id: (r.cluster_id, r.cluster_size) for r in out.collect()}
        assert rows == {i: (0, 32) for i in range(32)}
        plan = out._jdf.queryExecution().analyzed().toString()
        assert len(plan) < 20_000, f"plan grew to {len(plan)} chars"
        # reliable checkpoints materialize under the configured dir
        import os
        assert any(os.scandir(str(tmp_path / "ckpt")))
    finally:
        # unset so the rest of the suite keeps the localCheckpoint path
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None))
        assert sc.getCheckpointDir() is None


def test_simhash_band_pairs_equal_brute_force(spark):
    """The first-matching-band dedup-free rewrite must return exactly
    the pairs a brute-force hamming scan finds: every pair within
    hamming<=3 once (pigeonhole over 4 bands), no duplicates from
    multi-band matches, no pairs above the cutoff."""
    import itertools
    import random

    from signaldb_spark.operators.dedup import simhash_near_pairs

    rnd = random.Random(7)
    rows = []
    doc = 0
    for _ in range(40):
        base = rnd.getrandbits(32)
        rows.append((doc, base)); doc += 1
        for flips in (1, 2, 3, 4, 6):  # near and just-outside variants
            h = base
            for b in rnd.sample(range(32), flips):
                h ^= 1 << b
            rows.append((doc, h)); doc += 1
    sim = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(sim, "doc_id", max_hamming=3, bits=32).collect()
    }
    want = set()
    for (a, ha), (b, hb) in itertools.combinations(rows, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 3:
            want.add((min(a, b), max(a, b), d))
    assert got == want and len(want) > 50


def test_corpus_map_only_operators_have_no_exchange(spark):
    """stratified_sample and repetition_features are pure map-side
    transforms — a per-key (hashpartitioning) Exchange in their plans is
    a regression (the repetition "group-by bigram" must stay an in-row
    array fold). A RoundRobin fan-out of an under-partitioned scan is
    allowed: it carries no key, exists only because the local test file
    is a single split, and self-disables when file splits already
    saturate the cluster (operators/dedup.fan_out)."""
    for name in ("stratified_sample", "text_repetition"):
        p = plan(all_queries()[name](spark, SF_DIR))
        assert "hashpartitioning" not in p, name


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set must ride a broadcast probe (it is
    tiny vs the corpus); a sort-merge join or cartesian here would
    shuffle the 100 TB corpus against a KB-scale eval suite."""
    p = plan(all_queries()["decontaminate"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_new_operators_have_no_cartesian_or_bnl(spark):
    """asof_join / segment_dedup / exphist_quantile / trace_spanset_agg
    must stay join-blowup-free: window or equi-join shapes only."""
    for name in ("asof_join", "segment_dedup", "exphist_quantile", "trace_spanset_agg"):
        p = plan(all_queries()[name](spark, SF_DIR))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, name


def test_asof_join_is_single_logical_shuffle(spark):
    """The union/window as-of form partitions both union branches by the
    join key and runs one window — no join operator at all in the plan."""
    p = plan(all_queries()["asof_join"](spark, SF_DIR))
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "Window" in p


def test_segment_dedup_shuffles_hashed_longs_only(spark):
    """The verdict shuffle must carry the xxhash64 key, never the
    segment string."""
    p = plan(all_queries()["segment_dedup"](spark, SF_DIR))
    import re
    keys = re.findall(r"Arguments: hashpartitioning\(([a-zA-Z_0-9#]*)", p)
    assert keys and all(k.startswith(("seg_h", "doc_id")) for k in keys), keys


def test_pii_redact_is_map_only(spark):
    """Regex counting + redaction must stay a pure projection: zero
    exchanges of any kind."""
    p = plan(all_queries()["pii_redact"](spark, SF_DIR))
    assert "Exchange" not in p


def test_kmeans_assignment_is_map_only(spark):
    """After the iterations collect centroids driver-side, the returned
    assignment plan is literal-centroid argmax over the scan: no join,
    no aggregate, no exchange."""
    p = plan(all_queries()["emb_kmeans"](spark, SF_DIR))
    for op in ("Join", "Exchange", "HashAggregate"):
        assert op not in p, op


def test_curation_full_probe_is_broadcast_and_join_safe(spark):
    """The benchmark shingle probe must broadcast; nothing in the
    composite pipeline may degrade to a cartesian. Audited with
    eager=False — the default gate path truncates the plan behind a
    localCheckpoint after materializing."""
    from pyspark.sql import functions as F

    from signaldb_spark.catalog import load_table
    from signaldb_spark.operators.curation import curate_corpus_full

    out = curate_corpus_full(
        load_table(spark, SF_DIR, "documents"),
        benchmark_filter=F.col("source") == "src0",
        langs=("en",), min_quality=0.45,
        max_dup_bigram_frac=0.05, decontam_threshold=0.05,
        n=3, num_hashes=8, bands=4, eager=False,
    )
    p = plan(out)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_timeseries_aggs_keep_partial_final(spark):
    """New bucketed aggregations must keep map-side partial aggregation
    (two HashAggregate levels around the exchange)."""
    for name in ("trace_metrics_rate", "promql_mad", "exphist_quantile"):
        p = plan(all_queries()[name](spark, SF_DIR))
        assert p.count("HashAggregate") >= 2, name


def test_interval_join_is_bucketed_equi_join(spark):
    """The batch interval join must execute as a shuffled/broadcast HASH
    join on (keys, bucket) — never a nested-loop range join."""
    p = plan(all_queries()["interval_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Join" in p


def test_emb_quantize_is_map_only(spark):
    """Scalar quantization is a pure projection over the scan: the only
    exchange allowed is the fan_out repartition of the tiny benchmark
    file — no join, no aggregate."""
    p = plan(all_queries()["emb_quantize"](spark, SF_DIR))
    for op in ("Join", "HashAggregate"):
        assert op not in p, op


def test_incremental_dedup_probes_digests_only(spark):
    """The corpus side of incremental dedup must reduce to a digest
    projection before the join — ReadSchema on the corpus scan carries
    only the text column (digest input), never ancillary columns."""
    p = plan(all_queries()["dedup_incremental"](spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_profile_self_time_single_aggregation(spark):
    """Self+cumulative flamegraph must stay ONE aggregation over the
    prefix explode — a second pass or a self-vs-cum join is a
    regression."""
    p = plan(all_queries()["profile_self_time"](spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_ir_correlate_is_equi_join(spark):
    p = plan(all_queries()["ir_correlate"](spark, SF_DIR))
    assert "Join" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_relational_reports_broadcast_dims(spark):
    for name in ("returned_item_revenue", "large_orders"):
        p = plan(all_queries()[name](spark, SF_DIR))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, name
    # Q10's nation dim must broadcast
    p10 = plan(all_queries()["returned_item_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p10


def test_q19_or_of_ands_pushes_per_side_conjuncts(spark):
    """brand_quantity_revenue: Catalyst must derive each side's OR of
    conjuncts and push it into that side's parquet scan while pruning to
    the referenced columns only."""
    p = plan(all_queries()["brand_quantity_revenue"](spark, SF_DIR))
    # lineitem scan carries the derived quantity OR; part scan the brand/size OR
    assert "Or(And(EqualTo(p_brand,Brand#12)" in p.replace(" ", "") or "p_brand" in p
    assert "l_quantity" in p and "PushedFilters" in p
    # projection pruned: the wide lineitem scan reads only 4 columns
    lineitem_scan = [l for l in p.splitlines() if "ReadSchema" in l and "l_partkey" in l]
    assert lineitem_scan and "l_extendedprice" in lineitem_scan[0]
    assert "l_comment" not in p


def test_repeated_ngrams_shuffles_longs_not_text(spark):
    """repeated_ngram_stats: the exchange carries (doc, pos, hash) —
    the document text must not appear past the first projection."""
    from signaldb_spark.operators.corpus import repeated_ngram_stats

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")],
        "doc_id long, text string",
    )
    p = plan(repeated_ngram_stats(docs, "doc_id", "text"))
    # hash-partitioned exchanges exist on wh / doc id, none on the text
    assert "hashpartitioning" in p and "wh" in p
    assert "Exchange hashpartitioning(text" not in p


def test_pq_adc_is_join_free(spark):
    """pq_adc_topn: scoring is literal-table lookups + one groupBy on
    the id — no join operator anywhere in the plan."""
    from signaldb_spark.operators.similarity import pq_adc_topn

    codes = spark.createDataFrame(
        [(1, 0, 0), (1, 1, 1), (2, 0, 1), (2, 1, 0)],
        "vec_id long, subspace int, code int",
    )
    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.5, 0.5], [2.0, 2.0]]]
    p = plan(pq_adc_topn(codes, books, [0.2, 0.2, 0.7, 0.7], n=2))
    assert "Join" not in p and "BroadcastNestedLoop" not in p
    assert "HashAggregate" in p


def test_new_query_scale_shapes(spark):
    """Round-5 operators keep their 100 TB shapes: the ip() filter is a
    pure scan-filter (zero exchanges), MIPS broadcasts the query battery
    (no shuffled join), the unigram LM broadcasts its vocab, and the
    trailing-window count shuffles exactly once (on the user key)."""
    def exchanges(p: str) -> int:
        # formatted mode prints one "- Exchange (n)" tree node per shuffle
        return sum(1 for l in p.splitlines() if l.lstrip("+- :").startswith("Exchange"))

    qs = all_queries()
    # scan-filter only: the single Exchange is the presentation sort
    # (rangepartitioning); no hash shuffle anywhere
    p_ip = plan(qs["logql_ip_filter"](spark, SF_DIR))
    assert "hashpartitioning" not in p_ip

    p_mips = plan(qs["emb_mips_topk"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_mips or "BroadcastExchange" in p_mips
    assert "SortMergeJoin" not in p_mips

    p_lm = plan(qs["unigram_logprob"](spark, SF_DIR))
    assert "BroadcastExchange" in p_lm or "BroadcastHashJoin" in p_lm

    p_roll = plan(qs["event_rolling_window"](spark, SF_DIR))
    assert exchanges(p_roll) == 1 and "Window" in p_roll


def test_grouping_sets_use_one_expand(spark):
    """rollup/cube lower to a single Expand feeding ONE partial+final
    agg — not a union of per-level groupBys (which would rescan the
    fact table per grouping set at 100 TB)."""
    for name in ("rollup_revenue", "cube_priority_status"):
        p = plan(all_queries()[name](spark, SF_DIR))
        assert p.count("Expand") >= 1, name
        assert "Union" not in p, name
        assert "partial_" in p.lower() or "HashAggregate" in p, name


def test_global_join_reports_broadcast_all_dims(spark):
    """market_share / product_profit: every dimension side is a
    broadcast join; no SortMergeJoin and no cartesian appears at the
    test SF."""
    for name in ("market_share", "product_profit", "orders_above_segment_avg"):
        p = plan(all_queries()[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_pivot_is_single_pass_agg(spark):
    """The explicit-value pivot compiles to aggregation (pivot_first /
    conditional agg) — no join, no union, one shuffle on the group key."""
    p = plan(all_queries()["pivot_status_count"](spark, SF_DIR))
    assert "Join" not in p and "Union" not in p
    # group-key shuffle + the final orderBy range exchange
    assert p.count("+- Exchange") <= 3


def test_sre_windows_run_on_rollups(spark):
    """sli_error_budget / slo_multiwindow_burn: the raw event stream is
    reduced by a partial+final agg BEFORE any WindowExec — the window
    input is the daily/hourly rollup, so the single-partition global
    window holds ~10^3-10^4 rows at any fact scale."""
    for name in ("sli_error_budget", "slo_multiwindow_burn", "yoy_revenue"):
        p = plan(all_queries()[name](spark, SF_DIR))
        lines = p.splitlines()
        win = next(i for i, l in enumerate(lines) if "Window" in l)
        assert any("HashAggregate" in l for l in lines[win:]), name


def test_round7_staged_scale_shapes(spark):
    """Round-7 staged gates keep their 100 TB shapes: the basket pair
    self-join is an equi-join on the order key (never cartesian), the
    2-hop reach windows partition on user_id before the vocabulary-
    sized hop join, unpivot lowers to Expand (no Union/Join), the
    fingerprint is one map-side key derivation + one agg with no join,
    the reconciliation FULL OUTER joins two rollups (both sides
    aggregated before the join), and OHLC's window is partitioned on
    (type, hour) — no single-partition window over raw events."""
    qs = all_queries()

    p_pairs = plan(qs["top_product_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in p_pairs
    assert "BroadcastNestedLoopJoin" not in p_pairs
    assert "l_orderkey" in p_pairs

    p_reach = plan(qs["graph_2hop_reach"](spark, SF_DIR))
    assert "hashpartitioning(user_id" in p_reach
    assert "CartesianProduct" not in p_reach

    p_melt = plan(qs["unpivot_daily_mix"](spark, SF_DIR))
    assert "Expand" in p_melt
    assert "Join" not in p_melt and "Union" not in p_melt

    p_fp = plan(qs["partition_fingerprint"](spark, SF_DIR))
    assert "Join" not in p_fp
    assert "HashAggregate" in p_fp
    assert "BatchEvalPython" not in p_fp and "ArrowEvalPython" not in p_fp

    p_rec = plan(qs["daily_reconciliation"](spark, SF_DIR))
    lines = p_rec.splitlines()
    join_at = next(i for i, l in enumerate(lines) if "Join" in l and "FullOuter" in l)
    assert sum(1 for l in lines[join_at:] if "HashAggregate" in l) >= 2

    p_ohlc = plan(qs["ohlc_candles"](spark, SF_DIR))
    assert "Window" in p_ohlc
    assert "hashpartitioning(event_type" in p_ohlc

    p_gs = plan(qs["grouping_sets_explicit"](spark, SF_DIR))
    assert "Expand" in p_gs and "Union" not in p_gs

    p_pmi = plan(qs["seq_bigram_pmi"](spark, SF_DIR))
    assert "hashpartitioning(user_id" in p_pmi


def test_round7_batch4_scale_shapes(spark):
    """Batch-4 staged gates: the gap-fill spine cross join is broadcast
    (tiny derived dims) and the fact rollup feeds a left join — no
    nested-loop against the fact table; EXCEPT ALL lowers to the
    count-replicate rewrite (a single aggregate family, no row-pairing
    SortMergeJoin on the raw multiset); sessionized trigrams keep every
    window partitioned on user_id; padding-waste is one scan + one agg
    with no join."""
    qs = all_queries()

    p_gap = plan(qs["gapfill_daily_counts"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_gap or "BroadcastExchange" in p_gap
    assert "CartesianProduct" not in p_gap

    p_xall = plan(qs["except_all_multiset"](spark, SF_DIR))
    assert "SortMergeJoin" not in p_xall

    p_tri = plan(qs["session_path_trigrams"](spark, SF_DIR))
    assert "hashpartitioning(user_id" in p_tri

    p_pad = plan(qs["padding_waste_analysis"](spark, SF_DIR))
    assert "Join" not in p_pad
    assert "HashAggregate" in p_pad


def test_round7_batch5_scale_shapes(spark):
    """Batch-5 staged gates: the hopping-window multi-assignment stays
    a map-side explode feeding one shuffle (no join), audience overlap
    is two stacked aggregates with no self-join, the KS statistic's
    full-outer joins band rollups (both sides aggregated first), and
    the debounce window partitions on user_id."""
    qs = all_queries()

    p_hop = plan(qs["hopping_window_counts"](spark, SF_DIR))
    assert "Join" not in p_hop
    assert "HashAggregate" in p_hop

    p_aud = plan(qs["audience_overlap"](spark, SF_DIR))
    assert "Join" not in p_aud
    assert p_aud.count("Exchange hashpartitioning") <= 1  # user_id only

    p_ks = plan(qs["ks_drift_statistic"](spark, SF_DIR))
    lines = p_ks.splitlines()
    join_at = next(
        i for i, l in enumerate(lines) if "Join" in l and "FullOuter" in l)
    assert sum(1 for l in lines[join_at:] if "HashAggregate" in l) >= 2

    p_db = plan(qs["alert_debounce"](spark, SF_DIR))
    assert "hashpartitioning(user_id" in p_db


def test_round7_batch6_scale_shapes(spark):
    """Batch-6 staged gates: Gini's rank window partitions on segment
    (no global sort of the fact table), the CUSUM windows run over the
    daily rollup (aggregate BEFORE any WindowExec), posting lists carry
    one term-keyed shuffle, and the survival curve aggregates per-user
    rows before its rollup windows."""
    qs = all_queries()

    p_gini = plan(qs["gini_coefficient"](spark, SF_DIR))
    assert "hashpartitioning(segment" in p_gini

    for name in ("cusum_changepoint", "survival_curve"):
        p = plan(qs[name](spark, SF_DIR))
        lines = p.splitlines()
        win = next(i for i, l in enumerate(lines) if "Window" in l)
        assert any("HashAggregate" in l for l in lines[win:]), name

    p_post = plan(qs["posting_lists"](spark, SF_DIR))
    assert "hashpartitioning(term" in p_post


def test_round7_batch7_scale_shapes(spark):
    """Batch-7 staged gates: the Q2 shape joins its part and
    supplier-chain dims as broadcasts (only the derived-partsupp
    groupBy shuffles the fact table), the trimmed-mean and Hill-tail
    rank windows partition on segment (no global sort of orders), the
    novelty first-seen agg shuffles on the 16-byte gram digest, and the
    keyset page's OR-of-ANDs cursor predicate reaches the parquet scan
    as a pushed filter."""
    qs = all_queries()

    p_q2 = plan(qs["min_cost_supplier"](spark, SF_DIR))
    assert p_q2.count("BroadcastHashJoin") >= 2
    assert "hashpartitioning(l_partkey" in p_q2

    for name in ("trimmed_mean_price", "pareto_tail_alpha"):
        assert "hashpartitioning(segment" in plan(qs[name](spark, SF_DIR)), name

    p_ng = plan(qs["ngram_novelty_rate"](spark, SF_DIR))
    assert "hashpartitioning(gh" in p_ng

    p_ks = plan(qs["keyset_pagination"](spark, SF_DIR))
    assert "PushedFilters: [Or(GreaterThan(o_orderdate" in p_ks


def test_round8_batch1_scale_shapes(spark):
    """Round-8 staged gates: the rolling-distinct contribution explode
    aggregates on the window-end day (one exact distinct per day, no
    unbounded window state), the streak window partitions on user_id,
    the centroid-shift partial sums shuffle on (label, pos) — vectors
    never shuffle whole — and the robust-scaler rank window partitions
    on the stream key."""
    qs = all_queries()

    p_rd = plan(qs["rolling_distinct_users"](spark, SF_DIR))
    assert "hashpartitioning(win_end" in p_rd

    p_st = plan(qs["longest_activity_streak"](spark, SF_DIR))
    assert "hashpartitioning(user_id" in p_st

    p_cs = plan(qs["emb_centroid_shift"](spark, SF_DIR))
    assert "hashpartitioning(label" in p_cs

    p_rs = plan(qs["robust_scaler_stats"](spark, SF_DIR))
    assert "hashpartitioning(service" in p_rs


def test_round8_batch2_scale_shapes(spark):
    """Batch-2 staged gates: sessionization and entropy windows
    partition on user_id (no global sort of events), the weekly rank
    windows partition on the week key, and the LOCF spine joins the
    stream vocabulary as a broadcast before its per-stream carry
    window."""
    qs = all_queries()

    for name in ("abandonment_by_hour", "user_entropy_bands"):
        assert "hashpartitioning(user_id" in plan(qs[name](spark, SF_DIR)), name

    p_mv = plan(qs["top_k_movers"](spark, SF_DIR))
    assert "hashpartitioning(wk" in p_mv

    p_lf = plan(qs["locf_gap_fill"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_lf or "BroadcastHashJoin" in p_lf
    assert "hashpartitioning(service" in p_lf


def test_round8_batch3_scale_shapes(spark):
    """Batch-3 staged gates: the DiD joins its entire dim chain as
    broadcasts (the fact table aggregates in ONE conditional pass), the
    attribution and waterfall session/ledger windows partition on
    user_id, and the lead-lag self-join runs on the day-keyed rollup
    with the 4-row lag table broadcast."""
    qs = all_queries()

    p_did = plan(qs["holiday_diff_in_diff"](spark, SF_DIR))
    assert p_did.count("BroadcastHashJoin") >= 2
    # tree-level SHUFFLE exchanges only (details repeat each node, and
    # broadcast exchanges are not data shuffles): one agg shuffle + the
    # presentation sort's range partitioning
    shuffles = [
        l for l in p_did.splitlines()
        if " Exchange (" in l and "BroadcastExchange" not in l
    ]
    assert len(shuffles) <= 2, shuffles

    for name in ("linear_attribution", "weekly_revenue_waterfall"):
        assert "hashpartitioning(user_id" in plan(qs[name](spark, SF_DIR)), name

    p_ll = plan(qs["lead_lag_correlation"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_ll or "BroadcastHashJoin" in p_ll


def test_round8_batch4_scale_shapes(spark):
    """Batch-4 staged gates: the skew profiler's per-key count shuffles
    on the key being profiled, the BM25 document-frequency and term
    stats broadcast onto the tf table, and the MinHash audit's
    signature agg shuffles on (doc, hash-slot) — never the shingle
    text past the first rollup."""
    qs = all_queries()

    p_sk = plan(qs["key_skew_profile"](spark, SF_DIR))
    assert "hashpartitioning(l_orderkey" in p_sk

    p_bm = plan(qs["bm25_topk"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_bm
    assert "TakeOrderedAndProject" in p_bm  # top-15 never global-sorts

    p_mh = plan(qs["minhash_error_bands"](spark, SF_DIR))
    assert "hashpartitioning(doc_id" in p_mh


def test_round8_batch5_scale_shapes(spark):
    """Batch-5 staged gates: first-seen and engagement rollups shuffle
    on user_id, the CR4 rank window partitions on region over the
    customer rollup (never raw orders), the STL-lite decomposition's
    centered window runs over the (service, day) rollup, and the ship-
    lag join projects both fact sides to two columns before the join
    (ReadSchema stays narrow)."""
    qs = all_queries()

    for name in ("new_vs_returning_mix", "power_user_curve"):
        assert "hashpartitioning(user_id" in plan(qs[name](spark, SF_DIR)), name

    p_cr = plan(qs["cr4_concentration"](spark, SF_DIR))
    assert "hashpartitioning(r_name" in p_cr

    p_st = plan(qs["seasonal_trend_decomposition"](spark, SF_DIR))
    assert "hashpartitioning(service" in p_st

    p_sl = plan(qs["ship_lag_distribution"](spark, SF_DIR))
    read = [l for l in p_sl.splitlines() if "ReadSchema" in l]
    assert all("l_extendedprice" not in l for l in read)


def test_round8_batch6_scale_shapes(spark):
    """Batch-6 staged gates: the confusion-matrix assignment joins the
    label-vocabulary centroid table as a BROADCAST (vectors never
    shuffle whole — only (label, dim) partial sums do), the TF-IDF
    audit's dot joins shuffle on the sampled pair ids, and the scree's
    variance agg shuffles on the 64-value dim key."""
    qs = all_queries()

    p_cm = plan(qs["centroid_confusion_matrix"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_cm
    assert "hashpartitioning(vec_id" in p_cm

    p_tc = plan(qs["tfidf_cosine_pairs"](spark, SF_DIR))
    assert "hashpartitioning(id_a" in p_tc or "hashpartitioning(id_b" in p_tc

    # scree: variance aggregates (partial+final, one hash exchange on
    # the dim grouping expr) BEFORE any Window touches the 64-row table
    p_sc = plan(qs["emb_dim_variance_scree"](spark, SF_DIR))
    lines = p_sc.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    assert any("HashAggregate" in l for l in lines[win:])
    assert "hashpartitioning" in p_sc


def test_round8_batch7_scale_shapes(spark):
    """Batch-7 staged gates: the order-gap and error-burst windows
    partition on their natural keys (customer / user — no global sort
    of the fact tables), and the margin report joins part as a
    broadcast."""
    qs = all_queries()

    p_g = plan(qs["median_order_gap"](spark, SF_DIR))
    assert "hashpartitioning(o_custkey" in p_g

    p_b = plan(qs["error_burst_streaks"](spark, SF_DIR))
    assert "hashpartitioning(user_id" in p_b

    p_m = plan(qs["realized_vs_retail_margin"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_m


def test_round8_batch8_scale_shapes(spark):
    """Batch-8 staged gates: the tail-scan gate actually EARLY-STOPS
    (reads a strict subset of the manifest's files for top-200 over a
    month of days), the hot/cold gate unions cold parquet with hot
    batches, and the analytics windows partition on their natural keys
    instead of globally sorting the fact table."""
    from signaldb_spark import bench_round8 as b8
    from signaldb_spark.storage.manifest import ManifestTable

    qs = all_queries()

    # tail scan: files_read < total committed files, result multiset tied
    # to the oracle by the driver gate; here we pin the early stop itself
    path = b8._events_tail_table(spark, SF_DIR)
    mt = ManifestTable(path)
    total_files = len(mt.load_manifest()["files"])
    df, files_read = mt.read_recent_topk(spark, "ts", 200)
    assert df is not None and total_files >= 20
    assert files_read < total_files / 2  # a tail read, not a table scan

    p_hc = plan(qs["hot_cold_visibility"](spark, SF_DIR))
    assert "Union" in p_hc

    # per-user windows shuffle on user_id, never a single global sort
    for name in ("event_interarrival_histogram", "transition_entropy",
                 "session_bounce_rate"):
        p = plan(qs[name](spark, SF_DIR))
        assert "hashpartitioning(user_id" in p, name

    # drawdown's running-max window runs over the DAILY rollup: the
    # HashAggregate must appear below the Window in the plan tree
    p_dd = plan(qs["revenue_drawdown"](spark, SF_DIR))
    lines = p_dd.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    assert any("HashAggregate" in l for l in lines[win:])

    # dimension joins broadcast
    for name in ("unit_price_dispersion", "nation_rank_shift"):
        assert "BroadcastHashJoin" in plan(qs[name](spark, SF_DIR)), name

    # regression aggregates stay JVM-side (no Python UDF in the plan)
    p_el = plan(qs["discount_elasticity"](spark, SF_DIR))
    assert "Python" not in p_el and "HashAggregate" in p_el


def test_round9_staged_scale_shapes(spark):
    """Round-9 staged gates: rank statistics run over ROLLUPS (the
    Mann-Whitney ranks come from a distinct-value window, never a
    global sort of events), the silhouette broadcasts the centroid
    table, and the engine gates' storage behaviors hold (stats pruning
    actually drops files; time travel pins the old file list)."""
    import datetime as dt

    from signaldb_spark import bench_round9 as b9
    from signaldb_spark.storage.manifest import ManifestTable

    qs = all_queries()

    # mann-whitney: the window input is the per-value rollup — a
    # HashAggregate must appear below the Window in the plan tree
    p_mw = plan(qs["mann_whitney_u"](spark, SF_DIR))
    lines = p_mw.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    assert any("HashAggregate" in l for l in lines[win:])

    p_sil = plan(qs["emb_centroid_silhouette"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_sil

    # sessionized gates shuffle on user_id
    for name in ("session_position_dropoff", "session_type_lift",
                 "dwell_time_stats"):
        assert "hashpartitioning(user_id" in plan(qs[name](spark, SF_DIR)), name

    # stats pruning: the 3-day window plans a strict subset of files
    path = b9._events_versioned_table(spark, SF_DIR)
    mt = ManifestTable(path)
    total = len(mt.load_manifest()["files"])
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 13)
    pruned, n_pruned = mt.pruned_files("ts", lo, hi)
    assert n_pruned > 0 and len(pruned) < total

    # time travel: version 1 plans strictly fewer files than current
    v1_files = len(mt.load_manifest(1)["files"])
    assert 0 < v1_files < total

    # retention + compaction gates leave single-file / dropped layouts
    qs["compaction_equivalence"](spark, SF_DIR).collect()
    from signaldb_spark.maintenance.jobs import (
        list_hour_partitions,
        partition_files,
    )
    cpath = b9._R9_CACHE[("compact", SF_DIR)]
    for day, hour in list_hour_partitions(cpath):
        assert len(partition_files(cpath, day, hour)) == 1, (day, hour)
    qs["retention_drop_equivalence"](spark, SF_DIR).collect()
    rpath = b9._R9_CACHE[("retention", SF_DIR)]
    assert max(d for d, _ in list_hour_partitions(rpath)) <= "2024-01-04"


def test_round9_batch2_scale_shapes(spark):
    """Round-9 batch-2 gates: the brand-repeat and trade-balance joins
    broadcast their dimensions, the LSH tuning curve buckets on
    (band, band_hash) — pair volume is C(n,2) arithmetic, never a
    materialized pair join — and the replay-visibility table holds
    exactly one copy of the replayed batch's files."""
    from signaldb_spark import bench_round9 as b9
    from signaldb_spark.storage.manifest import ManifestTable

    qs = all_queries()

    for name in ("brand_repeat_rate", "nation_trade_balance"):
        assert "BroadcastHashJoin" in plan(qs[name](spark, SF_DIR)), name

    p_lsh = plan(qs["lsh_band_tuning_curve"](spark, SF_DIR))
    assert "hashpartitioning(band" in p_lsh
    assert "Join" not in p_lsh.replace("BroadcastHashJoin", "")  # no pair join

    # replay: the manifest holds b1's files ONCE (the retry's staged
    # files never entered the snapshot) and lineage has b1 exactly once
    qs["idempotent_replay_visibility"](spark, SF_DIR).collect()
    mt = ManifestTable(b9._R9_CACHE[("replay", SF_DIR)])
    man = mt.load_manifest()
    assert man["batches"].count("b1") == 1
    # gc safety: only the flushed sequence was reclaimed; one hot batch
    # (the unflushed ack) remains on disk
    from signaldb_spark.storage.hot import HotStore

    qs["hot_gc_safety"](spark, SF_DIR).collect()
    store = HotStore(b9._R9_CACHE[("hotgc", SF_DIR)])
    assert len(store.sequences()) == 1


def test_round9_batch3_scale_shapes(spark):
    """Round-9 batch-3 gates: the decay score's watermark is a 1-row
    broadcast (never a second scan join), the per-customer regression
    shuffles on custkey then broadcasts the customer dim, the skyline
    is one window (no all-pairs dominance join), and the tenant
    isolation fixture routes acme to acme's files only."""
    from signaldb_spark import bench_round9 as b9

    qs = all_queries()

    p_rw = plan(qs["recency_weighted_activity"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_rw or "BroadcastExchange" in p_rw

    p_ct = plan(qs["customer_trend_mix"](spark, SF_DIR))
    assert "hashpartitioning(o_custkey" in p_ct
    assert "BroadcastHashJoin" in p_ct

    p_sky = plan(qs["skyline_orders"](spark, SF_DIR))
    assert "Window" in p_sky
    assert "CartesianProduct" not in p_sky and "SortMergeJoin" not in p_sky

    qs["tenant_isolation_scan"](spark, SF_DIR).collect()
    p_iso = plan(qs["tenant_isolation_scan"](spark, SF_DIR))
    assert "acme" in p_iso and "globex" not in p_iso


def test_round9_batch4_batch5_scale_shapes(spark):
    """Round-9 batches 4-5: the Theil-Sen pair join runs over the
    calendar-bounded DAILY rollup with a broadcast side (never the
    fact table), keyness/collocation vocabularies aggregate before any
    window, the streaming gate's table carries multiple checkpointed
    batches, and the partition-filter gate prunes at the directory
    level."""
    from signaldb_spark import bench_round9 as b9
    from signaldb_spark.storage.manifest import ManifestTable

    qs = all_queries()

    p_ts = plan(qs["theil_sen_daily_trend"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_ts  # non-equi over the rollup
    lines = p_ts.splitlines()
    bj = next(i for i, l in enumerate(lines) if "BroadcastNestedLoopJoin" in l)
    assert any("HashAggregate" in l for l in lines[bj:])  # rollup below join

    for name in ("chi2_keyness_terms", "llr_collocations"):
        p = plan(qs[name](spark, SF_DIR))
        w = p.find("Window")
        assert w == -1 or "HashAggregate" in p[w:], name

    # streaming: availableNow drained the 4-file source into >=2
    # checkpointed manifest batches
    qs["streaming_ingest_visibility"](spark, SF_DIR).collect()
    mt = ManifestTable(b9._R9_CACHE[("streaming", SF_DIR)])
    assert len(mt.load_manifest()["batches"]) >= 2

    p_pf = plan(qs["partition_filter_scan"](spark, SF_DIR))
    assert "PartitionFilters" in p_pf
    assert "date_day" in p_pf.split("PartitionFilters", 1)[1][:250]


def test_round10_staged_scale_shapes(spark):
    """Round-10 staged gates: the moving-median / EWMA neighborhoods
    are calendar-bounded broadcast self-joins over the DAILY rollup
    (never the fact table), the grouping-sets distinct runs through an
    Expand, and the hierarchy rollup broadcasts the part dim."""
    qs = all_queries()

    for name in ("moving_median_revenue", "ewma_14d_revenue"):
        p = plan(qs[name](spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" in p, name
        lines = p.splitlines()
        bj = next(i for i, l in enumerate(lines)
                  if "BroadcastNestedLoopJoin" in l)
        assert any("HashAggregate" in l for l in lines[bj:]), name

    p_gs = plan(qs["grouping_sets_distinct_users"](spark, SF_DIR))
    assert "Expand" in p_gs

    p_th = plan(qs["type_hierarchy_rollup"](spark, SF_DIR))
    assert "Expand" in p_th and "BroadcastHashJoin" in p_th


def test_round10_batch4_batch5_scale_shapes(spark):
    """Round-10 batches 4-5: the predicated tail scan still early-stops
    (strict subset of files even under the filter transform), the
    hierarchical sessionization and SCD2 builds shuffle on user_id, and
    the CF affinity join runs on the (user, type) rollup."""
    from pyspark.sql import functions as F

    from signaldb_spark import bench_round9 as b9
    from signaldb_spark.storage.manifest import ManifestTable

    qs = all_queries()

    path = b9._events_versioned_table(spark, SF_DIR)
    mt = ManifestTable(path)
    total = len(mt.load_manifest()["files"])
    # top-10 filtered: the surviving rows concentrate in the newest
    # days, so the wave reader must stop before the full file list
    # (top-100 at sf0.001 legitimately needs ~all files — too few
    # 'error' rows per day to stop early; n=10 pins the mechanism)
    _df, files_read = mt.read_recent_topk(
        spark, "ts", 10,
        transform=lambda d: d.filter(F.col("event_type") == "error"),
    )
    assert files_read < total  # filtered early stop engaged

    for name in ("journeys_per_user", "scd2_validity_intervals"):
        assert "hashpartitioning(user_id" in plan(qs[name](spark, SF_DIR)), name

    p_cf = plan(qs["type_cosine_affinity"](spark, SF_DIR))
    lines = p_cf.splitlines()
    j = next(i for i, l in enumerate(lines) if "Join" in l)
    assert any("HashAggregate" in l for l in lines[j:])  # rollup below join


def test_round10_batch7_scale_shapes(spark):
    """Round-10 batch 7: two-pass quantile queries broadcast their tiny
    fence/quantile tables back onto the scan; the token-revenue top-10
    ends in TakeOrdered (never a global sort); the distributed-CC gate's
    final frame reads from a checkpoint scan (truncated lineage), not an
    unrolled iteration tree."""
    qs = all_queries()

    for name in ("iqr_price_outliers", "winsorized_mean_value",
                 "emb_clip_fractions"):
        p = plan(qs[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in p, name
        assert "CartesianProduct" not in p, name

    p_tok = plan(qs["part_token_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_tok
    assert "TakeOrderedAndProject" in p_tok

    p_cc = plan(qs["dedup_cc_distributed"](spark, SF_DIR))
    assert "Scan ExistingRDD" in p_cc  # checkpointed labels, plan truncated
    assert len(p_cc) < 20_000


def test_round11_staged_scale_shapes(spark):
    """Round-11 staged gates: dims and derived spines broadcast into
    fact scans, the global-scalar index rides a 1-row broadcast (never
    a shuffle), the cosine histogram's pair join is a bounded broadcast
    (10 x N, not N x N), and the widest-orders leaderboard ends in
    TakeOrdered."""
    qs = all_queries()

    p_idx = plan(qs["regional_price_index"](spark, SF_DIR))
    assert p_idx.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" in p_idx  # 1-row global scalar
    assert "CartesianProduct" not in p_idx

    p_lt = plan(qs["local_trade_share"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_lt

    p_gap = plan(qs["calendar_gap_days"](spark, SF_DIR))
    assert "LeftAnti" in p_gap

    p_cos = plan(qs["cosine_angle_histogram"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_cos
    assert "CartesianProduct" not in p_cos

    p_wide = plan(qs["widest_orders"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p_wide

    p_dead = plan(qs["never_ordered_parts"](spark, SF_DIR))
    assert "LeftAnti" in p_dead


def test_ir_metrics_scale_shapes(spark):
    """Metric-native IR lowering plan pins: samples reduce to (bucket,
    series) digests through hash aggregates (map-side partial combine),
    the only window functions run over the run/posting digest tables,
    and nothing degenerates to a cartesian product. The histogram path
    explodes to per-bucket postings BEFORE its aggregate (Generate under
    HashAggregate), never collecting arrays to the driver."""
    qs = all_queries()

    p_cum = plan(qs["ir_metrics_rate_cumulative"](spark, SF_DIR))
    assert "CartesianProduct" not in p_cum
    assert "HashAggregate" in p_cum
    assert "Window" in p_cum  # run ranking over the digest table

    p_delta = plan(qs["ir_metrics_rate_delta"](spark, SF_DIR))
    assert "CartesianProduct" not in p_delta
    assert "HashAggregate" in p_delta

    p_hist = plan(qs["ir_metrics_histogram_quantile"](spark, SF_DIR))
    assert "CartesianProduct" not in p_hist
    assert "Generate" in p_hist  # posexplode postings shape
    assert "HashAggregate" in p_hist

    p_last = plan(qs["ir_metrics_gauge_last"](spark, SF_DIR))
    assert "CartesianProduct" not in p_last
    assert "Window" not in p_last  # instant last is a pure groupBy


def test_round12_staged_scale_shapes(spark):
    """Round-12 staged gates: dim chains broadcast into fact scans,
    1-row global scalars ride broadcast nested loops (never a shuffle),
    the bigram walk explodes (Generate) before its aggregate, and
    nothing degenerates to a cartesian product."""
    qs = all_queries()

    p_trade = plan(qs["trade_region_matrix"](spark, SF_DIR))
    assert p_trade.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p_trade

    p_quart = plan(qs["basket_value_quartiles_by_region"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_quart
    assert "CartesianProduct" not in p_quart

    p_prem = plan(qs["brand_price_premium"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_prem  # 1-row global scalar
    assert "CartesianProduct" not in p_prem

    p_week = plan(qs["first_week_activation"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_week

    p_bi = plan(qs["bigram_hapax_share"](spark, SF_DIR))
    assert "Generate" in p_bi  # posexplode token walk
    assert "CartesianProduct" not in p_bi

    p_lead = plan(qs["supplier_lead_time_rank"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_lead
    assert "CartesianProduct" not in p_lead


def test_round13_staged_scale_shapes(spark):
    """Round-13 staged gates: dims broadcast, rank cuts ride windows
    over rollups, the trigram/bigram walks are O(words) Generate
    shapes, and the vocabulary pair joins never degrade to cartesian
    products."""
    qs = all_queries()

    p_trade = plan(qs["regional_quarter_share_shift"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_trade
    assert "CartesianProduct" not in p_trade

    p_corr = plan(qs["size_quantity_correlation"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_corr

    p_tri = plan(qs["top_trigram_by_source"](spark, SF_DIR))
    assert "Generate" in p_tri
    assert "CartesianProduct" not in p_tri

    p_vj = plan(qs["source_vocab_jaccard"](spark, SF_DIR))
    assert "CartesianProduct" not in p_vj  # word-keyed equi-join

    p_idf = plan(qs["part_name_token_idf"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p_idf
    assert "BroadcastNestedLoopJoin" in p_idf  # 1-row N broadcast
    assert "CartesianProduct" not in p_idf


def test_round14_staged_scale_shapes(spark):
    """Round-14 staged gates: dims and global scalars broadcast, rank
    cuts ride windows over rollups, leaderboards end in TakeOrdered,
    and the ring pairing joins on the rank key (never a cross join)."""
    qs = all_queries()

    p_eff = plan(qs["supplier_part_efficiency"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p_eff

    p_dev = plan(qs["nation_balance_deviation"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p_dev  # 1-row global scalar
    assert "CartesianProduct" not in p_dev

    p_rep = plan(qs["annual_repeat_revenue_share"](spark, SF_DIR))
    assert "CartesianProduct" not in p_rep

    p_zero = plan(qs["zero_discount_share_by_brand"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p_zero

    p_ring = plan(qs["emb_ring_dot_extremes"](spark, SF_DIR))
    assert "CartesianProduct" not in p_ring


def test_ir_binop_is_hash_join_no_cartesian(spark):
    """The IR vector-matching binop lowers to an equi-join on (bucket,
    matching labels): hash-join family in the plan, never a
    CartesianProduct/BroadcastNestedLoop — and with an aggregated
    operand the join inputs are the (bucket, by) digests, so map-side
    partial aggregation precedes the shuffle."""
    p = plan(all_queries()["ir_metrics_vector_binop"](spark, SF_DIR))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert ("SortMergeJoin" in p) or ("BroadcastHashJoin" in p) \
        or ("ShuffledHashJoin" in p)
    pg = plan(all_queries()["ir_metrics_binop_group_left"](spark, SF_DIR))
    assert "CartesianProduct" not in pg and "BroadcastNestedLoop" not in pg
    assert "partial" in pg.lower()  # map-side combine before the shuffle


def test_ir_summary_quantile_no_explode_no_join(spark):
    """Summary quantile is one groupBy (max_by anchors) plus pure array
    expressions — no explode, no join in the plan (operators/summary.py
    scale note)."""
    p = plan(all_queries()["ir_metrics_summary_quantile"](spark, SF_DIR))
    assert "Generate" not in p  # no explode
    assert "Join" not in p


def test_typed_attr_trace_predicate_plan_shape(spark):
    """The typed-trace gate's migration + typed predicate stays
    join-free: the AnyValue retype is a map_transform projection and
    the predicate reads struct fields — one aggregate over the scan."""
    p = plan(all_queries()["typed_attr_trace_predicate"](spark, SF_DIR))
    assert "CartesianProduct" not in p and "Join" not in p


def test_flamegraph_single_shuffle(spark):
    """The flamegraph fold (operators/profiles.flamegraph_self — the
    /pyroscope/render engine) is two map-side explodes + ONE exchange
    between partial and final aggregation: a 100 TB profile corpus
    aggregates with a single shuffle keyed on the bounded frame-path.
    A second Exchange would mean the prefix fan-out started shuffling
    raw samples."""
    import signaldb_spark.bench_round17 as r17
    from signaldb_spark.operators.profiles import flamegraph_self

    import re

    api = r17._api17(spark, SF_DIR)
    p = plan(flamegraph_self(api.session.table("profiles")))
    # the formatted plan names each node twice (tree + detail section)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert len(re.findall(r"\(\d+\) Generate", p)) == 2  # sample + prefix
    assert "Join" not in p and "CartesianProduct" not in p


def test_tempo_metrics_instant_no_bucket_column(spark):
    """The instant TraceQL metrics form aggregates straight on the
    series key — no bucket column, one partial+final aggregate, no
    join (traceql/trace_ops.metrics_query_instant)."""
    from signaldb_spark.catalog import load_table
    from signaldb_spark.traceql.trace_ops import metrics_query_instant

    import signaldb_spark.bench_round17 as r17

    api = r17._api17(spark, SF_DIR)
    spans = api.session.table("traces")
    out = metrics_query_instant(
        spans, "{ duration >= 0ns } | rate() by (service_name)", 3600.0
    )
    assert "bucket" not in out.columns
    p = plan(out)
    assert "Join" not in p
    assert p.lower().count("partial") >= 1  # map-side combine
