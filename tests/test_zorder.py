"""Z-order clustering (storage/zorder.py + manifest.zorder_compact_table):
interleave correctness, multi-dimension pruning effectiveness vs a
lexicographic layout, rewrite equivalence under snapshot isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from signaldb_spark.storage.manifest import (
    ManifestTable,
    write_batch_manifest,
    zorder_compact_table,
)
from signaldb_spark.storage.zorder import interleave, linear_code, vocab_code

UTC = dt.timezone.utc


def test_interleave_bit_layout(spark):
    """Bit b of code i lands at position b*n + i — checked against a
    hand-computed Morton pattern."""
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    (z,) = df.select(interleave([F.col("a"), F.col("b")], bits=3)).collect()[0]
    # a bits (0,2 set) -> positions 0,4 ; b bits (0,1 set) -> positions 1,3
    assert z == (1 << 0) | (1 << 4) | (1 << 1) | (1 << 3)


def test_codes_are_monotonic(spark):
    vals = [(0.0,), (25.0,), (50.0,), (100.0,)]
    df = spark.createDataFrame(vals, "x double")
    codes = [r[0] for r in df.select(linear_code(F.col("x"), 0, 100)).collect()]
    assert codes == sorted(codes) and codes[0] == 0 and codes[-1] == 2**16 - 1
    vdf = spark.createDataFrame([("a",), ("c",), ("b",), ("zz",)], "s string")
    vc = {
        r["s"]: r["c"]
        for r in vdf.select("s", vocab_code(F.col("s"), ["a", "b", "c"])
                            .alias("c")).collect()
    }
    assert vc["a"] < vc["b"] < vc["c"]
    assert vc["zz"] == 0  # unseen value degrades, never errors


def _grid(spark, n_types=8, n_days=8, rows_per_cell=40):
    """A (type x day) grid frame — every type active every day, the
    shape where lexicographic sorting can only serve one dimension."""
    n = n_types * n_days * rows_per_cell
    return spark.range(n).select(
        F.concat(F.lit("svc-"), (F.col("id") % n_types).cast("string"))
        .alias("service"),
        F.timestamp_micros(
            F.lit(int(dt.datetime(2024, 1, 1, tzinfo=UTC).timestamp() * 1e6))
            + ((F.col("id") / n_types).cast("long") % n_days) * 86_400_000_000
            + F.col("id") * 1_000_000
        ).alias("timestamp"),
        (F.col("id") * 7).alias("value"),
        F.lit("2024-01").alias("date_day"),
        F.lit(0).cast("int").alias("hour"),
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """After the z-rewrite, BOTH a service-only and a time-only range
    predicate prune files — the property no single lexicographic sort
    order can give. Scan results stay identical to pre-rewrite."""
    table = str(tmp_path / "t")
    df = _grid(spark)
    assert write_batch_manifest(
        df.repartition(16), table, "events_grid", batch_id=1,
        stats_cols=("timestamp",),
    )
    mt = ManifestTable(table)
    before = sorted(
        map(str, mt.read(spark).filter(F.col("service") == "svc-3").collect())
    )

    n = zorder_compact_table(
        spark, table, ["service", "timestamp"], n_files=16
    )
    assert n == 16
    assert mt.load_manifest()["props"]["zorder.cols"] == "service,timestamp"

    total = len(mt.files())
    # service-only predicate: equality as a degenerate range
    svc_kept, svc_pruned = mt.pruned_files_multi(
        [("service", "svc-3", "svc-3")]
    )
    assert svc_pruned > 0 and len(svc_kept) <= total // 2, (
        len(svc_kept), total
    )
    # time-only predicate: a 2-day window out of 8
    lo = dt.datetime(2024, 1, 2, tzinfo=UTC)
    hi = dt.datetime(2024, 1, 3, 23, 59, 59, tzinfo=UTC)
    t_kept, t_pruned = mt.pruned_files_multi([("timestamp", lo, hi)])
    assert t_pruned > 0 and len(t_kept) <= total // 2, (len(t_kept), total)
    # conjunction: strictly tighter than either alone
    both_kept, _ = mt.pruned_files_multi(
        [("service", "svc-3", "svc-3"), ("timestamp", lo, hi)]
    )
    assert len(both_kept) <= min(len(svc_kept), len(t_kept))

    # equivalence: same rows after the rewrite
    after = sorted(
        map(str, mt.read(spark).filter(F.col("service") == "svc-3").collect())
    )
    assert before == after


def test_zorder_beats_lexicographic_on_the_off_dimension(spark, tmp_path):
    """The justification for z-order over sort-by-(service, ts): on a
    (service, ts)-sorted layout with one file per service, each file
    spans that service's WHOLE history, so a time-only predicate keeps
    every file; z-order keeps a bounded fraction on BOTH dimensions."""
    df = _grid(spark, n_types=16, n_days=8, rows_per_cell=20)
    lo = dt.datetime(2024, 1, 2, tzinfo=UTC)
    hi = dt.datetime(2024, 1, 3, 23, 59, 59, tzinfo=UTC)

    lex = str(tmp_path / "lex")
    assert write_batch_manifest(
        df.repartitionByRange(16, "service", "timestamp")
        .sortWithinPartitions("service", "timestamp"),
        lex, "events_grid", batch_id=1, stats_cols=("timestamp",),
    )
    lex_kept, _ = ManifestTable(lex).pruned_files_multi([("timestamp", lo, hi)])
    lex_total = len(ManifestTable(lex).files())

    zed = str(tmp_path / "zed")
    assert write_batch_manifest(
        df.repartition(16), zed, "events_grid", batch_id=1,
        stats_cols=("timestamp",),
    )
    zorder_compact_table(spark, zed, ["service", "timestamp"], n_files=16)
    z_kept, _ = ManifestTable(zed).pruned_files_multi([("timestamp", lo, hi)])
    z_total = len(ManifestTable(zed).files())

    assert len(lex_kept) / lex_total > 0.9  # lexicographic: no time pruning
    assert len(z_kept) / z_total <= 0.5  # z-order: real time pruning


def test_zorder_commit_aborts_on_conflict(spark, tmp_path, monkeypatch):
    """Snapshot isolation: if an input file disappears between plan and
    commit (concurrent retention), the rewrite aborts — staged files
    become orphans, the table is untouched."""
    import signaldb_spark.storage.manifest as man

    table = str(tmp_path / "t")
    write_batch_manifest(
        _grid(spark, 2, 2, 10).repartition(2), table, "events_grid",
        batch_id=1, stats_cols=("timestamp",),
    )
    mt = ManifestTable(table)
    v_before = mt.current_version()

    real_stage = man._stage_into_data

    def race_then_stage(staging, data_dir, prefix):
        # a retention commit drops one input while the rewrite stages
        victim = mt.load_manifest()["files"][0]
        assert mt.commit([], remove_files=[victim])
        return real_stage(staging, data_dir, prefix)

    monkeypatch.setattr(man, "_stage_into_data", race_then_stage)
    n = zorder_compact_table(spark, table, ["service", "timestamp"], 2)
    assert n == 0
    m = mt.load_manifest()
    assert m["version"] == v_before + 1  # only the retention commit
    assert not any("zorder-" in f for f in m["files"])


def test_zorder_rewrite_plan_is_one_range_exchange(spark):
    """The rewrite's cost model: ONE shuffle (sampled range partition on
    the interleaved key), the key itself a codegen expression — no UDF,
    no extra exchange, no global sort."""
    from signaldb_spark.storage.zorder import zorder_rewrite

    df = _grid(spark, 4, 4, 10)
    out = zorder_rewrite(
        df,
        [linear_code(F.unix_micros("timestamp"), 0, 2**40),
         vocab_code(F.col("service"), [f"svc-{i}" for i in range(4)])],
        n_files=4,
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" in plan, plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan, plan
