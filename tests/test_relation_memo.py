"""Round-13 optimization pins: signal-relation memoization.

Round 12 memoized the *benchmark* tables; the façade's signal tables
(manifest snapshot reads, hot-batch unions, bare parquet dirs) still
re-listed and re-inferred on every route. The relation memo extends the
same contract to them: keys embed what makes the relation immutable (an
explicit committed file list, a hot-sequence tuple, a whole-tree stat
signature), values are LAZY DataFrames only — every action still scans
parquet.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from signaldb_spark import catalog
from signaldb_spark.catalog import optional_table, relation_memo
from signaldb_spark.storage.hot import HotStore
from signaldb_spark.storage.manifest import ManifestTable, write_batch_manifest


def _write_plain(spark, path, n=5):
    spark.range(n).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_relation_memo_same_key_same_object(spark, tmp_path):
    p = str(tmp_path / "t")
    _write_plain(spark, p)
    a = relation_memo(spark, ("k", p), lambda: spark.read.parquet(p))
    b = relation_memo(spark, ("k", p), lambda: spark.read.parquet(p))
    assert b is a
    c = relation_memo(spark, ("k2", p), lambda: spark.read.parquet(p))
    assert c is not a


def test_optional_table_plain_dir_memo_and_invalidation(spark, tmp_path):
    base = str(tmp_path)
    tp = os.path.join(base, "acme", "prod", "traces")
    _write_plain(spark, tp, n=5)
    a = optional_table(spark, base, "acme", "prod", "traces")
    b = optional_table(spark, base, "acme", "prod", "traces")
    assert b is a, "unchanged signal dir must be the memo hit"
    assert a.count() == 5
    # rewrite the dir → different tree signature → fresh relation
    _write_plain(spark, tp, n=3)
    c = optional_table(spark, base, "acme", "prod", "traces")
    assert c is not a
    assert c.count() == 3


def _batch(spark, n, tag):
    return spark.range(n).select(
        F.col("id"),
        F.lit(tag).alias("s"),
        F.lit("2024-01-01").cast("date").alias("date_day"),
        F.lit(0).alias("hour"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("timestamp"),
    )


def test_manifest_read_memo_per_version(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    write_batch_manifest(_batch(spark, 4, "a"), tp, "logs", 1)
    mt = ManifestTable(tp)
    v1 = mt.current_version()
    a = mt.read(spark, version=v1)
    b = mt.read(spark, version=v1)
    assert b is a, "same committed version must be the memo hit"
    # a new commit yields a different file list → different relation
    write_batch_manifest(_batch(spark, 2, "b"), tp, "logs", 2)
    c = mt.read(spark)
    assert c is not a
    assert c.count() == 6 and a.count() == 4


def test_hot_read_memo_keyed_on_sequences(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    store = HotStore(tp)
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("s"))
    store.ack(df)
    a = store.read_hot(spark)
    b = store.read_hot(spark)
    assert b is a
    store.ack(df)
    c = store.read_hot(spark)
    assert c is not a
    assert c.count() == 6


def test_hybrid_read_still_lazy_not_cached_data(spark, tmp_path):
    # the memoized relation must re-scan on every action: deleting the
    # files under it makes the next action fail, proving no data cache
    base = str(tmp_path)
    tp = os.path.join(base, "acme", "prod", "logs")
    _write_plain(spark, tp, n=4)
    df = optional_table(spark, base, "acme", "prod", "logs")
    assert df.count() == 4
    shutil.rmtree(tp)
    try:
        df.count()
        served_from_cache = True
    except Exception:
        served_from_cache = False
    assert not served_from_cache


def test_relation_memo_weakly_keyed_per_session(spark, tmp_path):
    p = str(tmp_path / "t2")
    _write_plain(spark, p)
    relation_memo(spark, ("weak", p), lambda: spark.read.parquet(p))
    assert spark in catalog._RELATION_MEMO
    assert ("weak", p) in catalog._RELATION_MEMO[spark]
