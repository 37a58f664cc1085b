"""Vanilla-session conformance: the engine under a BARE SparkSession.

The round driver (and any embedding application) builds its own
``SparkSession.builder...getOrCreate()`` without signaldb_spark.session's
pinned confs. Round 9's one driver red (`manifest_stats_report`) was
exactly this class of bug: the INT96 default timestamp encoding records
no parquet statistics, so manifest write paths that trusted session.py's
``outputTimestampType`` pin were stats-blind under the driver's session.

This test is the local analog of what the driver does: a fresh
subprocess whose session is built with NO signaldb_spark confs, driving

  write → per-file stats ledger → stats-pruned read → TopK tail scan

end-to-end plus a representative query slice (one per family + the
engine-contract gates) cross-checked against the DuckDB oracle. It runs
in a subprocess because a pytest session already holds the pinned JVM —
``getOrCreate`` in-process would inherit session.py's confs and hide
exactly the class of bug this guards against.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One query per family plus every engine-contract gate whose machinery
# writes parquet (the surface the INT96 class of bug can blind).
SLICE = [
    "manifest_stats_report",
    "manifest_time_prune",
    "snapshot_time_travel",
    "streaming_ingest_visibility",
    "hot_only_first_run",
    "pricing_summary",       # relational / SQL
    "rate",                  # PromQL range function
    "logql_count_by_service",  # LogQL metric path
    "trace_duration_filter",   # TraceQL
    "dedup_exact",           # training-data dedup
    "emb_cosine_topk",       # similarity
    # round-16 blocks (added r11 per the one-gate-per-new-block rule):
    "api_prom_range_envelope",  # façade envelope parsed back into rows
    "int96_session_stats_selfcheck",  # conf self-sufficiency family
    "logql_unpack_metric_path",  # LogQL metric-path output stages
    "epoch_shuffle_batches",     # LLM-loader determinism
    "bpe_merge_table",           # distributed BPE merge learning
    "doc_chunk_windows",         # token-window chunking
    # round-17 blocks: ops routes (manifest fixture under the bare
    # session — the write-conf class of bug) and the pyroscope
    # flamegraph envelope
    "api_ops_compact_dryrun",
    "api_pyroscope_render_envelope",
    # the Python-on-data path (mapInPandas closures deserialized on
    # workers) — the round-11 shipping fix's regression guard
    "multimodal_features",
]

_DRIVER_SCRIPT = r"""
import json, math, os, sys
sys.path.insert(0, __REPO__)
from pyspark.sql import SparkSession
import duckdb
import __spark_entry__ as m

# the bare session: exactly what the round driver builds — no
# signaldb_spark.session, no conf pins beyond master/parallelism
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName("vanilla").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sf = __SF__
out = {}

# ---- 1. the write->stats->prune->TopK pipeline under the bare session
import tempfile
from signaldb_spark.catalog import load_table
from signaldb_spark.storage.manifest import ManifestTable, write_batch_manifest
from pyspark.sql import functions as F

tmp = tempfile.mkdtemp(prefix="vanilla-manifest-")
ev = load_table(spark, sf, "events").select(
    F.col("ts").alias("timestamp"),
    F.to_date("ts").cast("string").alias("date_day"),
    F.hour("ts").alias("hour"),
    "event_type", "user_id",
)
write_batch_manifest(ev, tmp, "logs", batch_id=0)
mt = ManifestTable(tmp)
man = mt.load_manifest()
n_files = len(man["files"])
with_stats = sum(
    1 for f in man["files"]
    if man.get("stats", {}).get(f, {}).get("timestamp") is not None
)
out["stats_ledger"] = {"files": n_files, "with_ts_stats": with_stats}

# stats-pruning engages: one day's window must prune the other days
lo = ev.agg(F.min("timestamp")).collect()[0][0]
import datetime as dt
day_end = dt.datetime.combine(lo.date(), dt.time(23, 59, 59))
kept, pruned = mt.pruned_files("timestamp", lo, day_end)
out["prune"] = {"kept": len(kept), "pruned": pruned}

# TopK tail scan stops early (reads fewer files than the table holds)
top, files_read = mt.read_recent_topk(spark, "timestamp", 5)
out["topk"] = {
    "rows": top.count() if top is not None else 0,
    "files_read": files_read,
    "files_total": n_files,
}
out["conf_restored"] = spark.conf.get(
    "spark.sql.parquet.outputTimestampType")

# ---- 2. representative query slice vs the DuckDB oracle
q, o = m.queries(), m.oracle_sql()
con = duckdb.connect()
for t in ["events", "lineitem", "orders", "customer", "documents",
          "embeddings", "region", "nation", "supplier", "part"]:
    p = os.path.join(sf, t + ".parquet")
    if os.path.exists(p):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(v):
    import datetime
    if hasattr(v, "item"):
        v = v.item()  # numpy scalars repr differently from builtins
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        v = round(v, 6)
        return repr(0.0 if v == 0 else v)
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if hasattr(v, "item"):
        v = v.item()
    return repr(v)

results = {}
for name in __SLICE__:
    try:
        sdf = q[name](spark, sf)
        cols = sorted(sdf.columns)
        srows = sorted(
            tuple(canon(r[c]) for c in cols) for r in sdf.collect())
        otab = con.execute(o[name]).fetch_arrow_table()
        ocols = sorted(otab.column_names)
        orows = sorted(
            tuple(canon(row[c]) for c in ocols)
            for row in otab.to_pylist())
        results[name] = {
            "rows": len(srows), "oracle_rows": len(orows),
            "cols_match": cols == ocols, "hash_match": srows == orows,
        }
    except Exception as ex:
        results[name] = {"err": f"{type(ex).__name__}: {ex}"[:300]}
out["queries"] = results
spark.stop()
import shutil
shutil.rmtree(tmp, ignore_errors=True)
print("VANILLA_JSON:" + json.dumps(out))
"""


@pytest.fixture(scope="module")
def vanilla_result(sf_dir):
    script = (_DRIVER_SCRIPT.replace("__REPO__", repr(REPO))
              .replace("__SF__", repr(sf_dir))
              .replace("__SLICE__", repr(SLICE)))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # workers must not need our path setup
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=900, env=env,
        # a NEUTRAL cwd: running from the repo root silently rescues
        # Python workers (cwd lands on their sys.path), hiding the
        # ModuleNotFoundError class the round-11 shipping fix closed —
        # embedders run from anywhere, so the conformance test must too
        cwd=tempfile.gettempdir(),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("VANILLA_JSON:"):
            return json.loads(line[len("VANILLA_JSON:"):])
    raise AssertionError(
        f"vanilla subprocess produced no result\nstdout:{proc.stdout[-2000:]}"
        f"\nstderr:{proc.stderr[-2000:]}"
    )


def test_stats_recorded_under_bare_session(vanilla_result):
    ledger = vanilla_result["stats_ledger"]
    assert ledger["files"] > 0
    # every committed file must carry ts stats — the INT96 default would
    # make this 0 (round 9's driver red)
    assert ledger["with_ts_stats"] == ledger["files"]


def test_write_conf_restored(vanilla_result):
    # the engine pins the write conf only AROUND its own writes; the
    # embedder's session must come back untouched (vanilla default INT96)
    assert vanilla_result["conf_restored"] == "INT96"


def test_stats_pruning_engages(vanilla_result):
    prune = vanilla_result["prune"]
    assert prune["pruned"] > 0, "single-day window pruned nothing"
    assert prune["kept"] > 0


def test_topk_tail_scan_stops_early(vanilla_result):
    topk = vanilla_result["topk"]
    assert topk["rows"] == 5
    assert 0 < topk["files_read"] < topk["files_total"]


def test_query_slice_matches_oracle(vanilla_result):
    bad = {
        n: r for n, r in vanilla_result["queries"].items()
        if r.get("err") or not (
            r["rows"] == r["oracle_rows"] and r["cols_match"]
            and r["hash_match"]
        )
    }
    assert not bad, f"vanilla-session mismatches: {bad}"
