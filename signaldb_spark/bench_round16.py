"""Round-16 staging battery: façade envelope contracts, session-conf
self-sufficiency, LogQL metric-path output stages, and document
chunking — the driver-evidence-poor corners named by the round-9
verdict, each under the DuckDB oracle.

The façade gates are the new surface here: every prior driver gate
proved the LOWERINGS (query_range, query_metric, search), while the
JSON envelopes the reference's HTTP routes emit (matrix/streams/search
shapes, ns-string timestamps, direction ordering, truncation) were
pinned only by pytest. These gates run the real SignalDBAPI route,
parse the envelope BACK into rows, and let the oracle state the
result — shaping bugs (float formatting, ns math, ordering, dropped
series) now hash-mismatch instead of passing silently.

Fixtures derive deterministically from the events table (service =
event_type, severity = user_id %% 4, cents = round(value*100)) so the
oracle can restate every envelope from raw parquet.
"""

from __future__ import annotations

import tempfile as _tempfile

from pyspark.sql import SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F

from .catalog import load_table, signal_table_path

QUERIES: dict = {}
ORACLES: dict = {}

START, END = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
DAY = 86400
_BUCKET = "CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)"
# severity from user_id — the same closed form on both engines
_SEV_SQL = "['debug','info','warn','error'][CAST(user_id % 4 AS INT) + 1]"
_CENTS_SQL = "CAST(round(value * 100) AS BIGINT)"
_BODY_SQL = f"{_SEV_SQL} || ' evt=' || event_id || ' cents=' || {_CENTS_SQL}"

_R16_CACHE: dict = {}


def _sev_col():
    return F.element_at(
        F.array(F.lit("debug"), F.lit("info"), F.lit("warn"), F.lit("error")),
        (F.col("user_id") % 4).cast("int") + 1,
    )


def _cents_col():
    return F.round(F.col("value") * 100).cast("bigint")


def events_logs_frame(e):
    """The canonical events→logs-schema frame shared by the round-16
    signal fixture and the round-17 ops-route fixtures (service =
    event_type, severity = user_id %% 4, body carries evt id + cents) —
    one derivation so every façade gate's oracle can restate it."""
    day = F.to_date("ts").alias("date_day")
    hour = F.hour("ts").cast("int").alias("hour")
    sev = _sev_col()
    cents = _cents_col()
    body = F.concat(
        sev, F.lit(" evt="), F.col("event_id").cast("string"),
        F.lit(" cents="), cents.cast("string"),
    )
    null_s = F.lit(None).cast("string")
    null_m = F.lit(None).cast("map<string,string>")
    return e.select(
        F.col("ts").alias("timestamp"),
        F.col("ts").alias("observed_timestamp"),
        F.lower(F.lpad(F.hex("event_id"), 32, "0")).alias("trace_id"),
        F.lower(F.lpad(F.hex("event_id"), 16, "0")).alias("span_id"),
        F.lit(1).cast("int").alias("trace_flags"),
        sev.alias("severity_text"),
        F.element_at(
            F.array(F.lit(5), F.lit(9), F.lit(13), F.lit(17)),
            (F.col("user_id") % 4).cast("int") + 1,
        ).cast("int").alias("severity_number"),
        F.col("event_type").alias("service_name"),
        body.alias("body"),
        null_s.alias("scope_name"),
        null_s.alias("scope_version"),
        null_m.alias("resource_attributes"),
        null_m.alias("scope_attributes"),
        F.create_map(
            F.lit("uid"), F.col("user_id").cast("string")
        ).alias("log_attributes"),
        F.array(F.concat(F.lit("uid="), F.col("user_id").cast("string")))
        .alias("attr_tokens"),
        null_s.alias("label_namespace"),
        day, hour,
    )


def _signal_base(spark, sf_dir: str) -> str:
    """Materialize logs + metrics_gauge + traces for tenant acme/prod,
    derived 1:1 from events, hive-partitioned under a temp base — the
    engine's storage layout, built once per (process, sf)."""
    key = ("base", sf_dir)
    if key in _R16_CACHE:
        return _R16_CACHE[key]
    base = _tempfile.mkdtemp(prefix="sdb-r16-signals-")
    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("date_day")
    hour = F.hour("ts").cast("int").alias("hour")
    null_s = F.lit(None).cast("string")
    null_m = F.lit(None).cast("map<string,string>")
    logs = events_logs_frame(e)
    gauge = e.select(
        F.col("ts").alias("timestamp"),
        F.lit(None).cast("timestamp").alias("start_timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit("ev_value").alias("metric_name"),
        null_s.alias("metric_description"),
        null_s.alias("metric_unit"),
        F.lit(0).cast("int").alias("flags"),
        null_m.alias("resource_attributes"),
        null_m.alias("scope_attributes"),
        F.create_map(
            F.lit("uid"), F.col("user_id").cast("string")
        ).alias("attributes"),
        null_s.alias("exemplars"),
        day, hour,
        F.col("value"),
    )
    start_ns = F.unix_micros("ts") * 1000
    dur_ns = F.round(F.col("value") * 1e6).cast("bigint")
    traces = e.select(
        F.lower(F.lpad(F.hex("event_id"), 32, "0")).alias("trace_id"),
        F.lower(F.lpad(F.hex("event_id"), 16, "0")).alias("span_id"),
        null_s.alias("parent_span_id"),
        F.concat(F.lit("op-"), (F.col("event_id") % 3).cast("string"))
        .alias("span_name"),
        F.col("event_type").alias("service_name"),
        start_ns.alias("start_time_unix_nano"),
        (start_ns + dur_ns).alias("end_time_unix_nano"),
        dur_ns.alias("duration_nanos"),
        F.lit("SERVER").alias("span_kind"),
        F.when(F.col("user_id") % 10 == 0, "Error").otherwise("Ok")
        .alias("status_code"),
        null_s.alias("status_message"),
        F.lit(True).alias("is_root"),
        null_m.alias("span_attributes"),
        null_m.alias("resource_attributes"),
        F.lit(None).cast(
            "array<struct<name:string,time_unix_nano:bigint,"
            "attributes:map<string,string>>>"
        ).alias("events"),
        F.lit(None).cast(
            "array<struct<trace_id:string,span_id:string,"
            "attributes:map<string,string>>>"
        ).alias("links"),
        null_s.alias("trace_state"),
        null_s.alias("scope_name"),
        null_s.alias("scope_version"),
        null_m.alias("scope_attributes"),
        F.col("ts").alias("timestamp"),
        day, hour,
        null_s.alias("label_environment"),
    )
    # logs keep the hive layout (the read path the tail/partition
    # semantics run against), repartitioned BY the partition columns so
    # each (day,hour) dir gets ONE file instead of one per (task x dir);
    # gauge/traces write flat with date_day/hour as ordinary columns —
    # their gates read the whole table, and 2x720 partition dirs cost
    # ~15s of pure file-creation at sf0.1 for zero pruning benefit.
    (
        logs.repartition(F.col("date_day"), F.col("hour"))
        .write.mode("overwrite")
        .partitionBy("date_day", "hour")
        .parquet(signal_table_path(base, "acme", "prod", "logs"))
    )
    for name, df in [("metrics_gauge", gauge), ("traces", traces)]:
        (
            df.repartition(4)
            .write.mode("overwrite")
            .parquet(signal_table_path(base, "acme", "prod", name))
        )
    _R16_CACHE[key] = base
    return base


def _api(spark, sf_dir):
    from .api import SignalDBAPI

    return SignalDBAPI(spark, _signal_base(spark, sf_dir), "acme", "prod")


def run_routes_concurrent(*thunks):
    """Drive independent façade routes as overlapping Spark jobs
    (optimization guide §2.6): a discovery gate that issues N
    independent scans serially leaves the cluster idle during each
    scan's single-job tail, exactly like the N clients of the
    reference's HTTP server would not. Spark's scheduler happily runs
    the jobs at once; results come back in call order, so the
    assembled envelope rows are byte-identical to the serial drive.
    Errors propagate unchanged from whichever route raised."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.util import inheritable_thread_target

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(inheritable_thread_target(t)) for t in thunks]
        return [f.result() for f in futures]


# ------------------------------------------- façade envelope contracts


def q_api_prom_range_envelope(spark, sf_dir):
    """The real /prometheus/api/v1/query_range route end-to-end: daily
    sum_over_time per service through the FULL façade (tenant catalog →
    PromQL parse → lowering → matrix_to_prom envelope), then the JSON
    envelope parsed BACK into rows — bucket ints, value strings, series
    label maps all under the oracle (matrix shape: shapers.py
    matrix_to_prom; reference route endpoints/promql.rs)."""
    api = _api(spark, sf_dir)
    out = api.prom_query_range(
        "sum by (service_name) (sum_over_time(ev_value[1d]))",
        START, END, DAY,
    )
    assert out["status"] == "success", out
    assert out["data"]["resultType"] == "matrix"
    rows = []
    for series in out["data"]["result"]:
        svc = series["metric"]["service_name"]
        for b, v in series["values"]:
            rows.append((svc, int(b), float(v)))
    df = spark.createDataFrame(
        rows, "service_name string, bucket long, value double"
    )
    return df.select(
        "service_name", "bucket", F.round("value", 6).alias("value")
    ).orderBy("service_name", "bucket")


ORACLE_API_PROM_RANGE_ENVELOPE = f"""
SELECT event_type AS service_name, {_BUCKET} AS bucket,
       round(sum(value), 6) AS value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["api_prom_range_envelope"] = q_api_prom_range_envelope
ORACLES["api_prom_range_envelope"] = ORACLE_API_PROM_RANGE_ENVELOPE


def q_api_prom_instant_envelope(spark, sf_dir):
    """/prometheus/api/v1/query — the instant-vector reduce on the real
    route: one lookback window ending at END, each series reduced to
    its latest sample (matrix_to_instant_vector, promql.rs:458)."""
    api = _api(spark, sf_dir)
    out = api.prom_query("ev_value", END, lookback_s=30 * DAY)
    assert out["status"] == "success", out
    assert out["data"]["resultType"] == "vector"
    rows = []
    for series in out["data"]["result"]:
        ts, v = series["value"]
        rows.append((series["metric"]["service_name"], float(v)))
    df = spark.createDataFrame(rows, "service_name string, value double")
    return df.select(
        "service_name", F.round("value", 6).alias("value")
    ).orderBy("service_name")


ORACLE_API_PROM_INSTANT_ENVELOPE = """
SELECT event_type AS service_name, round(max_by(value, ts), 6) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
  AND ts <= TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1 ORDER BY 1
"""

QUERIES["api_prom_instant_envelope"] = q_api_prom_instant_envelope
ORACLES["api_prom_instant_envelope"] = ORACLE_API_PROM_INSTANT_ENVELOPE


def q_api_loki_streams_envelope(spark, sf_dir):
    """/loki/api/v1/query_range with a LOG selector: the streams
    envelope (one stream per label set, values as [ns_string, line])
    parsed back and rolled up — ns-string integer math, line filtering,
    and per-stream label sets under the oracle. Backward direction
    ordering is asserted inline (entries newest-first), since ordering
    inside a JSON array is invisible to a sorted-rows hash."""
    api = _api(spark, sf_dir)
    # limit = the engine's MAX_LOG_ENTRIES clamp (5000), which the
    # oracle mirrors as newest-5000 (ORDER BY ts DESC, event_id DESC
    # LIMIT 5000): below the clamp (sf0.001: 43, sf0.01: 480) the
    # limit doesn't bind and the oracle states the full match set;
    # above it (sf0.1: 5043) the truncation itself is under the oracle
    # — deterministic by the explicit trace_id tie-break the engine
    # applies at the cut (trace_id is fixed-width lowercase hex of
    # event_id, so event_id DESC restates it), not by any uniqueness
    # assumption about future-SF timestamps.
    # An unbounded limit is rejected by design — Spark lowers global
    # sort+limit to takeOrdered with an O(limit) task buffer.
    out = api.loki_query_range(
        '{service_name="click"} |= "error"', START, END,
        step_seconds=60, limit=1_000_000, direction="backward",
    )
    assert out["status"] == "success", out
    assert out["data"]["resultType"] == "streams"
    rows = []
    for stream in out["data"]["result"]:
        labels = stream["stream"]
        for ns_str, line in stream["values"]:
            rows.append((labels["service_name"], labels.get("level"),
                         int(ns_str), line))
        ns = [int(v[0]) for v in stream["values"]]
        assert ns == sorted(ns, reverse=True), "backward must be newest-first"
    df = spark.createDataFrame(
        rows, "service_name string, level string, ns long, line string"
    )
    return (
        df.groupBy("service_name", "level")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("ns").alias("min_ns"),
            F.max("ns").alias("max_ns"),
            F.sum(F.length("line")).cast("bigint").alias("sum_len"),
        )
        .orderBy("service_name", "level")
    )


ORACLE_API_LOKI_STREAMS_ENVELOPE = f"""
SELECT service_name, level, CAST(count(*) AS BIGINT) AS n,
       min(ns) AS min_ns, max(ns) AS max_ns,
       CAST(sum(length(body)) AS BIGINT) AS sum_len
FROM (
  SELECT event_type AS service_name, {_SEV_SQL} AS level,
         epoch_us(ts) * 1000 AS ns, {_BODY_SQL} AS body
  FROM events
  WHERE event_type = 'click' AND user_id % 4 = 3
  ORDER BY ts DESC, event_id DESC LIMIT 5000
)
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["api_loki_streams_envelope"] = q_api_loki_streams_envelope
ORACLES["api_loki_streams_envelope"] = ORACLE_API_LOKI_STREAMS_ENVELOPE


def q_api_loki_matrix_envelope(spark, sf_dir):
    """/loki/api/v1/query_range with a METRIC query: daily error-log
    counts per service through the façade's matrix envelope — the
    level→severity_text well-known matcher, count_over_time bucketing,
    and matrix shaping in one route."""
    api = _api(spark, sf_dir)
    out = api.loki_query_range(
        'sum by (service_name) (count_over_time({level="error"}[1d]))',
        START, END, step_seconds=DAY,
    )
    assert out["status"] == "success", out
    assert out["data"]["resultType"] == "matrix"
    rows = []
    for series in out["data"]["result"]:
        svc = series["metric"]["service_name"]
        for b, v in series["values"]:
            rows.append((svc, int(b), float(v)))
    df = spark.createDataFrame(
        rows, "service_name string, bucket long, value double"
    )
    return df.orderBy("service_name", "bucket")


ORACLE_API_LOKI_MATRIX_ENVELOPE = f"""
SELECT event_type AS service_name, {_BUCKET} AS bucket,
       CAST(count(*) AS DOUBLE) AS value
FROM events WHERE user_id % 4 = 3
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["api_loki_matrix_envelope"] = q_api_loki_matrix_envelope
ORACLES["api_loki_matrix_envelope"] = ORACLE_API_LOKI_MATRIX_ENVELOPE


def q_api_loki_discovery_envelope(spark, sf_dir):
    """/loki/api/v1/labels + /label/<x>/values on the real façade:
    label-name discovery (materialized label_* columns + attribute map
    keys) and well-known-label value routing (service_name → column,
    level → severity_text) — the discovery envelopes restated by the
    oracle as one (kind, name) relation."""
    api = _api(spark, sf_dir)
    labels, svc_vals, level_vals = run_routes_concurrent(
        api.loki_labels,
        lambda: api.loki_label_values("service_name"),
        lambda: api.loki_label_values("level"),
    )
    assert labels["status"] == "success", labels
    rows = [("label", n) for n in labels["data"]]
    for kind, vals in [("service", svc_vals), ("level", level_vals)]:
        assert vals["status"] == "success", vals
        rows += [(kind, v) for v in vals["data"]]
    df = spark.createDataFrame(rows, "kind string, name string")
    return df.orderBy("kind", "name")


ORACLE_API_LOKI_DISCOVERY_ENVELOPE = """
SELECT kind, name FROM (
  SELECT 'label' AS kind, 'namespace' AS name
  UNION ALL SELECT 'label', 'uid'
  UNION ALL SELECT DISTINCT 'service', event_type FROM events
  UNION ALL
  SELECT DISTINCT 'level',
         ['debug','info','warn','error'][CAST(user_id % 4 AS INT) + 1]
  FROM events
) ORDER BY kind, name
"""

QUERIES["api_loki_discovery_envelope"] = q_api_loki_discovery_envelope
ORACLES["api_loki_discovery_envelope"] = ORACLE_API_LOKI_DISCOVERY_ENVELOPE


def q_api_tempo_search_envelope(spark, sf_dir):
    """/tempo/api/search on the real façade: newest-N trace truncation
    (rank by most-recent span DESC, trace_id tiebreak — trace.rs:602),
    root-span identification, and the ns-string spanSet envelope,
    parsed back and rolled up per (root service, root op). The oracle
    restates the same top-1000 subset from raw events."""
    api = _api(spark, sf_dir)
    out = api.tempo_search(tags="", limit=1000)
    assert "traces" in out, out
    rows = []
    prev_start = None
    for t in out["traces"]:
        start_ns = int(t["startTimeUnixNano"])
        if prev_start is not None:
            assert start_ns <= prev_start, "search must be newest-first"
        prev_start = start_ns
        for s in t["spanSet"]["spans"]:
            rows.append((t["rootServiceName"], t["rootTraceName"],
                         start_ns, int(s["durationNanos"])))
    df = spark.createDataFrame(
        rows,
        "root_service string, root_op string, start_ns long, dur_ns long",
    )
    return (
        df.groupBy("root_service", "root_op")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("dur_ns").cast("bigint").alias("sum_dur_ns"),
            F.max("start_ns").alias("max_start_ns"),
        )
        .orderBy("root_service", "root_op")
    )


ORACLE_API_TEMPO_SEARCH_ENVELOPE = """
WITH top AS (
  SELECT event_type AS root_service,
         'op-' || CAST(event_id % 3 AS VARCHAR) AS root_op,
         epoch_us(ts) * 1000 AS start_ns,
         CAST(round(value * 1e6) AS BIGINT) AS dur_ns
  FROM events
  ORDER BY start_ns DESC, printf('%032x', event_id)
  LIMIT 1000
)
SELECT root_service, root_op, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(dur_ns) AS BIGINT) AS sum_dur_ns,
       max(start_ns) AS max_start_ns
FROM top GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["api_tempo_search_envelope"] = q_api_tempo_search_envelope
ORACLES["api_tempo_search_envelope"] = ORACLE_API_TEMPO_SEARCH_ENVELOPE


def q_api_sql_envelope(spark, sf_dir):
    """The raw-SQL route: tenant-scoped view resolution + the row-cap
    envelope (execute_query, flight.rs:1243-1263) — rows come back
    through the JSON envelope and must equal the oracle's rollup of the
    same tenant's logs."""
    api = _api(spark, sf_dir)
    out = api.sql(
        "SELECT service_name, severity_text, count(*) AS n, "
        "sum(severity_number) AS sev_sum "
        "FROM logs GROUP BY service_name, severity_text"
    )
    assert out["status"] == "success", out
    df = spark.createDataFrame(
        [(r["service_name"], r["severity_text"], r["n"], r["sev_sum"])
         for r in out["data"]],
        "service_name string, severity_text string, n long, sev_sum long",
    )
    return df.orderBy("service_name", "severity_text")


ORACLE_API_SQL_ENVELOPE = f"""
SELECT event_type AS service_name, {_SEV_SQL} AS severity_text,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum([5,9,13,17][CAST(user_id % 4 AS INT) + 1]) AS BIGINT)
         AS sev_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["api_sql_envelope"] = q_api_sql_envelope
ORACLES["api_sql_envelope"] = ORACLE_API_SQL_ENVELOPE


# ------------------------------------- session-conf self-sufficiency


def q_int96_session_stats_selfcheck(spark, sf_dir):
    """Adversarial-embedder conf gate: the session is pinned to the
    WORST write conf (INT96, the stats-blind legacy encoding) before
    the engine writes — the manifest write path must still record
    complete per-file ts stats because it pins TIMESTAMP_MICROS around
    its own writes (stats_visible_writes; round-9's driver red
    manifest_stats_report was exactly this failure under a vanilla
    session). The per-day stats ledger must equal the oracle's real
    min/max."""
    from .storage.manifest import ManifestTable, write_batch_manifest

    key = ("int96", sf_dir)
    if key not in _R16_CACHE:
        tmp = _tempfile.mkdtemp(prefix="sdb-r16-int96-")
        e = load_table(spark, sf_dir, "events").select(
            F.col("ts").alias("timestamp"),
            F.to_date("ts").cast("string").alias("date_day"),
            F.hour("ts").cast("int").alias("hour"),
            "event_type",
        ).repartition(F.col("date_day"), F.col("hour"))
        conf_key = "spark.sql.parquet.outputTimestampType"
        prev = spark.conf.get(conf_key)
        spark.conf.set(conf_key, "INT96")
        try:
            write_batch_manifest(
                e, tmp, "logs", batch_id=0,
                partition_cols=("date_day", "hour"),
                stats_cols=("timestamp",),
            )
            # the engine must restore the adversarial conf afterwards —
            # it owns its writes, not the embedder's session
            assert spark.conf.get(conf_key) == "INT96"
        finally:
            spark.conf.set(conf_key, prev)
        _R16_CACHE[key] = tmp
    man = ManifestTable(_R16_CACHE[key]).load_manifest()
    rows = []
    for rel, stats in man.get("stats", {}).items():
        rng = stats.get("timestamp")
        assert rng is not None, f"file {rel} has no ts stats"
        day = rel.split("date_day=", 1)[1].split("/", 1)[0]
        rows.append((day, int(rng[0]), int(rng[1])))
    df = spark.createDataFrame(rows, "day string, lo long, hi long")
    return (
        df.groupBy("day")
        .agg(F.min("lo").alias("min_us"), F.max("hi").alias("max_us"))
        .orderBy("day")
    )


ORACLE_INT96_SESSION_STATS_SELFCHECK = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["int96_session_stats_selfcheck"] = q_int96_session_stats_selfcheck
ORACLES["int96_session_stats_selfcheck"] = ORACLE_INT96_SESSION_STATS_SELFCHECK


def q_tz_repin_epoch_consistency(spark, sf_dir):
    """Timezone-pin gate: the session timezone is set to a non-UTC zone
    (what a U.S.-east embedder session looks like) and the engine's
    catalog entry point must repin UTC (pin_time_confs) so epoch
    arithmetic still matches the oracle's UTC wall-time reading of the
    same naive parquet timestamps."""
    conf_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "America/New_York")
    try:
        e = load_table(spark, sf_dir, "events")
        assert spark.conf.get(conf_key) == "UTC", (
            "catalog must repin the session to UTC"
        )
        return (
            e.select(
                F.expr("unix_micros(ts) div 3600000000").alias("hour_bucket"),
                _cents_col().alias("cents"),
            )
            .groupBy("hour_bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("cents").cast("bigint").alias("cents_sum"),
            )
            .orderBy("hour_bucket")
        )
    finally:
        # leave the engine's pin in place (UTC) — restoring the
        # embedder zone here would re-break later time arithmetic;
        # the pin-once contract is documented on pin_time_confs
        if prev == "UTC":
            spark.conf.set(conf_key, prev)


ORACLE_TZ_REPIN_EPOCH_CONSISTENCY = f"""
SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_CENTS_SQL}) AS BIGINT) AS cents_sum
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["tz_repin_epoch_consistency"] = q_tz_repin_epoch_consistency
ORACLES["tz_repin_epoch_consistency"] = ORACLE_TZ_REPIN_EPOCH_CONSISTENCY


# --------------------------------- LogQL output stages, metric path


def _r16_logql_ctx(spark, sf_dir):
    from .bench_logql import _ctx

    return _ctx(spark, sf_dir)


def q_logql_keep_stage_metric(spark, sf_dir):
    """LogQL `| keep service` on the METRIC path: keep prunes every
    label NOT listed, so the later `by (user)` grouping must see one
    NULL-label group per bucket (total counts) — if keep were
    parsed-and-ignored the result would be per-user series instead
    (the r9 metric-path stage execution, complement of the round-15
    `drop` gate)."""
    from .logql.lowering import query_metric

    out = query_metric(
        _r16_logql_ctx(spark, sf_dir),
        'sum by (user) (count_over_time('
        '{service=~".+"} | keep service [1d]))',
    )
    return out.select("bucket", F.col("user"), "value").orderBy("bucket")


ORACLE_LOGQL_KEEP_STAGE_METRIC = f"""
SELECT {_BUCKET} AS bucket, CAST(NULL AS VARCHAR) AS user,
       CAST(count(*) AS DOUBLE) AS value
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["logql_keep_stage_metric"] = q_logql_keep_stage_metric
ORACLES["logql_keep_stage_metric"] = ORACLE_LOGQL_KEEP_STAGE_METRIC


def q_logql_unpack_metric_path(spark, sf_dir):
    """LogQL `| unpack` on the METRIC path: the body is Promtail-packed
    JSON ({"_entry": <real line>}); unpack must replace the body with
    _entry BEFORE the logfmt stage extracts `cents` for the unwrap sum.
    If unpack did not execute, logfmt would scan the JSON wrapper, find
    no cents key, and every bucket would unwrap NULL."""
    from .logql.lowering import LowerCtx, query_metric

    e = load_table(spark, sf_dir, "events")
    packed = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit(None).cast("string").alias("severity_text"),
        F.lit(None).cast("string").alias("label_namespace"),
        F.to_json(
            F.struct(
                F.concat(
                    F.lit("evt="), F.col("event_id").cast("string"),
                    F.lit(" cents="), _cents_col().cast("string"),
                ).alias("_entry")
            )
        ).alias("body"),
        F.create_map(
            F.lit("user"), F.col("user_id").cast("string")
        ).alias("log_attributes"),
    )
    ctx = LowerCtx(spark, packed, START, END, DAY)
    out = query_metric(
        ctx,
        'sum by (service) (sum_over_time('
        '{service=~".+"} | unpack | logfmt | unwrap cents [1d]))',
    )
    return out.select(
        "bucket", "service_name", F.round("value", 6).alias("value")
    ).orderBy("bucket", "service_name")


ORACLE_LOGQL_UNPACK_METRIC_PATH = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round(sum({_CENTS_SQL}), 6) AS value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["logql_unpack_metric_path"] = q_logql_unpack_metric_path
ORACLES["logql_unpack_metric_path"] = ORACLE_LOGQL_UNPACK_METRIC_PATH


# --------------------------------------------- document chunking ops


def q_doc_chunk_windows(spark, sf_dir):
    """Overlapping token-window chunking (size 64, stride 48) rolled up
    per source: chunk counts, token coverage, and the tail-chunk fill —
    the pretraining document splitter as a map-only fan-out
    (operators/corpus.chunk_token_windows)."""
    from .operators.corpus import chunk_token_windows

    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_token_windows(d, "doc_id", "text", 64, 48)
    j = chunks.join(d.select("doc_id", "source"), "doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("chunk_tokens").cast("bigint").alias("sum_chunk_tokens"),
            F.min("chunk_tokens").cast("bigint").alias("min_chunk_tokens"),
        )
        .orderBy("source")
    )


ORACLE_DOC_CHUNK_WINDOWS = """
WITH tok AS (
  SELECT doc_id, source,
         len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
             ' ')) AS n_tok
  FROM documents
), spec AS (
  SELECT doc_id, source, n_tok,
         greatest(1, CAST(ceil((n_tok - 64) / 48.0) AS INT) + 1) AS n_chunks
  FROM tok
), chunks AS (
  SELECT s.doc_id, s.source,
         least(64, s.n_tok - (i.i * 48)) AS chunk_tokens
  FROM spec s, LATERAL (
    SELECT unnest(generate_series(0, s.n_chunks - 1)) AS i
  ) i
)
SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
       CAST(min(chunk_tokens) AS BIGINT) AS min_chunk_tokens
FROM chunks GROUP BY 1 ORDER BY 1
"""

QUERIES["doc_chunk_windows"] = q_doc_chunk_windows
ORACLES["doc_chunk_windows"] = ORACLE_DOC_CHUNK_WINDOWS


def q_chunk_overlap_audit(spark, sf_dir):
    """Chunk-boundary honesty audit: for every consecutive chunk pair
    the overlap region must be exactly chunk_size - stride tokens (16
    here) except at the document tail, and the concatenated stride
    prefixes must reconstruct the document's token count — chunking
    that silently drops or duplicates tokens corrupts every downstream
    training mix. Verified as a per-source relation of coverage
    invariants."""
    from .operators.corpus import chunk_token_windows

    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_token_windows(d, "doc_id", "text", 64, 48)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_id").alias("max_id"),
        # tokens covered exactly once = stride per non-final chunk plus
        # the final chunk's full width
        (F.lit(48) * (F.count(F.lit(1)) - 1)
         + F.max_by("chunk_tokens", "chunk_id")).alias("covered"),
    )
    toks = d.select(
        "doc_id", "source",
        F.size(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
            )
        ).alias("n_tok"),
    )
    j = per_doc.join(toks, "doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.sum((F.col("covered") == F.col("n_tok")).cast("long"))
            .cast("bigint").alias("docs_fully_covered"),
            F.sum((F.col("max_id") + 1 == F.col("n_chunks")).cast("long"))
            .cast("bigint").alias("docs_contiguous_ids"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
        .orderBy("source")
    )


ORACLE_CHUNK_OVERLAP_AUDIT = """
SELECT source, CAST(count(*) AS BIGINT) AS docs_fully_covered,
       CAST(count(*) AS BIGINT) AS docs_contiguous_ids,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""

QUERIES["chunk_overlap_audit"] = q_chunk_overlap_audit
ORACLES["chunk_overlap_audit"] = ORACLE_CHUNK_OVERLAP_AUDIT


# ------------------------------------------------ BPE merge learning


def _bpe_merges_cached(spark, sf_dir, n=6):
    key = ("bpe", sf_dir, n)
    if key not in _R16_CACHE:
        from .operators.corpus import bpe_learn_merges

        d = load_table(spark, sf_dir, "documents")
        _R16_CACHE[key] = bpe_learn_merges(d, "text", n_merges=n)
    return _R16_CACHE[key]


def _bpe_oracle_ctes(n: int) -> str:
    """The DuckDB restatement of the BPE loop: n chained
    (pairs → argmax → greedy replace) stages over the vocabulary, the
    same |l||r| delimited form and (weight DESC, l, r) tie-break."""
    parts = [r"""WITH w AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ',
           'g')), ' ')) AS w
    FROM documents
  ) WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w
), v0 AS MATERIALIZED (
  SELECT w, freq,
         '|' || array_to_string(regexp_extract_all(w, '.'), '||') || '|'
           AS seq
  FROM w
)"""]
    for i in range(n):
        parts.append(f""", p{i} AS MATERIALIZED (
  SELECT u.p[1] AS l, u.p[2] AS r, CAST(sum(t.freq) AS BIGINT) AS weight
  FROM (SELECT freq, string_split(trim(seq, '|'), '||') AS syms
        FROM v{i}) t,
  LATERAL (SELECT unnest(
      list_zip(t.syms[:len(t.syms)-1], t.syms[2:])) AS p) u
  GROUP BY 1, 2
), b{i} AS MATERIALIZED (SELECT l, r, weight FROM p{i}
  ORDER BY weight DESC, l, r LIMIT 1),
v{i + 1} AS MATERIALIZED (
  SELECT w, freq, replace(seq,
    '|' || (SELECT l FROM b{i}) || '||' || (SELECT r FROM b{i}) || '|',
    '|' || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || '|') AS seq
  FROM v{i}
)""")
    return "".join(parts)


_BPE_N = 6


def q_bpe_merge_table(spark, sf_dir):
    """Distributed BPE merge learning over the documents corpus
    (operators/corpus.bpe_learn_merges): the 6 highest-frequency
    adjacent symbol pairs, learned iteratively with greedy left-to-
    right application between rounds, must equal the oracle's 6-stage
    SQL restatement — pair counts, tie-breaks, and overlap semantics
    (a self-pair on a run merges floor(run/2) times) all hash-gated."""
    merges = _bpe_merges_cached(spark, sf_dir, _BPE_N)
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["weight"])
         for m in merges],
        "mrank int, left_sym string, right_sym string, merged string,"
        " weight long",
    ).orderBy("mrank")


ORACLE_BPE_MERGE_TABLE = _bpe_oracle_ctes(_BPE_N) + "\nSELECT * FROM (\n" + \
    "\nUNION ALL\n".join(
        f"SELECT {i} AS mrank, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, weight FROM b{i}"
        for i in range(_BPE_N)
    ) + "\n) ORDER BY mrank"

QUERIES["bpe_merge_table"] = q_bpe_merge_table
ORACLES["bpe_merge_table"] = ORACLE_BPE_MERGE_TABLE


def q_bpe_compression_by_source(spark, sf_dir):
    """Apply the learned merge table back to the corpus
    (bpe_apply_merges, map-only replace chain): per source, total
    post-merge symbols and participating word occurrences — the
    compression a tokenizer trainer reports. The oracle re-derives the
    merges AND re-tokenizes in SQL."""
    from .operators.corpus import bpe_apply_merges

    merges = _bpe_merges_cached(spark, sf_dir, _BPE_N)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    per_doc = bpe_apply_merges(d, merges, "text", id_col="doc_id")
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("bpe_symbols").cast("long").alias("bpe_symbols"),
            F.sum("bpe_words").cast("long").alias("bpe_words"),
        )
        .orderBy("source")
    )


ORACLE_BPE_COMPRESSION_BY_SOURCE = _bpe_oracle_ctes(_BPE_N) + rf""", occ AS (
  SELECT source, w FROM (
    SELECT source, unnest(string_split(trim(regexp_replace(lower(text),
           '\s+', ' ', 'g')), ' ')) AS w
    FROM documents
  ) WHERE regexp_matches(w, '^[a-z0-9]+$')
)
SELECT occ.source,
  CAST(sum(len(string_split(trim(v.seq, '|'), '||'))) AS BIGINT)
    AS bpe_symbols,
  CAST(count(*) AS BIGINT) AS bpe_words
FROM occ JOIN v{_BPE_N} v ON occ.w = v.w
GROUP BY 1 ORDER BY 1"""

QUERIES["bpe_compression_by_source"] = q_bpe_compression_by_source
ORACLES["bpe_compression_by_source"] = ORACLE_BPE_COMPRESSION_BY_SOURCE


# ------------------------------- cross-document duplicated passages


def q_shared_passage_extraction(spark, sf_dir):
    """ExactSubstr-style duplicated-passage extraction
    (operators/dedup.shared_passages) over a corpus with INJECTED
    copies: every 5th document contributes a clone holding exactly its
    tokens 11..40, and the detector must report each maximal shared run
    (>= 16 tokens, 8-token shingles) with exact positions — plus
    whatever passages the base corpus genuinely shares, since the
    oracle replays the full shingle→shared-filter→diagonal-island
    pipeline on strings."""
    from .operators.dedup import normalize_text, shared_passages

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(normalize_text(F.col("text")), " ")
    copies = (
        d.filter((F.col("doc_id") % 5 == 0) & (F.size(toks) >= 40))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.array_join(F.slice(toks, 11, 30), " ").alias("text"),
        )
    )
    corpus = d.select("doc_id", "text").unionByName(copies)
    out = shared_passages(
        corpus, "doc_id", "text", n=8, min_tokens=16, max_shingle_df=64
    )
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("start_a").cast("long").alias("start_a"),
        F.col("start_b").cast("long").alias("start_b"),
        "match_tokens",
    ).orderBy("id_a", "id_b", "start_a", "start_b")


ORACLE_SHARED_PASSAGE_EXTRACTION = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                      ' ') AS toks
  FROM documents
), corpus AS MATERIALIZED (
  SELECT doc_id, toks FROM toks
  UNION ALL
  SELECT doc_id + 1000000, toks[11:40] FROM toks
  WHERE doc_id % 5 = 0 AND len(toks) >= 40
), sh AS MATERIALIZED (
  SELECT c.doc_id AS id, u.i - 1 AS pos,
         array_to_string(c.toks[u.i:u.i+7], ' ') AS g
  FROM corpus c,
       LATERAL (SELECT unnest(generate_series(1, len(c.toks) - 7)) AS i) u
  WHERE len(c.toks) >= 8
), shared AS MATERIALIZED (
  SELECT g FROM sh GROUP BY g
  HAVING count(DISTINCT id) BETWEEN 2 AND 64
), hits AS MATERIALIZED (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.pos AS pos_a,
         b.pos AS pos_b, a.pos - b.pos AS diag
  FROM sh a
  JOIN shared s ON a.g = s.g
  JOIN sh b ON a.g = b.g
  WHERE a.id < b.id
), runs AS (
  SELECT id_a, id_b, diag, pos_a, pos_b,
         pos_a - row_number() OVER (
           PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS island
  FROM hits
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(min(pos_a) AS BIGINT) AS start_a,
       CAST(min(pos_b) AS BIGINT) AS start_b,
       CAST(count(*) + 7 AS BIGINT) AS match_tokens
FROM runs GROUP BY id_a, id_b, diag, island
HAVING count(*) + 7 >= 16
ORDER BY id_a, id_b, start_a, start_b
"""

QUERIES["shared_passage_extraction"] = q_shared_passage_extraction
ORACLES["shared_passage_extraction"] = ORACLE_SHARED_PASSAGE_EXTRACTION


# ------------------------------------------- epoch shuffle batching


def q_epoch_shuffle_batches(spark, sf_dir):
    """Deterministic training-epoch shuffling
    (operators/corpus.epoch_shuffle_batches): two epochs over the
    documents corpus, batch size 64 — the per-batch composition
    (exact-size batches, md5-permutation order, per-epoch
    reshuffling) restated by the oracle with a plain global
    row_number, which the engine computes scale-safely as
    bucket-local ranks + broadcast bucket offsets."""
    from .operators.corpus import epoch_shuffle_batches

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    parts = []
    for epoch in (1, 2):
        b = epoch_shuffle_batches(d, "doc_id", epoch=epoch, batch_size=64)
        parts.append(
            b.groupBy("batch_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
                F.min("shuffle_key").alias("first_key"),
                F.max_by("doc_id", F.col("pos_in_batch")).cast("bigint")
                .alias("last_doc_id"),
            )
            .select(F.lit(epoch).alias("epoch"), "batch_id", "n",
                    "sum_doc_id", "first_key", "last_doc_id")
        )
    return parts[0].unionByName(parts[1]).orderBy("epoch", "batch_id")


ORACLE_EPOCH_SHUFFLE_BATCHES = """
WITH ranked AS (
  SELECT epoch, doc_id,
         md5('shuffle:' || epoch || ':' || doc_id) AS shuffle_key,
         row_number() OVER (
           PARTITION BY epoch
           ORDER BY md5('shuffle:' || epoch || ':' || doc_id), doc_id
         ) - 1 AS rank
  FROM documents, (SELECT unnest([1, 2]) AS epoch)
)
SELECT epoch, CAST(rank // 64 AS BIGINT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
       min(shuffle_key) AS first_key,
       CAST(max_by(doc_id, rank) AS BIGINT) AS last_doc_id
FROM ranked GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["epoch_shuffle_batches"] = q_epoch_shuffle_batches
ORACLES["epoch_shuffle_batches"] = ORACLE_EPOCH_SHUFFLE_BATCHES
