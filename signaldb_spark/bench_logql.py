"""Driver-gate queries that exercise the FULL LogQL pipeline
(parse → plan → lower → execute) over a logs-shaped view of the events
table, with plain-SQL oracles. This puts the dialect frontend itself
under the cross-engine correctness gate, not just the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .logql import lowering
from .logql.lowering import LowerCtx, query_metric

START, END = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
DAY = 86400
_BUCKET = "CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)"


def _logs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt events to the logs schema surface the lowering consumes:
    event_type plays service_name, props (JSON) plays body."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit(None).cast("string").alias("severity_text"),
        F.lit(None).cast("string").alias("label_namespace"),
        F.col("props").alias("body"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias("log_attributes"),
    )


def _ctx(spark, sf_dir):
    return LowerCtx(spark, _logs_view(spark, sf_dir), START, END, DAY)


def q_logql_count_by_service(spark, sf_dir):
    out = query_metric(
        _ctx(spark, sf_dir), 'sum by (service) (count_over_time({service=~".+"}[1d]))'
    )
    return out.select("bucket", "service_name", "value")


ORACLE_LOGQL_COUNT = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       CAST(count(*) AS DOUBLE) AS value
FROM events GROUP BY 1, 2
"""


def q_logql_error_ratio(spark, sf_dir):
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum(count_over_time({service="error"}[1d]))'
        " / sum(count_over_time({service=~\".+\"}[1d]))",
    )
    return out.select("bucket", F.round("value", 6).alias("value"))


ORACLE_LOGQL_ERROR_RATIO = f"""
WITH err AS (
  SELECT {_BUCKET} AS bucket, CAST(count(*) AS DOUBLE) AS v
  FROM events WHERE event_type = 'error' GROUP BY 1
), tot AS (
  SELECT {_BUCKET} AS bucket, CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1
)
SELECT e.bucket, round(e.v / t.v, 6) AS value
FROM err e JOIN tot t ON e.bucket = t.bucket
"""


def q_logql_json_quantile(spark, sf_dir):
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (service) (quantile_over_time(0.9, {service=~".+"} | json | unwrap k [1d]))',
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_LOGQL_JSON_QUANTILE = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round(quantile_cont(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.9), 6) AS value
FROM events GROUP BY 1, 2
"""


def q_logql_line_filter_topk(spark, sf_dir):
    out = query_metric(
        _ctx(spark, sf_dir),
        'topk(2, sum by (service) (count_over_time({service=~".+"} |= "8" [1d])))',
    )
    return out.select("bucket", "service_name", "value")


ORACLE_LOGQL_TOPK = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CAST(count(*) AS DOUBLE) AS value
  FROM events WHERE contains(props, '8') GROUP BY 1, 2
), r AS (
  SELECT bucket, service_name, value,
         row_number() OVER (PARTITION BY bucket ORDER BY value DESC, service_name ASC) AS rk
  FROM m
)
SELECT bucket, service_name, value FROM r WHERE rk <= 2
"""


def q_logql_attr_unless(spark, sf_dir):
    """Full pipeline with map-attribute filter + logical unless:
    buckets where purchases happened unless errors happened, per user
    (attribute-routed label)."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (user) (count_over_time({service="purchase"}[1d]))'
        " unless on (user) "
        'sum by (user) (count_over_time({service="error"}[1d]))',
    )
    return out.select("bucket", F.col("user").alias("user"), "value")


ORACLE_LOGQL_ATTR_UNLESS = f"""
WITH p AS (
  SELECT {_BUCKET} AS bucket, CAST(user_id AS VARCHAR) AS user,
         CAST(count(*) AS DOUBLE) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), r AS (
  SELECT {_BUCKET} AS bucket, CAST(user_id AS VARCHAR) AS user
  FROM events WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT p.bucket, p.user, p.value FROM p
ANTI JOIN r ON p.bucket = r.bucket AND p.user = r.user
"""


def q_logql_label_format(spark, sf_dir):
    """Full pipeline with an executed label_format template: the derived
    label feeds by() grouping, and a json-extracted field feeds a second
    template var (_render_template; the reference parses but ignores
    this stage — logql.rs:107-128)."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (tag) (count_over_time('
        '{service=~".+"} | json | label_format tag="{{.service}}:{{.k}}" [1d]))',
    )
    return out.select("bucket", "tag", "value")


ORACLE_LOGQL_LABEL_FORMAT = f"""
SELECT {_BUCKET} AS bucket,
       event_type || ':' || coalesce(json_extract_string(props, '$.k'), '') AS tag,
       CAST(count(*) AS DOUBLE) AS value
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "logql_count_by_service": q_logql_count_by_service,
    "logql_label_format": q_logql_label_format,
    "logql_error_ratio": q_logql_error_ratio,
    "logql_json_quantile": q_logql_json_quantile,
    "logql_line_filter_topk": q_logql_line_filter_topk,
    "logql_attr_unless": q_logql_attr_unless,
}

ORACLES = {
    "logql_count_by_service": ORACLE_LOGQL_COUNT,
    "logql_label_format": ORACLE_LOGQL_LABEL_FORMAT,
    "logql_error_ratio": ORACLE_LOGQL_ERROR_RATIO,
    "logql_json_quantile": ORACLE_LOGQL_JSON_QUANTILE,
    "logql_line_filter_topk": ORACLE_LOGQL_TOPK,
    "logql_attr_unless": ORACLE_LOGQL_ATTR_UNLESS,
}


def q_logql_labels(spark, sf_dir):
    """Loki /loki/api/v1/labels analog: materialized label_* columns
    plus every attribute-map key, deduped/sorted/capped in-engine
    (maintenance.jobs.detected_labels; logs.rs:397-475)."""
    from .maintenance.jobs import detected_labels

    return detected_labels(_logs_view(spark, sf_dir))


# the logs view carries one materialized label column (namespace) and
# one attribute key (user, present on every row via create_map)
ORACLE_LOGQL_LABELS = """
SELECT 'namespace' AS label UNION ALL SELECT 'user' ORDER BY 1
"""

QUERIES["logql_labels"] = q_logql_labels
ORACLES["logql_labels"] = ORACLE_LOGQL_LABELS


def q_logql_label_values(spark, sf_dir):
    """/loki/api/v1/label/user/values analog (jobs.label_values):
    attribute-map route — distinct non-empty values, sorted, capped."""
    from .maintenance.jobs import label_values

    return label_values(_logs_view(spark, sf_dir), "user")


ORACLE_LOGQL_LABEL_VALUES = """
SELECT DISTINCT CAST(user_id AS VARCHAR) AS value
FROM events WHERE user_id IS NOT NULL
ORDER BY value LIMIT 1000
"""


def q_logql_series(spark, sf_dir):
    """/loki/api/v1/series analog (jobs.log_series): distinct label sets
    over a selector-filtered stream; the view has null severity, so the
    sets are service-only."""
    from .maintenance.jobs import log_series

    return log_series(_logs_view(spark, sf_dir))


ORACLE_LOGQL_SERIES = """
SELECT DISTINCT event_type AS service_name, CAST(NULL AS VARCHAR) AS level
FROM events WHERE event_type IS NOT NULL AND event_type != ''
ORDER BY service_name LIMIT 1000
"""

QUERIES["logql_label_values"] = q_logql_label_values
ORACLES["logql_label_values"] = ORACLE_LOGQL_LABEL_VALUES
QUERIES["logql_series"] = q_logql_series
ORACLES["logql_series"] = ORACLE_LOGQL_SERIES


def q_logql_volume(spark, sf_dir):
    """/loki/api/v1/index/volume — the oracle-gated aggregation the
    loki_index_volume façade route also runs (lowering.index_volume).
    Unbounded here so the oracle covers the whole table; the endpoint
    passes the request window."""
    return lowering.index_volume(_logs_view(spark, sf_dir))


ORACLE_LOGQL_VOLUME = """
SELECT event_type AS service_name,
       CAST(sum(octet_length(CAST(props AS BLOB))) AS BIGINT) AS volume_bytes,
       CAST(count(*) AS BIGINT) AS n_lines
FROM events GROUP BY 1 ORDER BY 1
"""

QUERIES["logql_volume"] = q_logql_volume
ORACLES["logql_volume"] = ORACLE_LOGQL_VOLUME


def q_logql_patterns(spark, sf_dir):
    """Log template mining (lowering.log_patterns) over the events-props
    JSON bodies: digits/hex/uuid runs → placeholders, top templates by
    frequency with a deterministic example line."""
    from .logql.lowering import log_patterns

    return log_patterns(_logs_view(spark, sf_dir), k=50)


ORACLE_LOGQL_PATTERNS = r"""
WITH norm AS (
  SELECT regexp_replace(
           regexp_replace(
             regexp_replace(props,
               '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}',
               '<UUID>', 'g'),
             '\b[0-9a-fA-F]{16,}\b', '<HEX>', 'g'),
           '\d+', '<N>', 'g') AS template,
         props AS raw
  FROM events
)
SELECT template, CAST(count(*) AS BIGINT) AS count, min(raw) AS example
FROM norm GROUP BY template
ORDER BY count DESC, template ASC LIMIT 50
"""

QUERIES["logql_patterns"] = q_logql_patterns
ORACLES["logql_patterns"] = ORACLE_LOGQL_PATTERNS


def q_logql_regexp_stage(spark, sf_dir):
    """Loki ``| regexp`` stage with an RE2 named capture group becoming
    a grouping label, end-to-end through the pipeline."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (kv) (count_over_time('
        '{service=~".+"} | regexp "\\"k\\": (?P<kv>[0-9]+)" [1d]))',
    )
    return out.select("bucket", F.col("kv"), "value")


ORACLE_LOGQL_REGEXP_STAGE = f"""
SELECT {_BUCKET} AS bucket,
       regexp_extract(props, '"k": ([0-9]+)', 1) AS kv,
       CAST(count(*) AS DOUBLE) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["logql_regexp_stage"] = q_logql_regexp_stage
ORACLES["logql_regexp_stage"] = ORACLE_LOGQL_REGEXP_STAGE


def q_logql_pattern_stage(spark, sf_dir):
    """Loki ``| pattern`` stage: placeholder template extraction feeding
    an unwrap aggregation."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (service) (sum_over_time('
        '{service=~".+"} | pattern "{\\"k\\": <pk>}" | unwrap pk [1d]))',
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_LOGQL_PATTERN_STAGE = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round(sum(CAST(regexp_extract(props, '^\\{{"k": (.*)\\}}$', 1) AS DOUBLE)), 6) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["logql_pattern_stage"] = q_logql_pattern_stage
ORACLES["logql_pattern_stage"] = ORACLE_LOGQL_PATTERN_STAGE


def q_logql_vector_fill(spark, sf_dir):
    """The canonical Loki zero-fill idiom: ``sum(...) or vector(0)``
    synthesizes a value for every empty step (logs.rs:1189
    synthesize_vector + or-union semantics)."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum(count_over_time({service="error"}[1d])) or vector(0)',
    )
    return out.select("bucket", "value")


ORACLE_LOGQL_VECTOR_FILL = f"""
WITH err AS (
  SELECT {_BUCKET} AS bucket, CAST(count(*) AS DOUBLE) AS value
  FROM events WHERE event_type = 'error' GROUP BY 1
),
spine AS (
  SELECT CAST(b AS BIGINT) AS bucket, 0.0 AS value
  FROM UNNEST(range(1704067200, 1706745601, 86400)) u(b)
)
SELECT s.bucket, coalesce(e.value, s.value) AS value
FROM spine s LEFT JOIN err e USING (bucket)
"""

QUERIES["logql_vector_fill"] = q_logql_vector_fill
ORACLES["logql_vector_fill"] = ORACLE_LOGQL_VECTOR_FILL


def q_logql_approx_topk(spark, sf_dir):
    """approx_topk (Loki 3.3): lowered to the salted two-phase window
    (timeseries.topk_per_bucket_salted) — per-(bucket, salt) partial
    top-k then a final merge over ≤ salts·k survivors. EXACT output
    (every global winner survives its salt group under the same total
    order), so the oracle is plain top-k; the point is the first
    window partitions a hot bucket over 16 tasks instead of one."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'approx_topk(2, sum by (service) (count_over_time({service=~".+"}[1d])))',
    )
    return out.select("bucket", "service_name", "value")


ORACLE_LOGQL_APPROX_TOPK = f"""
WITH m AS (
  SELECT {_BUCKET} AS bucket, event_type AS service_name,
         CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
), r AS (
  SELECT bucket, service_name, value,
         row_number() OVER (PARTITION BY bucket ORDER BY value DESC, service_name ASC) AS rk
  FROM m
)
SELECT bucket, service_name, value FROM r WHERE rk <= 2
"""

QUERIES["logql_approx_topk"] = q_logql_approx_topk
ORACLES["logql_approx_topk"] = ORACLE_LOGQL_APPROX_TOPK


def q_logql_pattern_filter(spark, sf_dir):
    """Loki 3.x ``|>`` pattern line filter: literal text with <_>
    wildcards, anchored — lowered to one rlike, no parser stage."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (service) (count_over_time({service=~".+"} |> "{\\"k\\": 8<_>}" [1d]))',
    )
    return out.select("bucket", "service_name", "value")


ORACLE_LOGQL_PATTERN_FILTER = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       CAST(count(*) AS DOUBLE) AS value
FROM events
WHERE regexp_matches(props, '^\\{{"k": 8.*\\}}$')
GROUP BY 1, 2
"""

QUERIES["logql_pattern_filter"] = q_logql_pattern_filter
ORACLES["logql_pattern_filter"] = ORACLE_LOGQL_PATTERN_FILTER


def _dirty_logs_view(spark, sf_dir):
    """Logs view where every third user's body is NOT valid JSON — the
    shape __error__ semantics exist for."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit(None).cast("string").alias("severity_text"),
        F.lit(None).cast("string").alias("label_namespace"),
        F.when(F.col("user_id") % 3 == 0, F.concat(F.lit("garbage "), F.col("props")))
        .otherwise(F.col("props"))
        .alias("body"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias("log_attributes"),
    )


def q_logql_error_label(spark, sf_dir):
    """Loki __error__ semantics: a failing `| json` TAGS the line
    (JSONParserErr) instead of dropping it; `| __error__=""` then
    filters the failures — counts only clean-JSON lines."""
    ctx = LowerCtx(spark, _dirty_logs_view(spark, sf_dir), START, END, DAY)
    out = query_metric(
        ctx,
        'sum by (service) (count_over_time({service=~".+"} | json | __error__="" [1d]))',
    )
    return out.select("bucket", "service_name", "value")


ORACLE_LOGQL_ERROR_LABEL = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       CAST(count(*) AS DOUBLE) AS value
FROM events
WHERE user_id % 3 <> 0
GROUP BY 1, 2
"""

QUERIES["logql_error_label"] = q_logql_error_label
ORACLES["logql_error_label"] = ORACLE_LOGQL_ERROR_LABEL


def q_logql_rate_counter(spark, sf_dir):
    """rate_counter (Loki): Prometheus-style (last − first)/range over
    an unwrapped counter label — here the json-parsed k value plays the
    counter."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (service) (rate_counter({service=~".+"} | json | unwrap k [1d]))',
    )
    return out.select("bucket", "service_name", F.round("value", 9).alias("value"))


ORACLE_LOGQL_RATE_COUNTER = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round((max_by(CAST(json_extract_string(props, '$.k') AS DOUBLE), ts)
              - min_by(CAST(json_extract_string(props, '$.k') AS DOUBLE), ts))
             / 86400.0, 9) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["logql_rate_counter"] = q_logql_rate_counter
ORACLES["logql_rate_counter"] = ORACLE_LOGQL_RATE_COUNTER


def q_logql_unwrap_duration(spark, sf_dir):
    """Unwrap conversion function (| unwrap duration(took)): the view
    renders each event value as a Go-duration string "<v>ms"; the
    engine parses it back to seconds — so the oracle is sum(value)/1000."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("service_name"),
        F.lit(None).cast("string").alias("severity_text"),
        F.lit(None).cast("string").alias("label_namespace"),
        F.concat(F.lit("took="), F.col("value").cast("string"), F.lit("ms")).alias("body"),
        F.create_map().cast("map<string,string>").alias("log_attributes"),
    )
    ctx = LowerCtx(spark, v, START, END, DAY)
    out = query_metric(
        ctx,
        'sum by (service) (sum_over_time({service=~".+"} | logfmt | unwrap duration(took) [1d]))',
    )
    return out.select("bucket", "service_name", F.round("value", 6).alias("value"))


ORACLE_LOGQL_UNWRAP_DURATION = f"""
SELECT {_BUCKET} AS bucket, event_type AS service_name,
       round(sum(value / 1000.0), 6) AS value
FROM events GROUP BY 1, 2
"""

QUERIES["logql_unwrap_duration"] = q_logql_unwrap_duration
ORACLES["logql_unwrap_duration"] = ORACLE_LOGQL_UNWRAP_DURATION


def q_logql_offset(spark, sf_dir):
    """Range-selector offset (`[1d] offset 1d`): each bucket reports the
    PREVIOUS day's count — the window shifts back, results stamp at the
    query's own buckets."""
    out = query_metric(
        _ctx(spark, sf_dir),
        'sum by (service) (count_over_time({service=~".+"}[1d] offset 1d))',
    )
    return out.select("bucket", "service_name", "value")


# the engine window is [START, END]; shifted back 1d it covers
# [START-1d, END-1d], so buckets re-stamp at day+86400 and only those
# landing inside [START, END] appear
ORACLE_LOGQL_OFFSET = f"""
WITH c AS (
  SELECT {_BUCKET} + 86400 AS bucket, event_type AS service_name,
         CAST(count(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2
)
SELECT * FROM c
WHERE bucket BETWEEN epoch('2024-01-01 00:00:00'::TIMESTAMP)
                 AND epoch('2024-02-01 00:00:00'::TIMESTAMP)
"""

QUERIES["logql_offset"] = q_logql_offset
ORACLES["logql_offset"] = ORACLE_LOGQL_OFFSET


def q_logql_ip_filter(spark, sf_dir):
    """Loki ``ip()`` matcher (log-queries docs; line-filter form
    ``|= ip("10.3.0.0/16")``): IPv4s are extracted from the line and
    compared NUMERICALLY against the CIDR range (lowering.line_ip_hit)
    — string prefix matching would accept 10.30.*. The view synthesizes
    a client IP from the event identity so both engines derive the same
    corpus."""
    from .logql.parser import parse as logql_parse
    from .logql.lowering import line_filter_expr

    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_id",
        F.col("event_type").alias("service_name"),
        F.concat(
            F.lit("client=10."), (F.col("user_id") % 64).cast("string"),
            F.lit("."), (F.col("event_id") % 256).cast("string"),
            F.lit(".1 msg=ok"),
        ).alias("body"),
    )
    sel = logql_parse('{service_name=~".+"} |= ip("10.3.0.0/16")')
    out = v.filter(line_filter_expr(sel.line_filters[0]))
    # no presentation orderBy: a global sort over a map-only child makes
    # the range partitioner re-execute the scan to sample boundaries —
    # the sort would cost more than the filter (the gate sorts rows
    # itself before hashing)
    return out.select("event_id", "service_name", "body")


ORACLE_LOGQL_IP_FILTER = r"""
WITH v AS (
  SELECT event_id, event_type AS service_name,
         'client=10.' || (user_id % 64) || '.' || (event_id % 256) || '.1 msg=ok' AS body
  FROM events
), ip AS (
  SELECT event_id, service_name, body,
         regexp_extract(body, '(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})',
                        ['a', 'b', 'c', 'd']) AS o
  FROM v
)
SELECT event_id, service_name, body
FROM ip
WHERE o.a::BIGINT * 16777216 + o.b::BIGINT * 65536 + o.c::BIGINT * 256 + o.d::BIGINT
      BETWEEN 167968768 AND 168034303
ORDER BY event_id
"""

QUERIES["logql_ip_filter"] = q_logql_ip_filter
ORACLES["logql_ip_filter"] = ORACLE_LOGQL_IP_FILTER
