"""Prometheus remote_write → metric rows.

The reference's acceptor decodes snappy-compressed protobuf
WriteRequests (src/acceptor/src/handler/prometheus_handler.rs). Here
the decode step (snappy+proto → JSON) is gated behind an import-try —
the container has neither lib — and the row conversion, which is the
actual engine work, operates on the decoded JSON shape::

    {"timeseries": [{"labels": [{"name": "__name__", "value": "up"}, ...],
                     "samples": [{"value": 1.0, "timestamp": 1704067200000}]}]}

Routing heuristic (remote_write carries no type metadata): series whose
name ends in ``_total``/``_count``/``_sum`` land in ``metrics_sum`` as
monotonic cumulative counters; everything else in ``metrics_gauge``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WRITE_REQUEST_SCHEMA = T.StructType(
    [
        T.StructField(
            "timeseries",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "labels",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType()),
                                        T.StructField("value", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                        T.StructField(
                            "samples",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("value", T.DoubleType()),
                                        T.StructField("timestamp", T.LongType()),  # ms
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

_COUNTER_SUFFIXES = ("_total", "_count", "_sum")


def decode_snappy_protobuf(payload: bytes) -> str:
    """Wire decode (snappy + prometheus.WriteRequest proto) → JSON.

    Gated: the required libraries are not present in this container."""
    try:
        import snappy  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "remote_write wire decode requires python-snappy + protobuf; "
            "feed decoded JSON to flatten_remote_write instead"
        ) from exc
    raise NotImplementedError("proto decode path not wired")  # pragma: no cover


def flatten_remote_write(raw: DataFrame, json_col: str = "value") -> dict[str, DataFrame]:
    """Decoded WriteRequest JSON → {'metrics_gauge': df, 'metrics_sum': df}.

    One row per sample; ``__name__`` → metric_name, ``job``/``instance``
    → service identity, remaining labels → the attributes map (the same
    label routing the query side undoes, metrics.rs:2147-2218).
    """
    parsed = raw.select(F.from_json(F.col(json_col), WRITE_REQUEST_SCHEMA).alias("p"))
    series = parsed.select(F.explode("p.timeseries").alias("ts"))
    lm = F.map_from_entries(
        F.transform(
            F.col("ts.labels"),
            lambda l: F.struct(l["name"].alias("key"), l["value"].alias("value")),
        )
    )
    rows = series.select(lm.alias("labels"), F.explode("ts.samples").alias("s"))
    t = F.timestamp_millis(F.col("s.timestamp"))
    base = rows.select(
        t.alias("timestamp"),
        F.coalesce(
            F.element_at("labels", "job"), F.element_at("labels", "instance"), F.lit("unknown")
        ).alias("service_name"),
        F.element_at("labels", "__name__").alias("metric_name"),
        F.col("s.value").alias("value"),
        # instance stays in the attribute map: two scrape targets of the
        # same job are distinct series and must not collapse
        F.map_filter(
            F.col("labels"), lambda k, _: ~k.isin("__name__", "job")
        ).alias("attributes"),
        F.to_date(t).alias("date_day"),
        F.hour(t).alias("hour"),
    ).filter(F.col("metric_name").isNotNull())
    is_counter = None
    for suf in _COUNTER_SUFFIXES:
        cond = F.col("metric_name").endswith(suf)
        is_counter = cond if is_counter is None else (is_counter | cond)
    gauge = base.filter(~is_counter)
    msum = base.filter(is_counter).withColumns(
        {
            "aggregation_temporality": F.lit(2),
            "is_monotonic": F.col("metric_name").endswith("_total"),
        }
    )
    return {"metrics_gauge": gauge, "metrics_sum": msum}
