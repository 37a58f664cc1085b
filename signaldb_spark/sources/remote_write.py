"""Prometheus remote_write → metric rows.

The reference's acceptor decodes snappy-compressed protobuf
WriteRequests (src/acceptor/src/handler/prometheus_handler.rs). Both
codecs are implemented here from their public specs in pure Python
(snappy block format + the prometheus.WriteRequest proto wire format),
so the full wire path works with no external libraries; the row
conversion, which is the actual engine work, operates on the decoded
JSON shape::

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


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def snappy_decompress(buf: bytes) -> bytes:
    """Pure-Python snappy *block format* decompressor (the format
    Prometheus remote_write bodies use — public spec:
    google/snappy format_description.txt). Preamble varint gives the
    uncompressed length; elements are literals or back-references
    (copy1/copy2/copy4 tags)."""
    expected, i = _read_varint(buf, 0)
    out = bytearray()
    n = len(buf)
    while i < n:
        tag = buf[i]
        i += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # length in the next 1-4 bytes, little-endian
                nb = ln - 59
                ln = int.from_bytes(buf[i:i + nb], "little")
                i += nb
            ln += 1
            out += buf[i:i + ln]
            i += ln
            continue
        if kind == 1:  # copy with 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            off = ((tag >> 5) << 8) | buf[i]
            i += 1
        elif kind == 2:  # copy with 2-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[i:i + 2], "little")
            i += 2
        else:  # copy with 4-byte offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError("corrupt snappy stream: bad copy offset")
        start = len(out) - off
        for k in range(ln):  # overlapping copies are legal (RLE)
            out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(f"corrupt snappy stream: {len(out)} != {expected}")
    return bytes(out)


def snappy_compress_literal(data: bytes) -> bytes:
    """Minimal valid snappy encoder (all-literal, no back-references) —
    enough to produce spec-conformant test payloads."""
    out = bytearray()
    ln = len(data)
    while ln >= 0x80:
        out.append((ln & 0x7F) | 0x80)
        ln >>= 7
    out.append(ln)
    i = 0
    while i < len(data):
        chunk = data[i:i + 65536]
        cl = len(chunk) - 1
        if cl < 60:
            out.append(cl << 2)
        else:
            out.append(62 << 2)  # 3-byte length
            out += cl.to_bytes(3, "little")
        out += chunk
        i += len(chunk)
    return bytes(out)


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over a proto message.
    value is bytes for LEN fields, int for varint, raw int for fixed64."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 0x07
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wt == 1:  # fixed64
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:  # LEN
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:  # fixed32
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_write_request(data: bytes) -> dict:
    """Minimal reader for prometheus.WriteRequest
    (prometheus/prompb/remote.proto, public): WriteRequest.timeseries=1;
    TimeSeries.labels=1, samples=2; Label.name=1, value=2;
    Sample.value=1 (double), timestamp=2 (int64, milliseconds)."""
    import struct

    timeseries = []
    for field, _wt, val in _fields(data):
        if field != 1:
            continue
        labels, samples = [], []
        for f2, _w2, v2 in _fields(val):
            if f2 == 1:  # Label
                name = value = ""
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 1:
                        name = v3.decode("utf-8")
                    elif f3 == 2:
                        value = v3.decode("utf-8")
                labels.append({"name": name, "value": value})
            elif f2 == 2:  # Sample
                sval, sts = 0.0, 0
                for f3, w3, v3 in _fields(v2):
                    if f3 == 1 and w3 == 1:
                        sval = struct.unpack("<d", v3.to_bytes(8, "little"))[0]
                    elif f3 == 2:
                        sts = _signed64(v3)
                samples.append({"value": sval, "timestamp": sts})
        timeseries.append({"labels": labels, "samples": samples})
    return {"timeseries": timeseries}


def encode_write_request(req: dict) -> bytes:
    """Proto writer for the same message — test-payload construction."""
    import struct

    def varint(v: int) -> bytes:
        out = bytearray()
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
        return bytes(out)

    def ln_field(field: int, payload: bytes) -> bytes:
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    out = bytearray()
    for ts in req.get("timeseries", []):
        body = bytearray()
        for lb in ts.get("labels", []):
            body += ln_field(
                1,
                ln_field(1, lb["name"].encode()) + ln_field(2, lb["value"].encode()),
            )
        for s in ts.get("samples", []):
            sample = (
                varint((1 << 3) | 1)
                + struct.pack("<d", s["value"])
                + varint(2 << 3)
                + varint(s["timestamp"] & ((1 << 64) - 1))
            )
            body += ln_field(2, bytes(sample))
        out += ln_field(1, bytes(body))
    return bytes(out)


def decode_snappy_protobuf(payload: bytes) -> str:
    """Wire decode: snappy block → prometheus.WriteRequest proto → the
    JSON shape flatten_remote_write consumes. Pure Python — the
    reference's acceptor path (prometheus_handler.rs) with both codecs
    implemented from their public specs, no external libraries."""
    import json

    return json.dumps(parse_write_request(snappy_decompress(payload)))


def decode_write_requests(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary wire payloads → decoded JSON strings ('value' column),
    Arrow-batched via mapInPandas: the decode is inherently per-payload
    Python, but payloads are request-sized (one HTTP body each), so the
    batch shape is right and the hot per-sample work stays in
    flatten_remote_write's JVM expressions."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"value": [decode_snappy_protobuf(bytes(p)) for p in pdf[payload_col]]}
            )

    return raw.mapInPandas(run, "value string")


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
