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
                        # Native histograms (TimeSeries.histograms = 4),
                        # already converted to the OTLP exp-histogram
                        # bucket convention by parse_write_request.
                        T.StructField(
                            "histograms",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("timestamp", T.LongType()),  # ms
                                        T.StructField("count", T.DoubleType()),
                                        T.StructField("sum", T.DoubleType()),
                                        T.StructField("scale", T.IntegerType()),
                                        T.StructField("zero_threshold", T.DoubleType()),
                                        T.StructField("zero_count", T.DoubleType()),
                                        T.StructField("positive_offset", T.IntegerType()),
                                        T.StructField(
                                            "positive_bucket_counts", T.ArrayType(T.DoubleType())
                                        ),
                                        T.StructField("negative_offset", T.IntegerType()),
                                        T.StructField(
                                            "negative_bucket_counts", T.ArrayType(T.DoubleType())
                                        ),
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


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _packed_varints(val, signed: bool) -> list[int]:
    """A packed repeated varint field (LEN payload) or a single unpacked
    element (plain varint); sint* fields zigzag-decode."""
    if isinstance(val, bytes):
        out, i = [], 0
        while i < len(val):
            v, i = _read_varint(val, i)
            out.append(_zigzag(v) if signed else v)
        return out
    return [_zigzag(val) if signed else val]


def _packed_doubles(val) -> list[float]:
    import struct

    if isinstance(val, bytes):
        return list(struct.unpack(f"<{len(val) // 8}d", val))
    return [struct.unpack("<d", val.to_bytes(8, "little"))[0]]


def _parse_bucket_span(buf: bytes) -> dict:
    """prompb BucketSpan: offset = 1 (sint32, gap to previous span or
    absolute start for the first), length = 2 (uint32)."""
    offset = length = 0
    for f, _w, v in _fields(buf):
        if f == 1:
            offset = _zigzag(v)
        elif f == 2:
            length = v
    return {"offset": offset, "length": length}


def _spans_to_dense(spans: list[dict], deltas: list[int], counts: list[float]):
    """(spans, deltas|counts) → (otlp_offset, dense_counts).

    Prometheus native-histogram bucket i covers (base^(i-1), base^i];
    OTLP exponential bucket i covers (base^i, base^(i+1)] — identical
    boundaries shifted by one, so OTLP offset = first prom index − 1
    (the same mapping the public prometheus↔OTLP translators use).
    Integer histograms carry per-bucket deltas (first absolute, the
    rest relative, running across span boundaries); float histograms
    carry absolute counts."""
    idxs: list[int] = []
    vals: list[float] = []
    cur = running = k = 0
    for si, sp in enumerate(spans):
        cur = sp["offset"] if si == 0 else cur + sp["offset"]
        for _ in range(sp["length"]):
            if deltas:
                running += deltas[k]
                v = float(running)
            else:
                v = counts[k] if k < len(counts) else 0.0
            idxs.append(cur)
            vals.append(v)
            cur += 1
            k += 1
    if not idxs:
        return 0, []
    lo, hi = idxs[0], idxs[-1]
    dense = [0.0] * (hi - lo + 1)
    for i, v in zip(idxs, vals):
        dense[i - lo] = v
    return lo - 1, dense


def _parse_histogram(buf: bytes) -> dict:
    """prompb.Histogram (public remote-write proto, Prometheus ≥2.40):
    count_int=1 / count_float=2, sum=3, schema=4 (sint32),
    zero_threshold=5, zero_count_int=6 / zero_count_float=7,
    negative_spans=8, negative_deltas=9 (sint64), negative_counts=10,
    positive_spans=11, positive_deltas=12, positive_counts=13,
    timestamp=15 (ms)."""
    import struct

    h: dict = {"count": 0.0, "sum": 0.0, "scale": 0, "zero_threshold": 0.0,
               "zero_count": 0.0, "timestamp": 0}
    neg_spans: list[dict] = []
    neg_deltas: list[int] = []
    neg_counts: list[float] = []
    pos_spans: list[dict] = []
    pos_deltas: list[int] = []
    pos_counts: list[float] = []
    for f, w, v in _fields(buf):
        if f == 1:
            h["count"] = float(v)
        elif f == 2:
            h["count"] = struct.unpack("<d", v.to_bytes(8, "little"))[0]
        elif f == 3:
            h["sum"] = struct.unpack("<d", v.to_bytes(8, "little"))[0]
        elif f == 4:
            h["scale"] = _zigzag(v)
        elif f == 5:
            h["zero_threshold"] = struct.unpack("<d", v.to_bytes(8, "little"))[0]
        elif f == 6:
            h["zero_count"] = float(v)
        elif f == 7:
            h["zero_count"] = struct.unpack("<d", v.to_bytes(8, "little"))[0]
        elif f == 8:
            neg_spans.append(_parse_bucket_span(v))
        elif f == 9:
            neg_deltas.extend(_packed_varints(v, signed=True))
        elif f == 10:
            neg_counts.extend(_packed_doubles(v))
        elif f == 11:
            pos_spans.append(_parse_bucket_span(v))
        elif f == 12:
            pos_deltas.extend(_packed_varints(v, signed=True))
        elif f == 13:
            pos_counts.extend(_packed_doubles(v))
        elif f == 15:
            h["timestamp"] = _signed64(v)
    h["positive_offset"], h["positive_bucket_counts"] = _spans_to_dense(
        pos_spans, pos_deltas, pos_counts
    )
    h["negative_offset"], h["negative_bucket_counts"] = _spans_to_dense(
        neg_spans, neg_deltas, neg_counts
    )
    return h


def parse_write_request(data: bytes) -> dict:
    """Minimal reader for prometheus.WriteRequest
    (prometheus/prompb/remote.proto, public): WriteRequest.timeseries=1;
    TimeSeries.labels=1, samples=2, histograms=4; Label.name=1, value=2;
    Sample.value=1 (double), timestamp=2 (int64, milliseconds);
    Histogram per _parse_histogram."""
    import struct

    timeseries = []
    for field, _wt, val in _fields(data):
        if field != 1:
            continue
        labels, samples, histograms = [], [], []
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
            elif f2 == 4:  # Histogram (native)
                histograms.append(_parse_histogram(v2))
        timeseries.append(
            {"labels": labels, "samples": samples, "histograms": histograms}
        )
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
        for h in ts.get("histograms", []):
            body += ln_field(4, _encode_histogram(h))
        out += ln_field(1, bytes(body))
    return bytes(out)


def _encode_histogram(h: dict) -> bytes:
    """prompb.Histogram writer in the *Prometheus* shape (count_int or
    count_float, schema, spans + deltas or counts) — so round-trip
    tests exercise the span/delta decode, not an identity copy."""
    import struct

    def varint(v: int) -> bytes:
        out = bytearray()
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
        return bytes(out)

    def zz(v: int) -> int:
        return (v << 1) ^ (v >> 63)

    def ln_field(field: int, payload: bytes) -> bytes:
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def span(sp: dict) -> bytes:
        return (
            varint(1 << 3) + varint(zz(sp["offset"]) & ((1 << 64) - 1))
            + varint(2 << 3) + varint(sp["length"])
        )

    out = bytearray()
    if "count_int" in h:
        out += varint(1 << 3) + varint(h["count_int"])
    if "count_float" in h:
        out += varint((2 << 3) | 1) + struct.pack("<d", h["count_float"])
    if "sum" in h:
        out += varint((3 << 3) | 1) + struct.pack("<d", h["sum"])
    if "schema" in h:
        out += varint(4 << 3) + varint(zz(h["schema"]) & ((1 << 64) - 1))
    if "zero_threshold" in h:
        out += varint((5 << 3) | 1) + struct.pack("<d", h["zero_threshold"])
    if "zero_count_int" in h:
        out += varint(6 << 3) + varint(h["zero_count_int"])
    if "zero_count_float" in h:
        out += varint((7 << 3) | 1) + struct.pack("<d", h["zero_count_float"])
    for sp in h.get("negative_spans", []):
        out += ln_field(8, span(sp))
    if h.get("negative_deltas"):
        out += ln_field(
            9, b"".join(varint(zz(d) & ((1 << 64) - 1)) for d in h["negative_deltas"])
        )
    if h.get("negative_counts"):
        out += ln_field(10, struct.pack(f"<{len(h['negative_counts'])}d", *h["negative_counts"]))
    for sp in h.get("positive_spans", []):
        out += ln_field(11, span(sp))
    if h.get("positive_deltas"):
        out += ln_field(
            12, b"".join(varint(zz(d) & ((1 << 64) - 1)) for d in h["positive_deltas"])
        )
    if h.get("positive_counts"):
        out += ln_field(13, struct.pack(f"<{len(h['positive_counts'])}d", *h["positive_counts"]))
    if "timestamp" in h:
        out += varint(15 << 3) + varint(h["timestamp"] & ((1 << 64) - 1))
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

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(raw.sparkSession)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"value": [decode_snappy_protobuf(bytes(p)) for p in pdf[payload_col]]}
            )

    return raw.mapInPandas(run, "value string")


def flatten_remote_write(raw: DataFrame, json_col: str = "value") -> dict[str, DataFrame]:
    """Decoded WriteRequest JSON → {'metrics_gauge': df, 'metrics_sum':
    df, 'metrics_exponential_histogram': df}.

    One row per sample; ``__name__`` → metric_name, ``job``/``instance``
    → service identity, remaining labels → the attributes map (the same
    label routing the query side undoes, metrics.rs:2147-2218). Native
    histograms (Prometheus ≥2.40, TimeSeries.histograms) land in the
    exponential-histogram table in the exact at-rest shape the
    exphist_* query operators read (sources/otlp.py exp_hist columns),
    completing the ingest leg of the native-histogram loop.
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
    svc = F.coalesce(
        F.element_at("labels", "job"), F.element_at("labels", "instance"), F.lit("unknown")
    )
    # instance stays in the attribute map: two scrape targets of the
    # same job are distinct series and must not collapse
    attrs = F.map_filter(F.col("labels"), lambda k, _: ~k.isin("__name__", "job"))
    base = rows.select(
        t.alias("timestamp"),
        svc.alias("service_name"),
        F.element_at("labels", "__name__").alias("metric_name"),
        F.col("s.value").alias("value"),
        attrs.alias("attributes"),
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
    hrows = series.select(lm.alias("labels"), F.explode("ts.histograms").alias("h"))
    ht = F.timestamp_millis(F.col("h.timestamp"))
    exp_hist = hrows.select(
        ht.alias("timestamp"),
        svc.alias("service_name"),
        F.element_at("labels", "__name__").alias("metric_name"),
        F.col("h.count").cast("long").alias("count"),
        F.col("h.sum").alias("sum"),
        F.lit(None).cast("double").alias("min"),
        F.lit(None).cast("double").alias("max"),
        F.col("h.scale").alias("scale"),
        F.col("h.zero_count").cast("long").alias("zero_count"),
        F.col("h.positive_offset").alias("positive_offset"),
        F.transform(F.col("h.positive_bucket_counts"), lambda c: c.cast("long")).alias(
            "positive_bucket_counts"
        ),
        F.col("h.negative_offset").alias("negative_offset"),
        F.transform(F.col("h.negative_bucket_counts"), lambda c: c.cast("long")).alias(
            "negative_bucket_counts"
        ),
        F.lit(0).alias("flags"),
        # remote_write native histograms are cumulative by contract
        F.lit(2).alias("aggregation_temporality"),
        F.col("h.zero_threshold").alias("zero_threshold"),
        attrs.alias("attributes"),
        F.to_date(ht).alias("date_day"),
        F.hour(ht).alias("hour"),
    ).filter(F.col("metric_name").isNotNull())
    return {
        "metrics_gauge": gauge,
        "metrics_sum": msum,
        "metrics_exponential_histogram": exp_hist,
    }
