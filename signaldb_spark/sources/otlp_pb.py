"""OTLP/gRPC protobuf wire decode for traces — pure Python.

The reference's acceptor consumes OTLP protobuf
(``ExportTraceServiceRequest``) and converts straight to Arrow
(src/common/src/flight/conversion/conversion_traces.rs:30). Here the
wire decode (field numbers from the PUBLIC opentelemetry-proto
``trace.proto`` / ``common.proto``) produces exactly the OTLP/JSON
shape ``sources.otlp.flatten_otlp_traces`` already consumes — hex ids,
camelCase keys, nano timestamps as strings — so the hot row-flattening
work stays in the existing JVM expressions and the per-payload Python
decode is Arrow-batched over request-sized bodies (the same split as
``remote_write.decode_write_requests``).

Field numbers (opentelemetry/proto/trace/v1/trace.proto):
  ExportTraceServiceRequest.resource_spans = 1
  ResourceSpans.resource = 1, .scope_spans = 2
  Resource.attributes = 1
  ScopeSpans.scope = 1, .spans = 2
  InstrumentationScope.name = 1, .version = 2
  Span: trace_id=1 span_id=2 trace_state=3 parent_span_id=4 name=5
        kind=6 start=7(fixed64) end=8(fixed64) attributes=9 events=11
        links=13 status=15
  Span.Event: time_unix_nano=1(fixed64) name=2 attributes=3
  Span.Link: trace_id=1 span_id=2 attributes=4
  Status: message=2 code=3
  KeyValue: key=1 value=2;  AnyValue: string=1 bool=2 int=3 double=4
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

from .remote_write import _fields  # shared wire primitives


def _any_value(buf: bytes) -> dict:
    out: dict = {}
    for f, w, v in _fields(buf):
        if f == 1:
            out["stringValue"] = v.decode("utf-8", "replace")
        elif f == 2:
            out["boolValue"] = bool(v)
        elif f == 3:
            out["intValue"] = str(v - (1 << 64) if v >= (1 << 63) else v)
        elif f == 4 and w == 1:
            out["doubleValue"] = struct.unpack("<d", v.to_bytes(8, "little"))[0]
    return out


def _kvs(buf_iter) -> list[dict]:
    out = []
    for kv in buf_iter:
        key, val = "", {}
        for f, _w, v in _fields(kv):
            if f == 1:
                key = v.decode("utf-8", "replace")
            elif f == 2:
                val = _any_value(v)
        out.append({"key": key, "value": val})
    return out


def _span(buf: bytes) -> dict:
    s: dict = {"attributes": [], "events": [], "links": []}
    for f, w, v in _fields(buf):
        if f == 1:
            s["traceId"] = v.hex()
        elif f == 2:
            s["spanId"] = v.hex()
        elif f == 3:
            s["traceState"] = v.decode("utf-8", "replace")
        elif f == 4:
            s["parentSpanId"] = v.hex()
        elif f == 5:
            s["name"] = v.decode("utf-8", "replace")
        elif f == 6:
            s["kind"] = v
        elif f == 7:
            s["startTimeUnixNano"] = str(v)
        elif f == 8:
            s["endTimeUnixNano"] = str(v)
        elif f == 9:
            s["attributes"].append(v)
        elif f == 11:
            ev: dict = {"attributes": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    ev["timeUnixNano"] = str(v2)
                elif f2 == 2:
                    ev["name"] = v2.decode("utf-8", "replace")
                elif f2 == 3:
                    ev["attributes"].append(v2)
            ev["attributes"] = _kvs(ev["attributes"])
            s["events"].append(ev)
        elif f == 13:
            lk: dict = {"attributes": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    lk["traceId"] = v2.hex()
                elif f2 == 2:
                    lk["spanId"] = v2.hex()
                elif f2 == 4:
                    lk["attributes"].append(v2)
            lk["attributes"] = _kvs(lk["attributes"])
            s["links"].append(lk)
        elif f == 15:
            st = {}
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    st["message"] = v2.decode("utf-8", "replace")
                elif f2 == 3:
                    st["code"] = v2
            s["status"] = st
    s["attributes"] = _kvs(s["attributes"])
    return s


def parse_trace_request(data: bytes) -> dict:
    resource_spans = []
    for f, _w, v in _fields(data):
        if f != 1:
            continue
        rs: dict = {"scopeSpans": []}
        for f2, _w2, v2 in _fields(v):
            if f2 == 1:  # Resource
                attrs = [v3 for f3, _w3, v3 in _fields(v2) if f3 == 1]
                rs["resource"] = {"attributes": _kvs(attrs)}
            elif f2 == 2:  # ScopeSpans
                ss: dict = {"spans": []}
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 1:
                        sc = {}
                        for f4, _w4, v4 in _fields(v3):
                            if f4 == 1:
                                sc["name"] = v4.decode("utf-8", "replace")
                            elif f4 == 2:
                                sc["version"] = v4.decode("utf-8", "replace")
                        ss["scope"] = sc
                    elif f3 == 2:
                        ss["spans"].append(_span(v3))
                rs["scopeSpans"].append(ss)
        resource_spans.append(rs)
    return {"resourceSpans": resource_spans}


# ------------------------------------------------------------------ encode
# proto writer for the same message — test-payload construction, exactly
# like remote_write.encode_write_request


def _varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _ln(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


def _f64(field: int, v: int) -> bytes:
    return _varint((field << 3) | 1) + int(v).to_bytes(8, "little")


def _enc_kv(kv: dict) -> bytes:
    val = kv.get("value", {})
    body = b""
    if "stringValue" in val:
        body = _ln(1, val["stringValue"].encode())
    elif "boolValue" in val:
        body = _vi(2, 1 if val["boolValue"] else 0)
    elif "intValue" in val:
        body = _vi(3, int(val["intValue"]) & ((1 << 64) - 1))
    elif "doubleValue" in val:
        body = _varint((4 << 3) | 1) + struct.pack("<d", val["doubleValue"])
    return _ln(1, kv["key"].encode()) + _ln(2, body)


def encode_trace_request(req: dict) -> bytes:
    out = bytearray()
    for rs in req.get("resourceSpans", []):
        rs_body = bytearray()
        res = rs.get("resource")
        if res:
            rs_body += _ln(
                1, b"".join(_ln(1, _enc_kv(kv)) for kv in res.get("attributes", []))
            )
        for ss in rs.get("scopeSpans", []):
            ss_body = bytearray()
            sc = ss.get("scope")
            if sc:
                sc_body = b""
                if sc.get("name"):
                    sc_body += _ln(1, sc["name"].encode())
                if sc.get("version"):
                    sc_body += _ln(2, sc["version"].encode())
                ss_body += _ln(1, sc_body)
            for sp in ss.get("spans", []):
                b = bytearray()
                b += _ln(1, bytes.fromhex(sp["traceId"]))
                b += _ln(2, bytes.fromhex(sp["spanId"]))
                if sp.get("parentSpanId"):
                    b += _ln(4, bytes.fromhex(sp["parentSpanId"]))
                b += _ln(5, sp.get("name", "").encode())
                if sp.get("kind"):
                    b += _vi(6, sp["kind"])
                b += _f64(7, int(sp["startTimeUnixNano"]))
                b += _f64(8, int(sp["endTimeUnixNano"]))
                for kv in sp.get("attributes", []):
                    b += _ln(9, _enc_kv(kv))
                for ev in sp.get("events", []):
                    eb = _f64(1, int(ev["timeUnixNano"])) + _ln(2, ev["name"].encode())
                    for kv in ev.get("attributes", []):
                        eb += _ln(3, _enc_kv(kv))
                    b += _ln(11, eb)
                for lk in sp.get("links", []):
                    lb = _ln(1, bytes.fromhex(lk["traceId"])) + _ln(
                        2, bytes.fromhex(lk["spanId"])
                    )
                    for kv in lk.get("attributes", []):
                        lb += _ln(4, _enc_kv(kv))
                    b += _ln(13, lb)
                st = sp.get("status")
                if st:
                    sb = b""
                    if st.get("message"):
                        sb += _ln(2, st["message"].encode())
                    if st.get("code"):
                        sb += _vi(3, st["code"])
                    b += _ln(15, sb)
                ss_body += _ln(2, bytes(b))
            rs_body += _ln(2, bytes(ss_body))
        out += _ln(1, bytes(rs_body))
    return bytes(out)


def decode_otlp_trace_requests(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary protobuf bodies → OTLP/JSON strings ('value' column),
    Arrow-batched via mapInPandas — request-sized payloads, so the
    Python decode amortizes and the per-span work stays JVM-side in
    flatten_otlp_traces."""
    import json

    import pandas as pd

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(raw.sparkSession)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "value": [
                        json.dumps(parse_trace_request(bytes(p)))
                        for p in pdf[payload_col]
                    ]
                }
            )

    return raw.mapInPandas(run, "value string")


# -------------------------------------------------------------------- logs
# opentelemetry/proto/logs/v1/logs.proto (public):
#   ExportLogsServiceRequest.resource_logs = 1
#   ResourceLogs.resource = 1, .scope_logs = 2
#   ScopeLogs.scope = 1, .log_records = 2
#   LogRecord: time_unix_nano=1(fixed64) observed_time_unix_nano=11(fixed64)
#              severity_number=2 severity_text=3 body=5(AnyValue)
#              attributes=6 trace_id=9 span_id=10


def _log_record(buf: bytes) -> dict:
    r: dict = {"attributes": []}
    for f, _w, v in _fields(buf):
        if f == 1:
            r["timeUnixNano"] = str(v)
        elif f == 11:
            r["observedTimeUnixNano"] = str(v)
        elif f == 2:
            r["severityNumber"] = v
        elif f == 3:
            r["severityText"] = v.decode("utf-8", "replace")
        elif f == 5:
            av = _any_value(v)
            r["body"] = {"stringValue": av.get("stringValue", "")}
        elif f == 6:
            r["attributes"].append(v)
        elif f == 9:
            r["traceId"] = v.hex()
        elif f == 10:
            r["spanId"] = v.hex()
    r["attributes"] = _kvs(r["attributes"])
    return r


def parse_logs_request(data: bytes) -> dict:
    resource_logs = []
    for f, _w, v in _fields(data):
        if f != 1:
            continue
        rl: dict = {"scopeLogs": []}
        for f2, _w2, v2 in _fields(v):
            if f2 == 1:
                attrs = [v3 for f3, _w3, v3 in _fields(v2) if f3 == 1]
                rl["resource"] = {"attributes": _kvs(attrs)}
            elif f2 == 2:
                sl: dict = {"logRecords": []}
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 1:
                        sc = {}
                        for f4, _w4, v4 in _fields(v3):
                            if f4 == 1:
                                sc["name"] = v4.decode("utf-8", "replace")
                            elif f4 == 2:
                                sc["version"] = v4.decode("utf-8", "replace")
                        sl["scope"] = sc
                    elif f3 == 2:
                        sl["logRecords"].append(_log_record(v3))
                rl["scopeLogs"].append(sl)
        resource_logs.append(rl)
    return {"resourceLogs": resource_logs}


def encode_logs_request(req: dict) -> bytes:
    out = bytearray()
    for rl in req.get("resourceLogs", []):
        rl_body = bytearray()
        res = rl.get("resource")
        if res:
            rl_body += _ln(
                1, b"".join(_ln(1, _enc_kv(kv)) for kv in res.get("attributes", []))
            )
        for sl in rl.get("scopeLogs", []):
            sl_body = bytearray()
            sc = sl.get("scope")
            if sc:
                sc_body = b""
                if sc.get("name"):
                    sc_body += _ln(1, sc["name"].encode())
                if sc.get("version"):
                    sc_body += _ln(2, sc["version"].encode())
                sl_body += _ln(1, sc_body)
            for r in sl.get("logRecords", []):
                b = bytearray()
                b += _f64(1, int(r["timeUnixNano"]))
                if r.get("observedTimeUnixNano"):
                    b += _f64(11, int(r["observedTimeUnixNano"]))
                if r.get("severityNumber"):
                    b += _vi(2, r["severityNumber"])
                if r.get("severityText"):
                    b += _ln(3, r["severityText"].encode())
                if r.get("body"):
                    b += _ln(5, _ln(1, r["body"]["stringValue"].encode()))
                for kv in r.get("attributes", []):
                    b += _ln(6, _enc_kv(kv))
                if r.get("traceId"):
                    b += _ln(9, bytes.fromhex(r["traceId"]))
                if r.get("spanId"):
                    b += _ln(10, bytes.fromhex(r["spanId"]))
                sl_body += _ln(2, bytes(b))
            rl_body += _ln(2, bytes(sl_body))
        out += _ln(1, bytes(rl_body))
    return bytes(out)


def decode_otlp_logs_requests(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary protobuf bodies → OTLP/JSON strings for
    flatten_otlp_logs, Arrow-batched (same shape as the traces path)."""
    import json

    import pandas as pd

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(raw.sparkSession)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "value": [
                        json.dumps(parse_logs_request(bytes(p)))
                        for p in pdf[payload_col]
                    ]
                }
            )

    return raw.mapInPandas(run, "value string")


# ----------------------------------------------------------------- metrics
# opentelemetry/proto/metrics/v1/metrics.proto (public):
#   ExportMetricsServiceRequest.resource_metrics = 1
#   ResourceMetrics.resource=1 .scope_metrics=2; ScopeMetrics.metrics=2
#   Metric: name=1 unit=3 gauge=5 sum=7 histogram=9
#           exponential_histogram=10 summary=11
#   NumberDataPoint: time=3(f64) as_double=4(f64 double) as_int=6(sf64)
#                    exemplars=5 attributes=7
#   HistogramDataPoint: time=3 count=4(f64) sum=5(double)
#                       bucket_counts=6 (packed fixed64)
#                       explicit_bounds=7 (packed double) exemplars=8
#                       attributes=9
#   ExponentialHistogramDataPoint: attributes=1 time=3 count=4(f64)
#                       sum=5 scale=6 (zigzag sint32) zero_count=7(f64)
#                       positive=8 negative=9; Buckets: offset=1(zigzag)
#                       bucket_counts=2 (packed varint)
#   SummaryDataPoint: time=3 count=4(f64) sum=5 quantile_values=6
#                     (quantile=1 double, value=2 double) attributes=7
#   Exemplar: time=2(f64) as_double=3 span_id=4 trace_id=5 as_int=6
#             filtered_attributes=7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _f64_double(v: int) -> float:
    return struct.unpack("<d", v.to_bytes(8, "little"))[0]


def _sf64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_fixed64(wt: int, val) -> list[int]:
    if wt == 1:
        return [val]
    return [
        int.from_bytes(val[i:i + 8], "little") for i in range(0, len(val), 8)
    ]


def _packed_varint_list(wt: int, val) -> list[int]:
    if wt == 0:
        return [val]
    from .remote_write import _read_varint

    out, i = [], 0
    while i < len(val):
        v, i = _read_varint(val, i)
        out.append(v)
    return out


def _exemplar(buf: bytes) -> dict:
    e: dict = {"filteredAttributes": []}
    for f, w, v in _fields(buf):
        if f == 2:
            e["timeUnixNano"] = str(v)
        elif f == 3 and w == 1:
            e["asDouble"] = _f64_double(v)
        elif f == 6:
            e["asInt"] = str(_sf64(v))
        elif f == 4:
            e["spanId"] = v.hex()
        elif f == 5:
            e["traceId"] = v.hex()
        elif f == 7:
            e["filteredAttributes"].append(v)
    e["filteredAttributes"] = _kvs(e["filteredAttributes"])
    return e


def _num_dp(buf: bytes) -> dict:
    dp: dict = {"attributes": [], "exemplars": []}
    for f, w, v in _fields(buf):
        if f == 3:
            dp["timeUnixNano"] = str(v)
        elif f == 4 and w == 1:
            dp["asDouble"] = _f64_double(v)
        elif f == 6:
            dp["asInt"] = str(_sf64(v))
        elif f == 5:
            dp["exemplars"].append(_exemplar(v))
        elif f == 7:
            dp["attributes"].append(v)
    dp["attributes"] = _kvs(dp["attributes"])
    return dp


def _hist_dp(buf: bytes) -> dict:
    dp: dict = {"attributes": [], "exemplars": []}
    for f, w, v in _fields(buf):
        if f == 3:
            dp["timeUnixNano"] = str(v)
        elif f == 4:
            dp["count"] = str(v)
        elif f == 5 and w == 1:
            dp["sum"] = _f64_double(v)
        elif f == 6:
            dp["bucketCounts"] = [str(x) for x in _packed_fixed64(w, v)]
        elif f == 7:
            dp["explicitBounds"] = [_f64_double(x) for x in _packed_fixed64(w, v)]
        elif f == 8:
            dp["exemplars"].append(_exemplar(v))
        elif f == 9:
            dp["attributes"].append(v)
    dp["attributes"] = _kvs(dp["attributes"])
    return dp


def _exp_buckets(buf: bytes) -> dict:
    b = {"offset": 0, "bucketCounts": []}
    for f, w, v in _fields(buf):
        if f == 1:
            b["offset"] = _zigzag(v)
        elif f == 2:
            b["bucketCounts"] = [str(x) for x in _packed_varint_list(w, v)]
    return b


def _exp_dp(buf: bytes) -> dict:
    dp: dict = {"attributes": []}
    for f, w, v in _fields(buf):
        if f == 1:
            dp["attributes"].append(v)
        elif f == 3:
            dp["timeUnixNano"] = str(v)
        elif f == 4:
            dp["count"] = str(v)
        elif f == 5 and w == 1:
            dp["sum"] = _f64_double(v)
        elif f == 6:
            dp["scale"] = _zigzag(v)
        elif f == 7:
            dp["zeroCount"] = str(v)
        elif f == 8:
            dp["positive"] = _exp_buckets(v)
        elif f == 9:
            dp["negative"] = _exp_buckets(v)
    dp["attributes"] = _kvs(dp["attributes"])
    return dp


def _summary_dp(buf: bytes) -> dict:
    dp: dict = {"attributes": [], "quantileValues": []}
    for f, w, v in _fields(buf):
        if f == 3:
            dp["timeUnixNano"] = str(v)
        elif f == 4:
            dp["count"] = str(v)
        elif f == 5 and w == 1:
            dp["sum"] = _f64_double(v)
        elif f == 6:
            qv = {}
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 1:
                    qv["quantile"] = _f64_double(v2)
                elif f2 == 2 and w2 == 1:
                    qv["value"] = _f64_double(v2)
            dp["quantileValues"].append(qv)
        elif f == 7:
            dp["attributes"].append(v)
    dp["attributes"] = _kvs(dp["attributes"])
    return dp


def _metric(buf: bytes) -> dict:
    m: dict = {}
    for f, w, v in _fields(buf):
        if f == 1:
            m["name"] = v.decode("utf-8", "replace")
        elif f == 3:
            m["unit"] = v.decode("utf-8", "replace")
        elif f == 5:
            m["gauge"] = {
                "dataPoints": [_num_dp(v2) for f2, _w2, v2 in _fields(v) if f2 == 1]
            }
        elif f == 7:
            s: dict = {"dataPoints": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    s["dataPoints"].append(_num_dp(v2))
                elif f2 == 2:
                    s["aggregationTemporality"] = v2
                elif f2 == 3:
                    s["isMonotonic"] = bool(v2)
            m["sum"] = s
        elif f == 9:
            h: dict = {"dataPoints": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    h["dataPoints"].append(_hist_dp(v2))
                elif f2 == 2:
                    h["aggregationTemporality"] = v2
            m["histogram"] = h
        elif f == 10:
            eh: dict = {"dataPoints": []}
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    eh["dataPoints"].append(_exp_dp(v2))
                elif f2 == 2:
                    eh["aggregationTemporality"] = v2
            m["exponentialHistogram"] = eh
        elif f == 11:
            m["summary"] = {
                "dataPoints": [
                    _summary_dp(v2) for f2, _w2, v2 in _fields(v) if f2 == 1
                ]
            }
    return m


def parse_metrics_request(data: bytes) -> dict:
    resource_metrics = []
    for f, _w, v in _fields(data):
        if f != 1:
            continue
        rm: dict = {"scopeMetrics": []}
        for f2, _w2, v2 in _fields(v):
            if f2 == 1:
                attrs = [v3 for f3, _w3, v3 in _fields(v2) if f3 == 1]
                rm["resource"] = {"attributes": _kvs(attrs)}
            elif f2 == 2:
                sm = {
                    "metrics": [
                        _metric(v3) for f3, _w3, v3 in _fields(v2) if f3 == 2
                    ]
                }
                rm["scopeMetrics"].append(sm)
        resource_metrics.append(rm)
    return {"resourceMetrics": resource_metrics}


def decode_otlp_metrics_requests(
    raw: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """binary protobuf bodies → OTLP/JSON strings for
    flatten_otlp_metrics, Arrow-batched."""
    import json

    import pandas as pd

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(raw.sparkSession)

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "value": [
                        json.dumps(parse_metrics_request(bytes(p)))
                        for p in pdf[payload_col]
                    ]
                }
            )

    return raw.mapInPandas(run, "value string")


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _enc_exemplar(e: dict) -> bytes:
    b = bytearray()
    if e.get("timeUnixNano"):
        b += _f64(2, int(e["timeUnixNano"]))
    if "asDouble" in e:
        b += _varint((3 << 3) | 1) + struct.pack("<d", e["asDouble"])
    if e.get("spanId"):
        b += _ln(4, bytes.fromhex(e["spanId"]))
    if e.get("traceId"):
        b += _ln(5, bytes.fromhex(e["traceId"]))
    return bytes(b)


def _enc_num_dp(dp: dict) -> bytes:
    b = bytearray()
    b += _f64(3, int(dp["timeUnixNano"]))
    if "asDouble" in dp:
        b += _varint((4 << 3) | 1) + struct.pack("<d", dp["asDouble"])
    if "asInt" in dp:
        b += _varint((6 << 3) | 1) + (int(dp["asInt"]) & ((1 << 64) - 1)).to_bytes(
            8, "little"
        )
    for ex in dp.get("exemplars", []):
        b += _ln(5, _enc_exemplar(ex))
    for kv in dp.get("attributes", []):
        b += _ln(7, _enc_kv(kv))
    return bytes(b)


def encode_metrics_request(req: dict) -> bytes:
    """Writer for the subset parse_metrics_request reads — packed
    repeated fields emitted exactly as OTLP SDKs do."""
    out = bytearray()
    for rm in req.get("resourceMetrics", []):
        rm_body = bytearray()
        res = rm.get("resource")
        if res:
            rm_body += _ln(
                1, b"".join(_ln(1, _enc_kv(kv)) for kv in res.get("attributes", []))
            )
        for sm in rm.get("scopeMetrics", []):
            sm_body = bytearray()
            for m in sm.get("metrics", []):
                mb = bytearray()
                mb += _ln(1, m["name"].encode())
                if m.get("unit"):
                    mb += _ln(3, m["unit"].encode())
                if "gauge" in m:
                    mb += _ln(
                        5,
                        b"".join(
                            _ln(1, _enc_num_dp(dp))
                            for dp in m["gauge"]["dataPoints"]
                        ),
                    )
                if "sum" in m:
                    sb = bytearray()
                    for dp in m["sum"]["dataPoints"]:
                        sb += _ln(1, _enc_num_dp(dp))
                    if m["sum"].get("aggregationTemporality"):
                        sb += _vi(2, m["sum"]["aggregationTemporality"])
                    if m["sum"].get("isMonotonic"):
                        sb += _vi(3, 1)
                    mb += _ln(7, bytes(sb))
                if "histogram" in m:
                    hb = bytearray()
                    for dp in m["histogram"]["dataPoints"]:
                        db = bytearray()
                        db += _f64(3, int(dp["timeUnixNano"]))
                        db += _f64(4, int(dp["count"]))
                        if "sum" in dp:
                            db += _varint((5 << 3) | 1) + struct.pack("<d", dp["sum"])
                        db += _ln(
                            6,
                            b"".join(
                                int(x).to_bytes(8, "little")
                                for x in dp["bucketCounts"]
                            ),
                        )
                        db += _ln(
                            7,
                            b"".join(
                                struct.pack("<d", x) for x in dp["explicitBounds"]
                            ),
                        )
                        for kv in dp.get("attributes", []):
                            db += _ln(9, _enc_kv(kv))
                        hb += _ln(1, bytes(db))
                    if m["histogram"].get("aggregationTemporality"):
                        hb += _vi(2, m["histogram"]["aggregationTemporality"])
                    mb += _ln(9, bytes(hb))
                if "exponentialHistogram" in m:
                    eb = bytearray()
                    for dp in m["exponentialHistogram"]["dataPoints"]:
                        db = bytearray()
                        for kv in dp.get("attributes", []):
                            db += _ln(1, _enc_kv(kv))
                        db += _f64(3, int(dp["timeUnixNano"]))
                        db += _f64(4, int(dp["count"]))
                        if "sum" in dp:
                            db += _varint((5 << 3) | 1) + struct.pack("<d", dp["sum"])
                        db += _vi(6, _zz(dp.get("scale", 0)))
                        db += _f64(7, int(dp.get("zeroCount", "0")))
                        for fno, key in ((8, "positive"), (9, "negative")):
                            if key in dp:
                                bb = _vi(1, _zz(dp[key].get("offset", 0))) + _ln(
                                    2,
                                    b"".join(
                                        _varint(int(x))
                                        for x in dp[key]["bucketCounts"]
                                    ),
                                )
                                db += _ln(fno, bb)
                        eb += _ln(1, bytes(db))
                    mb += _ln(10, bytes(eb))
                if "summary" in m:
                    sb = bytearray()
                    for dp in m["summary"]["dataPoints"]:
                        db = bytearray()
                        db += _f64(3, int(dp["timeUnixNano"]))
                        db += _f64(4, int(dp["count"]))
                        if "sum" in dp:
                            db += _varint((5 << 3) | 1) + struct.pack("<d", dp["sum"])
                        for qv in dp.get("quantileValues", []):
                            db += _ln(
                                6,
                                _varint((1 << 3) | 1)
                                + struct.pack("<d", qv["quantile"])
                                + _varint((2 << 3) | 1)
                                + struct.pack("<d", qv["value"]),
                            )
                        for kv in dp.get("attributes", []):
                            db += _ln(7, _enc_kv(kv))
                        sb += _ln(1, bytes(db))
                    mb += _ln(11, bytes(sb))
                sm_body += _ln(2, bytes(mb))
            rm_body += _ln(2, bytes(sm_body))
        out += _ln(1, bytes(rm_body))
    return bytes(out)
