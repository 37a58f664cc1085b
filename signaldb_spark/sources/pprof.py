"""pprof protobuf wire decode — pure Python.

Pyroscope clients upload gzip'd pprof ``Profile`` messages; the
reference's acceptor parses them natively
(src/router/src/endpoints/pyroscope.rs ingest path). Field numbers from
the PUBLIC google/pprof ``profile.proto``:

  Profile: sample_type=1 sample=2 location=4 function=5 string_table=6
           time_nanos=9 duration_nanos=10 period_type=11 period=12
  ValueType: type=1 unit=2            (string-table indexes)
  Sample:   location_id=1 (repeated uint64, may be packed)
            value=2       (repeated int64, may be packed)
  Location: id=1 line=4;  Line: function_id=1 line=2
  Function: id=1 name=2 (string-table index)

The decode produces the (stacktraces_json, samples_json) shape every
profile operator here consumes (flamegraph / flamegraph_self / diff /
truncate): stacks are ROOT-FIRST (pprof samples are leaf-first — the
decoder reverses), sample values take the requested sample-type index.
Per-payload Python is Arrow-batched over request-sized bodies; all
per-frame work stays in the JVM flamegraph expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .remote_write import _fields, _read_varint


def _packed_varints(wt: int, val) -> list[int]:
    """A repeated scalar arrives either packed (LEN of varints) or as
    one varint per occurrence — accept both, per proto3 rules."""
    if wt == 0:
        return [val]
    out, i = [], 0
    while i < len(val):
        v, i = _read_varint(val, i)
        out.append(v)
    return out


def parse_pprof(data: bytes, value_index: int | None = None) -> dict:
    strings: list[str] = []
    samples: list[tuple[list[int], list[int]]] = []
    loc_fn: dict[int, int] = {}  # location id → leaf function id
    fn_name: dict[int, int] = {}  # function id → string index
    sample_types: list[tuple[int, int]] = []  # (type idx, unit idx)
    period = time_nanos = duration_nanos = 0
    for f, wt, v in _fields(data):
        if f == 6:
            strings.append(v.decode("utf-8", "replace"))
        elif f == 2:  # Sample
            locs: list[int] = []
            vals: list[int] = []
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    locs.extend(_packed_varints(w2, v2))
                elif f2 == 2:
                    vals.extend(
                        x - (1 << 64) if x >= (1 << 63) else x
                        for x in _packed_varints(w2, v2)
                    )
            samples.append((locs, vals))
        elif f == 4:  # Location
            lid = 0
            fid = 0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    lid = v2
                elif f2 == 4 and fid == 0:  # first Line = leaf frame
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            fid = v3
            loc_fn[lid] = fid
        elif f == 5:  # Function
            fid = nm = 0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    fid = v2
                elif f2 == 2:
                    nm = v2
            fn_name[fid] = nm
        elif f == 1:  # ValueType
            t = u = 0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    t = v2
                elif f2 == 2:
                    u = v2
            sample_types.append((t, u))
        elif f == 9:
            time_nanos = v
        elif f == 10:
            duration_nanos = v
        elif f == 12:
            period = v

    def name_of(loc_id: int) -> str:
        idx = fn_name.get(loc_fn.get(loc_id, 0), 0)
        return strings[idx] if 0 <= idx < len(strings) else ""

    vi = value_index if value_index is not None else len(sample_types) - 1
    stacks: list[list[str]] = []
    stack_idx: dict[tuple[str, ...], int] = {}
    out_samples: list[dict] = []
    for locs, vals in samples:
        frames = tuple(name_of(l) for l in reversed(locs))  # root-first
        if frames not in stack_idx:
            stack_idx[frames] = len(stacks)
            stacks.append(list(frames))
        val = vals[vi] if 0 <= vi < len(vals) else (vals[-1] if vals else 0)
        out_samples.append({"stacktrace_idx": stack_idx[frames], "value": val})
    return {
        "stacktraces": stacks,
        "samples": out_samples,
        "sample_types": [
            {
                "type": strings[t] if t < len(strings) else "",
                "unit": strings[u] if u < len(strings) else "",
            }
            for t, u in sample_types
        ],
        "period": period,
        "time_nanos": time_nanos,
        "duration_nanos": duration_nanos,
    }


# ------------------------------------------------------------------ encode
# test-payload construction (same style as otlp_pb / remote_write)


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


def encode_pprof(profile: dict) -> bytes:
    """Writer for the subset parse_pprof reads. ``profile`` uses the
    decoded shape: stacktraces (root-first frame-name lists) + samples;
    the writer interns strings/functions/locations and emits samples
    leaf-first with PACKED location/value lists, as real pprof does."""
    strings = [""]

    def intern(s: str) -> int:
        if s not in strings:
            strings.append(s)
        return strings.index(s)

    fn_ids: dict[str, int] = {}
    locs: dict[str, int] = {}
    body = bytearray()
    for st in profile.get("sample_types", [{"type": "cpu", "unit": "nanoseconds"}]):
        body += _ln(1, _vi(1, intern(st["type"])) + _vi(2, intern(st["unit"])))
    loc_of_stack: list[list[int]] = []
    for frames in profile["stacktraces"]:
        ids = []
        for name in frames:
            if name not in fn_ids:
                fn_ids[name] = len(fn_ids) + 1
            if name not in locs:
                locs[name] = len(locs) + 1
            ids.append(locs[name])
        loc_of_stack.append(ids)
    for s in profile["samples"]:
        ids = list(reversed(loc_of_stack[s["stacktrace_idx"]]))  # leaf-first
        packed_locs = b"".join(_varint(i) for i in ids)
        packed_vals = _varint(int(s["value"]) & ((1 << 64) - 1))
        body += _ln(2, _ln(1, packed_locs) + _ln(2, packed_vals))
    for name, lid in locs.items():
        line = _ln(4, _vi(1, fn_ids[name]))
        body += _ln(4, _vi(1, lid) + line)
    for name, fid in fn_ids.items():
        body += _ln(5, _vi(1, fid) + _vi(2, intern(name)))
    for s in strings:
        body += _ln(6, s.encode())
    return bytes(body)


def decode_pprof_profiles(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary (optionally gzip'd) pprof bodies → the two-column JSON
    frame the flamegraph operators consume, Arrow-batched."""
    import gzip
    import json

    from ..shipping import ensure_package_on_workers

    ensure_package_on_workers(raw.sparkSession)

    import pandas as pd

    def one(p: bytes) -> tuple[str, str]:
        if p[:2] == b"\x1f\x8b":
            p = gzip.decompress(p)
        d = parse_pprof(p)
        return json.dumps(d["stacktraces"]), json.dumps(d["samples"])

    def run(batches):
        for pdf in batches:
            pairs = [one(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "stacktraces_json": [a for a, _ in pairs],
                    "samples_json": [b for _, b in pairs],
                }
            )

    return raw.mapInPandas(run, "stacktraces_json string, samples_json string")
