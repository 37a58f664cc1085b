"""Typed attribute values — the `otel-native-schema` proposal's typed
substrate, Spark-shaped.

The reference stringifies every attribute into ``Map<String,String>``
(`http.response.status_code=200` → ``"200"``) and its proposal
(/root/reference/openspec/changes/otel-native-schema/proposal.md +
specs/typed-attribute-storage/spec.md, attribute-type-authority/spec.md)
designs the fix: one canonical typed home per field, off-type values in
a lossless residue, bytes preserved as bytes, and a registry owning one
monotonic canonical type per (tenant, dataset, field).

Spark rendering: the typed home is a struct-valued map —
``map<string, struct<type,str,int,dbl,bool,bytes>>``. One struct IS the
per-type home set (exactly one non-null payload field per value, tagged
by ``type``); a value whose sent type matches the field's canonical
type lands in its typed field, an off-type value is retained losslessly
in ``str`` with its own type tag (the residue — readable only through
the raw accessor, never coerced into a canonical-typed read). Arrays
and kvlists ride the residue as their JSON text with type tags
``array``/``kvlist``; Spark's struct map is already self-describing and
columnar, so the proposal's CBOR residue encoding is unnecessary here —
the LOSSLESS property is what's load-bearing, and parquet stores the
struct fields as typed columns with real statistics.

Scale note: a struct-valued map costs the same shuffle bytes as the
strings it replaces (parquet encodes the all-null payload fields away),
and typed predicates (`status_code > 200`) compare longs in codegen
instead of ANSI-casting strings — strictly cheaper at 100 TB, with no
malformed-cast poison rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the AnyValue struct: `type` tags which home holds the value
ANY_VALUE = T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("str", T.StringType()),
    T.StructField("int", T.LongType()),
    T.StructField("dbl", T.DoubleType()),
    T.StructField("bool", T.BooleanType()),
    T.StructField("bytes", T.BinaryType()),
])

ANY_VALUE_MAP = T.MapType(T.StringType(), ANY_VALUE)

# canonical-type vocabulary (attribute-type-authority spec)
CANONICAL_TYPES = ("string", "int", "double", "bool", "bytes")

# Pinned semconv snapshot — the TYPE HINT tier of the canonical-home
# precedence (config → semconv → observed). A deliberately small,
# versioned subset of stable OpenTelemetry semantic conventions; the
# registry consults it only when no operator config names the key.
SEMCONV_TYPE_HINTS: dict[str, str] = {
    "http.response.status_code": "int",
    "http.request.body.size": "int",
    "http.response.body.size": "int",
    "http.request.resend_count": "int",
    "server.port": "int",
    "client.port": "int",
    "network.peer.port": "int",
    "url.port": "int",
    "thread.id": "int",
    "process.pid": "int",
    "messaging.batch.message_count": "int",
    "db.operation.batch.size": "int",
    "exception.escaped": "bool",
    "http.request.method": "string",
    "error.type": "string",
}


def _null(dt: str) -> Column:
    return F.lit(None).cast(dt)


def _av(type_tag, s=None, i=None, d=None, b=None, by=None) -> Column:
    return F.struct(
        (type_tag if isinstance(type_tag, Column) else F.lit(type_tag)).alias("type"),
        (s if s is not None else _null("string")).alias("str"),
        (i if i is not None else _null("long")).alias("int"),
        (d if d is not None else _null("double")).alias("dbl"),
        (b if b is not None else _null("boolean")).alias("bool"),
        (by if by is not None else _null("binary")).alias("bytes"),
    )


def av_string(col: Column) -> Column:
    return _av("string", s=col)


def av_int(col: Column) -> Column:
    return _av("int", i=col.cast("long"))


def av_double(col: Column) -> Column:
    return _av("double", d=col.cast("double"))


def av_bool(col: Column) -> Column:
    return _av("bool", b=col.cast("boolean"))


def av_bytes(col: Column) -> Column:
    return _av("bytes", by=col.cast("binary"))


def anyvalue_display(v: Column) -> Column:
    """Human/string view of an AnyValue (what `Map<String,String>`
    would have stored): the typed payload rendered by its tag. Bytes
    render as lowercase hex — NOT a lossy UTF-8 decode (the exact
    corruption the proposal's extract_value fix removes)."""
    return (
        F.when(v["type"] == "int", v["int"].cast("string"))
        .when(v["type"] == "double", v["dbl"].cast("string"))
        .when(v["type"] == "bool", v["bool"].cast("string"))
        .when(v["type"] == "bytes", F.lower(F.hex(v["bytes"])))
        .otherwise(v["str"])
    )


def anyvalue_read(v: Column, want: str) -> Column:
    """Canonical-typed read: the typed value or NULL — NEVER a coerced
    residue value (typed-attribute-storage spec, raw-accessor rule).
    ``want="number"`` unifies the two numeric homes for comparison
    predicates (int exactness beyond 2^53 is traded for one column
    type; the int home remains exact through ``want="int"``)."""
    if want == "number":
        return F.when(v["type"] == "int", v["int"].cast("double")).when(
            v["type"] == "double", v["dbl"]
        )
    field = {"string": "str", "int": "int", "double": "dbl",
             "bool": "bool", "bytes": "bytes"}[want]
    return F.when(v["type"] == want, v[field])


def anyvalue_from_string(value: Column, canonical: Column) -> Column:
    """Migration kernel (stringified v1 map → typed value): cast the
    stringified value into its field's canonical home; a value that
    does not parse as the canonical type is retained LOSSLESSLY as a
    string residue (typed-attribute-storage: off-type values are never
    dropped and never multi-homed)."""
    as_int = value.try_cast("long")
    as_dbl = value.try_cast("double")
    as_bool = F.when(F.lower(value) == "true", F.lit(True)).when(
        F.lower(value) == "false", F.lit(False)
    )
    return (
        F.when((canonical == "int") & as_int.isNotNull(), av_int(as_int))
        .when((canonical == "double") & as_dbl.isNotNull(), av_double(as_dbl))
        .when((canonical == "bool") & as_bool.isNotNull(), av_bool(as_bool))
        .otherwise(av_string(value))
    )


def typed_attrs_from_stringified(map_col: Column, attr_types: dict[str, str]) -> Column:
    """``map<string,string>`` → ``map<string,any_value>`` under a
    canonical-type assignment (key → CANONICAL_TYPES member). Keys
    without an assignment default to ``string`` — the observed-type
    floor of the precedence chain when all history is stringified."""
    if attr_types:
        pairs = []
        for k, t in sorted(attr_types.items()):
            if t not in CANONICAL_TYPES:
                raise ValueError(f"unknown canonical type {t!r} for key {k!r}")
            pairs += [F.lit(k), F.lit(t)]
        type_map = F.create_map(*pairs)
        canon = lambda e: F.coalesce(  # noqa: E731
            F.element_at(type_map, e["key"]), F.lit("string"))
    else:
        canon = lambda e: F.lit("string")  # noqa: E731
    entries = F.transform(
        F.map_entries(map_col),
        lambda e: F.struct(
            e["key"].alias("key"),
            anyvalue_from_string(e["value"], canon(e)).alias("value"),
        ),
    )
    return F.when(map_col.isNull(), F.lit(None).cast(ANY_VALUE_MAP)).otherwise(
        F.map_from_entries(entries)
    )


def is_anyvalue_map(dtype: T.DataType) -> bool:
    return (
        isinstance(dtype, T.MapType)
        and isinstance(dtype.valueType, T.StructType)
        and [f.name for f in dtype.valueType.fields] == [f.name for f in ANY_VALUE.fields]
    )


class AttributeTypeRegistry:
    """The attribute type authority (attribute-type-authority spec):
    ONE canonical type per (level, key) within a (tenant, dataset)
    scope — the caller holds one registry per scope, so cross-tenant
    isolation is structural. Precedence config → semconv hint →
    first-observed; MONOTONIC: once established, later conflicting
    observations never retype (off-type values go to the residue
    instead)."""

    def __init__(self, config: dict[str, str] | None = None,
                 semconv: dict[str, str] | None = None):
        self._config = dict(config or {})
        self._semconv = dict(SEMCONV_TYPE_HINTS if semconv is None else semconv)
        self._observed: dict[str, str] = {}
        for k, t in {**self._semconv, **self._config}.items():
            if t not in CANONICAL_TYPES:
                raise ValueError(f"unknown canonical type {t!r} for key {k!r}")

    @staticmethod
    def _field_id(key: str, level: str) -> str:
        # logical field identity includes the attribute LEVEL — a
        # resource-level service.name and a same-named record attribute
        # are distinct fields with independent canonical types
        return f"{level}:{key}"

    def canonical(self, key: str, level: str = "record") -> str:
        fid = self._field_id(key, level)
        if key in self._config:
            return self._config[key]
        if fid in self._observed:
            return self._observed[fid]
        if key in self._semconv:
            return self._semconv[key]
        return "string"

    def observe(self, key: str, otlp_type: str, level: str = "record") -> str:
        """Record a first observation; returns the (possibly
        pre-established) canonical type. Never flips an established
        type."""
        if otlp_type not in CANONICAL_TYPES:
            raise ValueError(f"unknown observed type {otlp_type!r}")
        fid = self._field_id(key, level)
        if key in self._config:
            return self._config[key]
        if fid not in self._observed:
            self._observed[fid] = self._semconv.get(key, otlp_type)
        return self._observed[fid]

    def assignments(self, level: str = "record") -> dict[str, str]:
        """key → canonical type for one level (the shape
        typed_attrs_from_stringified consumes)."""
        out = dict(self._semconv)
        prefix = f"{level}:"
        for fid, t in self._observed.items():
            if fid.startswith(prefix):
                out[fid[len(prefix):]] = t
        out.update(self._config)
        return out

    # -- persistence (catalog JSON round-trip)

    def to_dict(self) -> dict:
        return {"config": dict(self._config), "semconv": dict(self._semconv),
                "observed": dict(self._observed)}

    @classmethod
    def from_dict(cls, d: dict) -> "AttributeTypeRegistry":
        reg = cls(d.get("config"), d.get("semconv"))
        reg._observed = dict(d.get("observed") or {})
        return reg
