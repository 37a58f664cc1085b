"""Versioned-schema resolver as data (reference
src/common/src/schema/schema_parser.rs + schemas.toml, SURVEY §1.3).

The reference declares every at-rest table schema in a TOML document:
versions may ``inherits`` a previous version, apply ``field_renames``,
append ``field_additions``, and mark fields ``computed`` (derived at
write time from other columns). This module is that machinery for the
Spark engine — one Python structure (or a TOML string parsed with the
stdlib ``tomllib``) the flatteners and migrations consume, instead of
schema evolution hard-coded inside each flattener.

Resolution order mirrors schema_parser.rs resolve_table_schema
(:101-168): start from the parent's resolved fields, apply renames
(position-preserving), then append additions. Computed expressions are
the three the reference defines (schema_parser.rs computed set used by
schemas.toml) plus identity pass-through:

- ``start_time_unix_nano`` — nanosecond epoch column → timestamp
- ``date_from_timestamp`` / ``hour_from_timestamp`` — partition keys

``to_spark_schema`` is the to_iceberg_schema analog (:170-301),
including the materialized-label and attr_tokens appendage variants.
``migrate`` replays the rename/addition chain between two versions on
a live DataFrame — the upgrade path a reader of old parquet uses.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------- type mapping

_SPARK_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # Spark has no unsigned ints; the reference stores uint64 nanos that
    # fit comfortably in a signed long until year 2262
    "uint64": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "date": T.DateType(),
    "timestamp_ns": T.TimestampType(),  # µs precision at rest (catalog.py)
    "map<string,string>": T.MapType(T.StringType(), T.StringType()),
    "list<string>": T.ArrayType(T.StringType()),
    "list<double>": T.ArrayType(T.DoubleType()),
    "list<int64>": T.ArrayType(T.LongType()),
    # generic list<struct> (reference TOML vocabulary) rides as a JSON
    # string; the engine's own tables use the typed variants below
    "list<struct>": T.StringType(),
    "binary": T.BinaryType(),
}


def _register_signal_types() -> None:
    from .anyvalue import ANY_VALUE_MAP
    from .signal_schemas import QUANTILE_VALUE, SPAN_EVENT, SPAN_LINK

    _SPARK_TYPES["list<span_event>"] = T.ArrayType(SPAN_EVENT)
    _SPARK_TYPES["list<span_link>"] = T.ArrayType(SPAN_LINK)
    _SPARK_TYPES["list<quantile_value>"] = T.ArrayType(QUANTILE_VALUE)
    # typed attribute map (otel-native-schema proposal: the typed
    # substrate that replaces stringified Map<String,String>)
    _SPARK_TYPES["map<string,any_value>"] = ANY_VALUE_MAP


_register_signal_types()


def spark_type(name: str) -> T.DataType:
    try:
        return _SPARK_TYPES[name]
    except KeyError:
        raise ValueError(f"unknown schema field type {name!r}") from None


# ------------------------------------------------------- computed columns

def _computed_column(expr: str, source_cols: dict[str, str]) -> Column:
    """The reference's computed-field vocabulary (schemas.toml):
    a source column name (nanos → timestamp), or the two partition
    derivations. source_cols maps roles to actual column names."""
    ts = F.col(source_cols.get("timestamp", "timestamp"))
    if expr == "date_from_timestamp":
        return F.to_date(ts)
    if expr == "hour_from_timestamp":
        return F.hour(ts)
    # anything else names a source column carrying epoch nanoseconds;
    # integer `div`, not float `/` — a long→double round-trip rounds by
    # up to 256 ns near 2^60 and can flip the microsecond (otlp.py uses
    # the same div)
    return F.timestamp_micros(F.expr(f"CAST(`{expr}` AS LONG) div 1000"))


# -------------------------------------------------------------- resolver

@dataclass
class ResolvedField:
    name: str
    type: str
    required: bool = False
    computed: str | None = None


@dataclass
class ResolvedSchema:
    table: str
    version: str
    fields: list[ResolvedField] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)

    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def computed_fields(self) -> list[ResolvedField]:
        return [f for f in self.fields if f.computed is not None]

    def to_spark_schema(
        self, labels: list[str] | None = None, attr_tokens: bool = False
    ) -> T.StructType:
        """StructType for the resolved fields, optionally appending
        materialized label_<x> columns and the attr_tokens array
        (to_iceberg_schema_with_labels[_and_attr_tokens],
        schema_parser.rs:179-301)."""
        out = [
            T.StructField(f.name, spark_type(f.type), nullable=not f.required)
            for f in self.fields
        ]
        for lb in labels or []:
            out.append(T.StructField(f"label_{lb}", T.StringType(), nullable=True))
        if attr_tokens:
            out.append(
                T.StructField("attr_tokens", T.ArrayType(T.StringType()), nullable=True)
            )
        return T.StructType(out)


class SchemaRegistry:
    """All table schema versions, resolved on demand.

    ``definitions`` is the schemas.toml structure as Python data::

        {"metadata": {"current_traces_version": "v2", ...},
         "traces": {"v1": {"fields": [...]},
                    "v2": {"inherits": "v1",
                           "field_renames": [{"from": ..., "to": ...}],
                           "field_additions": [...],
                           "partition_by": [...]}}}
    """

    def __init__(self, definitions: dict):
        self._defs = definitions

    @classmethod
    def from_toml(cls, toml_str: str) -> "SchemaRegistry":
        import tomllib

        return cls(tomllib.loads(toml_str))

    @classmethod
    def from_toml_file(cls, path: str) -> "SchemaRegistry":
        with open(path, "rb") as fh:
            import tomllib

            return cls(tomllib.load(fh))

    # -- metadata

    def tables(self) -> list[str]:
        return sorted(k for k in self._defs if k != "metadata")

    def versions(self, table: str) -> list[str]:
        # natural order: v10 sorts AFTER v9, not between v1 and v2 —
        # the metadata-less current_version fallback takes the last
        def key(v: str):
            import re

            m = re.fullmatch(r"v(\d+)", v)
            return (0, int(m.group(1)), "") if m else (1, 0, v)

        return sorted(self._table_defs(table), key=key)

    def current_version(self, table: str) -> str:
        meta = self._defs.get("metadata", {})
        for key in (f"current_{table}_version", f"current_{table.rstrip('s')}_version"):
            if key in meta:
                return meta[key]
        return self.versions(table)[-1]

    def _table_defs(self, table: str) -> dict:
        try:
            return self._defs[table]
        except KeyError:
            raise ValueError(f"unknown table {table!r}") from None

    # -- resolution (schema_parser.rs:101-168)

    def resolve(self, table: str, version: str | None = None) -> ResolvedSchema:
        version = version or self.current_version(table)
        defs = self._table_defs(table)
        if version not in defs:
            raise ValueError(f"unknown version {version!r} for table {table!r}")
        d = defs[version]
        if d.get("inherits"):
            parent = self.resolve(table, d["inherits"])
            fields = copy.deepcopy(parent.fields)
        else:
            fields = []
        by_name = {f.name: i for i, f in enumerate(fields)}
        for f in d.get("fields", []):
            fields.append(
                ResolvedField(f["name"], f["type"], f.get("required", False),
                              f.get("computed"))
            )
            by_name[f["name"]] = len(fields) - 1
        for rn in d.get("field_renames", []):
            if rn["from"] in by_name:  # position-preserving rename
                i = by_name.pop(rn["from"])
                fields[i].name = rn["to"]
                by_name[rn["to"]] = i
        for f in d.get("field_additions", []):
            fields.append(
                ResolvedField(f["name"], f["type"], f.get("required", False),
                              f.get("computed"))
            )
            by_name[f["name"]] = len(fields) - 1
        # field_retypes: the otel-native-schema proposal's breaking
        # typed-layout cutover expressed as resolver data — the field
        # keeps its name and position, its TYPE changes (e.g.
        # map<string,string> → map<string,any_value>), and ``migration``
        # names the value-conversion kernel migrate() applies
        for rt in d.get("field_retypes", []):
            if rt["name"] not in by_name:
                raise ValueError(
                    f"retype of unknown field {rt['name']!r} in "
                    f"{table}/{version}")
            fields[by_name[rt["name"]]].type = rt["to_type"]
        return ResolvedSchema(
            table, version, fields,
            list(d.get("partition_by", []) or []),
        )

    # -- live-DataFrame migration between versions

    def _chain(self, table: str, from_version: str, to_version: str) -> list[str]:
        """Versions from (exclusive) from_version to (inclusive)
        to_version, following ``inherits`` links backwards."""
        defs = self._table_defs(table)
        chain = []
        v = to_version
        while v is not None and v != from_version:
            if v not in defs:
                raise ValueError(f"unknown version {v!r} for table {table!r}")
            chain.append(v)
            v = defs[v].get("inherits")
        if v != from_version:
            raise ValueError(
                f"{to_version!r} does not inherit (transitively) from "
                f"{from_version!r} for table {table!r}"
            )
        return list(reversed(chain))

    def migrate(
        self,
        df: DataFrame,
        table: str,
        from_version: str,
        to_version: str | None = None,
        attr_types: dict[str, str] | None = None,
    ) -> DataFrame:
        """Upgrade a DataFrame written at ``from_version`` to
        ``to_version`` by replaying each intermediate version's renames,
        computed additions (non-computed additions arrive as typed NULL
        columns), and retypes. The inverse of nothing — downgrades are
        reads with column pruning, never rewrites.

        ``attr_types`` (key → canonical type, usually
        ``AttributeTypeRegistry.assignments()``) drives the
        ``stringified_to_anyvalue`` retype kernel: each stringified
        value casts into its key's canonical home, off-type values are
        retained losslessly as string residue — the proposal's
        type-authority precedence applied retroactively to
        pre-cutover data."""
        to_version = to_version or self.current_version(table)
        defs = self._table_defs(table)
        for v in self._chain(table, from_version, to_version):
            d = defs[v]
            for rn in d.get("field_renames", []):
                if rn["from"] in df.columns:
                    df = df.withColumnRenamed(rn["from"], rn["to"])
            for f in d.get("field_additions", []):
                if f["name"] in df.columns:
                    continue
                if f.get("computed"):
                    col = _computed_column(f["computed"], {"timestamp": "timestamp"})
                else:
                    col = F.lit(None).cast(spark_type(f["type"]))
                df = df.withColumn(f["name"], col)
            for rt in d.get("field_retypes", []):
                if rt["name"] not in df.columns:
                    continue
                kernel = rt.get("migration")
                if kernel == "stringified_to_anyvalue":
                    from .anyvalue import typed_attrs_from_stringified

                    df = df.withColumn(
                        rt["name"],
                        typed_attrs_from_stringified(
                            F.col(rt["name"]), attr_types or {}),
                    )
                elif kernel == "cast":
                    df = df.withColumn(
                        rt["name"],
                        F.col(rt["name"]).cast(spark_type(rt["to_type"])),
                    )
                else:
                    raise ValueError(
                        f"unknown retype migration {kernel!r} for "
                        f"{rt['name']!r} in {table}/{v}")
        return df


# --------------------------------------------------------------- builtin

def builtin_registry() -> SchemaRegistry:
    """The engine's own table versions in the reference's declaration
    shape (schemas.toml parity for the tables this engine persists;
    v1 matches signal_schemas.py, which remains the at-rest source of
    truth — pinned equal by tests)."""
    ts = {"name": "timestamp", "type": "timestamp_ns", "required": True}
    day = {"name": "date_day", "type": "date", "required": True,
           "computed": "date_from_timestamp"}
    hour = {"name": "hour", "type": "int32", "required": True,
            "computed": "hour_from_timestamp"}

    def s(name, type_="string", required=False, computed=None):
        d = {"name": name, "type": type_, "required": required}
        if computed:
            d["computed"] = computed
        return d

    metric_common = [
        ts,
        s("start_timestamp", "timestamp_ns"),
        s("service_name", required=True),
        s("metric_name", required=True),
        s("metric_description"),
        s("metric_unit"),
        s("flags", "int32"),
        s("resource_attributes", "map<string,string>"),
        s("scope_attributes", "map<string,string>"),
        s("attributes", "map<string,string>"),
        s("exemplars"),
        day,
        hour,
    ]
    return SchemaRegistry({
        "metadata": {
            "description": "signaldb-spark built-in table schemas",
            "current_traces_version": "v2",
            "current_logs_version": "v1",
            "current_metrics_gauge_version": "v1",
        },
        "traces": {
            # v1: the pre-rename shape the reference's traces.v1 declares
            # (schemas.toml traces.v1) restricted to columns this engine
            # also persists
            "v1": {
                "fields": [
                    s("trace_id", required=True),
                    s("span_id", required=True),
                    s("parent_span_id"),
                    s("name", required=True),
                    s("service_name", required=True),
                    s("start_time_unix_nano", "uint64", required=True),
                    s("end_time_unix_nano", "uint64", required=True),
                    s("duration_nano", "uint64", required=True),
                    s("span_kind", required=True),
                    s("status_code", required=True),
                    s("status_message"),
                    s("is_root", "boolean", required=True),
                    s("attributes_json", "map<string,string>"),
                    s("resource_json", "map<string,string>"),
                    s("events", "list<span_event>"),
                    s("links", "list<span_link>"),
                    s("trace_state"),
                    s("scope_name"),
                    s("scope_version"),
                    s("scope_attributes", "map<string,string>"),
                ],
            },
            # v2: the reference's Iceberg-era renames + partition fields
            # (schemas.toml traces.v2) — the shape sources/otlp.py emits
            "v2": {
                "inherits": "v1",
                "field_renames": [
                    {"from": "name", "to": "span_name"},
                    {"from": "duration_nano", "to": "duration_nanos"},
                    {"from": "attributes_json", "to": "span_attributes"},
                    {"from": "resource_json", "to": "resource_attributes"},
                ],
                "field_additions": [
                    {"name": "timestamp", "type": "timestamp_ns", "required": True,
                     "computed": "start_time_unix_nano"},
                    day,
                    hour,
                ],
                "partition_by": ["date_day", "hour"],
            },
            # v3: the typed-attribute layout extended across the traces
            # signal (otel-native-schema: the type authority owns ONE
            # canonical type per field tenant-wide, so span and resource
            # attributes share the same assignments the logs cutover
            # used). Same breaking-retype shape as logs.v2: names and
            # positions keep, types change, migrate(v2→v3) replays
            # stringified maps through the authority.
            "v3": {
                "inherits": "v2",
                "field_retypes": [
                    {"name": "span_attributes",
                     "to_type": "map<string,any_value>",
                     "migration": "stringified_to_anyvalue"},
                    {"name": "resource_attributes",
                     "to_type": "map<string,any_value>",
                     "migration": "stringified_to_anyvalue"},
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
        "logs": {
            "v1": {
                "fields": [
                    ts,
                    s("observed_timestamp", "timestamp_ns"),
                    s("trace_id"),
                    s("span_id"),
                    s("trace_flags", "int32"),
                    s("severity_text"),
                    s("severity_number", "int32"),
                    s("service_name", required=True),
                    s("body"),
                    s("scope_name"),
                    s("scope_version"),
                    s("resource_attributes", "map<string,string>"),
                    s("scope_attributes", "map<string,string>"),
                    s("log_attributes", "map<string,string>"),
                    s("attr_tokens", "list<string>"),
                    s("label_namespace"),
                    day,
                    hour,
                ],
                "partition_by": ["date_day", "hour"],
            },
            # v2: the typed-attribute layout (otel-native-schema
            # proposal's breaking cutover): record attributes become the
            # typed AnyValue map in one go — same name, same position,
            # new type. current stays v1 until a deployment opts in
            # (metadata current_logs_version); migrate(v1→v2) replays
            # pre-cutover stringified maps through the type authority.
            "v2": {
                "inherits": "v1",
                "field_retypes": [
                    {"name": "log_attributes",
                     "to_type": "map<string,any_value>",
                     "migration": "stringified_to_anyvalue"},
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
        "metrics_gauge": {
            "v1": {
                "fields": metric_common + [s("value", "double", required=True)],
                "partition_by": ["date_day", "hour"],
            },
            # v2: typed datapoint attributes — the third signal under the
            # one tenant-wide type authority (logs.v2, traces.v3,
            # metrics_gauge.v2 complete the otel-native-schema cutover
            # story across signals). current stays v1 until opt-in.
            "v2": {
                "inherits": "v1",
                "field_retypes": [
                    {"name": "attributes",
                     "to_type": "map<string,any_value>",
                     "migration": "stringified_to_anyvalue"},
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
        "metrics_sum": {
            "v1": {
                "fields": metric_common + [
                    s("value", "double", required=True),
                    s("aggregation_temporality", "int32", required=True),
                    s("is_monotonic", "boolean", required=True),
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
        "metrics_histogram": {
            "v1": {
                "fields": metric_common + [
                    s("count", "uint64", required=True),
                    s("sum", "double"),
                    s("min", "double"),
                    s("max", "double"),
                    s("bucket_counts", "list<double>", required=True),
                    s("explicit_bounds", "list<double>", required=True),
                    s("aggregation_temporality", "int32", required=True),
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
        # exp-histogram / summary: the REDUCED column sets the flattener
        # persists (schema_transform.rs:1493/:1698) — not metric_common
        "metrics_exponential_histogram": {
            "v1": {
                "fields": [
                    ts,
                    s("service_name", required=True),
                    s("metric_name", required=True),
                    s("count", "int64"),
                    s("sum", "double"),
                    s("min", "double"),
                    s("max", "double"),
                    s("scale", "int32"),
                    s("zero_count", "int64"),
                    s("positive_offset", "int32"),
                    s("positive_bucket_counts", "list<int64>"),
                    s("negative_offset", "int32"),
                    s("negative_bucket_counts", "list<int64>"),
                    s("flags", "int32"),
                    s("aggregation_temporality", "int32"),
                    s("zero_threshold", "double"),
                    s("attributes", "map<string,string>"),
                    day,
                    hour,
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
        "metrics_summary": {
            "v1": {
                "fields": [
                    ts,
                    s("service_name", required=True),
                    s("metric_name", required=True),
                    s("count", "int64"),
                    s("sum", "double"),
                    s("quantile_values", "list<quantile_value>"),
                    s("flags", "int32"),
                    s("attributes", "map<string,string>"),
                    day,
                    hour,
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
        "profiles": {
            "v1": {
                "fields": [
                    s("profile_id", required=True),
                    ts,
                    s("duration_nano", "int64"),
                    s("sample_type_type"),
                    s("sample_type_unit"),
                    s("period", "int64"),
                    s("service_name", required=True),
                    s("stacktraces_json"),
                    s("samples_json"),
                    s("resource_attributes", "map<string,string>"),
                    s("attributes", "map<string,string>"),
                    s("trace_id"),
                    s("span_id"),
                    day,
                    hour,
                ],
                "partition_by": ["date_day", "hour"],
            },
        },
    })
