"""Replica of the driver's correctness gate: run every ``queries()``
entry in Spark AND its ``oracle_sql()`` in DuckDB over the same parquet
tables, canonicalize (sort columns by name, sort rows, round floats) and
compare values. Catches cross-engine drift before the driver does."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    if v == 0:
                        v = 0.0  # normalize -0.0
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return [c for _, c in sorted(zip(range(len(colnames)), colnames), key=lambda p: colnames[p[0]])], out


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = queries[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    if name not in oracles:
        # rows-only check, like the driver's weaker gate
        assert len(spark_rows) >= 0
        return
    con = _duck(SF_DIR)
    res = con.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    sc, srows = _canon(spark_rows, spark_cols)
    dc, drows = _canon(duck_rows, duck_cols)
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


# Types the driver's hasher is known to handle. HUGEINT/UHUGEINT (DuckDB's
# int128 result of sum() over integers) hash differently driver-side even
# when values are identical (round-3 finding: priority_shipmode,
# curation_pipeline, curation_full failed hash with identical values).
# Keep every oracle's output inside this envelope.
_DRIVER_SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE",
    "TIMESTAMP_NS",
}


def _type_ok(t: str) -> bool:
    return t in _DRIVER_SAFE_TYPES or t.startswith("DECIMAL")


def test_no_hugeint_in_oracle_output_types():
    """Every oracle's DuckDB result schema must avoid HUGEINT/UHUGEINT —
    the one type class proven to break the driver's value hash. This
    catches oracle typing drift in pytest, before the driver samples it."""
    con = _duck(SF_DIR)
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        types = [str(t) for t in con.sql(sql).types]
        bad = [t for t in types if not _type_ok(t)]
        if bad:
            offenders[name] = types
    assert not offenders, (
        f"oracles with driver-unsafe output types (wrap integer sums in "
        f"CAST(... AS BIGINT)): {offenders}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None
