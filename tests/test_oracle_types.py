"""Registry-wide oracle OUTPUT-TYPE gate.

Root cause of the r03–r05 ``embedding_dim_stats`` driver hash_fails
(the only query that ever hash-failed, three rounds running): its
oracle's uncast ``sum(BIGINT)`` widened to DuckDB HUGEINT — the single
non-canonical output type across all 156 oracles — and pandas converts
HUGEINT to float64, so any dtype- or serialization-sensitive compare
diverges from Spark's int64 while every *value*-based compare passes
(``70.0 == 70``). That failure mode is invisible to the local harness
and to bit-level value reruns by construction; the only robust defense
is a static type gate.

This test plans (does not execute) every ``oracle_sql()`` entry against
0-row views with the production parquet schemas and asserts every
output column's DuckDB type is in the canonical set that round-trips
to pandas with a stable dtype. HUGEINT, DECIMAL, FLOAT (float32), and
unsigned types are all banned — each has a pandas conversion that
differs from its Spark twin's.
"""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: DuckDB types whose pandas conversion matches the Spark toPandas dtype
#: of the corresponding Spark SQL type. Anything else is a latent driver
#: hash divergence even when values are bit-identical.
CANONICAL = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}


@pytest.fixture(scope="module")
def oracle_types():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    for t in TABLES:
        # 0-row views with the real parquet schemas: types resolve,
        # nothing executes beyond trivial scans
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{SF}/{t}.parquet' LIMIT 0"
        )
    out = {}
    for name, sql in mod.oracle_sql().items():
        rel = con.sql(sql)
        out[name] = dict(zip(rel.columns, (str(t) for t in rel.types)))
    con.close()
    return out


def test_every_oracle_column_type_is_canonical(oracle_types):
    offenders = {
        name: {c: t for c, t in cols.items() if t not in CANONICAL}
        for name, cols in oracle_types.items()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, (
        "oracle output columns with non-canonical DuckDB types (pandas "
        f"dtype will diverge from Spark's): {offenders}. Cast sums "
        "::BIGINT (DuckDB widens sum(BIGINT) to HUGEINT), decimals to "
        "DOUBLE or scaled BIGINT."
    )


def test_embedding_dim_stats_sum_is_bigint(oracle_types):
    """Regression pin for the exact r03-r05 failure."""
    assert oracle_types["embedding_dim_stats"]["sum_micro"] == "BIGINT"
