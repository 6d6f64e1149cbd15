"""Shared fixtures: one SparkSession per test session, DuckDB with the
fixture tables registered as views (mirrors the driver's oracle harness)."""

from __future__ import annotations

import duckdb
import pytest

from mapreduceindex_spark.session import TABLES, get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, duck_con, sql, check_schema=True):
    """Order-insensitive comparison of a Spark result vs DuckDB SQL —
    the same contract the driver's CORRECTNESS gate applies."""
    import math

    from mapreduceindex_spark.functions.floataudit import audit_pandas

    sdf = spark_df.toPandas()
    fcols = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    ]
    flagged = audit_pandas(sdf, fcols)
    assert not flagged, (
        f"float output columns in the driver hash-risk class (emit BIGINT "
        f"micro units instead — see functions/floataudit.py): {flagged}"
    )
    ddf = duck_con.sql(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"column mismatch: {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = ddf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return None
            return round(v, 9)
        return v

    for c in cols:
        av = [norm(v) for v in a[c].tolist()]
        bv = [norm(v) for v in b[c].tolist()]
        assert av == bv, (
            f"column {c} differs; first mismatch at "
            f"{next((i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if x != y)}"
        )
