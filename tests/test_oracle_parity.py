"""Local clone of the driver's t2 gate: every queries() entry vs its
oracle_sql() on the sf0.001 tables (sf0.01 in the driver; 0.001 here so
the full suite stays fast — the expressions are scale-invariant)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL, assert_df_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable():
    assert QUERIES, "no queries declared"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck):
    q = QUERIES[name]
    if name not in ORACLES:
        from mapreduceindex_spark.functions.floataudit import audit_pandas

        df = q(spark, SF_SMALL)
        fcols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float")
        ]
        pdf = df.toPandas()  # rows-only check, mirrors the driver
        assert len(pdf) >= 0
        assert not audit_pandas(pdf, fcols), "hash-risk float columns"
        return
    assert_df_matches_oracle(q(spark, SF_SMALL), duck, ORACLES[name])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["word", "df", "doc_ids"]
