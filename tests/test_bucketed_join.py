"""Bucketed co-located join: the orders ⨝ lineitem shuffle, paid at ingest.

Asserts the physical property that matters at 100 TB: two tables bucketed
on the join key with equal bucket counts sort-merge-join with ZERO
exchanges (broadcast disabled so the plan can't cheat at fixture scale).
"""

from __future__ import annotations

import contextlib
import io
import tempfile

from pyspark.sql import functions as F

from mapreduceindex_spark.session import load_table
from mapreduceindex_spark.sinks.bucketed import read_table, write_bucketed_table
from tests.conftest import SF_SMALL


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    write_bucketed_table(
        load_table(spark, SF_SMALL, "orders"),
        "t_orders_b",
        "o_orderkey",
        8,
        tempfile.mkdtemp(prefix="bkt_o_"),
    )
    write_bucketed_table(
        load_table(spark, SF_SMALL, "lineitem").withColumnRenamed(
            "l_orderkey", "lk"
        ),
        "t_lineitem_b",
        "lk",
        8,
        tempfile.mkdtemp(prefix="bkt_l_"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "t_orders_b").join(
            read_table(spark, "t_lineitem_b"),
            F.col("o_orderkey") == F.col("lk"),
        )
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # correctness: same result as the plain (shuffled) join
        expect = (
            load_table(spark, SF_SMALL, "orders")
            .join(
                load_table(spark, SF_SMALL, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
