"""Sketch operators: KMV estimator accuracy and exact-quantile semantics.

Oracle parity for all three queries is covered by test_oracle_parity.py's
auto-parametrization; these tests pin the properties parity can't see —
that the KMV *estimate* is actually close to the true cardinality, and
that price_quantiles implements percentile_disc rank semantics exactly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduceindex_spark.operators.sketches import (
    kmv_distinct_tokens,
    kmv_distinct_users,
    price_quantiles,
)
from mapreduceindex_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_kmv_tokens_estimate_close(spark):
    docs = load_table(spark, SF, "documents")
    row = kmv_distinct_tokens(docs, k=256).collect()[0]
    exact = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("tok"))
        .select(F.lower(F.regexp_replace("tok", "[^a-zA-Z]", "")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
        .count()
    )
    if row["n_mins"] < row["k"]:
        assert row["est_distinct"] == exact
    else:
        # KMV relative error ~ 1/sqrt(k) ≈ 6% at k=256; allow 3 sigma
        assert abs(row["est_distinct"] - exact) / exact < 0.2, (
            row["est_distinct"],
            exact,
        )


def test_kmv_users_exact_when_under_k(spark):
    events = load_table(spark, SF, "events")
    # k larger than any group's distinct users → sketch is exhaustive/exact
    res = {
        r["event_type"]: r
        for r in kmv_distinct_users(events, k=100000).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(res) == set(exact)
    for et, r in res.items():
        assert r["n_mins"] == exact[et]
        assert r["est_users"] == float(exact[et])


def test_price_quantiles_rank_semantics(spark):
    orders = load_table(spark, SF, "orders")
    got = {r["p"]: r["value"] for r in price_quantiles(orders).collect()}
    rows = sorted(
        orders.select("o_totalprice", "o_orderkey").collect(),
        key=lambda r: (r["o_totalprice"], r["o_orderkey"]),
    )
    n = len(rows)
    for p in (0.25, 0.5, 0.75, 0.9, 0.99):
        r = min(max(int(math.ceil(p * n)), 1), n)
        assert got[p] == round(rows[r - 1]["o_totalprice"], 2)


def test_price_quantiles_empty_input(spark):
    orders = load_table(spark, SF, "orders").filter("o_orderkey < 0")
    assert price_quantiles(orders).count() == 0


def test_cms_one_sided_guarantee_and_exactness(spark):
    """CMS never underestimates (min over depth rows of colliding sums),
    and with width >> vocabulary every estimate is exact. A width-2 grid
    forces collisions and must show overestimate > 0 somewhere while the
    guarantee still holds."""
    from mapreduceindex_spark.operators.sketches import cms_hot_tokens
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    wide = cms_hot_tokens(docs, depth=4, width=65536, k=15).collect()
    assert len(wide) == 15
    assert all(r["overestimate"] == 0 for r in wide)  # no collisions
    assert all(r["cms_est"] >= r["n_exact"] for r in wide)
    # exact ordering: descending counts, word tie-break
    keys = [(-r["n_exact"], r["word"]) for r in wide]
    assert keys == sorted(keys)
    tight = cms_hot_tokens(docs, depth=2, width=2, k=15).collect()
    assert all(r["cms_est"] >= r["n_exact"] for r in tight)
    assert any(r["overestimate"] > 0 for r in tight)
