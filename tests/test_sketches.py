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


def test_hll_registers_match_pure_python(spark):
    """The (register, rho) state is a pure function of md5 — recompute it
    row-by-row in Python on a tiny frame and require the identical
    z_scaled/zero-register readout (what oracle parity checks on the
    fixture, pinned here on hand-built rows where every hash path —
    including rho via bit_length — is independently derived)."""
    import hashlib

    from mapreduceindex_spark.operators.sketches import hll_distinct_users

    users = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89]
    rows = [(i, "t", u) for i, u in enumerate(users)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long"
    )
    regs: dict[int, int] = {}
    for u in users:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        w = h // 64
        rho = 55 if w == 0 else 55 - w.bit_length()
        r = h % 64
        regs[r] = max(regs.get(r, 0), rho)
    z_expected = sum(1 << (56 - mj) for mj in regs.values()) + (
        64 - len(regs)
    ) * (1 << 56)
    out = hll_distinct_users(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row["z_scaled"] == z_expected
    assert row["n_zero_regs"] == 64 - len(regs)
    assert row["n_exact"] == len(users)


def test_hll_estimate_close_and_linear_branch(spark):
    """Estimate accuracy on the fixture (HLL σ ≈ 1.04/√64 ≈ 13%; allow
    3σ) and the small-range linear-counting branch: with n ≪ m the
    estimate must be m·ln(m/V) — near-exact for tiny cardinalities."""
    import math

    from mapreduceindex_spark.operators.sketches import hll_distinct_users

    events = load_table(spark, SF, "events")
    for r in hll_distinct_users(events).collect():
        assert abs(r["est_users"] - r["n_exact"]) / r["n_exact"] < 0.4, (
            r["event_type"], r["est_users"], r["n_exact"],
        )
    tiny = spark.createDataFrame(
        [(i, "t", i % 3) for i in range(30)],
        "event_id long, event_type string, user_id long",
    )
    row = hll_distinct_users(tiny).collect()[0]
    assert row["n_exact"] == 3
    v = row["n_zero_regs"]
    # libm vs JVM ln may differ in the last ulp; the 1e-4 grid absorbs it
    assert abs(row["est_users"] - 64.0 * math.log(64.0 / v)) < 1e-3
    assert abs(row["est_users"] - 3) < 1.0
