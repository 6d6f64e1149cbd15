"""Round-10 third-wave semantics tests: link prediction (Resource
Allocation), label propagation communities, and the wave's other
additions — each pinned on a hand-built fixture where the expected
output is derivable on paper.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _li_from_orders(spark, orders):
    rows = [(ok, pk) for ok, parts in orders.items() for pk in parts]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    parts = sorted({pk for ps in orders.values() for pk in ps})
    part = spark.createDataFrame([(p,) for p in parts], "p_partkey long")
    return li, part


# ---------------------------------------------------------------------------
# link_prediction
# ---------------------------------------------------------------------------


def test_link_prediction_path_graph_hand_score(spark):
    """Path 1-2-3-4: non-adjacent pairs (1,3) and (2,4) share exactly
    one middle neighbor of degree 2 → ra = 500000; (1,4) shares no
    neighbor and is absent; adjacent pairs are excluded."""
    from mapreduceindex_spark.operators.graph import link_prediction

    li, part = _li_from_orders(
        spark, {1: [1, 2], 2: [2, 3], 3: [3, 4]}
    )
    out = {
        (r["p_a"], r["p_b"]): (r["common_neighbors"], r["ra_score_u"])
        for r in link_prediction(li, part, min_support=1).collect()
    }
    assert out == {(1, 3): (1, 500000), (2, 4): (1, 500000)}


def test_link_prediction_discounts_hub_intermediaries(spark):
    """Two wedges: leaves 10,11 meet through low-degree middle 1
    (deg 2); leaves 20,21 meet through hub 2 (deg 4). RA ranks the
    low-degree wedge above the hub wedge; raw CN alone could not."""
    from mapreduceindex_spark.operators.graph import link_prediction

    li, part = _li_from_orders(
        spark,
        {
            1: [1, 10],
            2: [1, 11],
            3: [2, 20],
            4: [2, 21],
            5: [2, 22],
            6: [2, 23],
        },
    )
    rows = link_prediction(li, part, min_support=1).collect()
    score = {(r["p_a"], r["p_b"]): r["ra_score_u"] for r in rows}
    assert score[(10, 11)] == 500000  # 1e6 DIV 2
    assert score[(20, 21)] == 250000  # 1e6 DIV 4
    # ranked output: the low-degree wedge comes first
    assert (rows[0]["p_a"], rows[0]["p_b"]) == (10, 11)


def test_link_prediction_excludes_existing_edges(spark):
    """Triangle 1-2-3: every pair is already adjacent, so no candidate
    edges remain even though every pair has a common neighbor."""
    from mapreduceindex_spark.operators.graph import link_prediction

    li, part = _li_from_orders(spark, {1: [1, 2, 3], 2: [1, 2, 3]})
    assert link_prediction(li, part, min_support=2).count() == 0


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def test_label_propagation_splits_barbell_where_components_cannot(spark):
    """Two triangles joined by one bridge edge (3-4): connected
    components would merge everything into one cluster; LPA keeps two
    density communities — each triangle converges to its minimum
    member label, and the bridge endpoints stay with their triangle
    (two same-community neighbors outvote the one bridge neighbor)."""
    from mapreduceindex_spark.operators.graph import label_propagation

    tri_a = [(1, 2), (1, 3), (2, 3)]
    tri_b = [(4, 5), (4, 6), (5, 6)]
    bridge = [(3, 4)]
    li, part = _li_from_orders(
        spark,
        {i + 1: list(e) for i, e in enumerate(tri_a + tri_b + bridge)},
    )
    out = {
        r["p_partkey"]: r["community"]
        for r in label_propagation(li, part, min_support=1).collect()
    }
    # two communities (the exact ids are whatever labels won the vote —
    # node 3's own label leaks over the bridge and becomes triangle B's
    # identifier, which is fine: LPA community ids are opaque)
    assert out[1] == out[2] == out[3]
    assert out[4] == out[5] == out[6]
    assert out[1] != out[4]
    # and the converged fixture is deterministic end to end
    assert out == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_tie_breaks_to_smaller_label(spark):
    """Star 1-2, 1-3, 1-4: the hub's neighbors all vote their own label
    in round 1 (every count 1) → the tie goes to the smallest label 2;
    leaves adopt the hub's label 1. Round 2+: hub keeps the smallest
    frequent label among leaves (all 1 after round 1) → 1."""
    from mapreduceindex_spark.operators.graph import label_propagation

    li, part = _li_from_orders(spark, {1: [1, 2], 2: [1, 3], 3: [1, 4]})
    out = {
        r["p_partkey"]: r["community"]
        for r in label_propagation(li, part, min_support=1, rounds=2).collect()
    }
    # round 1: hub 1 → min(2,3,4)=2; leaves → 1
    # round 2: hub sees leaves all labeled 1 → 1; leaves see hub's 2 → 2
    assert out == {1: 1, 2: 2, 3: 2, 4: 2}
