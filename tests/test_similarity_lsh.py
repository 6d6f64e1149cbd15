"""embedding_near_dups: LSH tier vs exact tier parity + plan properties.

The fixture embeddings have no pairs above 0.5 cosine, so these tests
plant near-duplicates (cosine ≥ 0.99) in a synthetic corpus and require
the default (LSH) tier to return exactly the exact tier's answer — the
deterministic planes make this a deterministic test, not a flaky
recall lottery.
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest

from mapreduceindex_spark.operators.similarity import embedding_near_dups


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((200, 64))
    # 30 perturbed near-copies of the first 30 vectors: cosine ≈ 0.997
    noise = rng.standard_normal((30, 64))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    dups = base[:30] + 0.6 * noise
    emb = np.vstack([base, dups])
    norms = np.linalg.norm(emb, axis=1)
    cos = (emb @ emb.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(emb), 1)
    truth = {
        (int(a), int(b), round(float(cos[a, b]), 6))
        for a, b in zip(*iu)
        if round(float(cos[a, b]), 6) >= 0.95
    }
    assert len(truth) >= 30, "fixture construction should plant ≥30 pairs"
    df = spark.createDataFrame(
        [(i, [float(x) for x in emb[i]]) for i in range(len(emb))],
        "vec_id long, embedding array<float>",
    )
    return df, truth


def test_lsh_equals_exact_on_planted_corpus(planted):
    df, truth = planted
    exact = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embedding_near_dups(df, method="exact").collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embedding_near_dups(df, method="lsh").collect()
    }
    # the exact tier must equal ground truth up to float32-storage rounding
    assert {(a, b) for a, b, _ in exact} == {(a, b) for a, b, _ in truth}
    assert lsh == exact


def test_lsh_no_pairs_on_fixture(spark):
    from mapreduceindex_spark.session import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    assert embedding_near_dups(emb).count() == 0


def test_default_plan_has_no_allpairs_stage(spark):
    from mapreduceindex_spark.session import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    df = embedding_near_dups(emb)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the exact tier's scale-killer must be absent from the default plan:
    # no cartesian/nested-loop stage and no all-block-pairs fan-out (the
    # exact tier's sequence(0, n_blocks-1) explode) — work is grouped by
    # the LSH bucket key instead
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "sequence(" not in plan
    assert "hashpartitioning(bucket" in plan


def test_ivf_trained_structure_and_recall(spark):
    """Trained IVF: exactly k ranked rows per query, cosine ordered,
    deterministic across partitionings, and recall@5 vs exact
    brute-force stays useful (>= 40% on the fixture — probing 2 of 8
    trained cells)."""
    from mapreduceindex_spark.operators.similarity import (
        cosine_topk,
        ivf_topk_trained,
    )
    from mapreduceindex_spark.session import load_table
    from tests.conftest import SF_SMALL

    embs = load_table(spark, SF_SMALL, "embeddings")
    out = ivf_topk_trained(embs, n_queries=10, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
    again = ivf_topk_trained(embs.repartition(7), n_queries=10, k=5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    exact = cosine_topk(embs, n_queries=10, k=5).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    found = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert len(found & truth) / len(truth) >= 0.4
