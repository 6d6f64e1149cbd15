"""Round-10 fourth-wave semantics tests: sketch set algebra and the
wave's other additions — each pinned on a hand-built fixture where the
expected output is derivable on paper (or by a tiny independent
pure-Python replay of the published estimator).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# kmv_set_ops
# ---------------------------------------------------------------------------


def test_kmv_set_ops_exhaustive_is_exact(spark):
    """Small sets (< k): every sketch is exhaustive, so union and
    intersection estimates degrade to the exact counts."""
    from mapreduceindex_spark.operators.sketches import kmv_set_ops

    ev = spark.createDataFrame(
        [(1, "x", 1), (2, "x", 2), (3, "x", 3), (4, "x", 2),
         (5, "y", 2), (6, "y", 3), (7, "y", 4)],
        "event_id long, event_type string, user_id long",
    )
    [r] = kmv_set_ops(ev, k=64).collect()
    assert (r["type_a"], r["type_b"]) == ("x", "y")
    assert r["exact_a"] == 3 and r["exact_b"] == 3
    assert r["exact_union"] == 4 and r["exact_inter"] == 2
    assert r["est_a"] == 3.0 and r["est_b"] == 3.0
    assert r["est_union"] == 4.0 and r["est_inter"] == 2.0


def test_kmv_set_ops_estimator_matches_pure_python_replay(spark):
    """k=4 on 12-user sets: the union sketch must be the k smallest of
    the merged per-type sketches and the estimates must equal the
    Beyer et al. formulas replayed independently in pure Python."""
    from mapreduceindex_spark.operators.sketches import kmv_set_ops

    a_users = list(range(100, 112))
    b_users = list(range(106, 118))  # overlap = 106..111 (6 users)
    ev = spark.createDataFrame(
        [(i, "a", u) for i, u in enumerate(a_users)]
        + [(100 + i, "b", u) for i, u in enumerate(b_users)],
        "event_id long, event_type string, user_id long",
    )
    k = 4
    [r] = kmv_set_ops(ev, k=k).collect()

    ha = sorted(_h60(str(u)) for u in a_users)[:k]
    hb = sorted(_h60(str(u)) for u in b_users)[:k]
    union_mins = sorted(set(ha) | set(hb))[:k]
    n_both = sum(1 for h in union_mins if h in ha and h in hb)
    est_union = round((k - 1) * float(2**60) / union_mins[-1], 4)
    assert r["n_mins"] == k
    assert r["n_both"] == n_both
    assert r["est_union"] == est_union
    assert r["est_inter"] == round(
        (k - 1) * float(2**60) / union_mins[-1] * n_both / k, 4
    )
    assert r["exact_union"] == 18 and r["exact_inter"] == 6


def test_kmv_set_ops_pair_universe_includes_disjoint_types(spark):
    """Types with zero shared users still get a row (left join), with
    exact_inter = 0 and est_inter = 0."""
    from mapreduceindex_spark.operators.sketches import kmv_set_ops

    ev = spark.createDataFrame(
        [(1, "p", 1), (2, "q", 2)],
        "event_id long, event_type string, user_id long",
    )
    [r] = kmv_set_ops(ev, k=8).collect()
    assert r["exact_inter"] == 0 and r["est_inter"] == 0.0
    assert r["exact_union"] == 2 and r["est_union"] == 2.0


# ---------------------------------------------------------------------------
# log2_quantile_sketch
# ---------------------------------------------------------------------------


def _orders(spark, cents_list):
    return spark.createDataFrame(
        [(i, "P", c / 100.0) for i, c in enumerate(cents_list)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )


def test_log2_sketch_hand_histogram(spark):
    """cents [100, 300, 900, 2000] -> buckets [6, 8, 9, 10]; p50 rank 2
    lands in bucket 8 (est 384 vs exact 300), p90/p99 rank 4 in bucket
    10 (est 1536 vs exact 2000) — midpoints and err_ppm by hand."""
    from mapreduceindex_spark.operators.sketches import log2_quantile_sketch

    rows = {
        r["p"]: r
        for r in log2_quantile_sketch(
            _orders(spark, [100, 300, 900, 2000])
        ).collect()
    }
    p50 = rows[50]
    assert (p50["rank"], p50["bucket"], p50["est_cents"], p50["exact_cents"]) == (
        2, 8, 384, 300,
    )
    assert p50["err_ppm"] == (384 - 300) * 1_000_000 // 300
    for p in (90, 99):
        r = rows[p]
        assert (r["rank"], r["bucket"], r["est_cents"], r["exact_cents"]) == (
            4, 10, 1536, 2000,
        )
        assert r["err_ppm"] == (2000 - 1536) * 1_000_000 // 2000


def test_log2_sketch_relative_error_bound(spark):
    """gamma=2 guarantee: the midpoint estimate is within 50% of the
    true nearest-rank value for every percentile and group."""
    from mapreduceindex_spark.operators.sketches import log2_quantile_sketch

    cents = [7, 13, 99, 128, 129, 1000, 4097, 65535, 12345, 54321]
    for r in log2_quantile_sketch(_orders(spark, cents)).collect():
        assert r["err_ppm"] <= 500_000, r


def test_log2_sketch_merge_equals_whole(spark):
    """Mergeability: the sketch of A union B equals elementwise-summed
    sketches of A and B — the property that makes the histogram valid
    pre-aggregated state. Verified at the readout level: quantiles of
    the union computed from the one-pass sketch match a direct run."""
    from mapreduceindex_spark.operators.sketches import log2_quantile_sketch

    a = [100, 300, 900]
    b = [2000, 50, 60]
    whole = log2_quantile_sketch(_orders(spark, a + b)).collect()
    unioned = log2_quantile_sketch(
        _orders(spark, a).unionByName(_orders(spark, b))
    ).collect()
    assert sorted(map(tuple, whole)) == sorted(map(tuple, unioned))


# ---------------------------------------------------------------------------
# ks_drift_test
# ---------------------------------------------------------------------------


def _drift_events(spark, rows):
    from datetime import datetime, timezone

    return spark.createDataFrame(
        [
            (i, datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None), t, c / 100.0)
            for i, (ts, t, c) in enumerate(rows)
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )


def test_ks_drift_shifted_distribution_rejects(spark):
    """Early half = cents 1..10, late half = cents 11..20: the ECDFs are
    disjoint so D = 1 (d_ppm = 1e6) and the alpha=0.05 decision fires;
    an identical-halves type has D = 0 and does not."""
    from mapreduceindex_spark.operators.events import ks_drift_test

    t0, t1 = 1_000_000, 2_000_000  # midpoint 1_500_000
    rows = [(t0, "shift", c) for c in range(1, 11)]
    rows += [(t1, "shift", c) for c in range(11, 21)]
    rows += [(t0, "same", c) for c in (5, 7, 9)]
    rows += [(t1, "same", c) for c in (5, 7, 9)]
    out = {r["event_type"]: r for r in ks_drift_test(_drift_events(spark, rows)).collect()}

    s = out["shift"]
    assert (s["n_early"], s["n_late"], s["n_values"]) == (10, 10, 20)
    assert s["d_scaled"] == 100  # at v=10: |10*10 - 0*10|
    assert s["d_ppm"] == 1_000_000
    assert s["reject_05"] == 1  # 1e6*100^2 = 1e10 > 1844164*20*100 = 3.69e9

    e = out["same"]
    assert e["d_scaled"] == 0 and e["d_ppm"] == 0 and e["reject_05"] == 0


def test_ks_drift_excludes_types_with_an_empty_half(spark):
    """A type entirely inside one half has an undefined statistic and
    must be absent, not a divide-by-zero."""
    from mapreduceindex_spark.operators.events import ks_drift_test

    t0, t1 = 1_000_000, 2_000_000
    rows = [(t0, "early_only", c) for c in (1, 2, 3)]
    rows += [(t0, "both", 1), (t1, "both", 2)]
    out = ks_drift_test(_drift_events(spark, rows)).collect()
    assert [r["event_type"] for r in out] == ["both"]


def test_ks_drift_statistic_matches_scipy_formula_replay(spark):
    """Interleaved samples: D replayed independently in pure Python over
    the two ECDFs (the scipy.stats.ks_2samp definition) matches the
    engine's integer statistic."""
    from mapreduceindex_spark.operators.events import ks_drift_test

    t0, t1 = 1_000_000, 2_000_000
    early = [3, 3, 5, 8, 13, 21, 21, 34]
    late = [2, 5, 5, 9, 13, 30, 55]
    rows = [(t0, "x", c) for c in early] + [(t1, "x", c) for c in late]
    [r] = ks_drift_test(_drift_events(spark, rows)).collect()

    n1, n2 = len(early), len(late)
    values = sorted(set(early) | set(late))
    d_scaled = max(
        abs(
            sum(1 for v in early if v <= x) * n2
            - sum(1 for v in late if v <= x) * n1
        )
        for x in values
    )
    assert r["d_scaled"] == d_scaled
    assert r["d_ppm"] == d_scaled * 1_000_000 // (n1 * n2)
    assert r["n_values"] == len(values)


# ---------------------------------------------------------------------------
# winnowing_fingerprints / winnowing_overlap
# ---------------------------------------------------------------------------


def _winnow_py(text, k=3, w=4):
    """Independent pure-Python robust winnowing (SIGMOD'03): rightmost
    minimal k-gram hash per window of w."""
    toks = [
        "".join(ch for ch in t if ch.isalpha()).lower() for t in text.split()
    ]
    toks = [t for t in toks if t]
    grams = [
        _h60(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    ]
    fps = set()
    for s in range(len(grams) - w + 1):
        window = grams[s : s + w]
        m = min(window)
        pos = max(i for i in range(s, s + w) if grams[i] == m)
        fps.add((grams[pos], pos))
    return len(grams), fps


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_winnowing_matches_pure_python_replay(spark):
    """Fingerprint count and density per doc equal the independent
    replay of the rightmost-min rule."""
    from mapreduceindex_spark.operators.text_analysis import (
        winnowing_fingerprints,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three one two three one two three one two",
    ]
    out = {
        r["doc_id"]: r
        for r in winnowing_fingerprints(_docs(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        n_grams, fps = _winnow_py(t)
        r = out[i]
        assert r["n_grams"] == n_grams
        assert r["n_windows"] == n_grams - 3
        assert r["n_fp"] == len(fps)
        assert r["density_ppm"] == len(fps) * 1_000_000 // (n_grams - 3)


def test_winnowing_shared_run_guarantee(spark):
    """The winnowing guarantee: documents sharing a token run of
    >= w+k-1 = 6 words share at least one fingerprint, so the overlap
    report must pair them."""
    from mapreduceindex_spark.operators.text_analysis import (
        winnowing_overlap,
    )

    shared = "lorem ipsum dolor sit amet consectetur"  # 6 words
    texts = [
        "unrelated preamble words here " + shared + " trailing tail one",
        "totally different beginning text " + shared + " other suffix two",
        "no overlap with anything else at all whatsoever in here",
    ]
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in winnowing_overlap(
            _docs(spark, texts), min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_winnowing_short_docs_excluded(spark):
    """Documents without one full window (< w+k-1 words) emit no row."""
    from mapreduceindex_spark.operators.text_analysis import (
        winnowing_fingerprints,
    )

    texts = ["tiny doc here", "five words is not enough", 
             "but six words is just enough yes"]
    out = winnowing_fingerprints(_docs(spark, texts)).collect()
    assert [r["doc_id"] for r in out] == [2]


# ---------------------------------------------------------------------------
# dbscan_embeddings
# ---------------------------------------------------------------------------


def _emb(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x), float(y)]) for i, (x, y) in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )


def test_dbscan_core_border_noise_hand_fixture(spark):
    """Five tight points spanning FOUR grid cells (the cross-cell
    adjacency check) form one all-core cluster labeled by its min id;
    a point within eps of exactly one core is border and inherits that
    cluster; an isolated point is noise; a second 4-point blob is its
    own cluster."""
    from mapreduceindex_spark.operators.clustering import dbscan_embeddings

    pts = [
        (0.015, 0.015), (0.025, 0.015), (0.015, 0.025),  # cluster A
        (0.025, 0.025), (0.020, 0.020),                  # (cells 0/1 x 0/1)
        (0.045, 0.045),                                  # border of A
        (0.5, 0.5),                                      # noise
        (-0.300, -0.300), (-0.305, -0.300),              # cluster B
        (-0.300, -0.305), (-0.305, -0.305),
    ]
    out = {
        r["vec_id"]: r
        for r in dbscan_embeddings(_emb(spark, pts)).collect()
    }
    assert len(out) == 11
    for i in range(5):
        assert (out[i]["role"], out[i]["cluster_rep"]) == ("core", 0), out[i]
    # A's points see each other + the border point is NOT in their eps
    # except vec 3 (0.025,0.025) which sees vec 5 at L-inf 0.02
    assert out[0]["n_neighbors"] == 5
    assert out[3]["n_neighbors"] == 6
    b = out[5]
    assert (b["role"], b["cluster_rep"], b["n_neighbors"]) == ("border", 0, 2)
    n = out[6]
    assert (n["role"], n["cluster_rep"], n["n_neighbors"]) == ("noise", None, 1)
    for i in range(7, 11):
        assert (out[i]["role"], out[i]["cluster_rep"]) == ("core", 7), out[i]
        assert out[i]["n_neighbors"] == 4


def test_dbscan_chain_links_through_shared_core(spark):
    """Two dense blobs bridged by a chain of core points merge into ONE
    cluster — density-reachability, the property k-means cannot
    express."""
    from mapreduceindex_spark.operators.clustering import dbscan_embeddings

    blob_a = [(0.0, 0.0), (0.005, 0.0), (0.0, 0.005), (0.005, 0.005)]
    chain = [(0.02, 0.0), (0.035, 0.0), (0.05, 0.0)]
    blob_b = [(0.065, 0.0), (0.07, 0.0), (0.065, 0.005), (0.07, 0.005)]
    pts = blob_a + chain + blob_b
    # min_pts=3: each chain link sees (prev, self, next) — just dense
    # enough to stay core; at the default 4 the middle link would be
    # border, and border points do NOT extend reachability
    out = dbscan_embeddings(_emb(spark, pts), min_pts=3).collect()
    reps = {r["cluster_rep"] for r in out if r["role"] == "core"}
    assert reps == {0}


def test_dbscan_two_blobs_beyond_eps_stay_separate(spark):
    """Without the bridge the same two blobs are distinct clusters."""
    from mapreduceindex_spark.operators.clustering import dbscan_embeddings

    blob_a = [(0.0, 0.0), (0.005, 0.0), (0.0, 0.005), (0.005, 0.005)]
    blob_b = [(0.2, 0.0), (0.205, 0.0), (0.2, 0.005), (0.205, 0.005)]
    out = dbscan_embeddings(_emb(spark, blob_a + blob_b)).collect()
    reps = {r["cluster_rep"] for r in out if r["role"] == "core"}
    assert reps == {0, 4}


# ---------------------------------------------------------------------------
# isotonic_calibration
# ---------------------------------------------------------------------------


def _iso_docs(spark, spec):
    """spec: list of (n_chars, text) — bucket comes from n_chars, the
    diversity ppm from the text's tokens."""
    return spark.createDataFrame(
        [(i, t, nc) for i, (nc, t) in enumerate(spec)],
        "doc_id long, text string, n_chars long",
    )


def test_isotonic_pools_the_violating_buckets(spark):
    """Bucket means [500000, 1000000, 250000] (weights 2,1,1): PAVA
    pools the last two into 625000; the fit is monotone and flags
    exactly the pooled buckets."""
    from mapreduceindex_spark.operators.corpus import isotonic_calibration

    spec = [
        (16, "a a b b"), (16, "c c d d"),     # bucket 4, ppm 500000 x2
        (32, "a b c"),                        # bucket 5, ppm 1000000
        (64, "a a a a"),                      # bucket 6, ppm 250000
    ]
    rows = isotonic_calibration(_iso_docs(spark, spec)).collect()
    got = [(r["bucket"], r["n_docs"], r["mean_ppm"], r["iso_ppm"], r["pooled"]) for r in rows]
    assert got == [
        (4, 2, 500000, 500000, 0),
        (5, 1, 1000000, 625000, 1),
        (6, 1, 250000, 625000, 1),
    ]


def test_isotonic_identity_on_monotone_input(spark):
    """Already-monotone bucket means are returned unchanged."""
    from mapreduceindex_spark.operators.corpus import isotonic_calibration

    spec = [
        (16, "a a a a"),          # 250000
        (32, "a a b b"),          # 500000
        (64, "a b c"),            # 1000000
    ]
    rows = isotonic_calibration(_iso_docs(spark, spec)).collect()
    assert all(r["pooled"] == 0 and r["iso_ppm"] == r["mean_ppm"] for r in rows)


def test_isotonic_fit_is_monotone_and_matches_minimax_replay(spark):
    """On a noisy multi-bucket fixture: the fit is non-decreasing and
    equals an independent pure-Python replay of the minimax identity
    with the same floored range averages."""
    from mapreduceindex_spark.operators.corpus import isotonic_calibration

    texts = {
        250000: "a a a a", 500000: "a a b b", 750000: "a b c d d d d e",
        1000000: "a b c d",
    }
    spec = []
    for nc, ppms in [
        (16, [500000, 500000]), (32, [250000]), (64, [1000000]),
        (128, [750000, 250000]), (256, [1000000]),
    ]:
        spec += [(nc, texts[p]) for p in ppms]
    rows = isotonic_calibration(_iso_docs(spark, spec)).collect()

    ns = [r["n_docs"] for r in rows]
    sys_ = [r["mean_ppm"] * r["n_docs"] for r in rows]  # sums are exact here
    B = len(rows)

    def avg(j, l):
        return sum(sys_[j : l + 1]) // sum(ns[j : l + 1])

    iso = [
        max(min(avg(j, l) for l in range(i, B)) for j in range(0, i + 1))
        for i in range(B)
    ]
    got = [r["iso_ppm"] for r in rows]
    assert got == iso
    assert all(a <= b for a, b in zip(got, got[1:]))


# ---------------------------------------------------------------------------
# kaplan_meier_retention
# ---------------------------------------------------------------------------


def _km_events(spark, user_days):
    from datetime import datetime, timezone

    rows = []
    for uid, days in user_days.items():
        for d in days:
            rows.append(
                (
                    len(rows),
                    datetime.fromtimestamp(d * 86400, tz=timezone.utc).replace(tzinfo=None),
                    uid,
                )
            )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_km_hand_life_table(spark):
    """Corpus end = day 20. Users: u1 lives 0..5 (t=5, churn), u2 lives
    0..10 (t=10, churn), u3 lives 0..20 (t=20, censored at the edge),
    u4 lives 18..20 (t=2, censored). Life table and floored ppm
    survival by hand."""
    from mapreduceindex_spark.operators.events import kaplan_meier_retention

    out = kaplan_meier_retention(
        _km_events(
            spark,
            {1: [0, 5], 2: [0, 10], 3: [0, 20], 4: [18, 20]},
        )
    ).collect()
    got = [tuple(r) for r in out]
    # t=2: censored exit (u4), S unchanged (d=0): s = 1e6*4//4 = 1e6
    # t=5: death among 3 at risk: s = 1e6*2//3 = 666666
    # t=10: death among 2 at risk: s = 666666*1//2 = 333333
    # t=20: censored (u3), S unchanged
    assert got == [
        (2, 4, 0, 1, 1_000_000),
        (5, 3, 1, 0, 666_666),
        (10, 2, 1, 0, 333_333),
        (20, 1, 0, 1, 333_333),
    ]


def test_km_all_censored_is_flat(spark):
    """Everyone active at the corpus edge: no deaths, survival stays
    at 1e6 ppm for every lifetime."""
    from mapreduceindex_spark.operators.events import kaplan_meier_retention

    out = kaplan_meier_retention(
        _km_events(spark, {1: [0, 30], 2: [10, 30], 3: [25, 30]})
    ).collect()
    assert all(r["s_ppm"] == 1_000_000 and r["n_events"] == 0 for r in out)


def test_km_matches_lifelines_formula_replay(spark):
    """Mixed fixture: survival equals an independent pure-Python KM
    replay (floored ppm) over the same (t, death/censor) exits."""
    from mapreduceindex_spark.operators.events import kaplan_meier_retention

    user_days = {
        1: [0, 3], 2: [0, 3], 3: [1, 4], 4: [0, 9], 5: [2, 9],
        6: [0, 50], 7: [45, 50], 8: [0, 20], 9: [5, 20],
    }
    out = kaplan_meier_retention(_km_events(spark, user_days)).collect()

    end = max(max(d) for d in user_days.values())
    exits = sorted(
        (max(d) - min(d), 1 if max(d) <= end - 7 else 0)
        for d in user_days.values()
    )
    from collections import defaultdict

    table = defaultdict(lambda: [0, 0])
    for t, ev in exits:
        table[t][0 if ev else 1] += 1
    remaining, s, expect = len(exits), 1_000_000, []
    for t in sorted(table):
        d, c = table[t]
        s = s * (remaining - d) // remaining
        expect.append((t, remaining, d, c, s))
        remaining -= d + c
    assert [tuple(r) for r in out] == expect


# ---------------------------------------------------------------------------
# streaming_ks_drift
# ---------------------------------------------------------------------------


def test_streaming_ks_drift_equals_batch(spark):
    """Stream ≡ batch: accumulating the late-half histogram as
    streaming state and folding it through the shared KS tail yields
    exactly the batch ks_drift_test rows on the same fixture."""
    from tests.conftest import SF_SMALL

    from mapreduceindex_spark.operators.events import ks_drift_test
    from mapreduceindex_spark.session import load_table
    from mapreduceindex_spark.streaming.pipelines import streaming_ks_drift

    batch = ks_drift_test(load_table(spark, SF_SMALL, "events")).collect()
    stream = streaming_ks_drift(spark, SF_SMALL).collect()
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))
    assert len(batch) > 0


# ---------------------------------------------------------------------------
# sequential_patterns
# ---------------------------------------------------------------------------


def test_sequential_patterns_gapped_support_hand_fixture(spark):
    """u1 does a then b (supports a->b only), u2 does b then a, u3 does
    a twice (a->a via two distinct timestamps), u4 does a once (supports
    nothing) — supports, ppm shares, and lifts by hand."""
    from datetime import datetime, timezone

    from mapreduceindex_spark.operators.events import sequential_patterns

    def ts(s):
        return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)

    ev = spark.createDataFrame(
        [
            (0, ts(1), 1, "a"), (1, ts(2), 1, "b"),
            (2, ts(1), 2, "b"), (3, ts(2), 2, "a"),
            (4, ts(1), 3, "a"), (5, ts(5), 3, "a"),
            (6, ts(3), 4, "a"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    rows = {
        (r["type_a"], r["type_b"]): r
        for r in sequential_patterns(ev, min_support=1).collect()
    }
    assert set(rows) == {("a", "b"), ("b", "a"), ("a", "a")}
    ab = rows[("a", "b")]
    assert (ab["n_users_ab"], ab["n_users_a"], ab["n_users_b"]) == (1, 4, 2)
    assert ab["support_ppm"] == 250_000
    assert ab["lift_ppm"] == 1 * 4 * 1_000_000 // (4 * 2)
    assert rows[("a", "a")]["lift_ppm"] == 1 * 4 * 1_000_000 // (4 * 4)
    assert rows[("b", "a")]["lift_ppm"] == 500_000


def test_sequential_patterns_same_timestamp_not_sequential(spark):
    """a and b at the same instant do not form a->b in either order."""
    from datetime import datetime, timezone

    from mapreduceindex_spark.operators.events import sequential_patterns

    t = datetime.fromtimestamp(10, tz=timezone.utc).replace(tzinfo=None)
    ev = spark.createDataFrame(
        [(0, t, 1, "a"), (1, t, 1, "b")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    assert sequential_patterns(ev, min_support=1).collect() == []


# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------


def test_theil_sen_ignores_the_outlier_day(spark):
    """Daily revenues [1,2,3,100,5] u4 over days 0..4: 6 of the 10
    pairwise slopes equal 1000 milli, so the median slope is 1000
    (1 u4/day) and the median residual level is 1 — the day-3 spike
    moves nothing (OLS would follow it)."""
    from datetime import datetime, timezone

    from mapreduceindex_spark.operators.events import theil_sen_trend

    def ts(day):
        return datetime.fromtimestamp(day * 86400, tz=timezone.utc).replace(
            tzinfo=None
        )

    ev = spark.createDataFrame(
        [
            (d, ts(d), 1, v / 10000.0)
            for d, v in enumerate([1, 2, 3, 100, 5])
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    [r] = theil_sen_trend(ev).collect()
    assert tuple(r) == (5, 10, 1000, 1)


def test_theil_sen_exact_line_recovers_slope_and_intercept(spark):
    """A perfectly linear series rev = 7 + 3*day gives slope 3000 milli
    and intercept 7 with zero spread."""
    from datetime import datetime, timezone

    from mapreduceindex_spark.operators.events import theil_sen_trend

    def ts(day):
        return datetime.fromtimestamp(day * 86400, tz=timezone.utc).replace(
            tzinfo=None
        )

    ev = spark.createDataFrame(
        [
            (d, ts(d), 1, (7 + 3 * d) / 10000.0)
            for d in range(8)
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    [r] = theil_sen_trend(ev).collect()
    assert (r["slope_milli_per_day"], r["intercept_u4"]) == (3000, 7)


# ---------------------------------------------------------------------------
# coreset_sample
# ---------------------------------------------------------------------------


def test_coreset_farthest_point_hand_fixture(spark):
    """1-D points at 0, 1, 10, 100 (micro 0, 1e6, 1e7, 1e8): seed is
    vec 0; the farthest-first order is 100, 10, 1 with hand-computable
    covering distances."""
    from mapreduceindex_spark.operators.clustering import coreset_sample

    pts = [(0, [0.0]), (1, [1.0]), (2, [10.0]), (3, [100.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = [tuple(r) for r in coreset_sample(emb, k=4).collect()]
    m = 1_000_000
    assert out == [
        (0, 0, None),
        (1, 3, (100 * m) ** 2),
        (2, 2, (10 * m) ** 2),   # min(dist to 0, dist to 100) = 1e7^2
        (3, 1, (1 * m) ** 2),
    ]


def test_coreset_tie_breaks_to_min_vec_id(spark):
    """Two points equidistant from the seed: the smaller vec_id wins."""
    from mapreduceindex_spark.operators.clustering import coreset_sample

    pts = [(5, [0.0]), (7, [2.0]), (9, [-2.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out = [(r["round"], r["vec_id"]) for r in coreset_sample(emb, k=3).collect()]
    assert out == [(0, 5), (1, 7), (2, 9)]


def test_coreset_stops_at_n_points(spark):
    """k larger than the table yields exactly n rows, no crash."""
    from mapreduceindex_spark.operators.clustering import coreset_sample

    pts = [(1, [0.0]), (2, [3.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    assert coreset_sample(emb, k=8).count() == 2


def test_coreset_radius_is_nonincreasing(spark):
    """The k-center covering radius traced by dist_sq never increases
    with k (greedy picks the current farthest point each round)."""
    from mapreduceindex_spark.operators.clustering import coreset_sample

    import random

    rng = random.Random(7)
    pts = [
        (i, [rng.uniform(-1, 1), rng.uniform(-1, 1)]) for i in range(30)
    ]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    d = [r["dist_sq"] for r in coreset_sample(emb, k=6).collect()][1:]
    assert all(a >= b for a, b in zip(d, d[1:]))


def test_streaming_sequential_patterns_equals_batch(spark):
    """Stream ≡ batch: min/max first-last state folded through the
    shared tail equals the batch sequential_patterns on the fixture."""
    from tests.conftest import SF_SMALL

    from mapreduceindex_spark.operators.events import sequential_patterns
    from mapreduceindex_spark.session import load_table
    from mapreduceindex_spark.streaming.pipelines import (
        streaming_sequential_patterns,
    )

    batch = sequential_patterns(
        load_table(spark, SF_SMALL, "events")
    ).collect()
    stream = streaming_sequential_patterns(spark, SF_SMALL).collect()
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))
    assert len(batch) > 0


# ---------------------------------------------------------------------------
# kneser_ney_bigram
# ---------------------------------------------------------------------------


def _kn_replay(texts, top_k=50):
    """Independent pure-Python interpolated KN (D=3/4) replay."""
    from collections import Counter

    def toks(t):
        out = []
        for w in t.split():
            w = "".join(ch for ch in w if ch.isalpha()).lower()
            if w:
                out.append(w)
        return out

    big = Counter()
    for t in texts:
        ws = toks(t)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    c1 = Counter()
    n1 = Counter()
    ncont = Counter()
    for (a, b), c in big.items():
        c1[a] += c
        n1[a] += 1
        ncont[b] += 1
    ntot = len(big)
    rows = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    out = {}
    for (a, b), c in rows:
        num = 1_000_000 * (max(4 * c - 3, 0) * ntot + 3 * n1[a] * ncont[b])
        out[(a, b)] = num // (4 * c1[a] * ntot)
    return out


def test_kneser_ney_matches_pure_python_replay(spark):
    from mapreduceindex_spark.operators.text_analysis import kneser_ney_bigram

    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog met in san francisco",
        "san francisco fog rolls over san francisco bay",
    ]
    docs = _docs(spark, texts)
    got = {
        (r["w1"], r["w2"]): r["p_kn_micro"]
        for r in kneser_ney_bigram(docs, top_k=1000).collect()
    }
    assert got == _kn_replay(texts, top_k=1000)


def test_kneser_ney_continuation_beats_raw_frequency(spark):
    """The KN property: 'francisco' appears 3 times but ONLY after
    'san' (continuation count 1), while 'cat' appears 3 times after 3
    different words — after an arbitrary context word, the model backs
    off to continuation counts, so p(cat | unseen-ish context) uses
    ncont=3 vs francisco's 1."""
    from mapreduceindex_spark.operators.text_analysis import kneser_ney_bigram

    texts = [
        "san francisco san francisco san francisco",
        "big cat small cat happy cat",
        "zebra cat",  # gives 'zebra' a single bigram: zebra->cat
    ]
    rows = {
        (r["w1"], r["w2"]): r
        for r in kneser_ney_bigram(_docs(spark, texts), top_k=1000).collect()
    }
    assert rows[("zebra", "cat")]["ncont_w2"] == 4
    fran = next(r for (a, b), r in rows.items() if b == "francisco")
    assert fran["ncont_w2"] == 1


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_flags_the_spike_stddev_would_hide_behind(spark):
    """[10x 100-cents values around the median, one 100000 spike]: the
    median/MAD flag catches exactly the spike; med and MAD by hand."""
    from mapreduceindex_spark.operators.events import mad_outliers

    cents = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100, 100000]
    ev = spark.createDataFrame(
        [(i, "t", c / 100.0) for i, c in enumerate(cents)],
        "event_id long, event_type string, value double",
    )
    [r] = mad_outliers(ev).collect()
    assert (r["n"], r["med_cents"], r["mad_cents"]) == (11, 100, 1)
    # flag: 1000*dev > 4448*1 -> dev > 4.448 -> only the spike
    assert (r["n_outliers"], r["outlier_ppm"]) == (1, 1_000_000 // 11)


def test_mad_zero_mad_flags_everything_off_median(spark):
    """Over half the group at one value gives MAD = 0: every value off
    the median is flagged (the documented degenerate case)."""
    from mapreduceindex_spark.operators.events import mad_outliers

    cents = [50, 50, 50, 50, 51, 49]
    ev = spark.createDataFrame(
        [(i, "t", c / 100.0) for i, c in enumerate(cents)],
        "event_id long, event_type string, value double",
    )
    [r] = mad_outliers(ev).collect()
    assert r["mad_cents"] == 0 and r["n_outliers"] == 2
