"""Semantic tests for the round-2 training-pipeline operators — properties
the oracle hash can't express (monotonicity, conservation, composition),
plus the rows-only kmeans fit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceindex_spark.operators import clustering as CL
from mapreduceindex_spark.operators import corpus as C
from mapreduceindex_spark.operators import dedup as D
from mapreduceindex_spark.session import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMALL, "embeddings").cache()


def test_contamination_flags_planted_clone(spark, docs):
    # plant: a non-benchmark doc that is a verbatim copy of a benchmark doc
    bench_doc = docs.filter(F.col("doc_id") % 97 == 0).limit(1).collect()[0]
    clone = spark.createDataFrame(
        [(999_983, bench_doc["text"], "en", "srcX", len(bench_doc["text"]))],
        docs.schema,
    )
    out = C.contamination_check(docs.unionByName(clone)).collect()
    by_id = {r["doc_id"]: r for r in out}
    planted = by_id[999_983]
    # a verbatim copy shares every shingle with the benchmark set
    assert planted["n_overlap"] == planted["n_shingles"] > 0
    # and no benchmark doc appears in the output at all
    assert all(i % 97 != 0 for i in by_id)


def test_repetition_score_bounds_and_degenerate_doc(spark, docs):
    degenerate = spark.createDataFrame(
        [(999_979, "spam " * 50, "en", "srcX", 250)], docs.schema
    )
    out = C.repetition_score(docs.unionByName(degenerate))
    rows = {r["doc_id"]: r for r in out.collect()}
    # "spam spam ... spam": 49 bigrams, all identical -> dup_pct = 48/49
    d = rows[999_979]
    assert (d["n_ngrams"], d["n_distinct"]) == (49, 1)
    assert d["dup_pct"] == pytest.approx(0.9796, abs=1e-9)
    assert all(0.0 <= r["dup_pct"] <= 1.0 for r in rows.values())
    # every doc present, even ngram-less ones
    assert len(rows) == docs.count() + 1


def test_domain_mixture_shares_sum_to_one(docs):
    rows = C.domain_mixture(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    # ppm rounding: shares sum to 1 within one ulp-of-grid per source
    assert abs(sum(r["token_share"] for r in rows) - 1.0) <= 1e-6 * len(rows)


def test_stratified_sample_respects_per_source_rates(docs):
    out = C.stratified_sample(
        docs, pct_by_source={"src0": 100, "src1": 0}, default_pct=10
    )
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert got.get("src0") == n_src0  # pct=100 keeps everything
    assert "src1" not in got  # pct=0 keeps nothing
    # default strata subset the deterministic_sample at the same pct
    base = {r["doc_id"] for r in C.deterministic_sample(docs, pct=10).collect()}
    rest = {r["doc_id"] for r in out.collect() if r["source"] not in ("src0", "src1")}
    assert rest <= base


def test_canonical_docs_keeps_best_member(docs):
    out = D.canonical_docs(docs, n=3, threshold=0.5)
    rows = out.collect()
    # one row per cluster; members sum to corpus size
    assert sum(r["n_members"] for r in rows) == docs.count()
    assert len({r["cluster_rep"] for r in rows}) == len(rows)
    # the kept doc is a member of its own cluster
    clusters = {r["doc_id"]: r["cluster_rep"]
                for r in D.near_dup_clusters(docs, n=3, threshold=0.5).collect()}
    for r in rows:
        assert clusters[r["keep_doc_id"]] == r["cluster_rep"]


def test_kmeans_partitions_the_corpus(embs):
    out = CL.kmeans_embeddings(embs, k=8, max_iter=3).collect()
    assert sum(r["n_members"] for r in out) == embs.count()
    assert len(out) <= 8
    assert all(r["n_members"] > 0 for r in out)


def test_kmeans_deterministic_across_partitionings(embs):
    a = CL.kmeans_embeddings(embs.repartition(3), k=4, max_iter=2).collect()
    b = CL.kmeans_embeddings(embs.repartition(11), k=4, max_iter=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_doc_chunks_conserves_tokens_and_covers_every_doc(docs):
    chunks = C.doc_chunks(docs, chunk_size=50).collect()
    from mapreduceindex_spark.functions.text import words

    per_doc = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(words(F.col("text"))).alias("n")
        ).collect()
    }
    got = {}
    for r in chunks:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["n_tokens"]
        # every chunk but possibly the last is exactly chunk_size
        assert 1 <= r["n_tokens"] <= 50
    assert got == {d: n for d, n in per_doc.items() if n > 0}
    # chunk ids are dense 0..k-1 per doc
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_id"])
    for ids in by_doc.values():
        assert sorted(ids) == list(range(len(ids)))


def test_pack_sequences_conserves_and_respects_order(docs):
    seqs = C.pack_sequences(docs, budget=512).collect()
    total = docs.select(
        F.sum(
            F.size(
                __import__(
                    "mapreduceindex_spark.functions.text", fromlist=["words"]
                ).words(F.col("text"))
            )
        )
    ).collect()[0][0]
    assert sum(r["n_tokens"] for r in seqs) == total
    # within a source, seq ids are contiguous and doc ranges don't overlap
    by_src = {}
    for r in seqs:
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r["seq_id"])
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"]


def test_postings_size_varint_at_least_one_byte_per_posting(docs):
    from mapreduceindex_spark.operators.inverted_index import postings_size

    rows = postings_size(docs).collect()
    assert rows, "corpus has words"
    for r in rows:
        assert r["df"] <= r["varint_bytes"] <= 5 * r["df"]
        assert r["fixed_bytes"] == 8 * r["df"]
        # gap coding can't beat 1 byte/posting; fixed is always ≥ varint
        assert r["varint_bytes"] <= r["fixed_bytes"]


def test_debounce_keeps_first_and_spaced_events(spark):
    from mapreduceindex_spark.operators.events import debounce

    ev = load_table(spark, SF_SMALL, "events")
    kept = debounce(ev, gap_sec=300)
    # idempotent: debouncing the survivors changes nothing
    again = debounce(kept, gap_sec=300)
    assert kept.count() == again.count()
    # first event of every (user, type) group survives
    firsts = (
        ev.groupBy("user_id", "event_type")
        .agg(F.min(F.struct("ts", "event_id"))["event_id"].alias("event_id"))
        .select("event_id")
    )
    assert firsts.exceptAll(kept.select("event_id")).count() == 0


def test_shuffle_corpus_is_seeded_permutation(docs):
    """Every document appears exactly once; positions are contiguous
    1..n per shard; the order is a pure function of the seed (invariant
    to partition layout, different across seeds)."""
    out = C.shuffle_corpus(docs, seed=42, n_shards=16).collect()
    assert len(out) == docs.count()
    assert len({r["doc_id"] for r in out}) == len(out)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    again = C.shuffle_corpus(docs.repartition(7), seed=42, n_shards=16).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    other = C.shuffle_corpus(docs, seed=7, n_shards=16).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))


def test_label_quality_profile_conserves_docs(docs, embs):
    out = C.label_quality_profile(docs, embs).collect()
    joined = docs.join(
        embs.select(F.col("vec_id").alias("doc_id")), "doc_id"
    ).count()
    assert sum(r["n_docs"] for r in out) == joined
    assert all(0.0 <= r["mean_quality"] <= 1.0 for r in out)
    assert all(r["n_tokens"] > 0 for r in out)


def test_profile_table_semantics(spark):
    """Null counting, exact distincts, typed ranges (numeric vs string
    vs timestamp-as-epoch), and null-safe behavior on a hand-built
    frame including an all-null column."""
    from mapreduceindex_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [
            (1, "a", 2.5, None),
            (2, "b", None, None),
            (2, None, -1.0, None),
        ],
        "id bigint, s string, x double, dead string",
    )
    prof = {r["column"]: r for r in profile_table(df, exact=True).collect()}
    # default (approx) mode: same shape, HLL distincts exact at these
    # tiny cardinalities, and identical non-distinct statistics
    approx = {r["column"]: r for r in profile_table(df).collect()}
    assert {c: r["n_distinct"] for c, r in approx.items()} == {
        c: r["n_distinct"] for c, r in prof.items()
    }
    assert {c: r["n_nulls"] for c, r in approx.items()} == {
        c: r["n_nulls"] for c, r in prof.items()
    }
    assert prof["id"]["n_rows"] == 3
    assert (prof["id"]["n_nulls"], prof["id"]["n_distinct"]) == (0, 2)
    assert (prof["id"]["min_num"], prof["id"]["max_num"]) == (1.0, 2.0)
    assert prof["id"]["min_str"] is None
    assert (prof["s"]["n_nulls"], prof["s"]["n_distinct"]) == (1, 2)
    assert (prof["s"]["min_str"], prof["s"]["max_str"]) == ("a", "b")
    assert (prof["x"]["min_num"], prof["x"]["max_num"]) == (-1.0, 2.5)
    assert (prof["dead"]["n_nulls"], prof["dead"]["n_distinct"]) == (3, 0)
    assert prof["dead"]["min_str"] is None and prof["dead"]["max_num"] is None


def test_kmeans_sparse_seed_ids_match_oracle_convention(spark):
    """Centroid ids are the seed vectors' ACTUAL vec_ids (the SQL
    oracle's `vec_id AS cid`), not list positions — exercised with ids
    sparse below k; and an id-space with no seeds raises cleanly."""
    import pytest as _pytest

    vecs = [(i, [float(i % 3), float(i % 5), 1.0]) for i in (0, 2, 5, 7, 9, 11)]
    embs = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = CL.kmeans_embeddings(embs, k=4, max_iter=3).collect()
    # seeds are vec_ids {0, 2} (the only ids < 4): cluster ids must be
    # exactly those values, and every vector lands in one of them
    assert {r["centroid_id"] for r in out} <= {0, 2}
    assert sum(r["n_members"] for r in out) == len(vecs)
    with _pytest.raises(ValueError, match="no seed vectors"):
        CL.kmeans_embeddings(
            spark.createDataFrame(
                [(50, [1.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
            ),
            k=4,
        )


def test_token_pagerank_centrality_semantics(spark):
    """A token pointed at by many distinct contexts outranks its
    sources; every rank is at least the uniform base share."""
    from mapreduceindex_spark.operators import graph as G

    # hub graph: aa->hub, bb->hub, cc->hub (each doc repeated so edge
    # weights > 1), hub->dd once
    rows = [
        (1, "aa hub aa hub"),
        (2, "bb hub bb hub"),
        (3, "cc hub cc hub"),
        (4, "hub dd"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["token"]: r["rank_micro"]
        for r in G.token_pagerank(docs, top_k=10).collect()
    }
    # 5 nodes -> uniform base = (0.15 * 1e6) / 5 = 30000
    assert all(v >= 30000 for v in out.values())
    assert out["hub"] > out["aa"] and out["hub"] > out["bb"]
    # hub fans out 1/4 to each of aa/bb/cc/dd: the receivers tie exactly
    # (integer damping is deterministic), and none outranks the hub
    assert out["aa"] == out["bb"] == out["cc"] == out["dd"]


def test_token_pagerank_empty_and_single_doc(spark):
    from mapreduceindex_spark.operators import graph as G

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert G.token_pagerank(empty).count() == 0
    one = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    got = G.token_pagerank(one).collect()
    # single node, no edges: its whole mass dangles and redistributes
    # back to itself — 0.15 base + 0.85 dangling = full SCALE (standard
    # PageRank dangling semantics; before round 10 the mass was dropped
    # and this pinned 150000)
    assert [(r["token"], r["rank_micro"]) for r in got] == [("solo", 1000000)]
