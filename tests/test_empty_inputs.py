"""Empty-input robustness: every selected operator must return an empty
(0-row) result on empty tables, not crash — the failure mode that
otherwise surfaces as a dead pipeline stage the first time a partition,
source slice, or filter comes back empty in production. Python/Arrow
stages are the usual culprits (np.stack on a 0-row batch, pandas dtype
inference on empty frames), so the list leans on those paths."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from mapreduceindex_spark.session import TABLES, load_table
from tests.conftest import SF_SMALL

#: batch queries exercised on fully-empty tables. Streaming queries are
#: excluded (file-stream sources need at least one file commit), as is
#: kmeans (k seed vectors are a documented precondition of the fit).
EMPTY_SAFE = [
    "inverted_index",
    "word_counts",
    "search_any",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_dups",
    "near_dup_clusters",
    "dup_spans",
    "semantic_dedup",
    "cms_hot_tokens",
    "shuffle_corpus",
    "label_quality_profile",
    "embedding_dim_stats",
    "embedding_norms",
    "cosine_topk",
    "tf_idf",
    "quality_score",
    "media_features",
    "media_dhash_near_dups",
    "events_debounce",
    "events_range_join",
    "asof_error_purchase",
    "sessionize",
    "q1_pricing_summary",
    "q5_region_revenue",
    "index_delete",
    "phrase_search",
    "bm25_search",
    "events_resample",
    "order_value_percent_rank",
    "zorder_layout",
    "join_hotspots",
    "token_pagerank",
    # round 5: probes/collects inside these must tolerate empty inputs
    # (hot-key list empty, no state rows, zero files to pack)
    "salted_affinity_join",
    "ann_recall",
    "top_event_paths",
    "incremental_revenue_trend",
    "snapshot_diff_orders",
    "compaction_plan",
    # round 6: empty probe collects (band bounds) and the shingle
    # anti-probe must tolerate 0-row inputs. mixture_resample is a
    # REPORT query (one row per configured source even when empty) and
    # has its own zero-report test below.
    "tokenizer_fertility",
    "groupwise_quantile_filter",
    "decontaminated_corpus",
    "dataset_card_stats",
    "corpus_freshness",
    "incremental_dedup",
    "hybrid_search",
    "index_merge",
    "timeseries_gap_fill",
    "quantized_topk",
    "typo_pairs",
    "merge_upsert_orders",
    "skyline_orders",
    # round 6 tail: semi join, doc-keyed rare census, 0-batch Arrow
    # partials (the n==0 early return), vocab TakeOrdered on nothing,
    # dim-frame NTILEs, log terms, session windows, dense-grid KL,
    # postings and their merge. shard_skew_report is a REPORT query
    # (one row per shard even when empty) with its own test below.
    "q4_order_priority",
    "rare_token_ratio",
    "embedding_covariance_topk",
    "vocab_coverage",
    "rfm_segments",
    "token_entropy",
    "events_markov_transitions",
    "domain_divergence",
    "positional_index",
    "phrase_search_indexed",
    # round 7: pivot on nothing, empty digit histogram, zero active
    # days, no baskets, no vectors. fk_integrity_audit (one row per FK
    # edge) and orders_cube (SQL's () grouping set emits one grand-total
    # row on an empty table) are REPORT queries with their own
    # zero-report tests below.
    "order_status_pivot",
    "benford_prices",
    "active_user_rollup",
    "events_ohlc",
    "repetition_profile",
    "copurchase_pairs",
    "label_outliers",
    "cumulative_unique_users",
    "shipping_sla_report",
    "embedding_power_iteration",
    "copurchase_clusters",
    "changepoint_scan",
    "conversion_latency_quantiles",
    "repeat_buyers_intersect",
    "yoy_nation_revenue",
    "top_parts_dense_rank",
    "weekday_seasonality",
    # round-9 second half
    "partitioned_scan_prune",
    "revenue_acf",
    "cdc_chunk_dedup",
    "token_burstiness",
    "weighted_sample",
    "association_rules",
    "centroid_classifier",
    "skipgram_cooccurrence",
    # round-9 third wave: empty register frame, no runs, empty graph
    # (the BFS seed guard), empty split sides, no sources, no brands,
    # no labels, no vocabulary. The sweeps/histogram
    # (lsh_band_sweep, matryoshka_recall, ivf_nprobe_sweep,
    # media_luma_histogram) are REPORT queries — config rows even when
    # empty — with their own zero-report tests below.
    "hll_distinct_users",
    "scd2_priority_history",
    "copurchase_bfs_depth",
    "copurchase_kcore",
    "knn_classifier",
    "readability_scores",
    "customers_with_full_set",
    "label_compactness",
    "vocab_growth_curve",
    # round 10: empty bounded query sample (the collect-side kernels'
    # 0-row early returns), empty drift halves, empty quality
    # histogram. The curve/sweep REPORT queries
    # (semantic_dup_threshold_curve: config rows even when empty) get
    # their own zero-report test below.
    "knn_classifier_ann",
    "embedding_drift_report",
    "quality_reliability_curve",
    # round-10 third wave: wedge enumeration and LPA argmax over an
    # empty edge list, MA/seasonal windows over an empty day series,
    # the silhouette's NULL-b branch on an empty centroid frame
    "link_prediction",
    "label_propagation",
    "events_stl_decompose",
    "silhouette_simplified",
    "pq_topk",
    "media_audio_autocorr",
    "temperature_mixture",
    "mmr_topk",
    # round-10 fourth wave: empty sketch pair universe, empty
    # bucket histograms
    "kmv_set_ops",
    "log2_quantile_sketch",
    "ks_drift_test",
    "winnowing_fingerprints",
    "winnowing_overlap",
    "dbscan_embeddings",
    "isotonic_calibration",
    "kaplan_meier_retention",
    "sequential_patterns",
    "theil_sen_trend",
    "coreset_sample",
    "kneser_ney_bigram",
    "mad_outliers",
]


@pytest.fixture()
def empty_tables(spark, monkeypatch):
    """Route every load_table call to a 0-row frame with the real schema."""
    import mapreduceindex_spark.session as sess

    real = sess.load_table
    cache = {}

    def _empty(spark_, sf_dir, name):
        key = name
        if key not in cache:
            cache[key] = real(spark_, SF_SMALL, name).where("1=0").cache()
        return cache[key]

    monkeypatch.setattr(sess, "load_table", _empty)
    return _empty


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_query_survives_empty_input(spark, empty_tables, name):
    df = entrymod._all_queries()[name](spark, SF_SMALL)
    assert df.count() == 0


def test_mixture_resample_empty_is_zero_report(spark, empty_tables):
    """mixture_resample reports one row per configured source even on
    an empty corpus — every count and rate pinned to zero (the empty
    probe must not divide by zero or drop sources)."""
    rows = entrymod._all_queries()["mixture_resample"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 4
    assert all(
        (r.n_total, r.rate_ppm, r.n_kept, r.mix_ppm) == (0, 0, 0, 0)
        for r in rows
    )


def test_shard_skew_report_empty_is_zero_report(spark, empty_tables):
    """shard_skew_report reports every shard even on an empty corpus —
    64 rows, zero counts, NULL load (0/0 has no balanced share; NULL is
    honest where 1e6 would claim perfect balance)."""
    rows = entrymod._all_queries()["shard_skew_report"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 64
    assert all(r.n_docs == 0 and r.load_ppm is None for r in rows)


def test_fk_integrity_audit_empty_is_zero_report(spark, empty_tables):
    """fk_integrity_audit reports all 7 FK edges even on empty tables —
    every child/orphan count pinned to zero (an empty drop has no
    integrity violations, not a missing report)."""
    rows = entrymod._all_queries()["fk_integrity_audit"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 7
    assert all((r.n_child, r.n_orphans) == (0, 0) for r in rows)


def test_orders_cube_empty_emits_grand_total_row(spark, empty_tables):
    """SQL GROUP BY () — and therefore CUBE — emits exactly one
    grand-total row over an empty table: count 0, sum NULL."""
    rows = entrymod._all_queries()["orders_cube"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r.order_year, r.o_orderstatus, r.grp_id) == (-1, "ALL", 3)
    assert r.n_orders == 0 and r.revenue_cents is None


def test_tuning_sweeps_empty_are_zero_reports(spark, empty_tables):
    """The round-9 tuning tables report one row per configured setting
    even on empty inputs, with every count and ppm pinned to zero —
    the recall-DIV-zero guards must kick in, not divide."""
    q = entrymod._all_queries()
    bands = q["lsh_band_sweep"](spark, SF_SMALL).collect()
    assert [r.bands for r in bands] == [1, 2, 4, 8, 16]
    assert all(
        (r.n_probe_pairs, r.n_truth, r.n_recalled, r.recall_ppm)
        == (0, 0, 0, 0)
        for r in bands
    )
    dims = q["matryoshka_recall"](spark, SF_SMALL).collect()
    assert [r.dims for r in dims] == [8, 16, 32, 64]
    assert all((r.n_hits, r.recall_ppm) == (0, 0) for r in dims)
    probes = q["ivf_nprobe_sweep"](spark, SF_SMALL).collect()
    assert [r.n_probe for r in probes] == [1, 2, 4, 8]
    # self-occurrence subtraction counts PRESENT queries, so the empty
    # report is 0, never the configured -n_queries
    assert all(
        (r.n_candidates, r.n_hits, r.recall_ppm) == (0, 0, 0)
        for r in probes
    )


def test_luma_histogram_empty_is_zero_report(spark, empty_tables):
    """media_luma_histogram reports all 8 bins on an empty corpus,
    zero-filled."""
    rows = entrymod._all_queries()["media_luma_histogram"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 8
    assert all((r.n_pixels, r.n_images_modal) == (0, 0) for r in rows)


def test_semantic_threshold_curve_empty_is_zero_report(spark, empty_tables):
    """semantic_dup_threshold_curve reports every configured threshold
    on an empty table, zero-filled."""
    rows = entrymod._all_queries()["semantic_dup_threshold_curve"](
        spark, SF_SMALL
    ).collect()
    assert [r.threshold_ppm for r in rows] == [
        800000, 900000, 950000, 990000,
    ]
    assert all((r.n_pairs, r.n_vecs_affected) == (0, 0) for r in rows)


def test_ranker_agreement_empty_is_degenerate_report(spark, empty_tables):
    """ranker_agreement is a one-row REPORT query: on an empty corpus
    it emits the degenerate (n_docs=0) row with rho pinned by the
    n < 2 branch — never a division by zero."""
    rows = entrymod._all_queries()["ranker_agreement"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 0
    assert rows[0]["rho_ppm"] == 1_000_000
