"""Determinism under varying parallelism (SURVEY.md §5 strategy #3).

The reference checker reruns the binary at 9 (M,R) configs and diffs every
run against golden output; the Spark analog is identical results at
different ``spark.sql.shuffle.partitions``. Queries with float aggregates
are included deliberately — exact decimal/integer aggregation is what
makes them partition-count-independent.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

QUERIES = entrymod.queries()

#: A representative slice: flagship, skew-salted variant, float-bearing
#: aggregations, window ranking, LSH (hash-heavy), streaming.
NAMES = [
    "inverted_index",
    "inverted_index_salted",
    "q1_pricing_summary",
    "events_sliding",
    "top_orders_per_customer",
    "minhash_lsh_pairs",
    # round-2 banded/quantized additions: band-join order and integer-
    # micro sums must not leak partitioning into results
    "simhash_near_dups",
    "media_dhash_near_dups",
    "lm_doc_scores",
    "bloom_prefilter",
    # round-3 additions: cogrouped merge_asof (per-group Python must not
    # depend on group-to-partition placement), span interval merge
    # (window over hot positions), quantized embedding sums, frame
    # windows, cluster resolution through the media clone collapse
    "asof_error_purchase",
    "dup_spans",
    "embedding_dim_stats",
    "revenue_moving_avg",
    "media_dup_clusters",
    "per_source_topk_sample",
    # round-4 additions: two-phase global rank must not leak partition
    # placement into file cuts; iterative integer PageRank must not
    # leak join/aggregation order into ranks
    "zorder_layout",
    "token_pagerank",
    # round-5 additions: salting must not leak salt placement into the
    # aggregate; the two-phase bucketed cumsum must equal the global
    # one at any partitioning; fingerprint diffs and path mining ride
    # windows/hashes that must not see partition boundaries
    "salted_affinity_join",
    "ann_recall",
    "top_event_paths",
    "incremental_revenue_trend",
    "snapshot_diff_orders",
    "compaction_plan",
    # round-6 additions: histogram-cumsum band bounds, probe-then-plan
    # mixture rates, and the broadcast shingle probe must all be
    # partition-count-blind
    "tokenizer_fertility",
    "groupwise_quantile_filter",
    "mixture_resample",
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
    # round-6 tail: semi-join dedup, min-doc rare census, cross-batch
    # Arrow partials (the covariance test also pins batch size), NTILE
    # boundaries, micro-log sums, session-window transitions, dense-
    # grid KL terms, in-group position sorts and their merge — all
    # partition-count-blind by construction
    "q4_order_priority",
    "rare_token_ratio",
    "embedding_covariance_topk",
    "vocab_coverage",
    "rfm_segments",
    "token_entropy",
    "events_markov_transitions",
    "shard_skew_report",
    "domain_divergence",
    "positional_index",
    "phrase_search_indexed",
    # round-7 additions: Expand grouping sets, pivot cells, exploded
    # sliding-window distinct counts, min_by/max_by open-close ties,
    # offset-quantized centroid ranks, and the top-k support cut must
    # all be partition-count-blind
    "orders_cube",
    "order_status_pivot",
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
    "yoy_nation_revenue",
    "top_parts_dense_rank",
    "weekday_seasonality",
    # round-9 third wave: register max/sum folds, bucket-size
    # aggregates with rep tie rules, integer argmin/vote ties,
    # min-propagation and peel rounds, floored centroid means,
    # gaps-and-islands windows, Arrow-stage bincounts — none may leak
    # partitioning into results
    "hll_distinct_users",
    "lsh_band_sweep",
    "knn_classifier",
    "copurchase_bfs_depth",
    "copurchase_kcore",
    "ivf_nprobe_sweep",
    "label_compactness",
    "scd2_priority_history",
    "media_luma_histogram",
    # round-10 additions: the BLAS kernels' per-batch local top-k must
    # merge identically at any batch split; the per-cell ANN scoring
    # must not see cell-to-partition placement; the histogram-offset
    # NTILE and the JPEG-wire dHash must be partition-count-blind
    "knn_classifier_ann",
    "media_dhash",
    "quality_reliability_curve",
    "embedding_drift_report",
    "semantic_dup_threshold_curve",
    # round-10 third wave: RA tie-break in the top-k rank, LPA argmax
    # ties, window frames over the day series, the silhouette's
    # floored ppm ratio — all partition-count-blind
    "link_prediction",
    "label_propagation",
    "events_stl_decompose",
    "silhouette_simplified",
    "pq_topk",
    "media_audio_autocorr",
    "temperature_mixture",
    "mmr_topk",
    "ranker_agreement",
    # round-10 fourth wave: k-smallest windows, membership-flag maxes,
    # and bucket-histogram cumsums must not leak partitioning
    "kmv_set_ops",
    "log2_quantile_sketch",
    "ks_drift_test",
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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", NAMES)
def test_same_result_across_shuffle_partitions(name, spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rows(QUERIES[name](spark, SF_SMALL))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        high = _rows(QUERIES[name](spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high


def test_flagship_rerun_identical(spark):
    a = _rows(QUERIES["inverted_index"](spark, SF_SMALL))
    b = _rows(QUERIES["inverted_index"](spark, SF_SMALL))
    assert a == b
