"""Round-6 operator semantics — the properties oracle parity can't see:
exact nearest-rank band selection on a hand-computable distribution,
mixture feasibility invariants (no upsampling, binding source saturated),
fertility arithmetic on a known tiny corpus, and decontamination
consistency with the underlying contamination scores."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_quantile_filter_nearest_rank_band(spark):
    """20 docs of lengths 1..20 in one source, band [5, 95]: nearest-rank
    k_lo = ceil(20*5/100) = 1 -> lo = 1, k_hi = ceil(20*95/100) = 19 ->
    hi = 19. Kept: lengths 1..19."""
    from mapreduceindex_spark.operators.corpus import groupwise_quantile_filter

    docs = _docs(
        spark,
        [(i, "x" * i, "en", "s", i) for i in range(1, 21)],
    )
    out = groupwise_quantile_filter(docs).collect()
    assert {r.value for r in out} == set(range(1, 20))
    assert all((r.band_lo, r.band_hi) == (1, 19) for r in out)


def test_quantile_filter_bands_are_per_group(spark):
    """Two sources with disjoint length ranges get independent bands —
    the per-group property that separates this from a global trim."""
    from mapreduceindex_spark.operators.corpus import groupwise_quantile_filter

    rows = [(i, "x" * i, "en", "short", i) for i in range(1, 41)]
    rows += [(100 + i, "y" * (1000 + i), "en", "long", 1000 + i) for i in range(1, 41)]
    out = groupwise_quantile_filter(_docs(spark, rows)).collect()
    bands = {r.source: (r.band_lo, r.band_hi) for r in out}
    # k_lo = ceil(40*5/100) = 2, k_hi = ceil(40*95/100) = 38
    assert bands["short"] == (2, 38)
    assert bands["long"] == (1002, 1038)


def test_mixture_resample_feasibility_invariants(spark):
    """No rate exceeds 1e6 (never upsamples); the binding source — the
    one whose count/weight ratio is smallest — gets rate 1e6 (fully
    consumed target); kept counts never exceed totals."""
    from mapreduceindex_spark.operators.corpus import mixture_resample
    from mapreduceindex_spark.session import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    weights = {"src0": 500000, "src1": 300000, "src2": 200000}
    out = {r.source: r for r in mixture_resample(docs, weights).collect()}
    assert set(out) == set(weights)
    for r in out.values():
        assert 0 <= r.rate_ppm <= 1_000_000
        assert r.n_kept <= r.n_total
    binding = min(
        out.values(), key=lambda r: r.n_total * 1_000_000 // r.target_ppm
    )
    assert binding.rate_ppm == 1_000_000
    # mix shares sum to ~1e6 (integer floor division loses < n sources)
    tot = sum(r.mix_ppm for r in out.values())
    assert 1_000_000 - len(out) <= tot <= 1_000_000


def test_mixture_resample_rate_zero_for_empty_source(spark):
    """A weighted source with no rows forces total=0: every rate is 0
    and nothing is kept — the degenerate plan must not divide by zero."""
    from mapreduceindex_spark.operators.corpus import mixture_resample
    from mapreduceindex_spark.session import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    out = mixture_resample(
        docs, {"src0": 500000, "no_such_source": 500000}
    ).collect()
    assert {r.source for r in out} == {"src0", "no_such_source"}
    assert all(r.rate_ppm == 0 and r.n_kept == 0 for r in out)


def test_tokenizer_fertility_known_counts(spark):
    """'ab cd.' = 3 BPE tokens ([ab][cd][.]), 2 whitespace words,
    6 chars -> 500000 tokens/char-micro, 1500000 tokens/word-micro."""
    from mapreduceindex_spark.operators.text_analysis import (
        tokenizer_fertility,
    )

    docs = _docs(spark, [(1, "ab cd.", "en", "s", 6)])
    r = tokenizer_fertility(docs).collect()[0]
    assert (r.n_docs, r.n_chars, r.n_words, r.n_bpe_tokens) == (1, 6, 2, 3)
    assert r.tokens_per_char_micro == 500000
    assert r.tokens_per_word_micro == 1500000


def test_decontaminated_consistent_with_contamination_check(spark):
    """Per-source removed counts must equal the count of docs
    contamination_check scores with n_overlap > 0."""
    from mapreduceindex_spark.operators.corpus import (
        contamination_check,
        decontaminated_corpus,
    )
    from mapreduceindex_spark.session import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    scored = contamination_check(docs)
    expect = {
        r.source: r.n
        for r in docs.join(
            scored.filter("n_overlap > 0").select("doc_id"), "doc_id"
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = decontaminated_corpus(docs)
    got = {r.source: r.n_removed for r in out.collect()}
    for src, n in expect.items():
        assert got[src] == n
    # every candidate is either kept or removed
    assert all(
        r.n_candidates == r.n_kept + r.n_removed for r in out.collect()
    )
