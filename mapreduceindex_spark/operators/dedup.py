"""Deduplication operators for LLM-corpus pipelines (SURVEY.md EXT1).

Exact (hash-group), n-gram Jaccard, MinHash+LSH banding, and SimHash —
each expressed as pure Catalyst dataflow so the same plan scales from the
500-doc fixture to a 100 TB corpus:

- **exact_dedup**: md5(text) groupBy — one shuffle on a 128-bit key,
  uniform by construction (no skew).
- **ngram_jaccard_pairs**: exact pairwise Jaccard via the inverted
  shingle index: explode distinct shingles → self-join on shingle →
  count intersections. The shingle join is the scale bottleneck, so hot
  shingles (appearing in > ``max_shingle_df`` docs) are dropped before the
  self-join — the standard frequency-cap trick that bounds the quadratic
  blowup while only ignoring shingles that carry no discriminative signal.
- **minhash_lsh_pairs**: the sub-quadratic scale path. K hash functions
  over a deterministic 60-bit shingle hash → per-doc signature → B bands
  → candidates join only within equal (band, band-hash) buckets →
  verified with exact Jaccard. All arithmetic (md5-derived hash, affine
  (a·h+b) mod p) is engine-portable, so the DuckDB oracle reproduces it
  bit-for-bit.
- **simhash64**: 60-bit sign-aggregated fingerprint; near-dups are pairs
  within a small Hamming distance, found by joining on 4 16-bit-ish chunk
  keys (any pair at distance ≤3 shares ≥1 identical chunk — pigeonhole).

The deterministic md5-based hash (``stable_hash64``) is deliberately used
instead of ``xxhash64`` so every stage is cross-checkable against an
independent SQL engine; swap in ``F.xxhash64`` for ~2× cheaper hashing
when auditability is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduceindex_spark.functions.text import shingles, stable_hash64

#: Mersenne prime 2^61 - 1: modulus for the affine MinHash permutations.
MINHASH_PRIME = (1 << 61) - 1

def _affine_coeffs(k: int) -> list[tuple[int, int]]:
    """First k (a, b) pairs from a fixed linear-congruential stream.

    Pure-Python, deterministic, embedded in both the Spark plan and the
    oracle SQL as literals.
    """
    coeffs = []
    x = 0x9E3779B97F4A7C15
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (MINHASH_PRIME - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MINHASH_PRIME
        coeffs.append((a, b))
    return coeffs


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash.

    Returns one row per distinct content: ``(text_hash, n_copies,
    keep_doc_id)`` with the lowest doc_id as the canonical survivor.
    """
    return (
        documents.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy("text_hash")
    )


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) pairs — the shared front end of the
    Jaccard / MinHash paths."""
    return documents.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), n))).alias("shingle"),
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard similarity ≥ threshold, via self-join
    on the inverted shingle index. Output: (doc_a, doc_b, jaccard), a < b."""
    sh = doc_shingles(documents, n)
    # Frequency cap: a shingle present in >max_shingle_df docs contributes
    # O(df²) candidate pairs but no discrimination — drop before the join.
    rare = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf")).filter(
        F.col("sdf") <= max_shingle_df
    )
    sh = sh.join(rare.select("shingle"), "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(
    documents: DataFrame, n: int = 3, num_hashes: int = 16
) -> DataFrame:
    """Per-document MinHash signature as ``num_hashes`` columns ``mh_i``.

    h_i(doc) = min over shingles of ((a_i · H(shingle) + b_i) mod P), with
    H the portable 60-bit md5 hash. One aggregation, no joins.
    """
    sh = doc_shingles(documents, n).select(
        "doc_id", stable_hash64("shingle").alias("h")
    )
    aggs = []
    for i, (a, b) in enumerate(_affine_coeffs(num_hashes)):
        # (a*h + b) mod P in 128-bit-safe pieces: h < 2^60, a < 2^61 →
        # products overflow int64, so compute in decimal(38,0) then mod.
        v = (
            (F.col("h").cast("decimal(38,0)") * F.lit(a) + F.lit(b))
            % F.lit(MINHASH_PRIME)
        ).cast("long")
        aggs.append(F.min(v).alias(f"mh_{i}"))
    return sh.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band value become candidates (joined within band
    buckets only — the sub-quadratic step); candidates are then verified
    with exact Jaccard so output quality equals ``ngram_jaccard_pairs``.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, n, num_hashes)
    band_cols = [
        F.md5(
            F.concat_ws(
                "_",
                F.lit(bi),
                *[
                    F.col(f"mh_{bi * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"band_{bi}")
        for bi in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(
            F.array(*[F.col(f"band_{bi}") for bi in range(bands)])
        ).alias("bucket"),
    )
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    exact = ngram_jaccard_pairs(documents, n, threshold=0.0)
    return (
        cand.join(exact, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def simhash64(documents: DataFrame, n_bits: int = 24) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over word hashes.

    For each bit j of the portable hash, sum (+1 if set else −1) over the
    doc's distinct words; bit j of the fingerprint = (sum > 0). Expressed
    as nested higher-order aggregates over the word array — single pass,
    no explode, no shuffle at all (a pure projection).
    """
    from mapreduceindex_spark.functions.text import words

    ws = F.array_distinct(words(F.col("text")))
    hashes = F.transform(ws, lambda w: stable_hash64(w))
    # One fold per bit (bit index is a plan-time constant — shiftright
    # requires it); 24 folds over the same array collapse into one
    # codegen'd projection stage.
    def _vote_fn(j: int):
        # NB: closure, not a default arg — pyspark derives the HOF lambda's
        # arity from the Python signature, so `lambda acc, h, j=j` would be
        # (mis)read as a 3-argument lambda.
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    terms = []
    for j in range(n_bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_fn(j))
        terms.append(
            F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    fingerprint = terms[0]
    for t in terms[1:]:
        fingerprint = fingerprint + t
    return documents.select("doc_id", fingerprint.alias("simhash")).orderBy(
        "doc_id"
    )
