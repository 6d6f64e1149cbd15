"""Similarity search over embedding columns (SURVEY.md EXT2).

Two tiers, same scoring expressions:

- **cosine_topk**: brute-force exact top-k. The query set is broadcast
  (queries ≪ corpus); every executor scores its slice of the corpus
  against all queries JVM-side (``zip_with``/``aggregate`` fold — no
  Python), then a per-query window keeps k. Cost O(|Q|·N) — the correct
  baseline and the verifier for the approximate tier.
- **ann_lsh_topk**: random-hyperplane LSH. A fixed, seeded set of
  hyperplanes (literal constants — reproducible, oracle-checkable) maps
  each vector to a sign-bit bucket; candidates join only within equal
  buckets, then exact cosine + window rank. Sub-linear candidate sets at
  scale; multi-probe (bit-flip) variants slot in by adding buckets.

The embedding-cosine near-duplicate detector reuses the same machinery
with a threshold instead of top-k.
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceindex_spark.functions.vectors import cosine_similarity


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes.

    Box-Muller over a fixed SplitMix64 stream — no numpy dependency, and
    the exact float64 literals are embeddable in oracle SQL.
    """
    def stream():
        x = 0x243F6A8885A308D3
        while True:
            x = (x + 0x9E3779B97F4A7C15) % (1 << 64)
            z = x
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % (1 << 64)
            z ^= z >> 31
            yield z / float(1 << 64)

    g = stream()
    planes = []
    for _ in range(n_planes):
        row = []
        while len(row) < dim:
            u1, u2 = next(g), next(g)
            if u1 <= 1e-12:
                continue
            r = math.sqrt(-2.0 * math.log(u1))
            row.append(r * math.cos(2 * math.pi * u2))
            if len(row) < dim:
                row.append(r * math.sin(2 * math.pi * u2))
        planes.append(row[:dim])
    return planes


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-bit LSH bucket id: bit i = (v · plane_i) >= 0."""
    bits = []
    for i, plane in enumerate(planes):
        # dot(v, plane) with the plane as a literal array — JVM-side fold.
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(c) for c in plane]),
                lambda x, c: x.cast("double") * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    b = bits[0]
    for x in bits[1:]:
        b = b + x
    return b


def cosine_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for the first ``n_queries``
    vectors (query_id < n_queries), excluding self-matches.

    Output: (query_id, neighbor_id, cosine, rank) — rank 1..k per query,
    deterministic tie-break on neighbor_id.
    """
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("q_emb", "c_emb"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall < 1 by design; at scale the bucket join replaces the O(N·Q)
    scan with O(N·Q / 2^planes) expected comparisons. Same output shape
    as ``cosine_topk``.
    """
    planes = _hyperplanes(n_planes, dim)
    bucketed = embeddings.select(
        "vec_id", "embedding", _bucket_expr("embedding", planes).alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity("q_emb", "c_emb"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold, a < b).

    Brute force at fixture scale; at 100 TB the LSH bucketing above
    pre-filters candidates (same scoring expression, so results only
    gain recall holes, never precision errors).
    """
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_similarity("emb_a", "emb_b"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def hyperplane_literals(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Expose the plane constants for oracle-SQL generation."""
    return _hyperplanes(n_planes, dim)
