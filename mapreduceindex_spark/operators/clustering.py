"""Iterative clustering over embedding columns (SURVEY.md EXT2 adjacency;
no reference file:line — the C reference has no vector surface).

Lloyd's k-means as a DataFrame loop: the canonical *iterative* algorithm
the driver contract calls out as legitimately non-SQL-expressible (the
correctness row is rows-only; there is no oracle twin). The loop shape —
broadcast small model state out, aggregate new state back — is how every
iterative fitted model (k-means, logistic regression, ALS) runs on Spark:
per-iteration data movement is one map pass plus one k×dim-sized
aggregate, never a shuffle of the corpus by cluster.

Scale: the model state (k × dim floats) is a few KB — collecting it per
iteration is a scalar-aggregate-class driver roundtrip, not a data
collect. Assignment is BLAS inside Arrow-batched ``mapInPandas`` (one
N×dim @ dim×k matmul per batch); the centroid update is a per-dimension
hash aggregate (k·dim groups). Iteration count is a fixed small constant,
so the whole fit is ``max_iter`` linear passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_embeddings(
    embeddings: DataFrame,
    k: int = 8,
    max_iter: int = 5,
) -> DataFrame:
    """Fit k-means (Lloyd) on the embedding column; return cluster sizes.

    Deterministic setup: centroids initialize to the first ``k`` vectors
    (vec_id < k) and every assignment tie-breaks toward the lower
    centroid id; centroid coordinates are rounded to 6 dp after each
    update so the fit is reproducible across partitionings to float
    noise below the rounding grid. Output: (centroid_id, n_members),
    one row per non-empty cluster, ordered by centroid_id.
    """
    import numpy as np
    import pandas as pd

    vecs = embeddings.select("vec_id", "embedding")
    centroids = np.array(
        [
            r["embedding"]
            for r in vecs.filter(F.col("vec_id") < k)
            .orderBy("vec_id")
            .collect()
        ],
        dtype="float64",
    )

    def _assigned(cents: np.ndarray) -> DataFrame:
        C = cents  # captured by value per iteration

        def _assign(batches):
            c_norm2 = (C * C).sum(axis=1)
            for pdf in batches:
                if pdf.empty:
                    continue
                E = np.stack(pdf["embedding"].to_numpy()).astype("float64")
                # argmin over squared distance; ||x||² is row-constant so
                # the argmin needs only  −2·x·cᵀ + ||c||²
                d = -2.0 * (E @ C.T) + c_norm2
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "embedding": pdf["embedding"].to_numpy(),
                        "centroid_id": d.argmin(axis=1),
                    }
                )

        return vecs.mapInPandas(
            _assign, "vec_id long, embedding array<float>, centroid_id long"
        )

    for _ in range(max_iter):
        assigned = _assigned(centroids)
        # new centroid = per-dimension mean: explode dims, one hash agg
        # over k·dim groups, collect the (tiny) model state back
        upd = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("dim", "x")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        nxt = centroids.copy()
        for r in upd:
            nxt[r["centroid_id"], r["dim"]] = round(r["m"], 6)
        if np.array_equal(nxt, centroids):
            break
        centroids = nxt

    return (
        _assigned(centroids)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("centroid_id")
    )
