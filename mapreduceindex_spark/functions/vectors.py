"""Vector column functions over ``array<float/double>`` embeddings.

All pure Catalyst higher-order functions (``zip_with`` + ``aggregate``):
they run JVM-side inside whole-stage codegen, so brute-force similarity
scans stay off the Python path entirely. For 100 TB-scale ANN the
LSH-bucketed variants in ``operators/similarity.py`` bound the candidate
set; these scalar functions then score only candidates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ as double."""
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) as double; NULL-safe for zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
