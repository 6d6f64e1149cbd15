"""Shared integer linear-algebra partials for the embedding operators.

One home for the signed tie-free micro quantization, the silent-int64-
wrap guard, and the per-partition Gram accumulation that
``embedding_covariance_topk`` and ``embedding_power_iteration`` both
need — two hand-synced copies of an overflow guard is how wrong bounds
ship (a round-6 review already fixed one).
"""

from __future__ import annotations


def signed_micro_int64(mat):
    """Tie-free signed micro quantization of a float matrix —
    ``floor(|x|·1e6 + 0.5)`` with the sign reapplied (numpy twin of
    ``functions.exact.micro``)."""
    import numpy as np

    return np.where(
        mat >= 0,
        np.floor(mat * 1e6 + 0.5),
        -np.floor(-mat * 1e6 + 0.5),
    ).astype(np.int64)


def accumulate_gram(batches, op_name: str):
    """Accumulate ``(gram = Σ vᵀv, sums = Σ v, n)`` in int64 across a
    partition's whole Arrow-batch iterator, with the silent-wrap guard:
    worst-case ``Σ|v_i·v_j|`` accumulated so far must stay inside int64
    (numpy overflow wraps silently — raising is the only safe failure).
    Returns ``(gram, sums, n)``; ``gram is None`` when the partition is
    empty. Raises on ragged embedding dimensions within the partition
    (cross-partition raggedness must be checked by the caller on the
    merged statistics — partitions can't see each other)."""
    import numpy as np

    gram = None
    sums = None
    n = 0
    max_abs = 0
    for pdf in batches:
        if len(pdf) == 0:
            continue
        arrs = [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        lens = {a.shape[0] for a in arrs}
        if len(lens) != 1:
            raise ValueError(
                f"{op_name}: ragged embedding dims within a batch "
                f"({sorted(lens)})"
            )
        mat = np.stack(arrs)
        vi = signed_micro_int64(mat)
        n += len(pdf)
        max_abs = max(max_abs, int(np.abs(vi).max(initial=0)))
        if max_abs and max_abs * max_abs > (2**62) // n:
            raise ValueError(
                f"{op_name}: int64 partial overflow risk "
                f"(max |micro|={max_abs}, rows={n}); rescale inputs or "
                "switch to DECIMAL accumulators"
            )
        g = vi.T @ vi
        s = vi.sum(axis=0)
        if gram is None:
            gram, sums = g, s
        elif g.shape != gram.shape:
            raise ValueError(
                f"{op_name}: ragged embedding dims "
                f"{g.shape[0]} vs {gram.shape[0]}"
            )
        else:
            gram += g
            sums += s
    return gram, sums, n
