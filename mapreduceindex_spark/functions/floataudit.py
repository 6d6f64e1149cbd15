"""Float-output hash-risk predicate (single copy for the audit script
and the CI parity gate).

Why this exists: ``embedding_dim_stats`` hash_failed at the driver for
two consecutive rounds while being bit-exact against the same oracle SQL
locally (VERDICT r04 "What's wrong" #1). With arithmetic provably
integer-exact on both sides, the surviving suspect is float *string*
serialization — engines flip to scientific notation at different
magnitude thresholds, so a value like 1.3e-05 can hash differently from
``0.000013`` even when the doubles are bit-identical. The registry-wide
contract is therefore: every emitted double is (a) on the 1e-6
quantization grid (the tie-free ``exact.py`` family or coarser), and
(b) magnitude-bounded away from both scientific-notation edges. Columns
that can't satisfy (b) — statistics of near-zero data — must be emitted
as BIGINT micro units instead (as ``embedding_dim_stats`` now is).
"""

from __future__ import annotations

import math

#: Below this magnitude Python repr (and several engines' casts) switch
#: to exponent form — the exact class that bit-identical doubles can
#: still serialize differently in.
TINY = 1e-4
#: Above this, doubles no longer represent every integer and engines
#: again diverge on exponent-form printing.
HUGE = 1e16
ABS_EPS = 1e-6


def column_flags(values) -> set[str]:
    """Return the set of risk flags for a column's values (empty = clean).

    Flags: ``tiny`` (0 < |v| < 1e-4), ``huge`` (|v| >= 1e16), ``inf``,
    and ``non_q6`` (not on the 1e-6 grid, i.e. never passed through an
    explicit cross-engine-exact quantization). The grid check uses a
    relative tolerance so large money sums whose fp representation
    wobbles below the 1e-6 digit still pass.
    """
    flags: set[str] = set()
    for v in values:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        v = float(v)
        if math.isinf(v):
            flags.add("inf")
            continue
        a = abs(v)
        if 0.0 < a < TINY:
            flags.add("tiny")
        if a >= HUGE:
            flags.add("huge")
        scaled = v * 1e6
        if abs(scaled - round(scaled)) > ABS_EPS * max(1.0, a):
            flags.add("non_q6")
    return flags


def audit_pandas(pdf, float_cols) -> dict[str, list[str]]:
    """Flag map for the float columns of a pandas frame (empty = clean)."""
    bad = {}
    for c in float_cols:
        fl = column_flags(pdf[c].tolist())
        if fl:
            bad[c] = sorted(fl)
    return bad
