"""Exact, engine-portable aggregate arithmetic for 2-dp money columns.

Float summation is partition-order-dependent and decimal division rounds
half boundaries differently per engine; these helpers are the single home
for the lossless-decimal / integer-cents formulations that both the Spark
plans and the DuckDB oracle SQL mirror. One copy, because the formulas
are exactly the kind of subtle arithmetic where a fix applied to one
duplicate and not another makes engines disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(c: str) -> Column:
    """Exact decimal image of a 2-dp money double."""
    return F.col(c).cast("decimal(15,2)")


def sum_dec(c: str, digits: int = 2) -> Column:
    """Order-independent rounded sum of a 2-dp column, emitted as double."""
    return F.round(F.sum(dec2(c)), digits).cast("double")


def avg4(c: str) -> Column:
    """Order-independent 4-dp average of a 2-dp column, exact in integers.

    Any float or decimal division lands on engine-specific rounding at
    half boundaries (e.g. avg = x.69875), so the average is computed
    entirely in BIGINT: sum of cents, scaled to 1e-4, divided with
    explicit round-half-away-from-zero. The oracle SQL carries the same
    formula, making results bit-identical by construction.
    """
    s4 = f"(sum(CAST(round({c} * 100, 0) AS BIGINT)) * 100)"
    n = "count(1)"
    return F.expr(
        f"CAST(CASE WHEN {s4} >= 0 THEN ({s4}*2 + {n}) DIV ({n}*2) "
        f"ELSE -(((-{s4})*2 + {n}) DIV ({n}*2)) END AS DOUBLE) / 10000.0"
    )
