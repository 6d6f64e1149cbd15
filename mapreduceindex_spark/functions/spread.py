"""Scale-adaptive scan spreading for heavy per-row stages.

The fixture tables are single parquet files with ONE row group, so a
scan plans exactly one input partition and every expression evaluated
in the scan stage (tokenizer regexes, per-shingle md5, HOF chunkers)
runs on one core regardless of ``local[N]`` — the round-11 profile
showed the document tokenizer alone costing ~0.9 s single-core per
corpus pass at sf0.1 while the same pass spread over the session's
cores takes ~0.15 s (guide §2.5 "input skew: one huge unsplittable
file — repartition immediately after the read").

``spread_rows(df, *cols)`` repartitions only when the frame's planned
parallelism is BELOW the session's ``defaultParallelism`` — at real
scale a table scan already plans at least one split per 128 MB, so the
helper is a structural no-op there and never adds a shuffle; on the
single-file fixture it moves the raw rows exactly once, after which
every downstream per-row stage runs at session width. Hash-partitioning
on the caller's key column(s) keeps the assignment deterministic under
task retries (guide §2.5 on round-robin + rand); results are unchanged
because every operator in the registry is partition-order independent
(the exactness discipline), which the full DuckDB oracle drive
re-verifies over the spread plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_rows(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to session parallelism by ``cols`` iff its
    planned partition count is below the session's core count."""
    spark = df.sparkSession
    try:
        parallelism = spark.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        return df  # Connect / streaming frames: leave the plan alone
    if n >= parallelism:
        return df
    if cols:
        return df.repartition(parallelism, *[F.col(c) for c in cols])
    return df.repartition(parallelism)
