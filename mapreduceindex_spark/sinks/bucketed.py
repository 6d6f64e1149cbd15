"""Bucketed-table sink — shuffle-free co-located joins (SURVEY.md §4.3).

Bucketing pre-partitions a table on its join key at write time: two tables
bucketed on the same key with the same bucket count join WITHOUT any
exchange — the join cost at 100 TB becomes a per-bucket merge instead of a
full shuffle of both fact tables. This is the standing answer to the
orders ⨝ lineitem shuffle, paid once at ingest instead of per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the catalog.

    Sorting within buckets by the key lets the subsequent sort-merge join
    skip its sort as well — the join degenerates to a zip of pre-sorted
    bucket pairs.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along, enabling
    exchange-free joins against tables bucketed on the same key/count."""
    return spark.table(table_name)
