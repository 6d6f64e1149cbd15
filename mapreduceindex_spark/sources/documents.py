"""Document-corpus sources beyond parquet (SURVEY.md §2 O1–O2 analogs).

Training corpora arrive as JSONL/CSV/text-dirs as often as parquet; these
readers normalize any of them to the canonical ``documents`` shape
``(doc_id BIGINT, text STRING, …metadata)`` consumed by every operator.
All are thin declarative wrappers over Spark's native sources, so schema
projection and (for parquet/csv) predicate pushdown stay with Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical minimal documents schema; extra metadata columns pass through.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def documents_from_jsonl(
    spark: SparkSession,
    path: str,
    id_field: str = "doc_id",
    text_field: str = "text",
) -> DataFrame:
    """JSON-lines corpus → documents. Explicit schema (no inference pass —
    at 100 TB a schema-inference pre-scan doubles the read)."""
    schema = T.StructType(
        [
            T.StructField(id_field, T.LongType(), True),
            T.StructField(text_field, T.StringType(), True),
        ]
    )
    return (
        spark.read.schema(schema)
        .json(path)
        .select(
            F.col(id_field).alias("doc_id"), F.col(text_field).alias("text")
        )
    )


def documents_from_csv(
    spark: SparkSession,
    path: str,
    id_field: str = "doc_id",
    text_field: str = "text",
    **options: str,
) -> DataFrame:
    """CSV corpus → documents (header row expected by default).

    ``multiLine`` defaults ON: a TEXT corpus legitimately contains
    newlines inside quoted fields, and without it each physical line
    parses as a record (silent corruption). The cost is that multiLine
    CSV is not line-splittable — each FILE parses as one unit — so at
    100 TB the parallelism comes from file count, not intra-file
    splits; pass ``multiLine="false"`` only for corpora guaranteed
    newline-free.
    """
    opts = {"header": "true", "escape": '"', "multiLine": "true", **options}
    df = spark.read.options(**opts).csv(path)
    return df.select(
        F.col(id_field).cast("long").alias("doc_id"),
        F.col(text_field).alias("text"),
    )


def documents_from_text_dir(
    spark: SparkSession, glob_path: str
) -> DataFrame:
    """Directory of raw text files → documents, one row per file.

    doc_id is a deterministic function of the file path (portable 60-bit
    md5 hash) — stable across runs and clusters, unlike
    ``monotonically_increasing_id``. For the reference's manifest-ordered
    1-based ids use ``sources.manifest.corpus_from_manifest`` instead.
    """
    raw = (
        spark.read.option("wholetext", "true")
        .text(glob_path)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("text"),
        )
    )
    doc_id = F.conv(F.substring(F.md5("path"), 1, 15), 16, 10).cast("long")
    return raw.select(doc_id.alias("doc_id"), "text", "path")


def documents_from_orc(
    spark: SparkSession,
    path: str,
    id_field: str = "doc_id",
    text_field: str = "text",
) -> DataFrame:
    """ORC corpus → documents. Spark's native ORC source keeps predicate
    pushdown and column pruning (same Catalyst DataSource V2 path as
    parquet), so ORC-resident corpora are first-class, not a conversion
    detour."""
    return spark.read.orc(path).select(
        F.col(id_field).cast("long").alias("doc_id"),
        F.col(text_field).alias("text"),
    )
