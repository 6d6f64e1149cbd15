"""Per-letter text sink (SURVEY.md §2 O12).

Writes the inverted index as 26 files ``a.txt`` … ``z.txt`` with lines
``word:[id1 id2 ...]`` ordered (df DESC, word ASC) within each file —
the reference's output contract (``src/reducer.c:110-147``). All 26 files
are materialized, including 0-byte ones for letters with no words
(golden-dir contract: ``checker/test_out_small/d.txt`` is empty; the
checker diffs all 26, ``checker/checker.sh:25-33``).

Scale design: the index is repartitioned BY LETTER (26-way hash on the
first character) and sorted within partitions, so each letter's lines are
produced by a bounded set of tasks in global order; Spark writes one
part-file per partition and the driver renames/concatenates per letter.
At test scale a single pass with ``partitionBy`` is used; at 100 TB the
same plan holds because the per-letter files are themselves an artifact
of the reference's contract (a cluster deployment would leave the output
as partitioned parquet and skip the concat).
"""

from __future__ import annotations

import glob
import os
import shutil
import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduceindex_spark.operators.inverted_index import letter_of


def format_lines(index: DataFrame) -> DataFrame:
    """``(letter, df, word, line)`` rows in reference line format.

    ``word:[id1 id2 ...]`` — ids ascending, space-separated
    (``reducer.c:132-139``).
    """
    return index.select(
        letter_of("word").alias("letter"),
        "df",
        "word",
        F.concat(
            F.col("word"),
            F.lit(":["),
            F.array_join(
                F.transform(F.col("doc_ids"), lambda x: x.cast("string")), " "
            ),
            F.lit("]"),
        ).alias("line"),
    )


def write_letter_files(
    index: DataFrame, out_dir: str, materialize: str = "txt"
) -> None:
    """Materialize the per-letter index from an inverted-index DataFrame.

    - ``materialize="txt"`` (the reference contract): ``out_dir/{a..z}.txt``.
      One Spark job: partition by letter (hash, 26 buckets ≈ one task per
      letter), sort within partitions by the reference's global order,
      write as ``partitionBy("letter")`` text. Driver then moves each
      letter's part-files (already internally ordered; ≤1 per letter here)
      into the flat ``<letter>.txt`` layout and touches empties.
    - ``materialize="parquet"`` (cluster mode): letter-partitioned parquet
      at ``out_dir/letter=<x>/`` carrying ``(df, word, line)``, no
      driver-side concatenation — the 100 TB form, where a single flat
      text file per letter is itself the bottleneck. The reference order
      is data, not file layout: readers reconstruct it with
      ``ORDER BY df DESC, word`` (parquet part-file order is not a
      contract), and partition pruning serves per-letter queries.
    """
    lines = format_lines(index)
    if materialize == "parquet":
        (
            lines.repartition(26, "letter")
            .sortWithinPartitions(
                "letter", F.col("df").desc(), F.col("word").asc()
            )
            .write.mode("overwrite")
            .partitionBy("letter")
            .parquet(out_dir)
        )
        return
    if materialize != "txt":
        raise ValueError(f"write_letter_files: unknown materialize {materialize!r}")
    os.makedirs(out_dir, exist_ok=True)
    staged = os.path.join(out_dir, "_staged")
    (
        lines.repartition(26, "letter")
        .sortWithinPartitions(
            "letter", F.col("df").desc(), F.col("word").asc()
        )
        .select("letter", "line")
        .write.mode("overwrite")
        .partitionBy("letter")
        .text(staged)
    )
    for ch in string.ascii_lowercase:
        target = os.path.join(out_dir, f"{ch}.txt")
        parts = sorted(glob.glob(os.path.join(staged, f"letter={ch}", "part-*")))
        with open(target, "wb") as out:
            for p in parts:
                with open(p, "rb") as src:
                    shutil.copyfileobj(src, out)
    shutil.rmtree(staged)
