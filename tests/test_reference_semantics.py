"""Bit-level reference-semantics tests (SURVEY.md §2 O3–O12).

Each case pins a behavior observed by running the reference C binary
(``/root/reference``): tokenization on whitespace runs, ASCII-only
strip-anywhere normalization, 1-based manifest doc ids, posting-list and
global ordering, and the golden letter-file format.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

from pyspark.sql import functions as F

from mapreduceindex_spark.functions.text import normalize_token, words
from mapreduceindex_spark.operators.inverted_index import (
    doc_words,
    inverted_index,
)
from mapreduceindex_spark.sinks.letter_sink import write_letter_files
from mapreduceindex_spark.sources.manifest import (
    corpus_from_manifest,
    read_manifest,
)

REF = "/root/reference/checker"


def test_normalize_token_reference_cases(spark):
    # Worked examples from the reference spec (Tema1a.pdf p.4) and
    # mapper.c:56-64 semantics: strip non-letters anywhere, lowercase.
    cases = [
        ("That's", "thats"),
        ("123ab", "ab"),
        ("42", ""),
        ("HELLO,", "hello"),
        ("a-b_c", "abc"),
        ("", ""),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["tok"])
    got = [r[0] for r in df.select(normalize_token("tok")).collect()]
    assert got == [e for _, e in cases]


def test_words_splits_on_whitespace_runs(spark):
    df = spark.createDataFrame([("a  b\tc\nd  ",)], ["text"])
    got = df.select(words(F.col("text")).alias("w")).collect()[0]["w"]
    assert got == ["a", "b", "c", "d"]


def test_doc_words_per_doc_distinct(spark):
    # O6: duplicates within one doc collapse; across docs they don't.
    df = spark.createDataFrame(
        [(1, "the the cat"), (2, "the dog")], ["doc_id", "text"]
    )
    pairs = {(r["word"], r["doc_id"]) for r in doc_words(df).collect()}
    assert pairs == {("the", 1), ("cat", 1), ("the", 2), ("dog", 2)}


def test_manifest_ids_are_1_based_manifest_order():
    entries = read_manifest(f"{REF}/test_small.txt")
    assert [i for i, _ in entries] == [1, 2, 3]
    assert [os.path.basename(p) for _, p in entries] == [
        "file1.txt",
        "file2.txt",
        "file3.txt",
    ]


def test_golden_parity_small_corpus(spark):
    # The strongest correctness anchor: bit parity (diff -w) with the
    # reference's own golden outputs on its small fixture, all 26 letters
    # including the 0-byte ones.
    docs = corpus_from_manifest(spark, f"{REF}/test_small.txt")
    out = tempfile.mkdtemp(prefix="golden_test_")
    write_letter_files(inverted_index(docs, ordered=False), out)
    for i in range(26):
        letter = chr(ord("a") + i)
        r = subprocess.run(
            [
                "diff",
                "-w",
                f"{out}/{letter}.txt",
                f"{REF}/test_out_small/{letter}.txt",
            ],
            capture_output=True,
        )
        assert r.returncode == 0, f"{letter}.txt differs:\n{r.stdout.decode()}"


def test_flagship_global_order(spark):
    # O11: df DESC, then word ASC — reference utils.c:20-29.
    docs = corpus_from_manifest(spark, f"{REF}/test_small.txt")
    rows = inverted_index(docs).collect()
    keys = [(-r["df"], r["word"]) for r in rows]
    assert keys == sorted(keys)
    # O10: posting lists ascending.
    for r in rows:
        assert list(r["doc_ids"]) == sorted(r["doc_ids"])


def test_micro_quantization_cross_engine_exact(spark):
    """The tie-free micro/q6/mean helpers must produce BIT-identical
    results in Spark and DuckDB on adversarial values — exact .5-micro
    boundaries, negative zeros, denormals-at-the-grid, large magnitudes.
    This is the regression pin for the r03 embedding_dim_stats driver
    hash_fail (engine-native round() resolves ties per-version)."""
    import duckdb

    from mapreduceindex_spark.functions import exact as X

    vals = [
        0.0, -0.0, 1.5e-6, -1.5e-6, 2.5e-6, -2.5e-6, 0.4999995,
        -0.4999995, 0.0000005, -0.0000005, 1.0000005, -1.0000005,
        123.4567895, -123.4567895, 7.5e-7, -7.5e-7, 1e-9, -1e-9,
        0.1, -0.1, 3.141592653589793, -2.718281828459045, 999999.9999995,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = (
        df.select(
            F.col("x"),
            X.micro(F.col("x")).alias("m"),
            X.q6(F.col("x")).alias("q"),
        )
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        lit = f"CAST({r['x']!r} AS DOUBLE)"  # repr round-trips doubles
        m, q = con.execute(
            f"SELECT {X.micro_sql(lit)}, {X.q6_sql(lit)}"
        ).fetchone()
        assert m == r["m"], (r["x"], m, r["m"])
        assert q == r["q"] or (q != q and r["q"] != r["q"]), (r["x"], q, r["q"])
    # mean_of_micro vs its SQL twin on half-boundary sums
    for s, n in [(5, 2), (-5, 2), (7, 2), (-7, 2), (10, 4), (-10, 4), (0, 3)]:
        sdf = spark.createDataFrame([(s, n)], "s long, n long")
        spark_mean = sdf.select(
            X.mean_of_micro("s", "n").alias("m")
        ).collect()[0]["m"]
        duck_mean = con.execute(
            f"SELECT {X.mean_of_micro_sql(str(s), str(n))}"
        ).fetchone()[0]
        assert spark_mean == duck_mean, (s, n, spark_mean, duck_mean)
