"""Text-analysis operators over the ``documents`` table (SURVEY.md EXT3).

Language ID (stopword heuristic), quality scoring, token statistics,
and document fingerprinting. Everything is a pure Catalyst expression
(split/transform/filter/aggregate higher-order functions) — zero Python
per row, so these run inside whole-stage codegen and scale linearly with
the corpus; the only shuffles are final small aggregations where present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduceindex_spark.functions.text import words

#: Small English function-word list for the language-ID heuristic.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "in", "on", "to", "is", "are",
    "was", "for", "with", "as", "by", "at", "from", "that", "this",
)

#: BPE-ish lexer classes: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _ws(text: Column | str) -> Column:
    return words(text)


def doc_stats(documents: DataFrame) -> DataFrame:
    """Per-document token statistics.

    n_tokens (whitespace tokens), n_words (normalized non-empty),
    n_distinct_words, avg_word_len, distinct_ratio.
    """
    ws = _ws(F.col("text"))
    n_words = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    total_len = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return documents.select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)
        ).cast("long").alias("n_tokens"),
        n_words.cast("long").alias("n_words"),
        n_distinct.cast("long").alias("n_distinct_words"),
        F.round(
            F.when(n_words > 0, total_len.cast("double") / n_words), 4
        ).alias("avg_word_len"),
        F.round(
            F.when(n_words > 0, n_distinct.cast("double") / n_words), 4
        ).alias("distinct_ratio"),
    ).orderBy("doc_id")


def token_counts_bpe(documents: DataFrame) -> DataFrame:
    """BPE-ish token counting: letter runs / digit runs / punctuation marks.

    A regex lexer via ``regexp_extract_all`` — the standard pre-tokenizer
    shape for LLM data pipelines (count before you train).
    """
    toks = F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), 0)
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_bpe"),
    ).orderBy("doc_id")


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-ratio language heuristic.

    en_ratio = fraction of words in a small English function-word list;
    predicted 'en' iff ratio ≥ 0.08. (An n-gram model would slot in the
    same expression shape; the declared ``lang`` column stays available
    for supervised comparison.)
    """
    ws = _ws(F.col("text"))
    n = F.size(ws)
    hits = F.size(F.filter(ws, lambda w: w.isin(*EN_STOPWORDS)))
    ratio = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
    return documents.select(
        "doc_id",
        "lang",
        F.round(ratio, 4).alias("en_ratio"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
    ).orderBy("doc_id")


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite document-quality score in [0,1] — LLM-corpus filtering shape.

    Components (each a bounded ratio): alpha character ratio, distinct-word
    ratio, mean-word-length band, length band. Deterministic, engine-portable
    arithmetic (the oracle computes the identical formula).
    """
    ws = _ws(F.col("text"))
    n = F.size(ws)
    n_chars = F.length("text")
    alpha_chars = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars.cast("double") / n_chars).otherwise(0.0)
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(ws)).cast("double") / n).otherwise(0.0)
    mean_len = F.when(
        n > 0,
        F.aggregate(ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w)).cast("double") / n,
    ).otherwise(0.0)
    len_band = F.least(n.cast("double") / 100.0, F.lit(1.0))
    word_len_band = F.least(mean_len / 8.0, F.lit(1.0))
    score = (
        alpha_ratio * 0.3 + distinct_ratio * 0.3 + len_band * 0.2 + word_len_band * 0.2
    )
    return documents.select(
        "doc_id",
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(score, 4).alias("quality"),
    ).orderBy("doc_id")


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct word set.

    Robust to word order and duplication — the canonical cheap
    "same bag of words" document key for corpus bookkeeping.
    """
    ws = _ws(F.col("text"))
    canon = F.array_join(F.array_sort(F.array_distinct(ws)), " ")
    return documents.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
    ).orderBy("doc_id")


def word_counts(documents: DataFrame) -> DataFrame:
    """Corpus-wide term frequencies (every occurrence, not per-doc distinct)."""
    return (
        documents.select(F.explode(_ws(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    )


def tf_idf(documents: DataFrame) -> DataFrame:
    """TF-IDF per (doc, word): tf = in-doc count, idf = ln(N / df).

    Two aggregations sharing the exploded pair stream; df comes from a
    broadcast-joined per-word dim (vocabulary ≪ corpus at scale).
    Natural log, smoothing-free — matches the oracle formula exactly.
    """
    pairs = documents.select(
        "doc_id", F.explode(_ws(F.col("text"))).alias("word")
    )
    tf = pairs.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = pairs.groupBy("word").agg(
        F.countDistinct("doc_id").alias("df")
    )
    total = documents.agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "word")
    )
