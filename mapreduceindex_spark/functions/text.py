"""Text column functions — the engine's scalar tokenization surface.

Semantics match the reference mapper bit-for-bit (SURVEY.md §2 O3–O5):

- tokenize: split on any whitespace run (space/tab/newline) —
  reference ``src/mapper.c:55`` (``fscanf("%255s")``).
- normalize: keep only ASCII letters *anywhere* in the token, then
  lowercase — reference ``src/mapper.c:56-64`` (``isalpha`` loop +
  ``tolower``). ASCII class ``[^a-zA-Z]``, deliberately NOT ``\\p{L}``:
  the reference uses C ``isalpha`` on ASCII input.
- filter: drop tokens that normalize to the empty string —
  reference ``src/mapper.c:66-69``.

All of these are pure Catalyst expressions (whole-stage-codegen'd,
JVM-side); no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java regex for "one or more whitespace chars" — mirrors fscanf %s delimiters.
WHITESPACE_RE = r"\s+"

#: ASCII-letters-only normalization class (reference mapper.c:60 `isalpha`).
NON_ALPHA_RE = "[^a-zA-Z]"


def tokenize(text: Column | str) -> Column:
    """Raw whitespace tokens of ``text`` as ``array<string>``.

    May contain empty strings at the edges (leading/trailing whitespace);
    downstream normalization filters them.
    """
    return F.split(text, WHITESPACE_RE)


def normalize_token(tok: Column | str) -> Column:
    """Reference word normalization: strip non-ASCII-letters anywhere, lowercase.

    ``That's`` → ``thats``; ``123ab`` → ``ab``; ``42`` → ``''``.
    """
    return F.lower(F.regexp_replace(tok, NON_ALPHA_RE, ""))


def words(text: Column | str) -> Column:
    """Normalized, non-empty words of ``text`` as ``array<string>``.

    One expression tree (split → transform → filter), fully codegen'd —
    no explode needed until the caller wants rows.
    """
    return F.filter(
        F.transform(tokenize(text), normalize_token),
        lambda w: F.length(w) > 0,
    )


def token_rows(documents, text_col: str = "text", id_col: str = "doc_id", *extra_cols: str):
    """One row per raw whitespace token: (doc_id, extra..., tok, word).

    THE shared row-wise tokenization front end — the flagship index, text
    analysis, simhash, and the streaming index all consume this, so the
    reference semantics (split → normalize) live in exactly one place.
    ``word`` may be empty (callers filter or count conditionally so
    raw-token statistics stay available).
    """
    import pyspark.sql.functions as _F

    return documents.select(
        _F.col(id_col).alias("doc_id"),
        *extra_cols,
        _F.explode(_F.split(_F.col(text_col), WHITESPACE_RE)).alias("tok"),
    ).select(
        "doc_id",
        *extra_cols,
        "tok",
        normalize_token("tok").alias("word"),
    )


def stable_hash64(col: Column | str, *, bits: int = 60) -> Column:
    """Deterministic, engine-independent 64-bit-ish hash of a string column.

    Built from the first 15 hex digits of md5 (< 2^60, always fits a signed
    BIGINT). Chosen over ``F.hash``/``F.xxhash64`` because the *same* value is
    reproducible in any SQL engine (the DuckDB oracle computes
    ``('0x' || substr(md5(x),1,15))::BIGINT``), which makes MinHash/SimHash
    pipelines cross-checkable. md5 here is a hash, not cryptography.
    """
    n_hex = bits // 4
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles of ``text`` as ``array<string>`` (space-joined).

    Implemented as a zip of the word array against itself shifted — pure
    Catalyst (transform over sequence), no UDF. Documents shorter than ``n``
    words yield a single shingle of all their words, so every doc has ≥1
    shingle (keeps Jaccard well-defined).
    """
    ws = words(text)
    k = F.size(ws)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    return F.when(k <= n, F.array(F.array_join(ws, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(ws, i + 1, n), " "))
    )
