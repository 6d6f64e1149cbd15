"""Multimodal (binary) column plumbing for media-bearing corpora
(SURVEY.md §2 north-star extension; no reference file:line — the C
reference is text-only).

Design: image/audio/video payloads are opaque ``binary`` columns with
typed metadata alongside. The Spark-side machinery — schema, Arrow batch
shape, ``mapInPandas`` signatures, partitioning — is real and tested; the
actual codec step is STUBBED (``decode_media`` raises
``NotImplementedError`` unless ``fake=True``) because media libraries are
not available in this environment. Swapping the stub for PIL/ffmpeg is a
one-function change; nothing in the distributed plan moves.

Scale notes: media rows are large and variable-sized, so the operators
(a) never shuffle raw bytes — feature extraction happens in the scan
stage via ``mapInPandas`` and only fixed-width features flow onward, and
(b) use ``maxRecordsPerBatch``-bounded Arrow batches so executor memory
is bounded regardless of payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the feature output of `extract_media_features`.
MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, magic string, checksum_prefix string, "
    "fake_width bigint, fake_height bigint"
)


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Derive an opaque binary payload column from text (fixture stand-in).

    In production this column arrives from the source (parquet BINARY);
    here we materialize one deterministically so the downstream plumbing
    is exercised end-to-end.
    """
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def decode_media(payload: bytes, fake: bool = False) -> dict:
    """STUB codec. Real implementation would dispatch on MIME type to
    PIL / torchaudio / pyav. ``fake=True`` returns deterministic
    pseudo-dimensions derived from the byte content (for tests)."""
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "install PIL/ffmpeg and replace this stub"
        )
    n = len(payload)
    return {"width": 16 + n % 1024, "height": 16 + (n // 7) % 1024}


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps bytes inside the scan stage: each Arrow batch is
    processed in one Python call, emitting only small fixed-width features.
    The decode itself is the stub above (deterministic fake), so the test
    asserts real plumbing with fake codec output.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_media(p, fake=True) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "magic": payloads.map(lambda b: b[:4].hex()),
                    "checksum_prefix": payloads.map(
                        lambda b: __import__("hashlib").md5(b).hexdigest()[:8]
                    ),
                    "fake_width": [d["width"] for d in dims],
                    "fake_height": [d["height"] for d in dims],
                }
            )

    return media.mapInPandas(_extract, schema=MEDIA_FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Resize plumbing: per-payload scale factors from decoded dimensions.

    The decode is the deterministic stub; the real resize kernel (PIL
    ``Image.resize`` over the bytes) slots into the same ``mapInPandas``
    batch loop. Only fixed-width numeric features leave the stage — the
    resized bytes would stay columnar in the scan stage exactly like the
    input payload.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode_media(p, fake=True) for p in pdf["payload"]]
            w = pd.Series([d["width"] for d in dims], dtype="int64")
            h = pd.Series([d["height"] for d in dims], dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_w": w,
                    "orig_h": h,
                    "new_w": target_w,
                    "new_h": target_h,
                    "scale_x": (target_w / w).round(6),
                    "scale_y": (target_h / h).round(6),
                }
            )

    return media.mapInPandas(
        _resize,
        schema=(
            "doc_id bigint, orig_w bigint, orig_h bigint, "
            "new_w bigint, new_h bigint, scale_x double, scale_y double"
        ),
    )


def frame_sample(media: DataFrame, every_n: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame offset.

    Stands in for video frame extraction (pyav keyframe walk): frames are
    modeled as fixed-stride byte offsets, one output row each — the same
    explode-shaped fan-out a real sampler produces. Per-frame decode
    attaches in the batch loop; only (doc_id, frame_idx, offset, length)
    flow onward.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i, off in enumerate(range(0, n, every_n)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_len"].append(min(every_n, n - off))
            # explicit dtypes so an all-empty batch still matches the schema
            yield pd.DataFrame(rows).astype("int64")

    return media.mapInPandas(
        _frames,
        schema=(
            "doc_id bigint, frame_idx bigint, frame_offset bigint, "
            "frame_len bigint"
        ),
    )


def media_metadata_stats(documents: DataFrame) -> DataFrame:
    """Pure-SQL metadata pass over the binary column (no Python at all):
    byte length + hex magic prefix, aggregated by source bucket.

    This is the shape of a corpus-level media audit (bytes per bucket,
    payload size distribution) and is oracle-checkable.
    """
    media = documents.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
    )
    return (
        media.select(
            "source",
            F.octet_length("payload").cast("long").alias("n_bytes"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("source")
    )
