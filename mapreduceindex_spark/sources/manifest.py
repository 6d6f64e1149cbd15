"""Reference-format corpus source (SURVEY.md §2 O1–O2).

The reference consumes a manifest file — first line = file count, then one
path per line (``src/utils.c:3-18``) — and assigns each document a **1-based
file ID by manifest position** (``src/mapper.c:35``). The ID is positional,
NOT derived from the filename, and must be deterministic: we therefore
parse the manifest driver-side (it is tiny — a list of paths) and attach
IDs before Spark ever sees the data. ``monotonically_increasing_id`` would
be partition-placement-dependent and is deliberately avoided.

Scale note: the manifest itself is metadata (one line per file), so
driver-side parsing is correct even at 100 TB of *content*; the heavy read
is the distributed text scan below. Each (doc_id, path) pair becomes one
task-parallel ``wholetext`` read — Spark's scheduler load-balances files
across executors exactly like the reference's mutex-cursor work queue
(``mapper.c:20-31``), but cluster-wide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("path", T.StringType(), False),
    ]
)


def read_manifest(manifest_path: str) -> list[tuple[int, str]]:
    """Parse ``count\\npath...`` into [(1-based doc_id, absolute path)]."""
    base = os.path.dirname(os.path.abspath(manifest_path))
    with open(manifest_path, encoding="ascii") as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    count = int(lines[0])
    paths = lines[1 : 1 + count]
    return [
        (i + 1, p if os.path.isabs(p) else os.path.join(base, p))
        for i, p in enumerate(paths)
    ]


def corpus_from_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    """Documents table ``(doc_id BIGINT, text STRING)`` from a reference manifest.

    Reads via the ``binaryFile`` source, which PACKS many small files into
    each scan partition (~openCostInBytes-weighted bin packing). The
    ``text``/``wholetext`` source pins one file per task, and per-task
    scheduling overhead then dominates any small-file corpus — measured
    7× slower on the reference's 355-file corpus, and at 100 TB a
    billion-file listing would mean a billion tasks. The deterministic
    doc_id comes from a broadcast-joined manifest-order map on the file
    path (tiny dim — Catalyst broadcasts it automatically).
    """
    from mapreduceindex_spark.session import ensure_session_confs

    # all read-dependent runtime confs live in ensure_session_confs so a
    # caller-provided bare session behaves identically to get_spark()'s
    # (this includes the parallel-discovery threshold that keeps the
    # explicit path list below from firing a one-task-per-path listing job)
    ensure_session_confs(spark)
    entries = read_manifest(manifest_path)
    raw = spark.read.format("binaryFile").load([p for _, p in entries]).select(
        F.col("path").alias("_file"),
        F.decode("content", "UTF-8").alias("text"),
    )
    # the path column is a file:// URI; normalize to the absolute
    # filesystem path, then attach the manifest-order id with a LITERAL
    # map lookup. The manifest is metadata (one entry per file), so the
    # map is plan-sized the way a broadcast hashmap is — but unlike the
    # broadcast-join formulation it costs NO exchange, no extra stage,
    # and no driver→executor table ship per query (measured ~0.3 s of
    # the reference-corpus anchor's ~1.9 s: plan build + broadcast).
    # Corpora past literal-map comfort (~100k entries) should fall back
    # to the broadcast join; the reference contract is a small manifest.
    # map path → ARRAY of manifest ids: a manifest may list one path
    # twice (the reference reads it once per line and hands out BOTH
    # ids — mapper.c:35 is positional), while binaryFile reads each
    # distinct file once; exploding the id list reproduces one row per
    # manifest LINE. Distinct keys also satisfy Spark's default
    # mapKeyDedupPolicy=EXCEPTION for the literal map.
    ids_by_path: dict[str, list[int]] = {}
    for doc_id, p in entries:
        ids_by_path.setdefault(p, []).append(doc_id)
    # ONE parsed SQL expression, not F.create_map over per-entry F.lit
    # columns: every lit() is a py4j round trip, and 355 paths × (path +
    # id-array) literals cost ~1.2 s of driver chatter PER PLAN BUILD —
    # measured as the dominant term of the reference-corpus anchor
    # (build 1.2 s vs execute 0.25 s). The single expr string builds the
    # same literal map through one parser call in ~10 ms.
    def _q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    id_map = F.expr(
        "map("
        + ", ".join(
            f"{_q(p)}, array({','.join(str(i) for i in ids)})"
            for p, ids in ids_by_path.items()
        )
        + ")"
    )
    path_col = F.regexp_replace("_file", "^file:(//)?", "")
    return (
        raw.select(
            F.element_at(id_map, path_col).alias("_ids"), "text"
        )
        .filter(F.col("_ids").isNotNull())
        .select(F.explode("_ids").alias("_id"), "text")
        .select(F.col("_id").cast("long").alias("doc_id"), "text")
    )
