"""Training-shard parquet sink — the pipeline's output end.

Writes a corpus as a deterministic, evenly-sized set of parquet shards:
the standard layout a downstream training loader consumes. Sharding is by
content/id hash (not by arrival partition), so shard membership is stable
across reruns and cluster sizes — a rerun with different parallelism
produces byte-identical shard *membership* (file internals may differ in
row order only if ``sort_within`` is off).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    documents: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    sort_within: bool = True,
) -> None:
    """Write ``documents`` as ``n_shards`` hash-assigned parquet shards.

    shard = crc32(id) mod n — deterministic, uniform, engine-portable.
    ``repartition(n, shard)`` gives one task per shard;
    ``sortWithinPartitions`` makes each shard file internally ordered and
    therefore byte-reproducible run-to-run.
    """
    sharded = documents.withColumn(
        "shard", (F.crc32(F.col(id_col).cast("string")) % n_shards).cast("int")
    )
    out = sharded.repartition(n_shards, "shard")
    if sort_within:
        out = out.sortWithinPartitions("shard", id_col)
    (
        out.write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def stream_to_training_shards(
    stream: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
):
    """Continuously materialize a document stream into the same
    deterministic shard layout via ``foreachBatch`` — the streaming form
    of ``write_training_shards`` and the standard production tail of an
    ingest pipeline (stream in, training-ready parquet out).

    ``foreachBatch`` hands each micro-batch to the BATCH writer, so shard
    assignment (``crc32(id) mod n``) is identical to the offline path and
    a row lands in the same shard directory whichever route it took.

    **Exactly-once**: ``foreachBatch`` alone is at-least-once — after a
    failure/restart the checkpoint replays the last uncommitted batch, and
    a plain parquet append would double-append its rows. The write is
    therefore keyed on ``batch_id``: output is partitioned by
    ``(shard, batch)`` and written with **dynamic partition overwrite**,
    so a replayed batch atomically replaces exactly its own
    ``shard=*/batch=B`` directories instead of appending next to the
    first attempt's rows. Downstream loaders read ``out_dir`` (or one
    ``shard=K/``) recursively and see each row once; the extra ``batch``
    partition column is bookkeeping they may drop.

    Returns the started ``StreamingQuery``; callers drive it
    (``processAllAvailable``/``awaitTermination``) and stop it.
    """
    import tempfile

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="shard_stream_ckpt_")

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_shard_batch(batch_df, batch_id, out_dir, n_shards, id_col)

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_shard_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> None:
    """Idempotent per-batch shard write (the ``foreachBatch`` body of
    ``stream_to_training_shards``, exposed for direct use/testing).

    Dynamic partition overwrite on ``(shard, batch=batch_id)``: re-running
    the same batch replaces its own partition directories, never appends a
    second copy — the property that upgrades foreachBatch's at-least-once
    replay to exactly-once output.
    """
    sharded = batch_df.withColumn(
        "shard",
        (F.crc32(F.col(id_col).cast("string")) % n_shards).cast("int"),
    ).withColumn("batch", F.lit(batch_id))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard", "batch")
        .parquet(out_dir)
    )
