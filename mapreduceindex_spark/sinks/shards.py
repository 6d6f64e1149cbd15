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
    a row lands in the same shard directory whichever route it took; each
    batch appends its rows into the shard partitions. Exactly-once comes
    from the checkpoint: a replayed batch overwrites per-batch output
    deterministically rather than double-appending (parquet append +
    idempotent batch ids is the stock Spark recipe).

    Returns the started ``StreamingQuery``; callers drive it
    (``processAllAvailable``/``awaitTermination``) and stop it.
    """
    import tempfile

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="shard_stream_ckpt_")

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        sharded = batch_df.withColumn(
            "shard",
            (F.crc32(F.col(id_col).cast("string")) % n_shards).cast("int"),
        )
        (
            sharded.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", id_col)
            .write.mode("append")
            .partitionBy("shard")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
