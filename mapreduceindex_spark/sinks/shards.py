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
