"""Checkpointed restart: streaming state must survive a stop/relaunch.

The conclusive shape: phase 1 drains file A into a checkpointed stateful
aggregate, then file A is DELETED (source retention expiry) before phase
2 adds file B and relaunches from the same checkpoint. The final
complete-mode result can only contain A's contributions if they were
recovered from the state store — recomputation is impossible, the bytes
are gone. This is the deployment property the in-memory correctness
harness (fresh query per run) deliberately skips.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _dedup_agg(stream):
    # same expressions as streaming_exact_dedup (pipelines.py)
    return (
        stream.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def test_streaming_state_survives_restart(spark, tmp_path):
    from mapreduceindex_spark.session import load_table
    from mapreduceindex_spark.streaming.pipelines import _run_to_table

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def add_file(df, tag):
        stage = tmp_path / f"stage_{tag}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.copy(part, src / f"{tag}.parquet")

    def run():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        return {
            r.content_hash: (r.keep_doc_id, r.n_copies)
            for r in _run_to_table(
                _dedup_agg(stream), "complete", checkpoint_dir=ckpt
            ).collect()
        }

    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    add_file(half_a, "a")
    r1 = run()
    expected_a = {
        r.content_hash: (r.keep_doc_id, r.n_copies)
        for r in _dedup_agg(half_a).collect()
    }
    assert r1 == expected_a

    # retention expiry: A's bytes vanish before the restart
    (src / "a.parquet").unlink()
    add_file(half_b, "b")
    r2 = run()

    expected_full = {
        r.content_hash: (r.keep_doc_id, r.n_copies)
        for r in _dedup_agg(docs).collect()
    }
    assert r2 == expected_full, (
        "restarted query lost phase-1 state (A was deleted, so its "
        "contributions can only come from the recovered state store)"
    )
    # and the A-only keys specifically rode through the restart
    a_only = set(expected_a) - {
        r.content_hash for r in _dedup_agg(half_b).collect()
    }
    assert a_only and all(h in r2 for h in a_only)


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """The eviction contract that bounds streaming state, proven on the
    emitted data: an append-mode windowed count with a 10-minute
    watermark finalizes a window once the (checkpointed) watermark
    passes its end — a row for that window arriving in a LATER batch
    must be dropped, even though the batch twin counts it. Run 1 drains
    events that push the watermark past the first window; run 2 adds a
    late row for that window plus a fresh row; run 3 adds one more so
    run 2's windows emit. The first window's count stays 1."""
    import datetime as dt

    def ts(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    schema = "id long, ts timestamp"
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def add_file(rows, tag):
        stage = tmp_path / f"stage_{tag}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.copy(part, src / f"{tag}.parquet")

    def agg(frame):
        return (
            frame.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_timestamp("w.start").alias("start"), "n")
        )

    # a FILE sink: the memory sink cannot recover an append-mode
    # checkpoint, and the parquet sink also accumulates every run's
    # emissions in one place
    out = str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            agg(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def epoch(h, m):
        return int(
            ts(h, m).replace(tzinfo=dt.timezone.utc).timestamp()
        )

    add_file([(1, ts(10, 0)), (2, ts(10, 30))], "a")
    run()  # watermark -> 10:20, past [10:00, 10:10)
    add_file([(3, ts(10, 5)), (4, ts(11, 0))], "b")  # id 3 is LATE
    run()
    add_file([(5, ts(12, 0))], "c")
    run()
    emitted = {r.start: r.n for r in spark.read.parquet(out).collect()}

    # the late row (10:05) was dropped: its window emitted exactly 1
    assert emitted[epoch(10, 0)] == 1
    # ...while run 2's fresh row WAS processed (its window emitted)
    assert emitted[epoch(11, 0)] == 1
    # and the batch twin over the same bytes counts the late row
    batch = {
        r.start: r.n
        for r in agg(spark.read.parquet(str(src))).collect()
    }
    assert batch[epoch(10, 0)] == 2
