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
