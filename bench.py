"""Engine benchmark — runs the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing methodology (BASELINE.md): steady-state query wall time with the
Spark session amortized — the JVM+Python startup (~10 s) exceeds the
reference's entire runtime, so each query is timed as the wall time of a
``noop``-sink write (full compute + exchange, no driver collect). A
``ref_corpus_index`` entry additionally reproduces the reference's own
workload (355-file corpus → inverted index → 26 letter files) for a
like-for-like number against BASELINE.md's 12.06 s (M=1,R=1) / 1.35 s
(M=4,R=4).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _time_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from mapreduceindex_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # JVM/JIT warm-up with the hot code paths (parquet scan, explode,
    # regexp, hash agg) at the smallest SF, so the first timed query
    # measures steady state, not compiler start-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        from mapreduceindex_spark.operators.inverted_index import (
            inverted_index_flat,
        )
        from mapreduceindex_spark.session import load_table

        inverted_index_flat(
            load_table(spark, "/root/testdata/sf0.001", "documents")
        ).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    except Exception:
        pass  # warm-up is best-effort; timings just run colder

    # Per-query median of N runs: single-run wall times on this box vary
    # ±30%, which would swamp round-over-round deltas; the median of 3 is
    # stable enough to compare against BASELINE.md and prior rounds.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def _run_once(fn) -> float:
        t0 = time.time()
        df = fn(spark, sf_dir)
        _time_noop(df)
        dt = time.time() - t0
        # steady-state isolation: drop caches persisted inside query builders
        # and nudge the collector, so a run never pays a predecessor's
        # memory footprint, inherited GC debt, or a warm persisted cache
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        return dt

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, fn in entrymod.queries().items():
        # one discarded warm-up run per query: the first execution pays
        # codegen compilation + cold file footers (measured 3-4× steady
        # state); BASELINE.md's comparable quantity is steady-state query
        # time, so the median is over post-warm-up runs only
        runs = [_run_once(fn) for _ in range(n_runs + 1)][1:]
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    # Reference-workload anchor: full pipeline on the reference's large
    # fixture, including the 26-letter-file write (what BASELINE.md times).
    ref_manifest = "/root/reference/checker/test.txt"
    if os.path.exists(ref_manifest):
        from mapreduceindex_spark.operators.inverted_index import inverted_index
        from mapreduceindex_spark.sinks.letter_sink import write_letter_files
        from mapreduceindex_spark.sources.manifest import corpus_from_manifest

        def _ref_once() -> float:
            out = tempfile.mkdtemp(prefix="bench_letters_")
            t0 = time.time()
            # ordered=False: the letter sink sorts within letter partitions
            # itself, so the flagship's global range-sort stage is dead
            # weight.
            write_letter_files(
                inverted_index(
                    corpus_from_manifest(spark, ref_manifest), ordered=False
                ),
                out,
            )
            dt = time.time() - t0
            shutil.rmtree(out, ignore_errors=True)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            return dt

        runs = [_ref_once() for _ in range(n_runs)]
        timings["ref_corpus_index"] = round(statistics.median(runs), 3)
        spread["ref_corpus_index"] = [round(min(runs), 3), round(max(runs), 3)]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs_per_query": n_runs,
                "spread": spread,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
