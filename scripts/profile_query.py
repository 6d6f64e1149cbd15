"""Per-query phase profiler: split a query's wall time into BUILD
(the builder call — driver-side plan construction plus any collect()
jobs the builder runs) and EXEC (the noop-sink write of the returned
frame), guide §1-style, so optimization effort lands on the phase that
actually costs.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_query.py q1,q2 [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entrymod
    from mapreduceindex_spark.functions import caching
    from mapreduceindex_spark.session import get_spark

    spark = get_spark(app_name="profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}:{i}")
            t0 = time.time()
            df = fn(spark, SF)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            caching.release_unmemoized()
            spark._jvm.System.gc()
            print(
                f"{name} run{i}: build={t1 - t0:6.2f}s exec={t2 - t1:6.2f}s "
                f"total={t2 - t0:6.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
