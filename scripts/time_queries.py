#!/usr/bin/env python
"""Time a subset of registry queries: scripts/time_queries.py q1 q2 ...

Same harness shape as bench.py (noop write, shingle/codegen warmup) but
only for the named queries, with N repeats (SPARK_GRAFT_REPEATS, default
1) so per-query deltas can be judged above run-to-run noise.
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must precede the session import: the builder conf reads this env var
# at module import time (same timer-disarm rationale as bench.py — the
# periodic System.gc() must not land inside a timed window)
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "1"))
    spark = get_spark(app_name="cam-etl-time")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
        shingle_postings,
    )

    spark.range(1).count()
    spark.range(8).mapInPandas(lambda it: it, "id long").count()
    _docs = spark.createDataFrame(
        [(i, "warm up the shingle code path, not a benchmark row %d" % i) for i in range(8)],
        "doc_id long, text string",
    )
    shingle_postings(_docs, "doc_id", "text", 3).groupBy("shingle").count().count()

    for r in range(repeats):
        for name in names:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print("[%d] %-40s %.3fs" % (r, name, dt), file=sys.stderr)
            del df
            gc.collect()
            spark._jvm.System.gc()


if __name__ == "__main__":
    main()
