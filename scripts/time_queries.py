#!/usr/bin/env python
"""Time a subset of registry queries: scripts/time_queries.py q1 q2 ...

Same harness as bench.py (shared warmup + timing loop in
``cam_location_addressing_feature_service_etl_spark.benchwarm``) but
only for the named queries, with N repeats (SPARK_GRAFT_REPEATS,
default 1) so per-query deltas can be judged above run-to-run noise.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must precede the session import: the builder conf reads this env var
# at module import time (same timer-disarm rationale as bench.py — the
# periodic System.gc() must not land inside a timed window)
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from cam_location_addressing_feature_service_etl_spark.benchwarm import (
    timed_noop_run,
    warm_session,
)
from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "1"))
    spark = get_spark(app_name="cam-etl-time")
    spark.sparkContext.setLogLevel("ERROR")
    warm_session(spark, sf_dir)

    for r in range(repeats):
        for name in names:
            dt = timed_noop_run(spark, QUERIES[name], sf_dir)
            print("[%d] %-40s %.3fs" % (r, name, dt), file=sys.stderr)


if __name__ == "__main__":
    main()
