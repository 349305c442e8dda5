#!/usr/bin/env python
"""Run the driver-style parity check for all (or selected) queries at a
given scale factor, reporting row counts and mismatches.

Usage: python scripts/check_parity.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import ORACLES, QUERIES
from tests.parity import compare_frames, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    names = [
        n for n in sorted(QUERIES) if not filters or any(f in n for f in filters)
    ]
    spark = get_spark(app_name="parity-check")
    con = duck_connection(sf_dir)
    failures = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
            if name in ORACLES:
                oracle_pdf = con.execute(ORACLES[name]).fetchdf()
                issues = compare_frames(spark_pdf, oracle_pdf)
            else:
                issues = []
            dt = time.perf_counter() - t0
            status = "OK " if not issues else "FAIL"
            if issues:
                failures += 1
            print(f"{status} {name:36s} rows={len(spark_pdf):>7} {dt:6.2f}s")
            for i in issues:
                print(f"     - {i}")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"ERR  {name:36s} {type(exc).__name__}: {str(exc).splitlines()[0][:160]}")
    print(f"\n{len(names) - failures}/{len(names)} parity-clean at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
