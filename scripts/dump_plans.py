#!/usr/bin/env python
"""Dump ``explain('formatted')`` for registry queries to files.

Usage: python scripts/dump_plans.py OUTDIR [sf_dir] [name ...]

Writes OUTDIR/<query>.txt for each named query (default: all). Used to
produce the plans/r16/<query>_before.txt / _after.txt evidence pairs —
plan capture is driver-only (no job runs), so it is safe to run while
other work is in flight.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES


def main() -> int:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or sorted(QUERIES)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        buf = io.StringIO()
        try:
            df = QUERIES[name](spark, sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # noqa: BLE001
            buf.write(f"ERROR {type(exc).__name__}: {exc}\n")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(name, file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
