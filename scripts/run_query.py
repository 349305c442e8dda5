#!/usr/bin/env python
"""Run any registry query by name against a testdata scale dir.

Usage:
  python scripts/run_query.py <query_name> [--sf DIR] [--rows N]
                              [--explain] [--oracle]

  --sf DIR     testdata dir (default /root/testdata/sf0.01)
  --rows N     show N rows (default 20)
  --explain    print the formatted physical plan instead of rows
  --oracle     also run the DuckDB oracle and report the parity verdict
  --list       list all registered query names and exit
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import ORACLES, QUERIES


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name", nargs="?")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--rows", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    if args.list or not args.name:
        for n in sorted(QUERIES):
            mark = " " if n in ORACLES else "*"  # * = rows-only check
            print(f"{mark} {n}")
        return 0

    if args.name not in QUERIES:
        hits = [n for n in sorted(QUERIES) if args.name in n]
        if len(hits) == 1:
            args.name = hits[0]
        else:
            print(f"unknown query {args.name!r}" + (f"; matches: {hits}" if hits else ""))
            return 2

    spark = get_spark(app_name="run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.name](spark, args.sf)

    if args.explain:
        df.explain("formatted")
        return 0

    df.show(args.rows, truncate=False)
    print(f"-- {df.count()} rows from {args.name} at {args.sf}")

    if args.oracle and args.name in ORACLES:
        from tests.parity import compare_frames, duck_connection

        issues = compare_frames(
            df.toPandas(), duck_connection(args.sf).execute(ORACLES[args.name]).fetchdf()
        )
        print("-- oracle:", "MATCH" if not issues else f"MISMATCH {issues}")
        return 1 if issues else 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
