#!/usr/bin/env python
"""Dispersion-policy probe: quantify the read-amplification the
adaptive ``compact_dispersion`` policy exists to bound.

Folds a long run of small ER-registry batches (each touching a
different key subset, the pattern that DISPERSES bucket ownership one
version per fold) twice:

- variant A: no compaction — owner versions accumulate without bound;
- variant B: ``compact_dispersion=8`` — a fold whose prior manifest
  already references >= 8 owner versions force-rewrites all live
  buckets.

Every 8 folds, measures the full-state stitch (read_latest_partitioned
+ count, min of 2) and reports the manifest's distinct-owner count,
live version-dir count, and cumulative bytes written. The claim under
test: stitch time grows with OWNER COUNT (one file-listing + footer
round per owner version), and the policy holds it flat for a bounded,
periodic full-rewrite cost.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from pyspark.sql import functions as F

from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.streaming.er import (
    fold_master_batch,
    read_registry,
)

_FOLDS = 33
_BATCH = 30
_BUCKETS = 256
_PROBE_EVERY = 8


def _batch(spark, b):
    """30 names unique to fold b — every fold touches fresh buckets,
    the worst-case dispersion pattern."""
    return spark.range(_BATCH).select(
        (F.lit(b * 1000) + F.col("id")).cast("long").alias("mk"),
        F.concat(
            F.lit(f"batch{b} name "), F.col("id").cast("string")
        ).alias("mn"),
    )


def _dir_bytes(d):
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _owners(state_dir):
    versions = sorted(
        int(n.split("=")[1])
        for n in os.listdir(state_dir)
        if n.startswith("v=")
        and os.path.exists(os.path.join(state_dir, n, "manifest.json"))
    )
    with open(os.path.join(state_dir, f"v={versions[-1]}", "manifest.json")) as f:
        man = json.load(f)
    return len({int(o) for o in man["pids"].values()}), len(versions)


def main() -> int:
    spark = get_spark(app_name="dispersion-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/spark-graft-dispersion"
    shutil.rmtree(base, ignore_errors=True)
    for label, kwargs in (
        ("no-compaction", {}),
        ("dispersion=8", {"compact_dispersion": 8}),
    ):
        d = f"{base}/{label.replace('=', '')}"
        print(f"--- {label} ---")
        written_before = 0
        for b in range(_FOLDS):
            fold_master_batch(
                _batch(spark, b), b, d, num_buckets=_BUCKETS,
                retain_versions=3, **kwargs,
            )
            if b % _PROBE_EVERY == _PROBE_EVERY - 1 or b == _FOLDS - 1:
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = read_registry(spark, d).count()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                owners, vdirs = _owners(d)
                total_b = _dir_bytes(d)
                print(
                    f"fold={b:>3} rows={n:>5} owners={owners:>3} "
                    f"vdirs={vdirs:>3} stitch={best:5.2f}s "
                    f"disk={total_b/1e6:6.2f}MB "
                    f"(+{(total_b - written_before)/1e6:5.2f}MB)"
                )
                written_before = total_b
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
