#!/usr/bin/env python
"""Benchmark harness: run the workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full column
materialization, no driver collect overhead). Per-query wall time
includes plan + execution, mirroring a cold analytic query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Disarm the periodic-GC timer BEFORE importing session.py: its builder
# conf reads this env var at module import time, so setting it inside
# main() (after the import) would silently keep the 2min default and the
# timer's System.gc() could land a multi-second full-GC pause inside one
# query's timed window. GC runs explicitly between queries instead.
os.environ.setdefault("SPARK_GRAFT_PERIODIC_GC", "60min")

from cam_location_addressing_feature_service_etl_spark.session import get_spark
from cam_location_addressing_feature_service_etl_spark.workload import QUERIES

#: Queries timed by the bench. Everything registered runs; the heavy
#: quadratic verifiers (simhash pair scan, embedding all-pairs) stay in
#: because they are part of the claimed surface — their scale path is
#: documented in the operator modules.
SKIP: set[str] = set()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # The JSON result line must be the ONLY stdout line. Spark's JVM
    # writes to fd 1 directly (ivy, log4j console), so swap fd 1 → fd 2
    # at the OS level for the whole run and restore it just for the
    # final print.
    real_stdout_fd = os.dup(1)
    os.dup2(2, 1)
    try:
        spark = get_spark(app_name="cam-etl-bench")
        spark.sparkContext.setLogLevel("ERROR")

        timings: dict[str, float] = {}
        # Warm session infrastructure so the first measured queries don't
        # absorb one-time costs that aren't query work: JVM/codegen
        # (range), parquet listing + vectorized reader (smallest table),
        # and the Python worker pool (trivial mapInPandas).
        spark.range(1).count()
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        spark.range(8).mapInPandas(lambda it: it, "id long").count()
        # generic whole-stage-codegen warmup (explode + window + join +
        # aggregate on a tiny frame): without it the alphabetically
        # first query of each expression family absorbs several seconds
        # of one-time JIT that is not that query's work
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        _w = spark.range(100).select(
            (F.col("id") % 7).alias("k"), F.explode(F.array(F.lit("a"), F.lit("b"))).alias("t")
        )
        _w.withColumn("rn", F.row_number().over(Window.partitionBy("k").orderBy("t"))).join(
            _w.groupBy("k").agg(F.count(F.lit(1)).alias("c")), "k"
        ).groupBy("t").agg(F.sum("c")).count()
        # second warmup family: array transform + nested posexplode +
        # decimal aggregate + set ops (the shapes the embedding
        # linear-algebra and shingle-set queries compile to)
        _a = spark.range(50).select(
            "id", F.transform(F.sequence(F.lit(1), F.lit(4)), lambda i: i * F.col("id")).alias("xs")
        )
        _e = _a.select("id", F.posexplode("xs").alias("i", "x"), F.col("xs").alias("ys"))
        _e.select("id", "i", "x", F.posexplode("ys").alias("j", "y")).groupBy("i", "j").agg(
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("g")
        ).count()
        _a.select(F.size(F.array_intersect("xs", "xs")).alias("s")).groupBy("s").agg(
            F.collect_set("s")
        ).count()
        # third warmup family: the tokenize/shingle pipeline (regex
        # clean + split + filter + n-gram transform + explode) that
        # every dedup/text query compiles to — otherwise the
        # alphabetically first of that family pays its JIT
        from cam_location_addressing_feature_service_etl_spark.operators.dedup import (
            shingle_postings,
        )

        _docs = spark.createDataFrame(
            [(i, "warm up the shingle code path, not a benchmark row %d" % i) for i in range(8)],
            "doc_id long, text string",
        )
        shingle_postings(_docs, "doc_id", "text", 3).groupBy("shingle").count().count()

        import gc

        for name in sorted(QUERIES):
            if name in SKIP:
                continue
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            # Drop the query's DataFrame refs and collect NOW: the
            # iterative operators localCheckpoint intermediate RDDs,
            # whose storage blocks are only unpersisted once the Python
            # object dies and the JVM ContextCleaner notices. With a
            # large heap the JVM may not GC for many queries, so blocks
            # pile up and later queries absorb erratic GC pauses —
            # measured as ±2s per-query noise across bench runs. The
            # explicit JVM System.gc() moves full-GC pauses BETWEEN
            # timed windows (the periodic-GC timer is disarmed above)
            # and lets the ContextCleaner free dead checkpoint blocks
            # promptly.
            del df
            gc.collect()
            spark._jvm.System.gc()
    finally:
        sys.stdout.flush()
        os.dup2(real_stdout_fd, 1)
        os.close(real_stdout_fd)

    total = round(sum(timings.values()), 3)
    full = json.dumps(
        {
            "metric": "workload_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        },
        separators=(",", ":"),
    )
    # durable full record (all per-query timings) on disk only
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo_dir, "BENCH.json"), "w") as f:
        f.write(full + "\n")
    # stdout line stays compact: the driver keeps only a short capture
    # tail, so the FULL per-query map lives in BENCH.json and the stdout
    # "queries" map carries just the 5 slowest (same contract shape).
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    compact = json.dumps(
        {
            "metric": "workload_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "sf": sf,
            "n_queries": len(timings),
            "queries_file": "BENCH.json",
        },
        separators=(",", ":"),
    )
    print(compact)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
