"""Shared benchmark-session warmup and per-query timing loop, used by
``bench.py`` and ``scripts/time_queries.py`` so the two harnesses
cannot drift apart.

The warmup exercises every one-time cost that is not query work: JVM /
whole-stage-codegen JIT for each expression family the workload
compiles to, parquet listing + the vectorized reader, and the Python
worker pool. Without it the alphabetically FIRST query of each family
absorbs several seconds of JIT that is not that query's cost.

GC discipline: callers must set ``SPARK_GRAFT_PERIODIC_GC`` BEFORE
importing ``session`` (the builder conf reads it at import time) so the
periodic System.gc() timer cannot land a full-GC pause inside a timed
window; ``timed_noop_run`` instead GCs explicitly BETWEEN windows,
which also lets the ContextCleaner free dead localCheckpoint blocks
promptly (they otherwise pile up and surface as ±2s per-query noise).
"""

from __future__ import annotations

import gc
import os
import time

from pyspark.sql import SparkSession


def warm_session(spark: SparkSession, sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .operators.dedup import shingle_postings

    # JVM/codegen, parquet reader, Python worker pool
    spark.range(1).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(8).mapInPandas(lambda it: it, "id long").count()
    # explode + window + join + aggregate family
    _w = spark.range(100).select(
        (F.col("id") % 7).alias("k"),
        F.explode(F.array(F.lit("a"), F.lit("b"))).alias("t"),
    )
    _w.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("t"))
    ).join(_w.groupBy("k").agg(F.count(F.lit(1)).alias("c")), "k").groupBy("t").agg(
        F.sum("c")
    ).count()
    # array transform + nested posexplode + decimal aggregate + set ops
    # (the embedding linear-algebra and shingle-set shapes)
    _a = spark.range(50).select(
        "id",
        F.transform(F.sequence(F.lit(1), F.lit(4)), lambda i: i * F.col("id")).alias(
            "xs"
        ),
    )
    _e = _a.select("id", F.posexplode("xs").alias("i", "x"), F.col("xs").alias("ys"))
    _e.select("id", "i", "x", F.posexplode("ys").alias("j", "y")).groupBy("i", "j").agg(
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("g")
    ).count()
    _a.select(F.size(F.array_intersect("xs", "xs")).alias("s")).groupBy("s").agg(
        F.collect_set("s")
    ).count()
    # tokenize/shingle pipeline (regex clean + split + n-gram + explode)
    _docs = spark.createDataFrame(
        [
            (i, "warm up the shingle code path, not a benchmark row %d" % i)
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    shingle_postings(_docs, "doc_id", "text", 3).groupBy("shingle").count().count()


def timed_noop_run(spark: SparkSession, fn, sf_dir: str) -> float:
    """Run one query end-to-end (noop write = full materialization, no
    driver collect), GC between timed windows, return seconds.

    The plan refs retained by ``runtime.materialize`` (they keep lazy
    checkpoints' SQLMetrics accumulators registered until the action
    has executed the subtree — see ``runtime._PLAN_REFS``) are released
    AFTER the action and BEFORE the forced GC, so a 195-query run
    neither floods the log with benign non-existent-accumulator ERRORs
    nor accumulates retained plans across queries."""
    from .runtime import release_plan_refs

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    del df
    release_plan_refs()
    gc.collect()
    spark._jvm.System.gc()
    return dt
