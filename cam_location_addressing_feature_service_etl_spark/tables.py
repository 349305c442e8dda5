"""Testdata / snapshot table access.

The reference restores state by locating the *latest* snapshot key on
S3 (descending-lex sort, ``address_etl/s3.py:37-46,111-121``) and
attaching it. Here the equivalent is a partitioned parquet snapshot
directory (``snapshot.py``); for query inputs we read the driver's
parquet tables.

Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown + column pruning: a downstream ``select``/``filter`` reaches
the scan (verify with ``df.explain('formatted')`` → ``PushedFilters``
/ ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: tables whose queries are dominated by per-row compute (tokenize /
#: shingle / vector math) rather than shuffle — worth widening a
#: narrow scan for (see ``_widen_narrow_scan``).
_COMPUTE_HEAVY = {"documents", "embeddings"}


def _widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Repartition a scan UP to the session's parallelism when the
    file layout gives fewer tasks than cores.

    Parquet splits at row-group granularity, so a small single-file
    table (one row group) is one task no matter how many cores exist —
    and the expensive per-row work downstream (regex tokenization,
    shingling, embedding arithmetic) runs single-threaded. Measured at
    sf0.1/local[32]: shingle-postings materialization 2.8s → sub-second
    after widening a 1-partition documents scan.

    Scale behavior: at 100 TB the scan already has thousands of
    splits, the partition count exceeds ``defaultParallelism``, and
    this is a no-op — no extra shuffle on the big-data path. Catalyst
    still pushes filters and prunes columns through Repartition, so
    scan pushdown is unaffected.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Never caches: each query should form a
    single scan-to-result plan so pushdown happens per-query."""
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name in _COMPUTE_HEAVY:
        df = _widen_narrow_scan(df)
    if name == "events":
        # ts arrives either as parquet TIMESTAMP(NANOS) read as long
        # (nanosAsLong — integer-divide to µs; double division would
        # lose precision past 2^53) or already as a µs timestamp,
        # depending on the generator's parquet writer version. Accept
        # both so the engine is schema-adaptive like the reference's
        # layer probe (address_etl/geocode.py:148-187).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # session tz is pinned UTC (session.py), so NTZ→LTZ keeps
            # the same instant the nanos path produced; downstream
            # unix_millis/unix_micros require the LTZ type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TESTDATA_TABLES}
