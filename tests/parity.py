"""Local replica of the driver's DuckDB-oracle comparison: run a
registered Spark query and its oracle SQL on the same sf dir, sort
columns by name and rows by value, and compare exactly.

Used by tests/test_parity.py and the scripts/check_parity.py loop.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif s.dtype == object:
            out[c] = s.map(lambda v: None if v is None else v)
    key = out.apply(lambda r: tuple(str(x) for x in r), axis=1)
    out = out.loc[key.sort_values().index].reset_index(drop=True)
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    issues: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        issues.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return issues
    if len(spark_pdf) != len(oracle_pdf):
        issues.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    # The driver's value hash is dtype-sensitive: an int64 Spark column
    # vs a float64 oracle column (the DuckDB SUM→HUGEINT→float64 trap)
    # hashes differently even when every value compares equal. Mirror
    # that here so the builder-side sweep catches it first.
    for c in a.columns:
        if c not in b.columns:
            issues.append(f"col {c!r}: missing from oracle frame")
            continue
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and {ka, kb} <= {"i", "u", "f"}:
            issues.append(
                f"col {c!r}: numeric dtype kind differs (spark={a[c].dtype} "
                f"oracle={b[c].dtype}) — driver hash would mismatch"
            )
    if len(a) == len(b):
        for c in a.columns:
            sa, sb = a[c], b[c]
            if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
                both_nan = sa.isna() & sb.isna()
                eq = (sa == sb) | both_nan
                if not eq.all():
                    bad = (~eq).idxmax()
                    diff = (sa - sb).abs().max()
                    issues.append(
                        f"col {c!r}: {int((~eq).sum())} value diffs, max abs {diff}, "
                        f"first at row {bad}: spark={sa[bad]!r} oracle={sb[bad]!r}"
                    )
            else:
                sa2 = sa.map(lambda v: None if (isinstance(v, float) and math.isnan(v)) else v)
                sb2 = sb.map(lambda v: None if (isinstance(v, float) and math.isnan(v)) else v)
                neq = [
                    i
                    for i, (x, y) in enumerate(zip(sa2.tolist(), sb2.tolist()))
                    if x != y and not (x is None and y is None)
                ]
                if neq:
                    i = neq[0]
                    issues.append(
                        f"col {c!r}: {len(neq)} value diffs, first at row {i}: "
                        f"spark={sa2[i]!r} oracle={sb2[i]!r}"
                    )
    return issues


def run_parity(spark, name: str, sf_dir: str) -> list[str]:
    from cam_location_addressing_feature_service_etl_spark.workload import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        return [] if spark_pdf is not None else ["query returned None"]
    con = duck_connection(sf_dir)
    oracle_pdf = con.execute(ORACLES[name]).fetchdf()
    return compare_frames(spark_pdf, oracle_pdf)
