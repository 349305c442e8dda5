"""The correctness gate, locally: every registered query must match its
DuckDB oracle on sf0.001 (fast) — the driver repeats this at sf0.01.
"""

from __future__ import annotations

import pytest

from cam_location_addressing_feature_service_etl_spark.workload import ORACLES, QUERIES

from tests.conftest import SF_SMOKE
from tests.parity import run_parity


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    issues = run_parity(spark, name, SF_SMOKE)
    assert not issues, f"{name}: " + "; ".join(issues)


#: queries deliberately registered without an oracle. Empty: even the
#: iterative k-means is covered by unrolling its fixed rounds in SQL.
DECLARED_ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_is_declared():
    no_oracle = set(QUERIES) - set(ORACLES)
    assert no_oracle == DECLARED_ROWS_ONLY, (
        f"queries missing oracles: {sorted(no_oracle - DECLARED_ROWS_ONLY)}"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 5


def test_priority_list_names_are_valid_and_unique():
    """__spark_entry__._PRIORITY drives the driver's 50-query sampling
    prefix: a typo'd or stale name silently shrinks driver coverage."""
    import __spark_entry__ as e

    names = e._PRIORITY
    assert len(names) == len(set(names)), "duplicate names in _PRIORITY"
    unknown = [n for n in names if n not in e.queries()]
    assert unknown == [], f"_PRIORITY names not in registry: {unknown}"
    # every oracle key is a registered query, and ordering round-trips
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert list(o) == [n for n in q if n in o]
