"""The driver-facing workload: one named query per implemented operator
from SURVEY.md §2 (plus the LLM-pipeline extensions), each with a
DuckDB oracle SQL string proving identical semantics.

Conventions (driver compares row-count + schema + order-insensitive
value-hash, sorting columns by name):

- every computed column is aliased identically in the Spark builder
  and the oracle SQL;
- doubles that pass through aggregation are ``ROUND``ed on BOTH sides
  (float summation order differs between engines);
- timestamps are formatted to strings at the output edge (session tz
  pinned to UTC via ``session.tune``);
- no bare ``LIMIT`` without a total order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark_builder, duckdb_oracle) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all_modules() -> None:
    # Import for side effect: each module registers its queries.
    from . import relational  # noqa: F401
    from . import scalars  # noqa: F401
    from . import llm_text  # noqa: F401
    from . import decontam  # noqa: F401
    from . import graph  # noqa: F401
    from . import vocab  # noqa: F401
    from . import llm_similarity  # noqa: F401
    from . import factorization  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import events  # noqa: F401
    from . import geo  # noqa: F401


_load_all_modules()
