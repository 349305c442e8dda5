"""SPARQL source: JSON result bindings → columnar DataFrames.

The reference consumes SPARQL JSON rows of ``{var: {"value": str}}``
with absent keys for unbound OPTIONAL variables
(``address_etl/pls/tables.py:361-364,409-416``), flattening them in
Python row loops. Here a bindings DataFrame (``map<string,
struct<value:string>>``) is flattened with column expressions —
unbound vars become NULLs naturally (P6), no row loop.

The reference's 750-LoC Jinja2 "query compiler" (VALUES-batch
injection, ``address_etl/pls/queries/*``) disappears: key batching is
a broadcast semi-join (J3) and the graph-pattern joins are DataFrame
joins (J1/J2), so there is no query-size limit and no escaping hazard.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

#: in-flight schema of one SPARQL JSON binding row
BINDING_SCHEMA = MapType(
    StringType(), StructType([StructField("value", StringType(), True)])
)


def bindings_df(spark: SparkSession, rows: Sequence[dict[str, dict[str, str]]]) -> DataFrame:
    """Build a bindings DataFrame from parsed SPARQL JSON rows (the
    shape a live connector would yield per page)."""
    return spark.createDataFrame(
        [(r,) for r in rows], StructType([StructField("binding", BINDING_SCHEMA, False)])
    )


def flatten_bindings(df: DataFrame, variables: Sequence[str], binding_col: str = "binding") -> DataFrame:
    """Flatten ``map<var, struct<value>>`` to one string column per
    variable; absent (OPTIONAL-unbound) vars become NULL."""
    return df.select(
        *[F.col(binding_col).getItem(v).getField("value").alias(v) for v in variables]
    )
