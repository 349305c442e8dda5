"""Spark SQL API equivalence: the engine's semantics are reachable via
``spark.sql`` over registered views, not only the DataFrame builders —
the flagship query expressed in pure SQL must produce the identical
result set."""

from __future__ import annotations

from cam_location_addressing_feature_service_etl_spark.tables import load
from cam_location_addressing_feature_service_etl_spark.workload.relational import (
    flagship_current_address,
)
from tests.conftest import SF_SMOKE

FLAGSHIP_SPARK_SQL = """
WITH latest AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
),
excl AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
SELECT concat_ws('/', CAST(l.o_custkey AS STRING), UPPER(n.n_name),
                 CAST(l.o_orderkey AS STRING))   AS addr_key,
       c.c_name                                  AS cust_name,
       UPPER(n.n_name)                           AS nation_name,
       date_format(l.o_orderdate, 'yyyy-MM-dd')  AS latest_order_date,
       ROUND(l.o_totalprice, 2)                  AS latest_total
FROM latest l
JOIN customer c ON c.c_custkey = l.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.rn = 1
  AND NOT EXISTS (SELECT 1 FROM excl e WHERE e.o_custkey = l.o_custkey)
"""


def test_flagship_sql_equals_dataframe(spark):
    for t in ("orders", "customer", "nation"):
        load(spark, SF_SMOKE, t).createOrReplaceTempView(t)
    via_sql = {tuple(r) for r in spark.sql(FLAGSHIP_SPARK_SQL).collect()}
    via_df = {tuple(r) for r in flagship_current_address(spark, SF_SMOKE).collect()}
    assert via_sql == via_df and len(via_df) > 0
