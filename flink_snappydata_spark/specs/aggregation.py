"""Aggregation battery: distinct/rollup/cube/having/grouping-sets + subquery (SURVEY.md §2.4).

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession

from flink_snappydata_spark.catalog import load_table
from flink_snappydata_spark.functions import scalar
from flink_snappydata_spark.operators import relational

from flink_snappydata_spark.specs.base import (
    QUERIES,
    QuerySpec,
    _cents,
    _register,
)

_register(
    "agg_distinct",
    ["orders"],
    relational.agg_distinct,
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)

_register(
    "agg_rollup",
    ["lineitem"],
    relational.agg_rollup,
    f"""
    SELECT l_returnflag, l_linestatus,
           SUM({_cents('l_quantity')}) / 100.0 AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)

_register(
    "agg_cube",
    ["orders"],
    relational.agg_cube,
    f"""
    SELECT o_orderstatus, o_orderpriority,
           SUM({_cents('o_totalprice')}) / 100.0 AS sum_total,
           COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)

_register(
    "agg_having",
    ["orders"],
    relational.agg_having,
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           SUM({_cents('o_totalprice')}) / 100.0 AS sum_total
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    ORDER BY o_custkey
    """,
    doc="Grouped agg + HAVING post-aggregation filter.",
)

_register(
    "agg_grouping_sets",
    ["orders"],
    relational.agg_grouping_sets,
    f"""
    SELECT o_orderstatus, o_orderpriority,
           SUM({_cents('o_totalprice')}) / 100.0 AS sum_total,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)


#: Correlated scalar subqueries, decorrelated by Catalyst into joins.
#: Threshold test in exact integer cents (cents*n > sum_cents) so both
#: engines pick identical boundary rows.
_SUBQUERY_SQL = f"""
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer c
    WHERE {_cents('c_acctbal')}
          * (SELECT COUNT(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT SUM({_cents('c2.c_acctbal')}) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c_custkey
"""


def _subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance — correlated
    scalar subqueries through Catalyst's decorrelation (the reference
    delegated all such SQL to its store, SnappyDataInputFormat.java:49)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SUBQUERY_SQL)


QUERIES["subquery_above_nation_avg"] = QuerySpec(
    fn=_subquery_above_nation_avg,
    oracle=_SUBQUERY_SQL,
    doc="Correlated scalar subqueries (exact integer-cents threshold).",
)
