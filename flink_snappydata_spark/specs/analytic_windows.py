"""Analytic window functions: rank/running-sum/lag-lead/frames/pivot (SURVEY.md §2.5).

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_snappydata_spark.operators import analytic
from flink_snappydata_spark.operators import relational

from flink_snappydata_spark.specs.base import (
    _cents,
    _register,
)

# ---------------------------------------------------------------------------
# Analytic window functions (SURVEY.md §2.5)
# ---------------------------------------------------------------------------

_register(
    "window_rank",
    ["customer"],
    analytic.rank_customers_in_nation,
    """
    SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
               RANK() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        FROM customer) t
    WHERE rn <= 3 ORDER BY c_nationkey, rn
    """,
)

_register(
    "window_running_sum",
    ["orders"],
    analytic.running_order_totals,
    f"""
    SELECT o_custkey, o_orderkey,
           SUM({_cents('o_totalprice')}) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
               AS running_total,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
               AS order_seq
    FROM orders
    """,
)

_register(
    "window_distribution",
    ["customer"],
    analytic.distribution_functions,
    """
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
    doc="Distribution windows: ntile / percent_rank / cume_dist.",
)

_register(
    "window_lag_lead",
    ["orders"],
    analytic.lag_lead_order_prices,
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice, 1) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
               AS prev_price,
           LEAD(o_totalprice, 1) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
               AS next_price
    FROM orders
    """,
)

_register(
    "window_range_frame",
    ["orders"],
    analytic.trailing_revenue_30d,
    f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           SUM({_cents('o_totalprice')}) OVER (
               PARTITION BY o_custkey
               ORDER BY datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE))
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) / 100.0 AS trailing_30d
    FROM orders
    """,
    doc="RANGE frame over event time: trailing-30-day spend per order.",
)

_register(
    "pivot_revenue",
    ["lineitem"],
    relational.pivot_revenue,
    f"""
    SELECT l_returnflag,
           SUM(CASE WHEN l_linestatus = 'F'
                    THEN {_cents('l_extendedprice')} END) / 100.0 AS sum_price_f,
           SUM(CASE WHEN l_linestatus = 'O'
                    THEN {_cents('l_extendedprice')} END) / 100.0 AS sum_price_o
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="groupBy().pivot() with explicit values (single-pass, stable schema).",
)
