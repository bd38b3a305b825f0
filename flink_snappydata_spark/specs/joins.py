"""Join family: star/broadcast/outer/semi/anti/band/non-equi (SURVEY.md §2.3).

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from flink_snappydata_spark.operators import relational

from flink_snappydata_spark.specs.base import (
    _REVENUE_CENTS,
    _cents,
    _register,
)

# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------

_register(
    "star_join_revenue",
    ["lineitem", "orders", "customer", "nation", "region"],
    relational.star_join_revenue,
    f"""
    SELECT r_name AS region_name, n_name AS nation_name,
           SUM({_REVENUE_CENTS}) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY region_name, nation_name
    """,
)

_register(
    "broadcast_dim_join",
    ["lineitem", "part"],
    relational.broadcast_dim_join,
    f"""
    SELECT p_brand,
           SUM({_cents('l_extendedprice')}) / 100.0 AS sum_price,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY p_brand
    """,
)

_register(
    "join_left_outer",
    ["customer", "orders"],
    relational.left_outer_join_counts,
    """
    SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)

_register(
    "join_semi",
    ["customer", "orders"],
    relational.semi_join_customers,
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
    """,
)

_register(
    "join_anti",
    ["customer", "orders"],
    relational.anti_join_customers,
    """
    SELECT c_custkey, c_name, c_nationkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    """,
)

_register(
    "join_band",
    ["customer", "supplier"],
    relational.band_join,
    """
    SELECT c_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM customer JOIN supplier
      ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
    GROUP BY c_nationkey ORDER BY nationkey
    """,
)

_register(
    "join_nonequi",
    ["nation", "region"],
    relational.pure_nonequi_join,
    """
    SELECT n_name, r_name FROM nation JOIN region ON n_regionkey < r_regionkey
    ORDER BY n_name, r_name
    """,
)
