"""TPC-H query shapes q1-q22 (SURVEY.md §2.4 scan/join/agg parity).

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_snappydata_spark.functions import scalar
from flink_snappydata_spark.operators import grouped
from flink_snappydata_spark.operators import relational

from flink_snappydata_spark.specs.base import (
    _REVENUE_CENTS,
    _cents,
    _register,
)

# ---------------------------------------------------------------------------
# Aggregation (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

_register(
    "q1_pricing_summary",
    ["lineitem"],
    relational.pricing_summary,
    f"""
    SELECT l_returnflag, l_linestatus,
           SUM({_cents('l_quantity')}) / 100.0 AS sum_qty,
           SUM({_cents('l_extendedprice')}) / 100.0 AS sum_base_price,
           SUM({_REVENUE_CENTS}) / 10000.0 AS sum_disc_price,
           SUM({_cents('l_extendedprice')} * (100 - {_cents('l_discount')})
               * (100 + {_cents('l_tax')})) / 1000000.0 AS sum_charge,
           SUM({_cents('l_quantity')}) / 100.0 / COUNT(*) AS avg_qty,
           SUM({_cents('l_extendedprice')}) / 100.0 / COUNT(*) AS avg_price,
           SUM({_cents('l_discount')}) / 100.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Flagship TPC-H-Q1-style pricing summary (groupBy+sum parity).",
)

_register(
    "q6_forecast_revenue",
    ["lineitem"],
    relational.q6_forecast_revenue,
    f"""
    SELECT SUM({_cents('l_extendedprice')} * {_cents('l_discount')}) / 10000.0
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND {_cents('l_discount')} BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
    doc="TPC-H-Q6-style filter+agg (full predicate pushdown; exact "
        "integer discount band).",
)

_register(
    "q3_shipping_priority",
    ["lineitem", "orders", "customer"],
    relational.q3_shipping_priority,
    f"""
    SELECT l_orderkey, o_orderdate,
           SUM({_REVENUE_CENTS}) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H-Q3-style shipping priority: selective joins -> grouped "
        "revenue -> top-k.",
)

_register(
    "q4_order_priority",
    ["orders", "lineitem"],
    relational.q4_order_priority,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H-Q4-style EXISTS correlated subquery -> semi join -> "
        "grouped count (fixture predicate: has a returned line item).",
)

_register(
    "q18_large_volume_customer",
    ["customer", "orders", "lineitem"],
    relational.q18_large_volume_customer,
    f"""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           SUM({_cents('l_quantity')}) / 100.0 AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM({_cents('l_quantity')}) > 15000)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    doc="TPC-H-Q18-style double aggregation: IN subquery over grouped "
        "HAVING, re-aggregated across the 3-way join, top-k.",
)

_register(
    "q5_local_supplier_volume",
    ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    relational.q5_local_supplier_volume,
    f"""
    SELECT n_name, SUM({_REVENUE_CENTS}) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    doc="TPC-H-Q5-style local supplier volume: 6-way join with the "
        "customer-nation = supplier-nation colocation clause.",
)

_register(
    "q7_volume_shipping",
    ["lineitem", "supplier", "orders", "customer", "nation"],
    relational.q7_volume_shipping,
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           SUM({_REVENUE_CENTS}) / 10000.0 AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H-Q7-style volume shipping between two nations "
        "(disjunctive nation-pair filter, per-year grouping).",
)

_register(
    "q10_returned_items",
    ["customer", "orders", "lineitem", "nation"],
    relational.q10_returned_items,
    f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           SUM({_REVENUE_CENTS}) / 10000.0 AS revenue
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H-Q10-style returned-item reporting: quarterly return "
        "revenue per customer, deterministic top-20.",
)

_register(
    "q12_priority_shipping",
    ["orders", "lineitem"],
    relational.q12_priority_shipping,
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H-Q12-style two-bucket CASE aggregation over a fact-fact "
        "join (l_linestatus stands in for the absent l_shipmode).",
)

_register(
    "q14_promo_revenue",
    ["lineitem", "part"],
    relational.q14_promo_revenue,
    f"""
    SELECT 100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                            THEN {_REVENUE_CENTS} ELSE 0 END)
               / SUM({_REVENUE_CENTS}) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H-Q14-style promotion revenue share (exact integer-cent "
        "sums; single-row ratio).",
)

_register(
    "q15_top_supplier",
    ["lineitem", "supplier"],
    relational.q15_top_supplier,
    f"""
    WITH rev AS (
        SELECT l_suppkey, SUM({_REVENUE_CENTS}) AS total_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_c / 10000.0 AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_c = (SELECT MAX(total_c) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H-Q15-style top supplier: revenue view + scalar MAX "
        "subquery, exact-cents equality.",
)

_register(
    "q16_supplier_part_count",
    ["part", "lineitem", "supplier"],
    relational.q16_supplier_part_count,
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    doc="TPC-H-Q16-style supplier count by part attributes with NOT IN "
        "exclusion (lineitem routes stand in for partsupp).",
)

_register(
    "q19_discounted_revenue",
    ["lineitem", "part"],
    relational.q19_discounted_revenue,
    f"""
    SELECT SUM({_REVENUE_CENTS}) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H-Q19-style disjunctive-predicate revenue (OR of three "
        "brand/size/quantity conjunctions over the part join).",
)

_register(
    "q21_waiting_supplier",
    ["supplier", "lineitem", "orders"],
    relational.q21_waiting_supplier,
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
    doc="TPC-H-Q21-style waiting supplier: EXISTS + NOT EXISTS pair, "
        "decorrelated Spark-side into one per-order aggregation.",
)

_register(
    "q22_global_sales_opportunity",
    ["customer", "orders"],
    relational.q22_global_sales_opportunity,
    f"""
    SELECT c_nationkey, COUNT(*) AS numcust,
           SUM({_cents('c_acctbal')}) / 100.0 AS totacctbal
    FROM customer
    WHERE {_cents('c_acctbal')}
              * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT SUM({_cents('c_acctbal')}) FROM customer
             WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="TPC-H-Q22-style global sales opportunity: above-average "
        "balance via exact cross-multiplied cents, anti join on recent "
        "orders, per-nation rollup.",
)

_register(
    "q8_market_share",
    ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"],
    relational.q8_market_share,
    f"""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                         THEN {_REVENUE_CENTS} ELSE 0 END) AS DOUBLE)
               / SUM({_REVENUE_CENTS}) AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H-Q8-style national market share: conditional-sum ratio of "
        "exact cents per year across a 7-table join.",
)

_register(
    "q9_product_profit",
    ["lineitem", "part", "supplier", "orders", "nation"],
    relational.q9_product_profit,
    f"""
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           SUM({_cents('l_extendedprice')} * (100 - {_cents('l_discount')})
               - {_cents('p_retailprice')} * {_cents('l_quantity')})
               / 10000.0 AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    ORDER BY nation ASC, o_year DESC
    """,
    doc="TPC-H-Q9-style product profit by supplier nation and year "
        "(retailprice*quantity stands in for absent ps_supplycost).",
)

_register(
    "q20_excess_suppliers",
    ["supplier", "lineitem"],
    relational.q20_excess_suppliers,
    f"""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM({_cents('l_quantity')}) AS BIGINT) AS ps_qty_c
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ) ps
        JOIN (
            SELECT l_partkey AS pk,
                   CAST(SUM({_cents('l_quantity')}) AS BIGINT) AS total_qty_c
            FROM lineitem GROUP BY l_partkey
        ) t ON l_partkey = pk
        WHERE ps_qty_c * 2 > total_qty_c
    )
    ORDER BY s_suppkey
    """,
    doc="TPC-H-Q20-style nested-IN supplier selection: suppliers "
        "shipping more than half of some part's volume (exact integer "
        "half-threshold).",
)

_register(
    "q11_important_stock",
    ["lineitem"],
    relational.q11_important_stock,
    f"""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(SUM({_cents('l_extendedprice')}) AS BIGINT) AS value_c
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, value_c / 100.0 AS part_value
    FROM per_part
    WHERE value_c * 10000 >
          (SELECT CAST(SUM({_cents('l_extendedprice')}) AS BIGINT)
           FROM lineitem)
    ORDER BY part_value DESC, l_partkey ASC
    """,
    doc="TPC-H-Q11-style important stock: grouped HAVING against a "
        "global scalar fraction, exact integer cross-multiplied "
        "threshold (lineitem value stands in for partsupp stock).",
)

_register(
    "q2_min_cost_supplier",
    ["part", "supplier", "lineitem", "nation", "region"],
    relational.q2_min_cost_supplier,
    """
    WITH routes AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), euro AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), offers AS (
        SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name
        FROM routes
        JOIN euro ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        WHERE p_size = 15
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM offers o
    WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM offers i
                       WHERE i.p_partkey = o.p_partkey)
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
    """,
    doc="TPC-H-Q2-style minimum-cost supplier: correlated MIN per part "
        "decorrelated to one aggregation (DISTINCT lineitem routes + "
        "s_acctbal stand in for partsupp).",
)

_register(
    "q13_customer_distribution",
    ["customer", "orders"],
    relational.q13_customer_distribution,
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H-Q13-style order-count distribution: LEFT join preserving "
        "zero-order customers, count-of-counts histogram.",
)

_register(
    "q17_small_quantity_revenue",
    ["lineitem", "part"],
    relational.q17_small_quantity_revenue,
    f"""
    WITH branded AS (
        SELECT l_partkey, {_cents('l_quantity')} AS qty_c,
               {_cents('l_extendedprice')} AS price_c
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#12'
    ), per_part AS (
        SELECT l_partkey AS agg_partkey,
               CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
               COUNT(*) AS n_lines
        FROM branded GROUP BY l_partkey
    )
    SELECT SUM(price_c) / 700.0 AS avg_yearly, COUNT(*) AS n_lines
    FROM branded JOIN per_part ON l_partkey = agg_partkey
    WHERE qty_c * 5 * n_lines < sum_qty_c
    """,
    doc="TPC-H-Q17-style small-quantity revenue: correlated per-part "
        "AVG decorrelated to one aggregation; threshold via exact "
        "integer cross-multiplication (no float AVG).",
)
