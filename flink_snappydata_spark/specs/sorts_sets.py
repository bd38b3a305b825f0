"""Sorts / limits / top-k / set ops + as-of join + late relational closers (SURVEY.md §2.7).

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from flink_snappydata_spark.operators import asof
from flink_snappydata_spark.operators import relational
from flink_snappydata_spark.streaming import count_window as cw

from flink_snappydata_spark.specs.base import (
    _register,
)

# ---------------------------------------------------------------------------
# Sorts / limits / distinct / set ops (SURVEY.md §2.7)
# ---------------------------------------------------------------------------

_register(
    "asof_join",
    ["events"],
    asof.asof_join_events,
    """
    WITH tagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_left
        FROM events WHERE event_type IN ('click', 'purchase')
    ), carried AS (
        SELECT user_id, event_id, ts, value, is_left,
               LAST_VALUE(CASE WHEN is_left = 1 THEN event_id END IGNORE NULLS)
                   OVER w AS left_event_id,
               LAST_VALUE(CASE WHEN is_left = 1 THEN ts END IGNORE NULLS)
                   OVER w AS left_ts,
               LAST_VALUE(CASE WHEN is_left = 1 THEN value END IGNORE NULLS)
                   OVER w AS left_value
        FROM tagged
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC, is_left DESC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS right_event_id, ts AS right_ts,
           value AS right_value, left_event_id, left_ts, left_value
    FROM carried WHERE is_left = 0
    ORDER BY user_id, right_ts, right_event_id
    """,
    doc="As-of (point-in-time) join: latest click at-or-before each "
        "purchase per user; union + keyed window scan, one shuffle.",
)

_register(
    "topk_orders",
    ["orders"],
    relational.top_k_orders,
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)

_register(
    "distinct_pairs",
    ["lineitem"],
    relational.distinct_pairs,
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)

_register(
    "join_full_outer",
    ["customer", "supplier"],
    relational.full_outer_nation_balance,
    """
    WITH c AS (SELECT c_nationkey AS nationkey,
                      CAST(COUNT(*) AS BIGINT) AS n_cust,
                      CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                           AS BIGINT) AS cust_bal
               FROM customer WHERE c_acctbal > 9800 GROUP BY 1),
    s AS (SELECT s_nationkey AS nationkey,
                 CAST(COUNT(*) AS BIGINT) AS n_supp,
                 CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT))
                      AS BIGINT) AS supp_bal
          FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           n_cust, cust_bal, n_supp, supp_bal
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
    doc="FULL OUTER equi-join (the declared surface's missing join "
        "flavor), thresholds chosen so both unmatched sides are "
        "non-empty on the fixtures; both inputs collapse map-side to "
        "nation-cardinality frames BEFORE the join (full outer cannot "
        "broadcast either side).",
)

_register(
    "set_ops_nations",
    ["customer", "supplier"],
    relational.set_ops_nations,
    """
    WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'union' AS set_op FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'intersect' AS set_op FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
    UNION ALL
    SELECT nationkey, 'except' AS set_op FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    ORDER BY set_op, nationkey
    """,
)

_register(
    "agg_mode",
    ["events"],
    relational.mode_per_type,
    """
    WITH pv AS (SELECT event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS v,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2),
    best AS (SELECT event_type, MAX(c) AS mode_count
             FROM pv GROUP BY 1)
    SELECT pv.event_type,
           CAST(MIN(v) AS BIGINT) AS mode_cents,
           CAST(MIN(mode_count) AS BIGINT) AS mode_count,
           CAST(COUNT(*) AS BIGINT) AS n_tied
    FROM pv JOIN best ON pv.event_type = best.event_type
                     AND pv.c = best.mode_count
    GROUP BY 1 ORDER BY 1
    """,
    doc="Exact per-type mode of the value cents with deterministic "
        "tie-break (highest count, then smallest value) plus the tie "
        "census: two-stage (type, value) count collapse, max-count "
        "fold joined back, MIN(v) over the explicit tie group — no "
        "sort, no window.",
)

_register(
    "weighted_median_price",
    ["lineitem"],
    relational.weighted_median_price,
    """
    WITH b AS (SELECT l_returnflag AS flag,
                      CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                      CAST(l_quantity AS BIGINT) AS w
               FROM lineitem),
    pv AS (SELECT flag, v, CAST(SUM(w) AS BIGINT) AS w
           FROM b GROUP BY 1, 2),
    c AS (SELECT flag, v,
                 SUM(w) OVER (PARTITION BY flag ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cw,
                 SUM(w) OVER (PARTITION BY flag) AS tw
          FROM pv)
    SELECT flag AS l_returnflag,
           CAST(MIN(tw) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
               AS median_cents,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
               / 100.0 AS median_price
    FROM c GROUP BY flag ORDER BY l_returnflag
    """,
    doc="Exact quantity-weighted median price per return flag (lower "
        "weighted median, rational 2*cum >= total selection): "
        "per-(flag, price) weight collapse, cumulative via the "
        "two-phase cell prefix — no single-task flag-wide window; "
        "oracle states the naive windowed cumsum.",
)

_register(
    "pareto_frontier",
    ["part"],
    relational.pareto_frontier,
    """
    SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size))
    ORDER BY p_partkey
    """,
    doc="2D skyline (Pareto frontier) on (min price, max size): the "
        "oracle is the textbook quadratic NOT-EXISTS self-join; the "
        "engine runs the sort-based sweep on the per-price best-size "
        "frame with the two-phase cell prefix-max, so catalog rows "
        "never globally sort and no window task holds the price "
        "histogram.",
)
