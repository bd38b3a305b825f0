"""Declared-query registry — the engine's public correctness contract.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) gets:

* a named builder ``(spark, sf_dir) -> DataFrame`` running the Spark-side
  implementation, and
* an ANSI-SQL oracle string (DuckDB-runnable over the same parquet
  views) producing identical column names and values — or ``None`` for
  genuinely non-SQL-expressible ops (driver then does a rows-only check).

Column names are aliased identically on both sides; numeric outputs use
the exact integer-cents discipline of :mod:`flink_snappydata_spark.functions.exact`
so value hashes match bit-for-bit at any parallelism.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flink_snappydata_spark.catalog import load_table
from flink_snappydata_spark.functions import scalar
from flink_snappydata_spark.operators import analytic, relational, wordcount
from flink_snappydata_spark.streaming import count_window as cw
from flink_snappydata_spark.streaming import joins as stream_joins
from flink_snappydata_spark.streaming import windows as stream_windows

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str = ""


# SQL fragment: exact integer cents of a 2-decimal double column.
def _cents(expr: str) -> str:
    return f"CAST(ROUND(({expr}) * 100) AS BIGINT)"


_REVENUE_CENTS = f"{_cents('l_extendedprice')} * (100 - {_cents('l_discount')})"


def _q(table_args: list[str], builder: Callable[..., DataFrame]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return builder(*[load_table(spark, sf_dir, t) for t in table_args])

    return fn


QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, tables: list[str], builder: Callable[..., DataFrame],
              oracle: str | None, doc: str = "") -> None:
    QUERIES[name] = QuerySpec(fn=_q(tables, builder), oracle=oracle, doc=doc)


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

# ---------------------------------------------------------------------------
# Word count family (reference WordCount.scala parity)
# ---------------------------------------------------------------------------

_register(
    "wordcount_batch",
    ["documents"],
    wordcount.word_count,
    r"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(lower(text), '\W+')) AS word
          FROM documents) t
    WHERE word <> ''
    GROUP BY word ORDER BY word
    """,
    doc="flatMap-tokenize → filter → map → grouped sum (WordCount parity).",
)

_register(
    "mappartitions_identity",
    ["region"],
    wordcount.map_partitions_identity,
    "SELECT r_regionkey, r_name FROM region",
    doc="mapInPandas per-partition pass-through (mapPartition parity).",
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

# ---------------------------------------------------------------------------
# Sorts / limits / distinct / set ops (SURVEY.md §2.7)
# ---------------------------------------------------------------------------

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

# ---------------------------------------------------------------------------
# Scalar function families (SURVEY.md §2.8)
# ---------------------------------------------------------------------------

_register(
    "scalar_string",
    ["part"],
    scalar.string_functions,
    r"""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substring(p_type, 1, 5) AS type_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_name, '(\w+)$', 1) AS last_token,
           trim(p_name) AS name_trim
    FROM part
    """,
)

_register(
    "scalar_date",
    ["orders"],
    scalar.date_functions,
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT)
               AS days_before_y2k,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)

_register(
    "scalar_math",
    ["lineitem"],
    scalar.math_functions,
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - l_quantity) AS abs_diff,
           CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS price_ceil_hundreds,
           CAST(floor(l_quantity / 10.0) AS BIGINT) AS qty_floor_tens,
           sqrt(l_quantity) AS qty_sqrt,
           greatest(l_extendedprice * (1.0 - l_discount), l_quantity) AS greatest_val,
           least(l_discount, l_tax) AS least_rate,
           CAST(l_orderkey % 7 AS BIGINT) AS orderkey_mod7
    FROM lineitem
    """,
)

_register(
    "scalar_json",
    ["events"],
    scalar.json_functions,
    r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_path,
           CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_struct
    FROM events
    """,
    doc="get_json_object/from_json over events.props; oracle via regex "
        "to stay independent of DuckDB's JSON extension.",
)

_register(
    "scalar_array",
    ["embeddings"],
    scalar.array_functions,
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
               AS vec_sum,
           list_aggregate(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS vec_norm_sq
    FROM embeddings
    """,
)


# ---------------------------------------------------------------------------
# Streaming operators, checked batch-equivalently on the bounded events
# table (SURVEY.md §2.6, §5: streaming and batch share Catalyst plans)
# ---------------------------------------------------------------------------

_register(
    "events_tumbling_window",
    ["events"],
    stream_windows.tumbling_window_counts,
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           SUM({_cents('value')}) / 100.0 AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    ORDER BY window_start, event_type
    """,
    doc="Tumbling event-time window agg (KafkaWindowWordCount parity).",
)

_register(
    "events_sliding_window",
    ["events"],
    stream_windows.sliding_window_counts,
    """
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + to_seconds(CAST(floor(epoch(ts)/21600) AS BIGINT)*21600
                                - 21600*g.g) AS window_start,
               event_type, ts
        FROM events, (SELECT unnest([0,1,2,3]) AS g) g
    ) t
    WHERE ts < window_start + INTERVAL 1 DAY AND ts >= window_start
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc="Sliding event-time window (1 day / 6 h), epoch-aligned starts.",
)

_register(
    "events_session_window",
    ["events"],
    stream_windows.session_window_counts,
    f"""
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM seq
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events,
           SUM({_cents('value')}) / 100.0 AS sum_value
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="Session windows (30 min gap) — gaps-and-islands oracle.",
)

_register(
    "stream_stream_join",
    ["events"],
    stream_joins.windowed_type_join,
    """
    WITH c AS (SELECT date_trunc('hour', ts) AS w, user_id, COUNT(*) AS n_click
               FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         p AS (SELECT date_trunc('hour', ts) AS w, user_id, COUNT(*) AS n_purchase
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT c.user_id AS user_id, c.w AS window_start, n_click, n_purchase
    FROM c JOIN p ON c.user_id = p.user_id AND c.w = p.w
    ORDER BY user_id, window_start
    """,
    doc="Windowed stream-stream join, aggregation-shaped (ParquetTableJoin parity).",
)


def _rowlevel_join(events: DataFrame) -> DataFrame:
    clicks = events.filter(events.event_type == "click")
    purchases = events.filter(events.event_type == "purchase")
    return stream_joins.windowed_stream_join(clicks, purchases)


_register(
    "stream_join_rowlevel",
    ["events"],
    _rowlevel_join,
    """
    SELECT l.user_id AS user_id, date_trunc('hour', l.ts) AS window_start,
           l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.value AS l_value, r.value AS r_value
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND date_trunc('hour', l.ts) = date_trunc('hour', r.ts)
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """,
    doc="Row-level windowed stream-stream inner join (same key + same "
        "tumbling window), reference JoinFunction projection.",
)

_register(
    "count_window",
    ["events"],
    cw.count_window_sums,
    f"""
    SELECT user_id, fire_seq, n_in_window, sum_value FROM (
        SELECT user_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT)
                   AS fire_seq,
               CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_in_window,
               SUM({_cents('value')}) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) / 100.0
                   AS sum_value
        FROM events) t
    WHERE fire_seq % 10 = 0
    ORDER BY user_id, fire_seq
    """,
    doc="Sliding count window (size 100, slide 10) — WindowWordCount.scala:45 "
        "parity; streaming twin in streaming/count_window.py.",
)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
