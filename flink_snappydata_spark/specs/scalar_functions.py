"""Scalar function families: string/date/math/json/map/conditional/array (SURVEY.md §2.8).

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from flink_snappydata_spark.functions import scalar

from flink_snappydata_spark.specs.base import (
    _register,
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
    "scalar_map",
    ["events"],
    scalar.map_functions,
    """
    SELECT event_id,
           CAST(2 AS BIGINT) AS n_entries,
           event_type AS m_type,
           CAST(user_id AS VARCHAR) AS m_uid,
           'type,uid' AS keys_csv
    FROM events
    """,
    doc="Map construct/inspect/extract; oracle is the directly-computed "
        "ground truth, proving the map round-trip loses nothing.",
)

_register(
    "scalar_conditional",
    ["customer"],
    scalar.conditional_functions,
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'AUTOMOBILE'), 'DEFAULT')
               AS segment_or_default,
           CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE 0.0 END AS bal_floor,
           NULLIF(CAST(c_nationkey AS BIGINT), 0) AS nation_or_null
    FROM customer
    """,
    doc="Conditional family: CASE tiers, coalesce/nullif, IF.",
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
