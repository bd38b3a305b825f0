"""Scalar-function family queries (SURVEY.md §2.8).

The reference's own scalar surface is just ``toLowerCase`` + regex split
(``WordCount.scala:30``); everything else it delegates to the store's SQL
via ``SN_SQL`` pushdown. Our store side is Spark SQL, so parity means
exercising each ``pyspark.sql.functions`` family: string, date, math,
JSON (the ``events.props`` fixture), array (the ``embeddings.embedding``
fixture).

Engine-portability rules baked in here (so the DuckDB oracle can verify
values bit-exactly):

* Integer-returning functions are cast to ``long`` (DuckDB returns
  BIGINT where Spark returns INT).
* No transcendental functions (exp/ln/pow) in checked outputs — libm
  rounding differs across engines; ``sqrt`` is IEEE-exact and allowed.
* Per-row double arithmetic is deterministic (same IEEE ops both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def string_functions(part: DataFrame) -> DataFrame:
    """lower/upper/substring/length/concat_ws/regexp_extract over part."""
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_token"),
        F.trim(F.col("p_name")).alias("name_trim"),
    )


def date_functions(orders: DataFrame) -> DataFrame:
    """year/month/quarter/date_trunc/datediff/last_day over orders."""
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(od).cast("long").alias("order_year"),
        F.month(od).cast("long").alias("order_month"),
        F.quarter(od).cast("long").alias("order_quarter"),
        F.date_trunc("month", od).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date"))
        .cast("long")
        .alias("days_before_y2k"),
        F.last_day(od.cast("date")).alias("month_end"),
    )


def math_functions(lineitem: DataFrame) -> DataFrame:
    """abs/ceil/floor/sqrt/greatest/least/mod over lineitem.

    Per-row IEEE double ops only — deterministic and engine-portable.
    """
    price = F.col("l_extendedprice")
    qty = F.col("l_quantity")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - qty).alias("abs_diff"),
        F.ceil(price / F.lit(100.0)).cast("long").alias("price_ceil_hundreds"),
        F.floor(qty / F.lit(10.0)).cast("long").alias("qty_floor_tens"),
        F.sqrt(qty).alias("qty_sqrt"),
        F.greatest(price * (F.lit(1.0) - F.col("l_discount")), qty).alias("greatest_val"),
        F.least(F.col("l_discount"), F.col("l_tax")).alias("least_rate"),
        (F.col("l_orderkey") % F.lit(7)).cast("long").alias("orderkey_mod7"),
    )


def json_functions(events: DataFrame) -> DataFrame:
    """JSON extraction over ``events.props`` (``{"k": <int>}``).

    Spark side uses the real JSON operator surface (``get_json_object``
    and ``from_json`` → typed struct); the oracle verifies the same
    values via regex so it stays independent of DuckDB's JSON extension.
    """
    schema = "k INT"
    parsed = F.from_json(F.col("props"), schema)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_path"),
        parsed.getField("k").cast("long").alias("k_struct"),
    )


def array_functions(embeddings: DataFrame) -> DataFrame:
    """Array-column surface over ``embeddings.embedding`` (array<float>).

    size / element_at / sequential fold (F.aggregate) — the fold runs
    left-to-right with a double accumulator, identical to the oracle's
    ordered list aggregation, so the sums are bit-exact.
    """
    emb = F.col("embedding")
    return embeddings.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")).alias("vec_sum"),
        F.aggregate(
            emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        ).alias("vec_norm_sq"),
    )


def map_functions(events: DataFrame) -> DataFrame:
    """Map-type family: construct (create_map), inspect (size/map_keys),
    extract (element_at). The oracle checks against the directly-computed
    ground truth, proving the map round-trip loses nothing."""
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return events.select(
        "event_id",
        F.size(m).cast("long").alias("n_entries"),
        F.element_at(m, F.lit("type")).alias("m_type"),
        F.element_at(m, F.lit("uid")).alias("m_uid"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


def similarity_functions(nation: DataFrame) -> DataFrame:
    """Edit-distance field matching (levenshtein) — the scalar building
    block of fuzzy record linkage; exact integer outputs on both engines.
    All nation-name pairs (25x25 — a dimension-side cross, broadcast)."""
    a = nation.select(F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_name").alias("name_b"))
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
            (F.levenshtein("name_a", "name_b")
             / F.greatest(F.length("name_a"), F.length("name_b"))
             ).alias("edit_ratio"),
        )
        .filter(F.col("name_a") < F.col("name_b"))
        .orderBy("name_a", "name_b")
    )


def conditional_functions(customer: DataFrame) -> DataFrame:
    """Conditional family: CASE/WHEN tiers, coalesce, nullif, if —
    pure codegen expressions."""
    bal = F.col("c_acctbal")
    return customer.select(
        "c_custkey",
        F.when(bal < 0, "debt")
        .when(bal < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")),
                   F.lit("DEFAULT")).alias("segment_or_default"),
        F.expr("IF(c_acctbal >= 0, c_acctbal, 0.0)").alias("bal_floor"),
        F.nullif(F.col("c_nationkey").cast("long"), F.lit(0).cast("long"))
        .alias("nation_or_null"),
    )
