"""Registry infrastructure shared by every spec module.

``QUERIES`` is the single registration dict: each spec module in
:mod:`flink_snappydata_spark.specs` populates it at import time (via
:func:`_register` or direct ``QuerySpec`` assignment), and
:mod:`flink_snappydata_spark.registry` applies the driver-facing
declaration order on top. Nothing outside the specs package should
import this module's ``QUERIES`` — the ordered public dict lives in
``registry``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flink_snappydata_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    #: True when the query embeds its own exact judge (bound-verdict
    #: pattern: sketch + exact side-by-side). Timings of these measure
    #: sketch AND judge — the bench surfaces the flag, and raw sketch
    #: variants are timed separately, so sweep numbers for "the scale
    #: path" stay honest.
    judge_bearing: bool = False


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
              oracle: str | None, doc: str = "",
              judge_bearing: bool = False) -> None:
    QUERIES[name] = QuerySpec(fn=_q(tables, builder), oracle=oracle, doc=doc,
                              judge_bearing=judge_bearing)
