"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``flink_snappydata_spark``; this file is the thin
driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_snappydata_spark import registry
from flink_snappydata_spark.operators.relational import pricing_summary

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The pricing-summary aggregation (TPC-H Q1 shape) — the reference's
    groupBy+sum (``WordCount.scala:32-33``) on the fixture mirroring its
    own smoke table (``APP.PARTSUPP``, ``SnappydataConnectorTest.scala:14``).
    """
    lineitem = spark.read.parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    return pricing_summary(lineitem)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return registry.oracle_sql()
