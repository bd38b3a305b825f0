"""Batch sources and sinks (SURVEY.md §2.1 parity).

Reference surface → Spark mapping:

* text file source (``WordCount.scala:23``, ``WindowWordCount.scala:24``)
  → ``spark.read.text``;
* in-memory collection source (``env.fromCollection``,
  ``WordCount.scala:27``) → ``spark.createDataFrame``;
* text sink with overwrite (``writeAsText(path, OVERWRITE)``,
  ``KafkaWindowWordCount.scala:31``) → ``df.write.mode("overwrite").text``;
* CSV sink with record/field delimiters (``writeAsCsv(path, "\\n", " ")``,
  ``WordCount.scala:36``) → ``df.write.csv(sep=...)``;
* the SnappyData parallel table scan with full-SQL pushdown
  (``SnappyDataInputFormat.java:87-91``: run ``SN_SQL`` against the
  store, one split per bucket) → :func:`scan_table`: register the
  parquet table, run the SQL through Catalyst — the scan is
  partition-parallel and the *whole query* (not just the scan) is
  optimized, which is strictly more pushdown than the reference's
  ship-the-SQL-string protocol.

Sinks write directories of part files (one per partition) — the
cluster-correct layout; a 100 TB result never funnels through one file.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from flink_snappydata_spark.catalog import load_table


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Lines of text file(s) as DataFrame[value: string]."""
    return spark.read.text(path)


def from_collection(
    spark: SparkSession, rows: Iterable, schema=None
) -> DataFrame:
    """Dataset from a driver-side literal collection (small fixtures
    only — anything big belongs in files, never parallelized from the
    driver)."""
    return spark.createDataFrame(list(rows), schema=schema)


def write_text(df: DataFrame, path: str) -> None:
    """Single-string-column text sink, overwrite mode."""
    df.write.mode("overwrite").text(path)


def read_csv(spark: SparkSession, path: str, sep: str = ",", schema=None) -> DataFrame:
    reader = spark.read.option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, sep: str = ",") -> None:
    """CSV sink with a field delimiter (reference used space)."""
    df.write.mode("overwrite").option("sep", sep).csv(path)


def scan_table(
    spark: SparkSession, sf_dir: str, table: str, sql: str | None = None
) -> DataFrame:
    """Parallel table scan with full-SQL pushdown.

    ``sql=None`` ⇒ ``select * from <table>`` — exactly the reference's
    default (``SnappyDataInputFormat.java:49``). With SQL, the whole
    statement runs through Catalyst: filter pushdown, column pruning and
    partition planning replace the reference's bucket pinning and
    locality-aware split assignment (Spark task scheduler owns both).
    """
    load_table(spark, sf_dir, table).createOrReplaceTempView(table)
    return spark.sql(sql if sql is not None else f"select * from {table}")


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source; pass a schema at scale (inference reads the
    data twice)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink, overwrite mode (one part file per partition)."""
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (columnar alternative to parquet; same pushdown and
    pruning via the vectorized ORC reader)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink, overwrite mode."""
    df.write.mode("overwrite").orc(path)
