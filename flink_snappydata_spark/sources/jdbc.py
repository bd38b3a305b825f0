"""Partition-parallel JDBC scan options (SURVEY.md §2.1).

The reference's ``JDBCOptions.java:13-27`` declares the Spark-JDBC
option vocabulary (url/dbtable/user/password, stride partitioning via
partitionColumn/lowerBound/upperBound/numPartitions, fetchsize, plus
write-side truncate/createTableOptions/batchsize/isolationLevel) but
implements only the read path, and its split planning ignores those
stride options in favor of one-split-per-bucket. Here the same
vocabulary configures Spark's built-in JDBC source, which implements
stride partitioning for real: ``numPartitions`` concurrent connections,
each scanning one ``partitionColumn`` range.

The JVM's embedded Derby (ships with Spark) exercises the whole path
live — ``jdbc:derby:memory:`` stride-partitioned reads and
truncate/batchsize writes in tests — so against any production URL the
same builders are a working partition-parallel scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrameReader, SparkSession

_STRIDE_KEYS = ("partition_column", "lower_bound", "upper_bound", "num_partitions")


@dataclass(frozen=True)
class JdbcScanOptions:
    """Validated option set (reference ``JDBCOptions.java:42-95`` does the
    same required/paired checks imperatively)."""

    url: str
    table: str
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    fetchsize: int | None = None

    def __post_init__(self) -> None:
        if not self.url:
            raise ValueError("jdbc url is required")
        if not self.table:
            raise ValueError("dbtable is required")
        stride = [getattr(self, k) for k in _STRIDE_KEYS]
        if any(v is not None for v in stride) and any(v is None for v in stride):
            raise ValueError(
                "partitionColumn, lowerBound, upperBound and numPartitions "
                "must be specified together"
            )
        if self.num_partitions is not None and self.num_partitions < 1:
            raise ValueError("numPartitions must be >= 1")


def jdbc_reader(spark: SparkSession, opts: JdbcScanOptions) -> DataFrameReader:
    """A configured ``spark.read.format('jdbc')`` reader; ``.load()`` on
    it runs the stride-partitioned scan."""
    reader = (
        spark.read.format("jdbc")
        .option("url", opts.url)
        .option("dbtable", opts.table)
    )
    if opts.user is not None:
        reader = reader.option("user", opts.user)
    if opts.password is not None:
        reader = reader.option("password", opts.password)
    if opts.driver is not None:
        reader = reader.option("driver", opts.driver)
    if opts.partition_column is not None:
        reader = (
            reader.option("partitionColumn", opts.partition_column)
            .option("lowerBound", opts.lower_bound)
            .option("upperBound", opts.upper_bound)
            .option("numPartitions", opts.num_partitions)
        )
    if opts.fetchsize is not None:
        reader = reader.option("fetchsize", opts.fetchsize)
    return reader


@dataclass(frozen=True)
class JdbcWriteOptions:
    """Write-side option set. The reference declares this vocabulary
    (``JDBCOptions.java:24-27``: truncate, createTableOptions, batchsize,
    isolationLevel) but ships no OutputFormat; Spark's JDBC writer
    implements all four for real."""

    url: str
    table: str
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    truncate: bool = False
    create_table_options: str | None = None
    batchsize: int | None = None
    isolation_level: str | None = None

    _LEVELS = ("NONE", "READ_COMMITTED", "READ_UNCOMMITTED",
               "REPEATABLE_READ", "SERIALIZABLE")

    def __post_init__(self) -> None:
        if not self.url:
            raise ValueError("jdbc url is required")
        if not self.table:
            raise ValueError("dbtable is required")
        if self.batchsize is not None and self.batchsize < 1:
            raise ValueError("batchsize must be >= 1")
        if (self.isolation_level is not None
                and self.isolation_level not in self._LEVELS):
            raise ValueError(f"isolationLevel must be one of {self._LEVELS}")


def jdbc_writer(df, opts: JdbcWriteOptions, mode: str = "append"):
    """A configured JDBC DataFrameWriter; ``.save()`` runs the write
    (one connection per partition, ``batchsize`` rows per round trip)."""
    writer = (
        df.write.format("jdbc").mode(mode)
        .option("url", opts.url)
        .option("dbtable", opts.table)
        .option("truncate", str(opts.truncate).lower())
    )
    if opts.user is not None:
        writer = writer.option("user", opts.user)
    if opts.password is not None:
        writer = writer.option("password", opts.password)
    if opts.driver is not None:
        writer = writer.option("driver", opts.driver)
    if opts.create_table_options is not None:
        writer = writer.option("createTableOptions", opts.create_table_options)
    if opts.batchsize is not None:
        writer = writer.option("batchsize", opts.batchsize)
    if opts.isolation_level is not None:
        writer = writer.option("isolationLevel", opts.isolation_level)
    return writer
