"""Batch sources and sinks (SURVEY.md §2.1)."""

from flink_snappydata_spark.sources.batch import (  # noqa: F401
    from_collection,
    read_csv,
    read_json,
    read_orc,
    read_text,
    scan_table,
    write_csv,
    write_json,
    write_orc,
    write_text,
)
from flink_snappydata_spark.sources.jdbc import (  # noqa: F401
    JdbcScanOptions,
    JdbcWriteOptions,
    jdbc_reader,
    jdbc_writer,
)
