"""flink_snappydata_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference project ``zhangshitong/flink-snappydata`` (a Flink 1.4 +
SnappyData connector sample), re-expressed Spark-first:

* The reference's "in-memory bucketed SQL store" half (SnappyData) maps to
  Spark's in-memory catalog: parquet scans registered as (optionally
  cached) temp views, partition-parallel by construction.
* The reference's "dataflow job" half (Flink DataSet/DataStream word
  counts, windowed aggregations, stream-stream windowed join) maps to the
  DataFrame API and Structured Streaming.
* The reference's connector machinery (splits, locality, pooling,
  failover) is subsumed by Spark's scheduler and data sources — see
  SURVEY.md §4: zero custom Catalyst rules are needed for parity.

Beyond parity, the package adds large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
under :mod:`flink_snappydata_spark.pipeline`.
"""

from flink_snappydata_spark.session import get_spark, stop_spark
from flink_snappydata_spark.catalog import TABLES, load_table, register_tables

__all__ = [
    "get_spark",
    "stop_spark",
    "TABLES",
    "load_table",
    "register_tables",
]

__version__ = "0.1.0"
