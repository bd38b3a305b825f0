"""Word-count family — the reference's signature dataflow.

Parity with reference ``WordCount.scala:30-33`` (batch),
``WindowWordCount.scala:40-47`` / ``KafkaWindowWordCount.scala:25-29``
(streaming variants): flatMap-tokenize → filter-empty → map-to-pair →
grouped sum. In Spark the whole chain is built-in column expressions
(explode/split/lower), executing JVM-side inside one whole-stage-codegen
span — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_snappydata_spark.util import small_sorted, spread

#: The reference tokenizes with ``line.toLowerCase.split("\\W+")``
#: (``WordCount.scala:30``).
TOKEN_SPLIT_PATTERN = r"\W+"


def tokenize(df: DataFrame, col: str = "text") -> DataFrame:
    """1 row → N token rows (flatMap parity). Empty tokens dropped
    (filter parity, reference ``WindowWordCount.scala:41``)."""
    return (
        spread(df).select(
            F.explode(F.split(F.lower(F.col(col)), TOKEN_SPLIT_PATTERN)).alias("word")
        )
        .filter(F.col("word") != "")
    )


def word_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Grouped token counts (reference ``WordCount.scala:30-33``).

    Scale: partial+final hash agg; cardinality = vocabulary size, so the
    shuffle is tiny regardless of corpus size.
    """
    return (
        tokenize(df, col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(lambda d: small_sorted(d, "word"))
    )


def map_partitions_identity(df: DataFrame) -> DataFrame:
    """Per-partition pass-through (reference ``SnappydataConnectorTest.scala:17-21``
    runs an identity ``mapPartition`` over the scan).

    Implemented with ``mapInPandas`` — the Arrow-batched per-partition
    iterator surface. The identity body is where per-partition imperative
    logic would go; the plumbing (schema preservation, batch iteration)
    is the operator under test.
    """
    schema = df.schema

    def _identity(batches):
        for pdf in batches:
            yield pdf

    return df.mapInPandas(_identity, schema=schema)
