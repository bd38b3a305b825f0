"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure ``df`` has at least the cluster's default parallelism.

    Local-mode fixtures are single-file, single-row-group parquet — one
    input split — which would serialize every downstream explode/agg on
    one core. Hash-repartitioning on ``cols`` (e.g. the group key) both
    spreads the work and lets the next ``groupBy(cols)`` reuse the
    partitioning without another exchange.

    At scale this is a no-op: a 100 TB table already scans as thousands
    of splits, so the partition count check fails and no shuffle is
    added. The check costs one driver-side plan conversion, no job.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *cols) if cols else df.repartition(target)
    return df
