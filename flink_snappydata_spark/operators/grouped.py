"""Grouped-map Arrow UDF surface — the batch "full-window apply".

The reference's ``WindowFunction``/``ProcessWindowFunction`` receive an
entire window's rows and emit any number of output rows (reference
``ParquetTableJoin.scala:103-130``). The batch Spark surface for that
shape is ``groupBy(key).applyInPandas(fn, schema)``: each group arrives
as one Arrow-backed pandas frame, the function returns a frame.

Exactness discipline: the z-score is computed from exact integer
aggregates (cents, cents², counts) with one fixed double formula
``(x·n − Σx) / sqrt(n·Σx² − (Σx)²)`` so the result is bit-identical to
the same formula in SQL — no float summation-order dependence.

Scale: one shuffle on the group key; each group must fit in one
executor's memory (the contract of grouped-map UDFs — for unbounded
groups use window functions instead, which this repo also provides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from flink_snappydata_spark.functions.exact import cents_np
from flink_snappydata_spark.util import spread

_OUT_SCHEMA = "event_id long, user_id long, value double, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    c = cents_np(pdf["value"].to_numpy())
    n = np.int64(len(c))
    s = c.sum()
    ss = (c * c).sum()
    num = (c * n - s).astype(np.float64)
    den = float(np.sqrt(float(n * ss - s * s)))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = num / den
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value": pdf["value"],
            "zscore": z,
        }
    )


def zscore_by_user(events: DataFrame) -> DataFrame:
    """Per-user z-score of event values via grouped-map ``applyInPandas``
    (whole group in, whole group out — the UDTF-like surface)."""
    # Pre-partition on the group key: the grouped-map shuffle reuses the
    # partitioning, and the Arrow/Python stage runs on all cores even
    # when the source is a single local file split.
    return (
        spread(events.select("event_id", "user_id", "value"), "user_id")
        .groupBy("user_id")
        .applyInPandas(_zscore_group, schema=_OUT_SCHEMA)
        .orderBy("user_id", "event_id")
    )
