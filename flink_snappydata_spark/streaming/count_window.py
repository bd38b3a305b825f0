"""Sliding COUNT window (size N records, slide M records) — the one
reference operator with no Spark built-in (SURVEY.md §2.6, §7 phase 4).

Reference: ``WindowWordCount.scala:35-36,45`` — ``countWindow(100, 10)``
on a keyed stream: per key, fire every ``slide`` records with an
aggregate over the last ``size`` records (count-based, not time-based).

Two implementations with identical semantics on bounded input:

* ``count_window_sums`` (batch): row_number + ROWS frame — pure
  Catalyst, used for the oracle-checked declared query. Deterministic
  record order is defined as (ts, event_id) per key.
* ``streaming_count_window`` (streaming): ``applyInPandasWithState``
  keeping per-key state = (records_seen, ring buffer of the last
  ``size`` integer-cents values) — Flink's reducing-state count-window
  analog. State is O(size) per key, independent of stream length.

Scale: the batch form shuffles once on the key and sorts within
partitions; the streaming form's state store holds ``size`` longs per
key (~800 B at size=100) — 100 M keys ≈ 80 GB spread across executors,
fine. Arrival order across micro-batches defines "last N records",
exactly as in Flink.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_snappydata_spark.functions.exact import cents_np
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from flink_snappydata_spark.functions.exact import cents

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("fire_seq", LongType()),
        StructField("n_in_window", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("seen", LongType()),
        StructField("buffer", ArrayType(LongType())),
    ]
)


def count_window_sums(
    events: DataFrame, size: int = 100, slide: int = 10, key: str = "user_id"
) -> DataFrame:
    """Batch count-window: fire at every ``slide``-th record per key with
    count + exact sum over the trailing ``size`` records."""
    order = Window.partitionBy(key).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    frame = order.rowsBetween(-(size - 1), 0)
    return (
        events.select(
            F.col(key),
            F.row_number().over(order).cast("long").alias("fire_seq"),
            F.count(F.lit(1)).over(frame).cast("long").alias("n_in_window"),
            (F.sum(cents("value")).over(frame) / F.lit(100.0)).alias("sum_value"),
        )
        .filter(F.col("fire_seq") % slide == 0)
        .orderBy(key, "fire_seq")
    )


def streaming_count_window(
    events: DataFrame, size: int = 100, slide: int = 10
) -> DataFrame:
    """Streaming count-window via ``applyInPandasWithState``.

    Rows inside each micro-batch are processed in (ts, event_id) order
    per key; across batches, arrival order — Flink's semantics. Emits the
    same rows as :func:`count_window_sums` when the whole input arrives
    in event-time order.
    """

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seen, buffer = state.get
            buffer = list(buffer)
        else:
            seen, buffer = 0, []
        fires: list[tuple[int, int, int, float]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # exact integer cents; cents_np is HALF_UP like the batch
            # path's F.round (pandas .round is banker's half-even and
            # diverges on exact .5 products)
            cents_vals = cents_np(pdf["value"].to_numpy())
            for v in cents_vals:
                buffer.append(int(v))
                if len(buffer) > size:
                    buffer.pop(0)
                seen += 1
                if seen % slide == 0:
                    fires.append(
                        (key[0], seen, len(buffer), sum(buffer) / 100.0)
                    )
        state.update((seen, buffer))
        if fires:
            yield pd.DataFrame(
                fires, columns=["user_id", "fire_seq", "n_in_window", "sum_value"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        process,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
