"""As-of (point-in-time) join — a training-pipeline staple Spark lacks
as a built-in.

The reference joins two event streams only within the *same* tumbling
window (reference ``ParquetTableJoin.scala:51-59``); an as-of join is
the stronger primitive: each right-side row matches the latest left-side
row at-or-before its timestamp. Implemented as a union + keyed window
scan — one shuffle on the key, no range cross-product:

1. tag both sides, union them (schema aligned by name);
2. total-order each key's timeline by (ts, left-first, event_id);
3. ``last(left_value, ignorenulls=True)`` over an unbounded-preceding
   frame carries the most recent left row forward;
4. keep right rows; matched left columns ride along.

Scale: one hash shuffle on the join key; state per row is O(1) (the
running "last left row"), versus the O(window²) buffering of an
interval-join formulation. Skewed keys can be salted upstream; the
window scan itself is a single ordered pass per key partition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def asof_join_events(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """For each ``right_type`` event: the latest ``left_type`` event of
    the same user at-or-before it (``>=`` semantics — a left event with
    the same timestamp matches, as it sorts first).

    Output: one row per right event, with the matched left event id /
    ts / value (nulls when no left event precedes it).
    """
    tagged = events.filter(F.col("event_type").isin(left_type, right_type)).select(
        "user_id",
        "event_id",
        "ts",
        "value",
        (F.col("event_type") == left_type).cast("int").alias("is_left"),
    )
    # Total order per user: time, left-before-right on ties, then the
    # unique event id — deterministic at any parallelism.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_left").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(col: str, alias: str):
        return F.last(
            F.when(F.col("is_left") == 1, F.col(col)), ignorenulls=True
        ).over(w).alias(alias)

    return (
        tagged.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            "is_left",
            carry("event_id", "left_event_id"),
            carry("ts", "left_ts"),
            carry("value", "left_value"),
        )
        .filter(F.col("is_left") == 0)
        .select(
            "user_id",
            F.col("event_id").alias("right_event_id"),
            F.col("ts").alias("right_ts"),
            F.col("value").alias("right_value"),
            "left_event_id",
            "left_ts",
            "left_value",
        )
        .orderBy("user_id", "right_ts", "right_event_id")
    )


ASOF_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("right_event_id", LongType()),
        StructField("right_ts", TimestampType()),
        StructField("right_value", DoubleType()),
        StructField("left_event_id", LongType()),
        StructField("left_ts", TimestampType()),
        StructField("left_value", DoubleType()),
    ]
)

#: per-key carry state: the latest left event seen (ts as epoch micros).
ASOF_STATE_SCHEMA = StructType(
    [
        StructField("l_event_id", LongType()),
        StructField("l_ts_us", LongType()),
        StructField("l_value", DoubleType()),
    ]
)


def streaming_asof_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """Streaming as-of enrichment: each ``right_type`` event emitted with
    the latest ``left_type`` event of the same key seen so far.

    Per-key state is ONE carried left row (O(1), no buffering) via
    ``applyInPandasWithState`` — the streaming twin of
    :func:`asof_join_events`. Rows are processed in (ts, left-first,
    event_id) order within each micro-batch and in arrival order across
    batches, so on in-order input the output equals the batch operator
    (equivalence-tested on the events fixture).
    """

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            l_id, l_ts_us, l_val = state.get
        else:
            l_id = l_ts_us = l_val = None
        out = []
        for pdf in pdfs:
            pdf = pdf.assign(
                isleft=(pdf["event_type"] == left_type).astype(int)
            ).sort_values(["ts", "isleft", "event_id"], ascending=[True, False, True])
            for r in pdf.itertuples():
                if r.isleft == 1:
                    l_id = int(r.event_id)
                    l_ts_us = int(r.ts.value // 1_000)
                    l_val = float(r.value)
                elif r.event_type == right_type:
                    out.append(
                        (
                            key[0],
                            int(r.event_id),
                            r.ts,
                            float(r.value),
                            l_id,
                            pd.Timestamp(l_ts_us * 1_000) if l_ts_us is not None else None,
                            l_val,
                        )
                    )
        if l_id is not None:
            state.update((l_id, l_ts_us, l_val))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in ASOF_OUTPUT_SCHEMA.fields])

    return (
        events.filter(F.col("event_type").isin(left_type, right_type))
        .groupBy("user_id")
        .applyInPandasWithState(
            process,
            outputStructType=ASOF_OUTPUT_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
