"""Streaming CEP pattern matching — Flink CEP's operational model
(a per-key state machine carrying the open partial match) on
Structured Streaming's ``applyInPandasWithState``.

The batch twin is :func:`flink_snappydata_spark.operators.cep.
cep_pattern_match` (the oracle-checked declared query); this module is
the LIVE form: matches emit in the micro-batch whose trigger event
closes them, and a click run still open at a batch boundary rides the
state store into the next batch — exactly how Flink CEP keeps partial
matches in keyed state. Emits the same rows as the batch op when input
arrives in event-time order (the streaming-equivalence test), and the
pure state-transition core (:func:`advance_cep_state`) is
unit-tested for cross-batch continuation at every split point.

Scale: state per key is ONE open run (three longs — start, end,
length), independent of stream length or pattern frequency; matches
stream out append-only. Same footprint class as the count-window op's
ring buffer, smaller.

Absence (notFollowedBy) note: the wrong-event case emits here too (a
non-trigger event closes the run and the match is simply not emitted);
the SILENCE case needs event-time timers to fire without a closing
event — at read time the batch :func:`cep_absence_alerts` over the
raw-log twin covers it exactly, so this operator deliberately carries
no timeout machinery.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from flink_snappydata_spark.operators.cep import _window_seconds

MATCH_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("run_start", TimestampType()),
        StructField("run_end", TimestampType()),
        StructField("n_run", LongType()),
        StructField("trigger_ts", TimestampType()),
    ]
)

#: (run_start_us, run_end_us, n_run) — the open partial match; n_run=0
#: means no pending run (start/end are then meaningless zeros).
STATE_SCHEMA = StructType(
    [
        StructField("run_start_us", LongType()),
        StructField("run_end_us", LongType()),
        StructField("n_run", LongType()),
    ]
)


def advance_cep_state(
    state: tuple[int, int, int],
    rows: list[tuple[int, str]],
    run_type: str = "click",
    trigger_type: str = "purchase",
    min_run: int = 2,
    within_us: int = 86_400_000_000,
) -> tuple[list[tuple[int, int, int, int]], tuple[int, int, int]]:
    """Pure state transition: fold (ts_us, event_type) rows — already
    in event-time order — through the pattern state machine.

    Returns ``(fires, new_state)`` where each fire is
    ``(run_start_us, run_end_us, n_run, trigger_ts_us)``. Associative
    over splits of an ordered sequence by construction (the only
    carried context is the open trailing run) — pinned by the
    every-split-point test."""
    run_start, run_end, n = state
    fires: list[tuple[int, int, int, int]] = []
    for ts_us, etype in rows:
        if etype == run_type:
            if n == 0:
                run_start = ts_us
            run_end = ts_us
            n += 1
            continue
        if (
            n >= min_run
            and etype == trigger_type
            and ts_us <= run_end + within_us
        ):
            fires.append((run_start, run_end, n, ts_us))
        n = 0
    return fires, (run_start, run_end, n)


def streaming_cep_match(
    events: DataFrame,
    run_type: str = "click",
    trigger_type: str = "purchase",
    min_run: int = 2,
    within: str = "1 day",
) -> DataFrame:
    """Live MATCH_RECOGNIZE ``PATTERN (C{min_run,} P)``: per-key
    pattern state machine over ``applyInPandasWithState``. Rows inside
    each micro-batch are processed in (ts, event_id) order per key;
    across batches, arrival order — Flink CEP's semantics. A match
    emits in the micro-batch that completes it."""
    within_us = _window_seconds(within) * 1_000_000

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        st = state.get if state.exists else (0, 0, 0)
        # ONE global sort over the whole group: a key's batch rows can
        # arrive as several Arrow chunks in arbitrary order (groups
        # larger than arrow.maxRecordsPerBatch) — sorting chunks
        # independently would interleave wrongly and corrupt both the
        # emitted matches and the carried state.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        rows = [
            (int(ts.value // 1000), etype)
            for ts, etype in zip(pdf["ts"], pdf["event_type"])
        ]
        all_fires, st = advance_cep_state(
            st, rows, run_type, trigger_type, min_run, within_us
        )
        if st[2] == 0:
            # no open run: drop the state-store entry so the store is
            # bounded by keys with OPEN runs, not keys ever seen (the
            # next batch re-initializes to (0,0,0) identically)
            state.remove()
        else:
            state.update(tuple(int(x) for x in st))
        if all_fires:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(all_fires),
                    "run_start": pd.to_datetime(
                        [f[0] for f in all_fires], unit="us"
                    ),
                    "run_end": pd.to_datetime(
                        [f[1] for f in all_fires], unit="us"
                    ),
                    "n_run": [f[2] for f in all_fires],
                    "trigger_ts": pd.to_datetime(
                        [f[3] for f in all_fires], unit="us"
                    ),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        process,
        outputStructType=MATCH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
