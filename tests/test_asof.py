"""As-of join semantics on a hand-built timeline: >= tie matching,
no-prior-match nulls, latest-of-several selection."""

from __future__ import annotations

import datetime as dt

from flink_snappydata_spark.operators.asof import asof_join_events

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=seconds)


def _events(spark):
    rows = [
        # user 1: two clicks before the purchase — latest must win
        (1, 101, _ts(0), "click", 1.0),
        (2, 101, _ts(10), "click", 2.0),
        (3, 101, _ts(20), "purchase", 9.0),
        # user 1: purchase tied with a click at the same instant (>=)
        (4, 101, _ts(30), "click", 3.0),
        (5, 101, _ts(30), "purchase", 9.5),
        # user 2: purchase with no prior click → null match
        (6, 202, _ts(5), "purchase", 7.0),
        (7, 202, _ts(6), "click", 4.0),
        # other event types are ignored entirely
        (8, 101, _ts(15), "view", 0.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_asof_join_semantics(spark):
    out = {r.right_event_id: r for r in asof_join_events(_events(spark)).collect()}
    assert set(out) == {3, 5, 6}

    assert out[3].left_event_id == 2, "latest of several prior clicks"
    assert out[3].left_value == 2.0

    assert out[5].left_event_id == 4, "same-timestamp click matches (>=)"
    assert out[5].left_ts == _ts(30)

    assert out[6].left_event_id is None, "no prior click -> null"
    assert out[6].left_value is None
