"""Streaming operators checked batch-equivalently on the bounded events table (SURVEY.md §2.6).

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_snappydata_spark.streaming import count_window as cw
from flink_snappydata_spark.streaming import joins as stream_joins
from flink_snappydata_spark.streaming import windows as stream_windows

from flink_snappydata_spark.specs.base import (
    _cents,
    _register,
)

# ---------------------------------------------------------------------------
# Streaming operators, checked batch-equivalently on the bounded events
# table (SURVEY.md §2.6, §5: streaming and batch share Catalyst plans)
# ---------------------------------------------------------------------------

_register(
    "events_tumbling_window",
    ["events"],
    stream_windows.tumbling_window_counts,
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           SUM({_cents('value')}) / 100.0 AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    ORDER BY window_start, event_type
    """,
    doc="Tumbling event-time window agg (KafkaWindowWordCount parity).",
)

_register(
    "events_sliding_window",
    ["events"],
    stream_windows.sliding_window_counts,
    """
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + to_seconds(CAST(floor(epoch(ts)/21600) AS BIGINT)*21600
                                - 21600*g.g) AS window_start,
               event_type, ts
        FROM events, (SELECT unnest([0,1,2,3]) AS g) g
    ) t
    WHERE ts < window_start + INTERVAL 1 DAY AND ts >= window_start
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc="Sliding event-time window (1 day / 6 h), epoch-aligned starts.",
)

_register(
    "events_session_window",
    ["events"],
    stream_windows.session_window_counts,
    f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM seq
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events,
           SUM({_cents('value')}) / 100.0 AS sum_value
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="Session windows (30 min gap) — gaps-and-islands oracle.",
)

_register(
    "session_funnel",
    ["events"],
    stream_windows.session_funnel,
    f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE event_type IN ('click', 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_type,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM seq
    )
    SELECT MIN(ts) AS session_start, user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           (MIN(CASE WHEN event_type = 'click' THEN ts END) IS NOT NULL
            AND MAX(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
            AND MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                >= MIN(CASE WHEN event_type = 'click' THEN ts END))
               AS converted
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="Sessionized click->purchase funnel: session windows composed "
        "with conversion logic (gaps-and-islands oracle).",
)

# rollup_multires oracle: each grain aggregated straight from raw
# events — the engine folds day/week FROM the hourly rollup instead,
# and the exact cent sums make the two spellings provably identical.
_register(
    "rollup_multires",
    ["events"],
    stream_windows.rollup_multires,
    f"""
    WITH g AS (
        SELECT grain FROM (VALUES ('hour'), ('day'), ('week')) t(grain)
    )
    SELECT grain, date_trunc(grain, ts) AS bucket_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({_cents('value')}) AS DOUBLE) / 100.0 AS sum_value
    FROM events, g
    GROUP BY grain, date_trunc(grain, ts), event_type
    ORDER BY grain, bucket_start, event_type
    """,
    doc="Hypertable-style multi-resolution continuous aggregate: "
        "hour/day/week (bucket, type) rollups in one frame — raw "
        "events scanned once, coarser grains fold the persisted "
        "hourly aggregate (lossless under exact cent sums).",
)

_register(
    "stream_stream_join",
    ["events"],
    stream_joins.windowed_type_join,
    """
    WITH c AS (SELECT date_trunc('hour', ts) AS w, user_id, COUNT(*) AS n_click
               FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         p AS (SELECT date_trunc('hour', ts) AS w, user_id, COUNT(*) AS n_purchase
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT c.user_id AS user_id, c.w AS window_start, n_click, n_purchase
    FROM c JOIN p ON c.user_id = p.user_id AND c.w = p.w
    ORDER BY user_id, window_start
    """,
    doc="Windowed stream-stream join, aggregation-shaped (ParquetTableJoin parity).",
)


def _rowlevel_join(events: DataFrame) -> DataFrame:
    clicks = events.filter(events.event_type == "click")
    purchases = events.filter(events.event_type == "purchase")
    return stream_joins.windowed_stream_join(clicks, purchases)


_register(
    "stream_join_rowlevel",
    ["events"],
    _rowlevel_join,
    """
    SELECT l.user_id AS user_id, date_trunc('hour', l.ts) AS window_start,
           l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.value AS l_value, r.value AS r_value
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND date_trunc('hour', l.ts) = date_trunc('hour', r.ts)
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """,
    doc="Row-level windowed stream-stream inner join (same key + same "
        "tumbling window), reference JoinFunction projection.",
)

_register(
    "interval_join",
    ["events"],
    stream_joins.interval_join_events,
    """
    SELECT l.user_id AS user_id,
           r.event_id AS r_event_id, r.ts AS r_ts,
           l.event_id AS l_event_id, l.ts AS l_ts,
           l.value AS l_value, r.value AS r_value
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.ts <= r.ts AND l.ts >= r.ts - INTERVAL 30 MINUTE
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    ORDER BY user_id, r_event_id, l_event_id
    """,
    doc="Time-bounded interval join (clicks in the 30 min before each "
        "purchase) — the streaming time-interval join form, batch-checked.",
)

_register(
    "count_window",
    ["events"],
    cw.count_window_sums,
    f"""
    SELECT user_id, fire_seq, n_in_window, sum_value FROM (
        SELECT user_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT)
                   AS fire_seq,
               CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_in_window,
               SUM({_cents('value')}) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) / 100.0
                   AS sum_value
        FROM events) t
    WHERE fire_seq % 10 = 0
    ORDER BY user_id, fire_seq
    """,
    doc="Sliding count window (size 100, slide 10) — WindowWordCount.scala:45 "
        "parity; streaming twin in streaming/count_window.py.",
)

# -- round 11: the outer windowed stream-stream join (rotated into
# the r12 stamp window, registry._HEAD, with the other round-11
# additions).


def _rowlevel_left_join(events: DataFrame) -> DataFrame:
    clicks = events.filter(events.event_type == "click")
    purchases = events.filter(events.event_type == "purchase")
    return stream_joins.windowed_stream_join(
        clicks, purchases, how="left_outer"
    )


_register(
    "stream_join_left_outer",
    ["events"],
    _rowlevel_left_join,
    """
    SELECT l.user_id AS user_id, date_trunc('hour', l.ts) AS window_start,
           l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.value AS l_value, r.value AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND date_trunc('hour', l.ts) = date_trunc('hour', r.ts)
    """,
    doc="Row-level windowed LEFT OUTER stream-stream join — the "
        "watermark-gated null-extension shape Structured Streaming "
        "supports beyond the reference's inner join; clicks with no "
        "same-window purchase survive null-extended.",
)

# -- round 12: the FULL OUTER shape completes the outer family the
# builder already accepts (streaming/joins.py windowed_stream_join,
# how="full_outer"): null extension on BOTH sides once the watermark
# closes a window — clicks with no same-window purchase AND purchases
# with no same-window click each survive exactly once.


def _rowlevel_full_join(events: DataFrame) -> DataFrame:
    clicks = events.filter(events.event_type == "click")
    purchases = events.filter(events.event_type == "purchase")
    return stream_joins.windowed_stream_join(
        clicks, purchases, how="full_outer"
    )


_register(
    "stream_join_full_outer",
    ["events"],
    _rowlevel_full_join,
    """
    SELECT COALESCE(l.user_id, r.user_id) AS user_id,
           date_trunc('hour', COALESCE(l.ts, r.ts)) AS window_start,
           l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.value AS l_value, r.value AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id
     AND date_trunc('hour', l.ts) = date_trunc('hour', r.ts)
    """,
    doc="Row-level windowed FULL OUTER stream-stream join — both-side "
        "null extension (ParquetTableJoin.scala:51-59 generalized): "
        "matched pairs once, unmatched clicks right-null-extended, "
        "unmatched purchases left-null-extended. COALESCE keeps "
        "key/window non-null on extended rows, matching the Spark "
        "builder's coalesce projection.",
)
