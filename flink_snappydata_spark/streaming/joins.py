"""Windowed stream-stream inner join — ``ParquetTableJoin`` parity.

The reference co-groups two keyed streams per 1 s tumbling event-time
window (``ParquetTableJoin.scala:51-59``): rows join iff same key AND
same tumbling window. Spark expresses that exactly as an equi-join on
``window(ts, width)`` + key — the form Structured Streaming explicitly
supports for stream-stream joins (equality on a window column derived
from the watermarked event time).

The builder is input-agnostic: on bounded frames it runs as a plain
Catalyst join (what the oracle checks); on streaming frames add
watermarks via the ``watermark`` arg and the same plan becomes a
state-store-backed stream-stream join.

Scale: state per side is bounded by watermark horizon x keys-per-window.
Join keys include the window, so the shuffle partitioner spreads state
across windows as well as keys — hot keys within one window are the
residual skew risk (AQE skew-join handles the batch path; for streaming,
pre-aggregate per (key, window) first when the join is
aggregation-shaped, which is what ``windowed_type_join`` does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    width: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Row-level windowed inner equi-join of two event streams
    (same key + same tumbling window), reference JoinFunction projection
    (``ParquetTableJoin.scala:86-92``) as a plain select."""
    if watermark is not None:
        left = left.withWatermark("ts", watermark)
        right = right.withWatermark("ts", watermark)
    l = left.select(
        F.col(key).alias("l_key"),
        F.window("ts", width).alias("l_w"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.window("ts", width).alias("r_w"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r, (F.col("l_key") == F.col("r_key")) & (F.col("l_w") == F.col("r_w")), "inner"
    ).select(
        F.col("l_key").alias("user_id"),
        F.col("l_w.start").alias("window_start"),
        "l_event_id",
        "r_event_id",
        "l_value",
        "r_value",
    )


def windowed_type_join(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Aggregation-shaped windowed join: clicks vs purchases per
    (user, window). Both sides pre-aggregate to one row per (key,
    window) *before* the join — the scale-correct form when the consumer
    wants per-window counts, since join state shrinks from O(events) to
    O(keys x windows)."""
    def side(event_type: str, alias: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == event_type)
            .groupBy(F.window("ts", width).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    clicks = side("click", "n_click")
    purchases = side("purchase", "n_purchase")
    return (
        clicks.alias("c")
        .join(
            purchases.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id")) & (F.col("c.w") == F.col("p.w")),
            "inner",
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.w.start").alias("window_start"),
            "n_click",
            "n_purchase",
        )
        .orderBy("user_id", "window_start")
    )
