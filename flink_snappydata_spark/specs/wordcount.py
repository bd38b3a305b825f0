"""Word count family (reference WordCount.scala parity) + grouped/mapPartitions carriers.

Mechanically split from the original single-file registry; declaration
order is preserved by the import order in :mod:`flink_snappydata_spark.specs`.
"""

from __future__ import annotations

from flink_snappydata_spark.operators import grouped
from flink_snappydata_spark.operators import wordcount

from flink_snappydata_spark.specs.base import (
    _cents,
    _register,
)

# ---------------------------------------------------------------------------
# Word count family (reference WordCount.scala parity)
# ---------------------------------------------------------------------------

_register(
    "wordcount_batch",
    ["documents"],
    wordcount.word_count,
    r"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split_regex(lower(text), '\W+')) AS word
          FROM documents) t
    WHERE word <> ''
    GROUP BY word ORDER BY word
    """,
    doc="flatMap-tokenize → filter → map → grouped sum (WordCount parity).",
)

_register(
    "grouped_zscore",
    ["events"],
    grouped.zscore_by_user,
    f"""
    WITH c AS (
        SELECT event_id, user_id, value,
               {_cents('value')} AS cv
        FROM events
    ), agg AS (
        SELECT event_id, user_id, value,
               SUM(cv) OVER w AS s,
               SUM(cv * cv) OVER w AS ss,
               COUNT(*) OVER w AS n,
               cv
        FROM c WINDOW w AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id, value,
           CAST(cv * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE))
               AS zscore
    FROM agg ORDER BY user_id, event_id
    """,
    doc="Grouped-map applyInPandas (full-window apply parity): per-user "
        "z-score from exact integer aggregates, bit-identical formula "
        "on both engines.",
)

_register(
    "mappartitions_identity",
    ["region"],
    wordcount.map_partitions_identity,
    "SELECT r_regionkey, r_name FROM region",
    doc="mapInPandas per-partition pass-through (mapPartition parity).",
)
