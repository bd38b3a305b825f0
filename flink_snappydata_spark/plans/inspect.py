"""Physical-plan introspection helpers.

The reference hand-builds its physical strategy (one split per bucket,
locality-aware assignment, full-SQL pushdown — reference
``SnappydataJdbcUtil.scala:21-33``, ``SnappydataInputSplitAssigner.java:21-61``,
``SnappyDataInputFormat.java:87-91``). In this engine Catalyst owns the
physical plan, so the correctness criterion shifts: not "did we schedule
it right" but "did the optimizer produce the plan we'd want at 100 TB" —
filters pushed to the parquet scan, columns pruned, small dimensions
broadcast, no accidental exchanges. These helpers read those facts off
``df._jdf.queryExecution().explainString`` so tests can pin them.

Driver-side only, never on the data path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All data-source-pushed filter expressions in the plan.

    Non-empty ⇒ the predicate reaches the parquet reader (row-group /
    page pruning at scale), instead of filtering post-scan.
    """
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (one list per scan).

    A 2-column projection reading a 16-column schema means pruning
    failed — at 100 TB that is the difference between reading 2 TB and
    reading 100 TB.
    """
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        body = m.group(1)
        cols = [c.split(":")[0].strip() for c in body.split(",") if ":" in c]
        out.append(cols)
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-pruning predicates applied at each scan. Non-empty ⇒
    the scan skips whole partition directories (the analog of the
    reference's bucket pruning via SET_BUCKETS_FOR_LOCAL_EXECUTION)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) in the plan.

    Counts the "(<id>) <Node>" detail headers so each physical node is
    counted once (formatted mode also names nodes in the tree section).
    """
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", plan))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — each is a full network/disk
    materialization of its input at scale. Broadcast exchanges are not
    counted (they move only the small side)."""
    plan = formatted_plan(df)
    # Detail headers only; the word boundary keeps "(n) BroadcastExchange"
    # out of the count.
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def codegen_span_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider spans = more operator
    fusion = fewer virtual calls per row)."""
    # Pre-execution, AQE wraps the plan and hides codegen subtrees from
    # the explain walker; re-plan a copy with AQE off for the gauge only.
    sess = df.sparkSession
    old = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        replanned = df.select("*")
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            replanned._jdf.queryExecution(), "codegen"
        )
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def gauge_row(name: str, df: DataFrame) -> str:
    """The pinned gauge line for one query —
    ``name|pushed_filters|broadcast_joins|exchanges`` — shared by the
    PLANS.md generator (tools/dump_plans.py, which writes
    tests/golden_plan_gauges.txt) and the golden-gauge pin test, so the
    two can never drift on format or gauge choice. A dropped pushdown,
    a gained/lost broadcast, or a new shuffle changes this line."""
    return "|".join(
        [
            name,
            str(len(pushed_filters(df))),
            str(broadcast_join_count(df)),
            str(exchange_count(df)),
        ]
    )


def clean_gauge_row(spark, name: str, builder, sf_dir: str) -> str:
    """:func:`gauge_row` measured on a cache-clean session.

    Plan gauges are cache-state-sensitive: Spark's CacheManager
    substitutes InMemoryRelation for ANY matching plan subtree, so a
    ``tracked_persist`` left behind by an earlier query/test changes a
    later query's exchange count (dedup_minhash gauges 12 exchanges
    mid-suite vs 10 on a fresh session). Clearing the cache before the
    build makes the gauge a property of the QUERY, not of session
    history; clearing after drops the build's own persists so the
    measurement leaves no residue either.
    """
    from flink_snappydata_spark.util import release_caches

    release_caches()
    spark.catalog.clearCache()
    try:
        return gauge_row(name, builder(spark, sf_dir))
    finally:
        release_caches()
        spark.catalog.clearCache()
