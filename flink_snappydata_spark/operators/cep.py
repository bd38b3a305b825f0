"""Complex-event-processing operators — Flink CEP / MATCH_RECOGNIZE
parity, batch-checked on the bounded events table.

The reference runs on Flink, whose flagship beyond-SQL feature set is
the CEP library (pattern matching over keyed event sequences) and the
SQL MATCH_RECOGNIZE clause built on it. Spark has no MATCH_RECOGNIZE,
but the deterministic skip-past-last-row subset every funnel/alerting
pipeline actually uses — maximal runs of a predicate followed within a
time budget by a trigger event — is exactly expressible as
gaps-and-islands over a per-key ordered window plus a lead() lookahead:
one user-keyed shuffle, no UDFs, whole-stage-codegen throughout.

Scale notes shared by all ops here: the only shuffle is the per-user
window sort (same key every session/funnel op in the engine shuffles
on); islands/groupBy reuse that partitioning; per-user sequences are
human-activity-bounded, so no window partition is corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cep_pattern_match(
    events: DataFrame,
    run_type: str = "click",
    trigger_type: str = "purchase",
    min_run: int = 2,
    within: str = "1 day",
) -> DataFrame:
    """MATCH_RECOGNIZE ``PATTERN (C{min_run,} P)`` with skip-past-last
    semantics: MAXIMAL runs of >= ``min_run`` consecutive ``run_type``
    events (consecutive in the user's (ts, event_id) order — no other
    event type interleaves) whose immediately-next event is a
    ``trigger_type`` within ``within`` of the run's last event.
    Maximal runs are disjoint by construction, which is exactly the
    AFTER MATCH SKIP PAST LAST ROW contract of the SQL clause.

    Returns ``(user_id, run_start, run_end, n_run, trigger_ts)``
    sorted by (user_id, run_start). Every column is a min/max/count of
    deterministic inputs — bit-identical in any engine, so the DuckDB
    oracle checks values.

    Scale: one user-keyed window shuffle; the run groupBy reuses the
    hash partitioning; lookahead is lead(1), not a self-join.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_run = F.col("event_type") == run_type
    seq = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(is_run)
    # classic islands: rn - row_number() among run-type rows is
    # constant exactly on maximal consecutive runs
    w_runs = Window.partitionBy("user_id").orderBy("rn")
    runs = seq.withColumn(
        "grp", F.col("rn") - F.row_number().over(w_runs)
    )
    matched = (
        runs.groupBy("user_id", "grp")
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("n_run"),
            F.max_by("next_type", "rn").alias("last_next_type"),
            F.max_by("next_ts", "rn").alias("last_next_ts"),
        )
        .filter(
            (F.col("n_run") >= min_run)
            & (F.col("last_next_type") == trigger_type)
            & (
                F.col("last_next_ts")
                <= F.col("run_end") + F.expr(f"INTERVAL {within}")
            )
        )
        .select(
            "user_id",
            "run_start",
            "run_end",
            "n_run",
            F.col("last_next_ts").alias("trigger_ts"),
        )
    )
    return matched.orderBy("user_id", "run_start")


def window_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    window: str = "1 day",
) -> DataFrame:
    """ClickHouse-style ``windowFunnel``: per user, the deepest funnel
    stage reachable through a strictly-increasing event chain
    ``stages[0] < stages[1] < ...`` that fits entirely inside
    ``window`` of the chain's FIRST event. Greedy-earliest chaining
    (each stage takes the MINIMUM qualifying timestamp) is used by
    both sides; greedy-earliest maximizes reachable depth for a fixed
    anchor, and every anchor is tried, so the per-user max is the true
    max. Returns ``(user_id, max_stage)`` for users with at least one
    stage-1 event, sorted by user_id.

    Scale: ``len(stages)-1`` user-keyed interval joins (equi-key +
    range predicate — never a cross product), each reusing the same
    hash partitioning; per-anchor candidate sets are bounded by one
    user's activity inside ``window``.
    """
    iv = F.expr(f"INTERVAL {window}")
    anchors = (
        events.filter(F.col("event_type") == stages[0])
        .select("user_id", F.col("ts").alias("ts0"), "event_id")
    )
    chain = anchors
    prev = "ts0"
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.filter(F.col("event_type") == stage)
            .select(F.col("user_id").alias("u"), F.col("ts").alias("t"))
        )
        chain = (
            chain.join(
                nxt,
                (F.col("user_id") == F.col("u"))
                & (F.col("t") > F.col(prev))
                & (F.col("t") <= F.col("ts0") + iv),
                "left",
            )
            .groupBy("user_id", "ts0", "event_id", *[
                c for c in chain.columns if c.startswith("ts") and c != "ts0"
            ])
            .agg(F.min("t").alias(f"ts{i}"))
        )
        prev = f"ts{i}"
    stage_expr = F.lit(0)
    for i in range(len(stages)):
        stage_expr = F.when(F.col(f"ts{i}").isNotNull(), i + 1).otherwise(
            stage_expr
        )
    # ts_i non-null implies ts_{i-1} non-null (the join chained off
    # it), so the deepest non-null column IS the reached stage
    per_anchor = chain.select(
        "user_id", stage_expr.cast("long").alias("stage")
    )
    return (
        per_anchor.groupBy("user_id")
        .agg(F.max("stage").alias("max_stage"))
        .orderBy("user_id")
    )


def temporal_table_join(
    events: DataFrame,
    version_type: str = "signup",
    fact_type: str = "purchase",
) -> DataFrame:
    """Flink temporal table join (``FOR SYSTEM_TIME AS OF fact.ts``):
    the ``version_type`` events form a VERSIONED per-user dimension —
    each signup opens a version valid until the user's next signup
    (half-open ``[valid_from, valid_to)``), carrying its ``props``
    payload — and each ``fact_type`` event joins the version valid at
    its own event time. Facts before a user's first version survive
    null-extended (LEFT join), matching Flink's outer temporal join.

    Returns ``(user_id, event_id, ts, version_ts, version_props)``
    sorted by event_id. The interval containment join is the
    event-time temporal join Flink documents for versioned tables;
    building versions is one lead() window, the join is equi-key +
    range — the same shape as :func:`~flink_snappydata_spark.streaming.
    joins.interval_join`, bounded per user.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        events.filter(F.col("event_type") == version_type)
        .select("user_id", "ts", "event_id", "props")
        .select(
            F.col("user_id").alias("vu"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("valid_to"),
            F.col("props").alias("version_props"),
        )
    )
    facts = events.filter(F.col("event_type") == fact_type).select(
        "user_id", "event_id", "ts"
    )
    cond = (
        (F.col("user_id") == F.col("vu"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
    )
    return (
        facts.join(versions, cond, "left")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("valid_from").alias("version_ts"),
            "version_props",
        )
        .orderBy("event_id")
    )
