"""Golden plan-gauge pins for the 23 headline bench queries plus the
sweep's expensive tail (tools.dump_plans.GAUGE_TAIL — the biggest
plans, where a silent regression costs the most).

PLANS.md's per-query gauges were regenerated every round but never
asserted, so a plan regression in an untouched query — a dropped
parquet pushdown after a refactor, a broadcast silently becoming a
shuffle, a new exchange — surfaced only as bench noise. This pins the
scale-relevant gauges (pushed-filter count, broadcast-join count,
shuffle-exchange count) for the headline set against a checked-in
golden table, exact match.

A failure means the physical plan changed. If the change is
intentional, regenerating the golden file is the explicit, reviewable
acceptance:

    python tools/dump_plans.py --golden-only

The gauge line format lives in one place —
:func:`flink_snappydata_spark.plans.inspect.gauge_row` — shared by the
generator and this test, so they cannot drift. Both measure CACHE-CLEAN
(:func:`~flink_snappydata_spark.plans.inspect.clean_gauge_row`):
Spark's CacheManager substitutes InMemoryRelation for any matching plan
subtree, so persists left by earlier tests would otherwise change a
later query's exchange count (dedup_minhash gauges 12 exchanges on a
polluted session vs 10 clean — seen as two mid-suite failures the first
time this file ran inside the full suite).
"""

from __future__ import annotations

import pathlib

import pytest

from tests.conftest import SF_CORRECT

GOLDEN = pathlib.Path(__file__).parent / "golden_plan_gauges.txt"


def _golden_rows() -> dict[str, str]:
    rows = {}
    for line in GOLDEN.read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        rows[line.split("|", 1)[0]] = line
    return rows


def test_golden_covers_exactly_the_pinned_set():
    from tools.dump_plans import PINNED_QUERIES

    assert list(_golden_rows()) == PINNED_QUERIES, (
        "golden gauge file out of sync with tools.dump_plans."
        "PINNED_QUERIES (HEADLINE + GAUGE_TAIL); regenerate: "
        "python tools/dump_plans.py --golden-only"
    )


@pytest.mark.parametrize("name", sorted(_golden_rows()))
def test_headline_plan_gauges_match_golden(spark, name):
    from flink_snappydata_spark import registry
    from flink_snappydata_spark.plans.inspect import clean_gauge_row

    got = clean_gauge_row(spark, name, registry.queries()[name], SF_CORRECT)
    want = _golden_rows()[name]
    assert got == want, (
        f"plan gauge drift for {name} (format name|pushed_filters|"
        f"broadcast_joins|exchanges):\n  golden: {want}\n  actual: {got}\n"
        "If intentional, accept with: python tools/dump_plans.py --golden-only"
    )


def test_gauges_detect_a_deliberate_plan_break(spark):
    """Known-bad case proving the pin has teeth: killing the
    auto-broadcast threshold demotes q5's un-hinted dimension
    broadcasts to shuffle joins — the gauge line MUST drift from
    golden (broadcasts drop, exchanges rise)."""
    from flink_snappydata_spark import registry
    from flink_snappydata_spark.plans.inspect import clean_gauge_row

    q = registry.queries()["q5_local_supplier_volume"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        broken = clean_gauge_row(spark, "q5_local_supplier_volume", q, SF_CORRECT)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert broken != _golden_rows()["q5_local_supplier_volume"], (
        "gauge pin failed to detect a disabled auto-broadcast"
    )


def test_clean_gauge_row_neutralizes_cache_pollution(spark):
    """Regression for the first full-suite run of this file: persists
    left by earlier tests made dedup_minhash gauge 12 exchanges instead
    of its clean 10 (CacheManager substitutes InMemoryRelation for any
    matching plan subtree). clean_gauge_row must reproduce the golden
    line even on a deliberately polluted session."""
    from flink_snappydata_spark import registry
    from flink_snappydata_spark.plans.inspect import clean_gauge_row, gauge_row

    q = registry.queries()["dedup_minhash"]
    q(spark, SF_CORRECT).count()  # materialize → tracked persists linger
    polluted = gauge_row("dedup_minhash", q(spark, SF_CORRECT))
    clean = clean_gauge_row(spark, "dedup_minhash", q, SF_CORRECT)
    assert clean == _golden_rows()["dedup_minhash"], clean
    # the pollution itself must be visible to the raw gauge, otherwise
    # this test guards nothing (exchange count drops when cached
    # subtrees replace shuffle stages)
    assert polluted != clean, "expected cache pollution to alter raw gauges"
