"""Golden plan-gauge pins for the 23 headline bench queries.

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
generator and this test, so they cannot drift.
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


def test_golden_covers_exactly_the_headline_set():
    from bench import HEADLINE

    assert list(_golden_rows()) == HEADLINE, (
        "golden gauge file out of sync with bench.HEADLINE; regenerate: "
        "python tools/dump_plans.py --golden-only"
    )


@pytest.mark.parametrize("name", sorted(_golden_rows()))
def test_headline_plan_gauges_match_golden(spark, name):
    from flink_snappydata_spark import registry
    from flink_snappydata_spark.plans.inspect import gauge_row

    df = registry.queries()[name](spark, SF_CORRECT)
    got = gauge_row(name, df)
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
    from flink_snappydata_spark.plans.inspect import gauge_row

    q = registry.queries()["q5_local_supplier_volume"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        broken = gauge_row("q5_local_supplier_volume", q(spark, SF_CORRECT))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert broken != _golden_rows()["q5_local_supplier_volume"], (
        "gauge pin failed to detect a disabled auto-broadcast"
    )
