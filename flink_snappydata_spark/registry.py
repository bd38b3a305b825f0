"""Declared-query registry — the engine's public correctness contract.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) gets:

* a named builder ``(spark, sf_dir) -> DataFrame`` running the Spark-side
  implementation, and
* an ANSI-SQL oracle string (DuckDB-runnable over the same parquet
  views) producing identical column names and values — or ``None`` for
  genuinely non-SQL-expressible ops (driver then does a rows-only check).

Column names are aliased identically on both sides; numeric outputs use
the exact integer-cents discipline of :mod:`flink_snappydata_spark.functions.exact`
so value hashes match bit-for-bit at any parallelism.

The specs themselves live in per-domain modules under
:mod:`flink_snappydata_spark.specs` (import order there = registration
order); THIS module owns only the driver-facing declaration order —
``_HEAD`` (the 50-slot driver-stamp window), ``_HEAD_ROUND``, and the
never-stamped queue — so the ordering contract stays auditable in one
place.
"""

from __future__ import annotations

# Importing the specs package registers every query, in spec-module
# import order, into the shared dict re-exported here.
from flink_snappydata_spark.specs import QUERIES, QueryFn, QuerySpec  # noqa: F401

# Back-compat re-exports for tests that reach into spec internals.
from flink_snappydata_spark.specs.profiling_analytics import (  # noqa: F401
    _scd2_streamed,
)

# ---------------------------------------------------------------------------
# Declaration order
# ---------------------------------------------------------------------------
# The correctness driver verifies registry entries front-to-back with a
# bounded budget (50 stamps per round). Order therefore encodes
# verification priority, not implementation grouping.
#
# ROUND-10 POLICY AMENDMENT (budget math, superseding the round-6
# "every third round" cadence): with 210 registered queries and a
# 50-stamp budget, the tightest cadence any rotation can sustain is
# every ceil(210/50) = FIFTH round — 50 stamps/round * 4 rounds = 200
# < 210, so a 3- or even 4-round cadence is structurally
# unsatisfiable once every query has been stamped at least once (the
# same arithmetic that forced the round-8 amendment when never-stamped
# backlog first exceeded the window). Effective policy, pinned by
# tests/test_oracle_parity.py::test_stamp_rotation_covers_stale_and_
# unstamped:
#
# (a) every query whose latest stamp is ceil(len(QUERIES)/50)+ rounds
#     old is inside the window (cadence floor, threshold derived from
#     the live registry size so it tightens/relaxes with the budget
#     math instead of silently rotting);
# (b) never-stamped queries are inside the window or head the
#     post-window order (new work first in line, never buried);
# (c) remaining slots go stalest-first.
#
# Local tests/test_oracle_parity.py still verifies ALL 210 queries
# against their DuckDB oracles every pytest run, so driver-stamp
# staleness never means unverified code, only an older driver receipt.
#
# Round-10 window (_HEAD, 50 names) — exactly the round-9 verdict's
# task-1 directive: the first 50 names of the r09 _R10_QUEUE, ALL
# never-stamped (rollup_multires … funnel_latency, the round-8
# OLAP/profiling/graph/text battery, in queue order). No stamped query
# is cadence-due at r10 under (a): the stalest stamps are r07
# (staleness 3 < 5). The 21 remaining never-stamped names head
# _R11_QUEUE per (b); the r07-stamped battery (39 queries, staleness 4
# at r11) fills r11's remaining 29 slots stalest-first per (c) and the
# final 10 follow at r12 alongside the r08 rotation.
#
# All 71 queue entries are fully verified locally every pytest run via
# test_oracle_parity plus the semantic tests in tests/test_round8_ops.py
# — driver-stamp pending, not unverified.

#: The round this _HEAD window was built for. The rotation tripwire
#: (tests/test_oracle_parity.py::test_stamp_rotation_covers_stale_and_
#: unstamped) computes staleness relative to THIS round, not to
#: max(stamp files)+1, so the suite a round ships stays green both
#: before and after the driver writes its CORRECTNESS_r{N}.json — and
#: goes red only if a round closes without rotating the window.
_HEAD_ROUND = 10

_HEAD = [
    # -- never stamped: first 50 of the r09 queue, in queue order --
    "rollup_multires",
    "random_projection",
    "hard_negatives",
    "pq_adc_topk",
    "inverted_index",
    "cms_heavy_hitters",
    "pagerank",
    "retention_cohorts",
    "ordered_funnel",
    "events_mad_outliers",
    "source_centroids",
    "embedding_dim_stats",
    "bloom_membership",
    "latest_snapshot",
    "timeline_gapfill",
    "percentile_bands",
    "vocab_growth",
    "knn_accuracy",
    "mmr_select",
    "typo_pairs",
    "zorder_key",
    "event_rate_spikes",
    "equidepth_histogram",
    "readability_scores",
    "session_paths",
    "snapshot_diff",
    "merge_upsert",
    "event_transitions",
    "zonemap_skip_stats",
    "weighted_sample",
    "ohlc_bars",
    "trend_regression",
    "conversion_attribution",
    "table_profile",
    "key_skew_profile",
    "bpe_merges",
    "temperature_mix",
    "user_growth",
    "itemset_pairs",
    "referential_audit",
    "graph_triangles",
    "ks_drift",
    "ab_test_report",
    "activity_heatmap",
    "repeat_purchase_stats",
    "session_conversion",
    "quantile_transform",
    "token_drift_topk",
    "rfm_segments",
    "funnel_latency",
]

#: The r11 stamp queue: the 21 still-never-stamped round-8 operators,
#: placed IMMEDIATELY after the 50-slot window in declaration order so
#: the next round's front-to-back stamping reaches them first. The
#: rotation test pins this position (never-stamped overflow must head
#: the post-window order — budget-bounded verification, nothing
#: buried). r11's remaining 29 slots go to the r07-stamped battery,
#: stalest-first.
_R11_QUEUE: list[str] = [
    "activity_gini",
    "embedding_top_pc",
    "zipf_fit",
    "html_clean",
    "bpe_encode_stats",
    "leakage_safe_split",
    "containment_pairs",
    "seasonal_anomaly",
    "benford_audit",
    "tokenizer_fertility",
    "rolling_active_users",
    "pareto_frontier",
    "ngram_diversity",
    "scd2_state_intervals",
    "winnowing_fingerprints",
    "source_tv_distance",
    "winnowing_pairs",
    "audio_silence_stats",
    "type_lag_correlation",
    "source_token_entropy",
    "email_domain_stats",
]

_TAIL: list[str] = []


def _reorder() -> None:
    order = _HEAD + _R11_QUEUE + _TAIL
    missing = [n for n in order if n not in QUERIES]
    if missing:  # pragma: no cover - guards registry edits
        raise KeyError(f"unknown registry entries in order lists: {missing}")
    middle = [
        n for n in QUERIES if n not in _HEAD and n not in _R11_QUEUE and n not in _TAIL
    ]
    ordered = {n: QUERIES[n] for n in _HEAD + _R11_QUEUE + middle + _TAIL}
    # Reorder IN PLACE: QUERIES is the same dict object the specs
    # package exports, so mutating (rather than rebinding) keeps
    # specs.QUERIES and registry.QUERIES identical — any importer sees
    # the driver-stamp order, not raw registration order.
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }


def judge_bearing_queries() -> set[str]:
    """Names of queries that embed their own exact judge (bound-verdict
    pattern) — their timings measure sketch + judge, not the raw scale
    path; the bench marks them and times raw variants separately."""
    return {name for name, spec in QUERIES.items() if spec.judge_bearing}
