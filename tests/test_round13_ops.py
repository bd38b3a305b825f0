"""Round-13 operators and fixes: the gated presentation sort on
temporal_table_join, fixed-width interval parsing for the banded-join
family, the event-time-timeout live CEP absence path, and the general
CEP pattern builder.

Oracle parity for the registered queries is covered by
test_oracle_parity; the tests here pin the library-path behaviors the
oracle can't see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401 (fixtures below)

from flink_snappydata_spark.catalog import load_table

SF = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


# ----------------------------------- interval parsing (banded joins)


def test_window_seconds_fixed_width_units():
    """Every fixed-width Spark interval unit the streaming path accepts
    must parse in the batch banding path too (ADVICE r12: '90 seconds'
    raised KeyError after interval_join started routing lookback
    through _window_seconds)."""
    from flink_snappydata_spark.operators.cep import _window_seconds

    assert _window_seconds("90 seconds") == 90
    assert _window_seconds("1 second") == 1
    assert _window_seconds("15 minutes") == 900
    assert _window_seconds("2 hours") == 7200
    assert _window_seconds("1 day") == 86400
    assert _window_seconds("1 week") == 604800
    assert _window_seconds("2 Weeks") == 1209600  # case-insensitive


def test_window_seconds_rejects_calendar_units():
    """Calendar units have no fixed width — banding on an approximated
    width silently drops matches near month boundaries, so the parse
    must fail loudly, naming the offending interval."""
    from flink_snappydata_spark.operators.cep import _window_seconds

    for bad in ("1 month", "3 years", "1", "day", "x day"):
        with pytest.raises(ValueError, match="unsupported interval"):
            _window_seconds(bad)


def test_interval_join_batch_accepts_seconds_lookback(spark):
    """The batch twin of interval_join must accept any fixed-width
    lookback the streaming twin accepts — '90 seconds' used to raise
    KeyError only in batch mode (silent mode divergence)."""
    from flink_snappydata_spark.streaming.joins import interval_join

    ev = load_table(spark, SF_SMOKE, "events")
    clicks = ev.filter(ev.event_type == "click")
    purchases = ev.filter(ev.event_type == "purchase")
    out = interval_join(clicks, purchases, lookback="90 seconds")
    # no assertion on rows beyond non-crash + schema: the semantic
    # contract is pinned at '1 hour' by the oracle-backed query
    assert out.columns and out.count() >= 0


# ------------------------------- temporal join: gated presentation sort


def test_temporal_table_join_sort_gate(spark):
    """sort=False must (a) drop the corpus-sized global orderBy from
    the plan — no top-level Sort/Exchange rangepartitioning above the
    window stage — and (b) return exactly the same row SET as the
    spec path (sort is presentation only)."""
    from flink_snappydata_spark.operators.cep import temporal_table_join

    ev = load_table(spark, SF_SMOKE, "events")
    sorted_rows = temporal_table_join(ev).collect()
    unsorted = temporal_table_join(ev, sort=False)
    assert {tuple(r) for r in unsorted.collect()} == {
        tuple(r) for r in sorted_rows
    }
    plan = unsorted._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(event_id" not in plan, (
        "sort=False must not range-exchange on the presentation key"
    )


# --------------------------- IVFADC prebuilt path, registered query


def test_ivf_pq_prebuilt_topk_registered(spark):
    """The driver-stamped production ANN path: the registered
    ivf_pq_prebuilt_topk query must (a) return rows identical to the
    inline-training ivf_pq_topk (same oracle applies), and (b) carry a
    training-free plan — file-backed index scans, <= 15 exchanges
    (the inline DAG optimizes to ~60)."""
    from flink_snappydata_spark.registry import QUERIES, queries

    spec = QUERIES["ivf_pq_prebuilt_topk"]
    assert spec.oracle == QUERIES["ivf_pq_topk"].oracle
    qs = queries()
    prebuilt = qs["ivf_pq_prebuilt_topk"](spark, SF_SMOKE)
    inline = qs["ivf_pq_topk"](spark, SF_SMOKE)
    assert [tuple(r) for r in prebuilt.collect()] == [
        tuple(r) for r in inline.collect()
    ]
    from flink_snappydata_spark.plans.inspect import exchange_count

    n_ex = exchange_count(prebuilt)  # shuffle exchanges, gauge metric
    assert n_ex <= 15, f"prebuilt plan still carries training ({n_ex} exchanges)"


def test_ivfpq_prebuilt_memo_is_session_keyed(spark, tmp_path):
    """Review-fix pin (r13 + the r14 concurrent-session hardening):
    the prebuilt-index memo is keyed by (session identity, sf_dir) —
    a dead session's entry must not be returned and its on-disk
    directory IS reclaimed on the next build, while a CONCURRENTLY
    LIVE session's entry and directory must survive another session's
    rebuild (its loaded qv/codes frames still point at those files)."""
    import os

    from flink_snappydata_spark.specs import embeddings_quality as eq

    idx = eq.ivfpq_prebuilt_index(spark, SF_SMOKE)
    assert eq.ivfpq_prebuilt_index(spark, SF_SMOKE) is idx, "same-session hit"
    live_key = (id(spark), SF_SMOKE)
    _, live_idx, live_dir = eq._IVFPQ_PREBUILT[live_key]

    # (a) dead-session entry (no SparkContext => confirmed stopped):
    #     reclaimed on the next build
    stale_dir = str(tmp_path / "stale-ivfpq")
    os.makedirs(stale_dir, exist_ok=True)
    dead_owner = object()
    eq._IVFPQ_PREBUILT[(id(dead_owner), SF_SMOKE)] = (
        dead_owner, live_idx, stale_dir,
    )
    # (b) concurrently-live entry (this session, different sf_dir key):
    #     must NOT be reclaimed by another key's rebuild
    peer_dir = str(tmp_path / "peer-ivfpq")
    os.makedirs(peer_dir, exist_ok=True)
    peer_key = (id(spark), str(tmp_path / "peer-sf"))
    eq._IVFPQ_PREBUILT[peer_key] = (spark, live_idx, peer_dir)
    # force a rebuild of the live key by dropping it
    del eq._IVFPQ_PREBUILT[live_key]
    try:
        rebuilt = eq.ivfpq_prebuilt_index(spark, SF_SMOKE)
        assert eq._IVFPQ_PREBUILT[live_key][0] is spark, "re-keyed to session"
        assert not os.path.exists(stale_dir), "dead session dir reclaimed"
        assert os.path.exists(peer_dir), "live session dir must survive"
        assert peer_key in eq._IVFPQ_PREBUILT, "live entry must survive"
        assert len(rebuilt.qv.take(1)) == 1, "rebuilt index is live"
    finally:
        eq._IVFPQ_PREBUILT.pop(peer_key, None)
        assert eq._IVFPQ_PREBUILT[live_key][0] is spark


# ------------------- mergeable-partial compaction (wordcount loop)


def test_wordcount_compaction_drain_equals_batch(spark):
    """The round-12 session/funnel compaction floor extended to the
    mergeable-partial loops: 4-batch replay with compact_every=2 must
    (a) fold to exactly the batch word count (compaction is exact —
    sum of sums), (b) stamp a non-zero floor, and (c) leave the LIVE
    partial set bounded by ~vocabulary size, not stream age; the CMS
    twin reads the SAME table floor-aware and must also equal its
    single-pass sketch."""
    from flink_snappydata_spark.operators import wordcount
    from flink_snappydata_spark.pipeline import text as textops

    from tests.test_round12_ops import _replay_ingest

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    want = sorted(
        tuple(r) for r in wordcount.word_count(docs, col="text").collect()
    )
    got, state = _replay_ingest(
        spark,
        docs,
        4,
        lambda s, t: wordcount.streaming_wordcount_ingest(
            s, t, compact_every=2
        ),
        wordcount.wordcount_from_state,
        "wccomp",
    )
    assert got == want
    floor = max(r["floor"] for r in state)
    assert floor > 0, "4-batch replay with compact_every=2 must compact"
    vocab = len(want)
    live = [r for r in state if r["batch_id"] >= floor]
    # live partials: one compacted row per word + at most the batches
    # since compaction re-adding per-batch vocabulary partials
    assert len(live) <= 2 * vocab, "live partials must be vocab-bounded"
    # the CMS twin reads the same compacting table and must match its
    # own batch op (exact counts fold batching- and compaction-blind)
    cms_got, _ = _replay_ingest(
        spark,
        docs,
        4,
        lambda s, t: wordcount.streaming_wordcount_ingest(
            s, t, compact_every=2
        ),
        textops.cms_from_state,
        "cmscomp",
    )
    cms_want = sorted(
        tuple(r) for r in textops.cms_heavy_hitters(docs).collect()
    )
    assert cms_got == cms_want


def test_rollup_compaction_drain_equals_batch(spark):
    """Same floor discipline on the events-side hourly partials:
    4-batch replay with compact_every=2 must fold to exactly the batch
    multi-resolution rollup, stamp a non-zero floor, and leave the
    live partial set bucket-bounded."""
    from flink_snappydata_spark.streaming import windows as stream_windows

    from tests.test_round12_ops import _replay_ingest

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    want = sorted(
        tuple(r) for r in stream_windows.rollup_multires(ev).collect()
    )
    got, state = _replay_ingest(
        spark,
        ev,
        4,
        lambda s, t: stream_windows.streaming_rollup_ingest(
            s, t, compact_every=2
        ),
        stream_windows.rollup_from_state,
        "rollcomp",
    )
    assert got == want
    floor = max(r["floor"] for r in state)
    assert floor > 0, "4-batch replay with compact_every=2 must compact"
    n_buckets = len(
        {(r["bucket_start"], r["event_type"]) for r in state}
    )
    live = [r for r in state if r["batch_id"] >= floor]
    assert len(live) <= 2 * n_buckets, "live partials must be bucket-bounded"


# ------------------------------------ general CEP pattern builder


def _mk_events(spark, rows):
    """rows: (user_id, ts_offset_s, event_id, event_type, value)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (u, t0 + dt.timedelta(seconds=s), e, et, v)
            for u, s, e, et, v in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double",
    )


def test_pattern_builder_strict_contiguity_and_quantifiers(spark):
    """STRICT contiguity: an interleaved non-stage event breaks the
    pattern; quantifiers bound the maximal run; the middle stage's
    non-type predicate (value >= 0.5) filters by value."""
    from flink_snappydata_spark.operators.cep import cep_funnel_pattern

    ev = _mk_events(
        spark,
        [
            # user 1: clean view click click purchase -> match
            (1, 0, 1, "view", 1.0),
            (1, 1, 2, "click", 0.9),
            (1, 2, 3, "click", 0.8),
            (1, 3, 4, "purchase", 5.0),
            # user 2: error interleaves the click run -> NO match
            (2, 0, 5, "view", 1.0),
            (2, 1, 6, "click", 0.9),
            (2, 2, 7, "error", 0.0),
            (2, 3, 8, "click", 0.8),
            (2, 4, 9, "purchase", 5.0),
            # user 3: only ONE qualifying click (other is value<0.5)
            (3, 0, 10, "view", 1.0),
            (3, 1, 11, "click", 0.1),
            (3, 2, 12, "click", 0.9),
            (3, 3, 13, "purchase", 5.0),
        ],
    )
    got = cep_funnel_pattern(ev).collect()
    assert [r.user_id for r in got] == [1]
    assert got[0].n_view == 1 and got[0].n_click == 2 and got[0].n_purchase == 1


def test_pattern_builder_bounded_max_count(spark):
    """Bounded max_count on an EDGE stage sub-run-matches an over-long
    maximal run (NFA semantics — the r13 run-quantified delta is
    closed in r14): user 2's click run of 3 matches its 2-event
    SUFFIX, so match_start moves to the run's second event and the
    emitted count caps at the bound. A bounded MIDDLE stage still
    fails on overrun (forced consumption — see
    tests/test_round14_ops.py for the NFA differential)."""
    from flink_snappydata_spark.operators.cep import (
        PatternStage,
        cep_match_pattern,
    )

    ev = _mk_events(
        spark,
        [
            (1, 0, 1, "click", 1.0),
            (1, 1, 2, "click", 1.0),
            (1, 2, 3, "purchase", 1.0),
            (2, 0, 4, "click", 1.0),
            (2, 1, 5, "click", 1.0),
            (2, 2, 6, "click", 1.0),  # run of 3 > max_count=2: suffix
            (2, 3, 7, "purchase", 1.0),
        ],
    )
    stages = [
        PatternStage("click", "click", min_count=2, max_count=2),
        PatternStage("buy", "purchase"),
    ]
    got = cep_match_pattern(ev, stages).collect()
    assert [r.user_id for r in got] == [1, 2]
    assert got[0].n_click == 2 and got[0].n_buy == 1
    # user 2: suffix of the 3-run — starts at the run's SECOND event
    u2 = got[1]
    assert u2.n_click == 2 and u2.n_buy == 1
    by_id = {r.event_id: r.ts for r in ev.collect()}
    assert u2.match_start == by_id[5], "match_start = suffix boundary"
    assert u2.match_end == by_id[7]

    # middle-stage overrun still has no match, engine and NFA alike
    mid = [
        PatternStage("view", "view"),
        PatternStage("click", "click", min_count=1, max_count=2),
        PatternStage("buy", "purchase"),
    ]
    ev2 = _mk_events(
        spark,
        [
            (3, 0, 1, "view", 1.0),
            (3, 1, 2, "click", 1.0),
            (3, 2, 3, "click", 1.0),
            (3, 3, 4, "click", 1.0),  # middle run of 3 > max 2
            (3, 4, 5, "purchase", 1.0),
        ],
    )
    assert cep_match_pattern(ev2, mid).collect() == []


def test_pattern_builder_validation_and_one_shuffle(spark):
    """Spec validation fails loudly; the compiled plan carries exactly
    ONE shuffle exchange (everything reuses the user_id hash
    partitioning) when sort=False."""
    import pytest as _pytest

    from flink_snappydata_spark.operators.cep import (
        PatternStage,
        cep_match_pattern,
        cep_funnel_pattern,
    )
    from flink_snappydata_spark.plans.inspect import exchange_count

    with _pytest.raises(ValueError, match="at least one stage"):
        cep_match_pattern(_mk_events(spark, []), [])
    with _pytest.raises(ValueError, match="unique"):
        cep_match_pattern(
            _mk_events(spark, []),
            [PatternStage("a", "view"), PatternStage("a", "click")],
        )
    ev = load_table(spark, SF_SMOKE, "events")
    from flink_snappydata_spark.operators.cep import PatternStage as PS

    df = cep_match_pattern(
        ev,
        [PS("view", "view"), PS("click", "click", 2), PS("buy", "purchase")],
        sort=False,
    )
    assert exchange_count(df) == 1, "islands + lead must reuse ONE shuffle"


def test_pattern_builder_matches_are_disjoint(spark):
    """With pairwise-disjoint stage predicates, matches never overlap
    per user (the skip-past-last-row guarantee the docstring derives)."""
    from flink_snappydata_spark.operators.cep import cep_funnel_pattern

    ev = load_table(spark, SF, "events")
    rows = cep_funnel_pattern(ev).collect()
    assert rows, "fixture must produce matches (non-vacuous)"
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r.match_start)
        for a, b in zip(user_rows, user_rows[1:]):
            assert a.match_end < b.match_start, "matches must be disjoint"


def test_pattern_builder_relaxed_contiguity_and_within(spark):
    """followedBy semantics: irrelevant events neither break a run nor
    separate stages, and same-stage bursts separated only by noise
    merge (greedy absorption); within bounds match_end - match_start."""
    from flink_snappydata_spark.operators.cep import (
        PatternStage,
        cep_match_pattern,
    )

    ev = _mk_events(
        spark,
        [
            # user 1: noise inside the click run and between stages —
            # relaxed matches (2 clicks absorb across the error), strict
            # does not
            (1, 0, 1, "view", 1.0),
            (1, 1, 2, "click", 0.9),
            (1, 2, 3, "error", 0.0),
            (1, 3, 4, "click", 0.8),
            (1, 4, 5, "error", 0.0),
            (1, 5, 6, "purchase", 5.0),
            # user 2: same shape but the purchase lands 3 days after
            # the view — the within='2 days' gate drops it
            (2, 0, 7, "view", 1.0),
            (2, 1, 8, "click", 0.9),
            (2, 2, 9, "click", 0.8),
            (2, 259200, 10, "purchase", 5.0),
        ],
    )
    stages = [
        PatternStage("view", "view"),
        PatternStage("click", "click", min_count=2),
        PatternStage("buy", "purchase"),
    ]
    strict = cep_match_pattern(ev, stages).collect()
    assert [r.user_id for r in strict] == [2], (
        "strict: noise breaks user 1; user 2 matches (no within)"
    )
    relaxed = cep_match_pattern(ev, stages, contiguity="relaxed").collect()
    assert [r.user_id for r in relaxed] == [1, 2]
    assert relaxed[0].n_click == 2, "bursts absorb across noise"
    bounded = cep_match_pattern(
        ev, stages, contiguity="relaxed", within="2 days"
    ).collect()
    assert [r.user_id for r in bounded] == [1], "within gates user 2"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strict|relaxed"):
        cep_match_pattern(ev, stages, contiguity="skip_till_next")


# ----------------------------- live general pattern state machine


def test_pattern_machine_is_split_invariant(spark):
    """advance_pattern_state folded across EVERY split point of an
    ordered label sequence must equal the single-pass result — the
    cross-batch continuation contract (closed prefix + open run ride
    the state store)."""
    from flink_snappydata_spark.operators.cep import stage_label_expr
    from flink_snappydata_spark.streaming.cep import advance_pattern_state

    from flink_snappydata_spark.operators.cep import PatternStage as PS

    stages = [PS("view", "view"), PS("click", "click", 2), PS("buy", "purchase")]
    quants = [(s.min_count, s.max_count) for s in stages]
    ev = load_table(spark, SF_SMOKE, "events")
    labeled = ev.select(
        "user_id", "ts", "event_id", stage_label_expr(stages).alias("lab")
    )
    # the fixture user with the most stage-participating events
    uid = (
        labeled.filter(F.col("lab") > 0)
        .groupBy("user_id")
        .count()
        .orderBy(F.col("count").desc(), "user_id")
        .first()
        .user_id
    )
    rows = [
        (int(r.ts.timestamp() * 1_000_000), r.lab)
        for r in labeled.filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .collect()
    ]
    single, end_state = advance_pattern_state(((), None), rows, quants)
    for cut in range(len(rows) + 1):
        m1, s1 = advance_pattern_state(((), None), rows[:cut], quants)
        m2, s2 = advance_pattern_state(s1, rows[cut:], quants)
        assert m1 + m2 == single, f"split at {cut} diverged"
        assert s2 == end_state


def test_streaming_pattern_equals_batch_with_flush(spark, tmp_path):
    """Two-batch replay of the fixture followed by per-key FLUSH
    records (sentinel type, after each user's last event — they close
    every trailing run and can never join a match): the live machine's
    matches must be row-identical to the batch compiler over the
    ORIGINAL events (batch end-of-data closes runs implicitly; the
    flush makes the live machine see the same closures)."""
    import datetime as dt

    import pandas as pd

    from flink_snappydata_spark.operators.cep import cep_funnel_pattern
    from flink_snappydata_spark.operators.cep import PatternStage as PS
    from flink_snappydata_spark.streaming import runtime
    from flink_snappydata_spark.streaming.cep import streaming_cep_pattern

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    halves = [pdf.iloc[: len(pdf) // 2], pdf.iloc[len(pdf) // 2 :]]
    flush = (
        pdf.groupby("user_id")
        .agg(last_ts=("ts", "max"), last_eid=("event_id", "max"))
        .reset_index()
    )
    base = str(tmp_path / "pstream")
    for i, half in enumerate(halves):
        spark.createDataFrame(half).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{base}/f{i}.parquet")
    flush_rows = [
        (
            int(r.user_id),
            r.last_ts.to_pydatetime() + dt.timedelta(days=400),
            int(r.last_eid) + 10_000_000,
            "__flush__",
            0.0,
        )
        for r in flush.itertuples()
    ]
    spark.createDataFrame(
        flush_rows,
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/f2.parquet")
    import os

    for i, mt in enumerate((1_700_000_000, 1_700_000_100, 1_700_000_200)):
        d = f"{base}/f{i}.parquet"
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (mt, mt))
        os.utime(d, (mt, mt))
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string,"
            " value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*.parquet")
    )
    stages = [
        PS("view", "view"),
        PS(
            "click",
            (F.col("event_type") == "click") & (F.col("value") >= 0.5),
            min_count=2,
        ),
        PS("purchase", "purchase"),
    ]
    live = streaming_cep_pattern(stream, stages)
    runtime.run_to_memory_sink(live, "pattern_live", output_mode="append")
    got = spark.table("pattern_live").toPandas()
    want = cep_funnel_pattern(ev).toPandas()
    cols = ["user_id", "match_start", "match_end", "n_view", "n_click", "n_purchase"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got), "non-vacuous"
    pd.testing.assert_frame_equal(got, want)


def test_streaming_pattern_relaxed_within_matches_batch(spark):
    """The live machine under contiguity='relaxed' + within must agree
    with the batch builder on a single-batch replay (relaxed drops the
    sentinel rows JVM-side, so every run is closed by the next stage
    event or the flushless end counts only via closed runs — compare
    on the batch matches whose final run is closed in-stream)."""
    import pandas as pd

    from flink_snappydata_spark.operators.cep import (
        cep_funnel_pattern_relaxed,
        _funnel_stages,
    )
    from flink_snappydata_spark.streaming import runtime
    from flink_snappydata_spark.streaming.cep import streaming_cep_pattern

    stream = runtime.events_file_stream(spark, SF_SMOKE)
    live = streaming_cep_pattern(
        stream, _funnel_stages(), contiguity="relaxed", within="2 days"
    )
    runtime.run_to_memory_sink(live, "pattern_relaxed_live", "append")
    got = spark.table("pattern_relaxed_live").toPandas()
    want = cep_funnel_pattern_relaxed(
        load_table(spark, SF_SMOKE, "events")
    ).toPandas()
    cols = ["user_id", "match_start", "match_end", "n_view", "n_click",
            "n_purchase"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    # live withholds matches whose final purchase run is still open at
    # end-of-stream (no flush here); every emitted match must be a
    # batch match, and matches closed in-stream must all emit
    merged = got.merge(want[cols], how="left", indicator=True)
    assert (merged["_merge"] == "both").all(), "live ⊄ batch"
    assert len(got) >= 1, "non-vacuous"


# --------------------- live absence (notFollowedBy, event-time timer)


def test_absence_state_machine_is_split_invariant(spark):
    """advance_absence_state folded across EVERY split point of an
    ordered sequence must equal the single-pass result, and its
    in-stream alerts must agree with the batch cep_absence_alerts rows
    whose runs are closed by an event (next_type non-null)."""
    from flink_snappydata_spark.operators.cep import cep_absence_alerts
    from flink_snappydata_spark.streaming.cep import advance_absence_state

    ev = load_table(spark, SF_SMOKE, "events")
    uid = (
        ev.filter(ev.event_type == "click")
        .groupBy("user_id")
        .count()
        .orderBy(F.col("count").desc())
        .first()
        .user_id
    )
    rows = [
        (int(r.ts.timestamp() * 1_000_000), r.event_type)
        for r in ev.filter(ev.user_id == uid)
        .orderBy("ts", "event_id")
        .collect()
    ]
    single, end_state = advance_absence_state((0, 0, 0), rows)
    for cut in range(len(rows) + 1):
        f1, s1 = advance_absence_state((0, 0, 0), rows[:cut])
        f2, s2 = advance_absence_state(s1, rows[cut:])
        assert f1 + f2 == single, f"split at {cut} diverged"
        assert s2 == end_state
    want = sorted(
        (
            int(r.run_start.timestamp() * 1_000_000),
            int(r.run_end.timestamp() * 1_000_000),
            r.n_run,
            r.next_type,
            int(r.next_ts.timestamp() * 1_000_000),
        )
        for r in cep_absence_alerts(ev.filter(ev.user_id == uid)).collect()
        if r.next_type is not None  # silence rows are the timer's job
    )
    assert sorted(single) == want
    assert want, "chosen user must produce at least one in-stream alert"


def _write_event_file(spark, path, rows, mtime):
    """One parquet file of (user_id, ts, event_id, event_type) rows
    with a pinned mtime — the file source processes files in mtime
    order, so tests control micro-batch boundaries exactly."""
    import os

    df = spark.createDataFrame(
        [(u, ts, eid, et) for u, ts, eid, et in rows],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_streaming_absence_silence_fires_on_event_time_timer(spark, tmp_path):
    """THE notFollowedBy silence case, live: a qualifying click run
    with NO closing event must alert (null next_type/next_ts) once the
    event-time watermark passes run_end + within — fired by the
    EventTimeTimeout timer, not by any closing event. Three files =
    three micro-batches: (1) the run, (2) an unrelated user advancing
    max event time, (3) another unrelated event so the batch-2
    watermark (which excludes batch 2's own rows) passes the deadline
    and the timer fires."""
    import datetime as dt

    from flink_snappydata_spark.streaming import runtime
    from flink_snappydata_spark.streaming.cep import streaming_cep_absence

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    base = str(tmp_path / "stream")
    day = dt.timedelta(days=1)
    _write_event_file(
        spark,
        f"{base}/f1.parquet",
        [(1, t0, 10, "click"), (1, t0 + dt.timedelta(minutes=1), 11, "click")],
        mtime=1_700_000_000,
    )
    _write_event_file(
        spark,
        f"{base}/f2.parquet",
        [(999, t0 + 3 * day, 20, "view")],
        mtime=1_700_000_100,
    )
    _write_event_file(
        spark,
        f"{base}/f3.parquet",
        [(998, t0 + 4 * day, 30, "view")],
        mtime=1_700_000_200,
    )
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*.parquet")
    )
    alerts = streaming_cep_absence(stream, within="1 day")
    runtime.run_to_memory_sink(alerts, "absence_live", output_mode="append")
    got = spark.table("absence_live").collect()
    assert len(got) == 1, f"exactly one silence alert expected, got {got}"
    a = got[0]
    assert a.user_id == 1 and a.n_run == 2
    assert a.run_start == t0
    assert a.run_end == t0 + dt.timedelta(minutes=1)
    assert a.next_type is None and a.next_ts is None


def test_streaming_absence_expired_run_fires_despite_new_data(spark, tmp_path):
    """Batching-invariance of the silence alert (review finding r13):
    when a key receives NEW data in the batch where its pattern window
    is already watermark-expired (hasTimedOut only fires for keys
    without data), the stored run must alert and reset BEFORE the fold
    — not silently extend across the expired gap. Batch 1: a 2-click
    run + an unrelated event 5 days out (watermark passes the 1-day
    deadline). Batch 2: the SAME user clicks again at day 10 — the
    day-0 run must emit a silence alert with n_run=2, and the new
    click must start a fresh run (no n_run=3 merge, no lost alert)."""
    import datetime as dt

    from flink_snappydata_spark.streaming import runtime
    from flink_snappydata_spark.streaming.cep import streaming_cep_absence

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    day = dt.timedelta(days=1)
    base = str(tmp_path / "stream")
    _write_event_file(
        spark,
        f"{base}/f1.parquet",
        [
            (1, t0, 10, "click"),
            (1, t0 + dt.timedelta(minutes=1), 11, "click"),
            (999, t0 + 5 * day, 20, "view"),
        ],
        mtime=1_700_000_000,
    )
    _write_event_file(
        spark,
        f"{base}/f2.parquet",
        [(1, t0 + 10 * day, 30, "click")],
        mtime=1_700_000_100,
    )
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/*.parquet")
    )
    alerts = streaming_cep_absence(stream, within="1 day")
    runtime.run_to_memory_sink(alerts, "absence_expiry", output_mode="append")
    got = spark.table("absence_expiry").collect()
    assert len(got) == 1, f"exactly the day-0 silence alert expected: {got}"
    a = got[0]
    assert a.user_id == 1 and a.n_run == 2
    assert a.run_end == t0 + dt.timedelta(minutes=1)
    assert a.next_type is None and a.next_ts is None


def test_streaming_absence_in_stream_close_matches_batch(spark):
    """Single-batch replay of the fixture: every live alert closed by
    an in-stream event must be exactly the batch op's non-silence
    alert set (the containment the module docstring declares)."""
    import pandas as pd

    from flink_snappydata_spark.operators.cep import cep_absence_alerts
    from flink_snappydata_spark.streaming import runtime
    from flink_snappydata_spark.streaming.cep import streaming_cep_absence

    stream = runtime.events_file_stream(spark, SF_SMOKE)
    live = streaming_cep_absence(stream)
    runtime.run_to_memory_sink(live, "absence_live_smoke", output_mode="append")
    got = spark.table("absence_live_smoke").toPandas()
    got = got[got["next_type"].notna()]
    want = cep_absence_alerts(load_table(spark, SF_SMOKE, "events")).toPandas()
    want = want[want["next_type"].notna()]
    cols = ["user_id", "run_start", "run_end", "n_run", "next_type", "next_ts"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got), "non-vacuous"
    pd.testing.assert_frame_equal(got, want)
