"""Streaming CEP pattern matching — Flink CEP's operational model
(a per-key state machine carrying the open partial match) on
Structured Streaming's ``applyInPandasWithState``.

The batch twins are :func:`flink_snappydata_spark.operators.cep.
cep_pattern_match` (the oracle-checked declared query) and the general
:func:`~flink_snappydata_spark.operators.cep.cep_match_pattern`
builder; this module is the LIVE form: matches emit in the micro-batch
whose closing event completes them, and a run still open at a batch
boundary rides the state store into the next batch — exactly how
Flink CEP keeps partial matches in keyed state.
:func:`streaming_cep_pattern` is the live GENERAL machine (same
``PatternStage`` spec as the batch builder, stage labels evaluated
JVM-side, O(k)-long keyed state). Emits the same rows as the batch op when input
arrives in event-time order (the streaming-equivalence test), and the
pure state-transition core (:func:`advance_cep_state`) is
unit-tested for cross-batch continuation at every split point.

Scale: state per key is ONE open run (three longs — start, end,
length), independent of stream length or pattern frequency; matches
stream out append-only. Same footprint class as the count-window op's
ring buffer, smaller.

Absence (notFollowedBy): :func:`streaming_cep_absence` covers BOTH
absence cases live — the wrong-event / too-late-trigger close emits in
the micro-batch of the closing event, and the SILENCE case fires on an
``EventTimeTimeout`` timer when the watermark passes
``run_end + within`` with no closing event (Flink CEP's
``notFollowedBy(...).within(...)`` timer semantics: the pattern window
expires, the partial match fires as an alert and is discarded, so a
later run-type event starts a NEW run — whereas the batch
:func:`cep_absence_alerts` over the raw-log twin computes maximal runs
over ALL history regardless of gaps; the two agree whenever runs are
closed in-stream, which the containment test pins).
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_snappydata_spark.operators.cep import _window_seconds

MATCH_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("run_start", TimestampType()),
        StructField("run_end", TimestampType()),
        StructField("n_run", LongType()),
        StructField("trigger_ts", TimestampType()),
    ]
)

#: (run_start_us, run_end_us, n_run) — the open partial match; n_run=0
#: means no pending run (start/end are then meaningless zeros).
STATE_SCHEMA = StructType(
    [
        StructField("run_start_us", LongType()),
        StructField("run_end_us", LongType()),
        StructField("n_run", LongType()),
    ]
)


def _ordered_rows(pdfs: Iterator[pd.DataFrame], col: str) -> list[tuple]:
    """Concatenate a group's Arrow chunks, sort ONCE globally by
    (ts, event_id), and project to (ts_us, <col>) pairs — the shared
    entry step of every per-key state machine here. One global sort,
    not per-chunk: a key's batch rows can arrive as several chunks in
    arbitrary order (groups larger than arrow.maxRecordsPerBatch), and
    sorting chunks independently would interleave wrongly, corrupting
    both the emitted rows and the carried state."""
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"])
    return [
        (int(ts.value // 1000), v) for ts, v in zip(pdf["ts"], pdf[col])
    ]


def _ordered_rows_vals(
    pdfs: Iterator[pd.DataFrame], col: str
) -> list[tuple]:
    """:func:`_ordered_rows` carrying the ``value`` column too —
    (ts_us, <col>, value) triples for machines with iterative
    conditions."""
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"])
    return [
        (int(ts.value // 1000), lab, v)
        for ts, lab, v in zip(pdf["ts"], pdf[col], pdf["value"])
    ]


def _advance_run_state(state, rows, run_type, on_close):
    """THE shared run-tracking fold for the single-run CEP family:
    extend the open run on ``run_type`` rows, and on any other row
    hand ``(run_start, run_end, n, closer_type, closer_ts)`` to
    ``on_close`` — whatever it returns non-None is emitted — then
    reset. One owner for the run semantics (extend/close/carry), so
    the match fold and its absence complement cannot drift apart (the
    matches ∪ alerts partition invariant the tests pin). Associative
    over splits of an ordered sequence (the only carried context is
    the open trailing run)."""
    run_start, run_end, n = state
    out: list = []
    for ts_us, etype in rows:
        if etype == run_type:
            if n == 0:
                run_start = ts_us
            run_end = ts_us
            n += 1
            continue
        fire = on_close(run_start, run_end, n, etype, ts_us)
        if fire is not None:
            out.append(fire)
        n = 0
    return out, (run_start, run_end, n)


def advance_cep_state(
    state: tuple[int, int, int],
    rows: list[tuple[int, str]],
    run_type: str = "click",
    trigger_type: str = "purchase",
    min_run: int = 2,
    within_us: int = 86_400_000_000,
) -> tuple[list[tuple[int, int, int, int]], tuple[int, int, int]]:
    """Pure state transition: fold (ts_us, event_type) rows — already
    in event-time order — through the pattern state machine.

    Returns ``(fires, new_state)`` where each fire is
    ``(run_start_us, run_end_us, n_run, trigger_ts_us)``. Associative
    over splits of an ordered sequence by construction — pinned by the
    every-split-point test. The run fold itself is the shared
    :func:`_advance_run_state`; this wires in the MATCH close
    predicate (trigger in time, run long enough)."""

    def on_close(run_start, run_end, n, etype, ts_us):
        if (
            n >= min_run
            and etype == trigger_type
            and ts_us <= run_end + within_us
        ):
            return (run_start, run_end, n, ts_us)
        return None

    return _advance_run_state(state, rows, run_type, on_close)


def streaming_cep_match(
    events: DataFrame,
    run_type: str = "click",
    trigger_type: str = "purchase",
    min_run: int = 2,
    within: str = "1 day",
) -> DataFrame:
    """Live MATCH_RECOGNIZE ``PATTERN (C{min_run,} P)``: per-key
    pattern state machine over ``applyInPandasWithState``. Rows inside
    each micro-batch are processed in (ts, event_id) order per key;
    across batches, arrival order — Flink CEP's semantics. A match
    emits in the micro-batch that completes it."""
    within_us = _window_seconds(within) * 1_000_000

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        st = state.get if state.exists else (0, 0, 0)
        rows = _ordered_rows(pdfs, "event_type")
        all_fires, st = advance_cep_state(
            st, rows, run_type, trigger_type, min_run, within_us
        )
        if st[2] == 0:
            # no open run: drop the state-store entry so the store is
            # bounded by keys with OPEN runs, not keys ever seen (the
            # next batch re-initializes to (0,0,0) identically)
            state.remove()
        else:
            state.update(tuple(int(x) for x in st))
        if all_fires:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(all_fires),
                    "run_start": pd.to_datetime(
                        [f[0] for f in all_fires], unit="us"
                    ),
                    "run_end": pd.to_datetime(
                        [f[1] for f in all_fires], unit="us"
                    ),
                    "n_run": [f[2] for f in all_fires],
                    "trigger_ts": pd.to_datetime(
                        [f[3] for f in all_fires], unit="us"
                    ),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        process,
        outputStructType=MATCH_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: a CLOSED maximal run: (label, cnt, start_us, end_us, sub_start_us,
#: sub_end_us) — sub_start is the suffix boundary a bounded FIRST
#: stage would match from (= start when the run fits the bound or the
#: bound doesn't apply), sub_end the prefix boundary a bounded LAST
#: stage would stop at (= end likewise).
ClosedRun = tuple[int, int, int, int, int, int]
#: the OPEN trailing run: (label, cnt, start_us, last_us, mark_us,
#: ring) — mark_us is the ts of the last-stage-bound'th event (0 until
#: reached); ring holds the last <= first_max event timestamps so the
#: suffix boundary is known at close (empty when not tracked).
OpenRun = tuple[int, int, int, int, int, tuple[int, ...]]
PatternState = tuple[tuple[ClosedRun, ...], OpenRun | None]


def advance_pattern_state(
    state: PatternState,
    rows: list[tuple[int, int]],
    quants: list[tuple[int, int | None]],
) -> tuple[list[tuple[int, int, tuple[int, ...]]], PatternState]:
    """Pure state transition for the GENERAL pattern machine: fold
    (ts_us, stage_label) rows — already in event-time order, labels
    pre-computed JVM-side by :func:`~flink_snappydata_spark.operators.
    cep.stage_label_expr` — through the run-quantified matcher with
    NFA-equivalent sub-run semantics for bounded EDGE stages (the
    batch compiler's contract — see ``cep_match_pattern``'s docstring
    for why only the first and last stages have sub-run freedom under
    strict contiguity).

    State is ``(closed_runs, open_run)``: the last <= k CLOSED maximal
    runs plus the open trailing run — everything a future match can
    still reference. Size is O(k + first_max) longs (the suffix ring
    is only kept on label-1 runs when the first stage is bounded),
    independent of stream length. A run closes when the label changes;
    the match check fires on close. On a match the closed history
    clears — AFTER MATCH SKIP PAST LAST ROW, which is lossless even
    when a downstream ``within`` filter rejects the match because
    candidate matches are provably disjoint for any stage spec (run
    positions pin stage labels; see the batch docstring). Returns
    ``(matches, new_state)`` with each match
    ``(match_start_us, match_end_us, per-stage effective counts)``
    where a bounded edge stage's count is capped at its bound.
    Associative over splits of an ordered sequence — pinned at every
    split point."""
    closed, open_run = state
    matches: list[tuple[int, int, tuple[int, ...]]] = []
    k = len(quants)
    first_max = quants[0][1]
    last_max = quants[-1][1] if k > 1 else None
    if k == 1 and first_max is not None:
        raise ValueError(
            "single-stage bounded patterns are rejected by the compiler"
        )

    def _ok(i: int, run: ClosedRun) -> bool:
        lo, hi = quants[i]
        if run[0] != i + 1 or run[1] < lo:
            return False
        # bounded EDGE stages absorb overrun via sub-run boundaries;
        # bounded MIDDLE stages keep the exact upper bound
        return hi is None or i == 0 or i == k - 1 or run[1] <= hi

    def _eff(i: int, run: ClosedRun) -> int:
        hi = quants[i][1]
        if hi is None or 0 < i < k - 1:
            return run[1]
        return min(run[1], hi)

    def close_and_eval(orun: OpenRun) -> None:
        nonlocal closed
        lab, cnt, start, last, mark, ring = orun
        sub_start = ring[0] if ring else start
        sub_end = mark if mark else last
        closed = (closed + ((lab, cnt, start, last, sub_start, sub_end),))[-k:]
        if len(closed) == k and all(
            _ok(i, r) for i, r in enumerate(closed)
        ):
            matches.append(
                (
                    closed[0][4],
                    closed[-1][5],
                    tuple(_eff(i, r) for i, r in enumerate(closed)),
                )
            )
            closed = ()  # skip past last row

    for ts_us, lab in rows:
        if open_run is not None and lab == open_run[0]:
            _, cnt, start, _, mark, ring = open_run
            cnt += 1
            if ring:
                ring = (ring + (ts_us,))[-first_max:]
            if lab == k and last_max is not None and cnt == last_max:
                mark = ts_us
            open_run = (lab, cnt, start, ts_us, mark, ring)
        else:
            if open_run is not None:
                close_and_eval(open_run)
            ring = (
                (ts_us,)
                if lab == 1 and first_max is not None
                else ()
            )
            mark = (
                ts_us if lab == k and last_max is not None and last_max == 1
                else 0
            )
            open_run = (lab, 1, ts_us, ts_us, mark, ring)
    return matches, (closed, open_run)


def _pack_pattern_state(state: PatternState) -> tuple[list[int]]:
    closed, open_run = state
    flat = [len(closed)]
    for r in closed:
        flat.extend(r)
    if open_run is not None:
        lab, cnt, start, last, mark, ring = open_run
        flat.extend((lab, cnt, start, last, mark, len(ring)))
        flat.extend(ring)
    return (flat,)


def _unpack_pattern_state(packed: list[int]) -> PatternState:
    n = packed[0]
    closed = tuple(
        tuple(packed[1 + 6 * i : 7 + 6 * i]) for i in range(n)
    )
    rest = packed[1 + 6 * n :]
    if not rest:
        return closed, None
    lab, cnt, start, last, mark, rlen = rest[:6]
    return closed, (lab, cnt, start, last, mark, tuple(rest[6 : 6 + rlen]))


def streaming_cep_pattern(
    events: DataFrame,
    stages,
    contiguity: str = "strict",
    within: str | None = None,
    after_match: str = "skip_past_last",
) -> DataFrame:
    """LIVE general pattern matching — the streaming twin of
    :func:`~flink_snappydata_spark.operators.cep.cep_match_pattern`
    (same ``PatternStage`` spec, same run-quantified strict-contiguity
    semantics): stage labels are evaluated JVM-side (whole-stage
    codegen — Python sees only (ts, label) pairs), and a per-key state
    machine on ``applyInPandasWithState`` carries the last <= k closed
    runs plus the open run. A match emits in the micro-batch whose
    event CLOSES the final stage's maximal run (run quantifiers need
    the maximal length, so a trailing still-open run withholds its
    match until a later event — or a downstream flush record — closes
    it; on a bounded replay closed by per-key flush events the output
    is row-identical to the batch compiler, which the equivalence test
    pins).

    ``contiguity``/``within`` mirror the batch builder exactly:
    relaxed drops sentinel-labeled events BEFORE the state machine (a
    JVM-side filter — irrelevant events never reach Python or the
    state store), and ``within`` is a JVM-side post-filter on emitted
    matches (match_start/end are both known at emission).

    Output: ``(user_id, match_start, match_end, n_<stage.name>...)``.
    State per key is O(k) longs, independent of stream length."""
    from pyspark.sql.types import ArrayType

    from flink_snappydata_spark.operators.cep import stage_label_expr

    machine = contiguity in ("relaxed_nfa", "strict_nfa")
    if contiguity not in ("strict", "relaxed", "relaxed_nfa", "strict_nfa"):
        raise ValueError(
            "contiguity must be strict|relaxed|relaxed_nfa|strict_nfa: "
            f"{contiguity!r}"
        )
    if not machine and any(st.min_count == 0 for st in stages):
        raise ValueError(
            "the live machine supports optional stages (min_count=0) "
            "only under the machine modes (relaxed_nfa/strict_nfa — "
            "the batch compiler's strict realization union has no "
            "streaming twin)"
        )
    if after_match != "skip_past_last" and not machine:
        raise ValueError(
            "after_match='skip_to_next' is supported only under the "
            "machine modes (relaxed_nfa/strict_nfa)"
        )

    # capture only plain-Python spec data in the worker closure: a
    # PatternStage predicate is a JVM Column, which cannot pickle
    quants = [(st.min_count, st.max_count) for st in stages]
    names = [st.name for st in stages]
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("match_start", TimestampType()),
            StructField("match_end", TimestampType()),
            *[StructField(f"n_{n}", LongType()) for n in names],
        ]
    )
    state_schema = StructType([StructField("packed", ArrayType(LongType()))])
    rels = [getattr(st, "rel", None) for st in stages]
    use_rels = any(r is not None for r in rels)
    if use_rels and not machine:
        raise ValueError(
            "relative predicates (PatternStage.rel) are supported only "
            "under the machine modes (relaxed_nfa/strict_nfa)"
        )
    labeled = events.select(
        "user_id",
        "ts",
        "event_id",
        stage_label_expr(list(stages)).alias("stage_id"),
        *(["value"] if use_rels else []),
    )
    if contiguity in ("relaxed", "relaxed_nfa"):
        labeled = labeled.filter(F.col("stage_id") != -1)
    # strict_nfa ships sentinels: they BREAK matches in the fold

    k = len(quants)
    advance = advance_pattern_state
    unpack = _unpack_pattern_state
    pack = _pack_pattern_state
    empty: Any = ((), None)
    if machine:
        # the EXACT followedBy / strict machine: same emission contract (a
        # match emits in the micro-batch whose event closes/completes
        # it; a satisfiable trailing run waits for a closing stage
        # label or a flush record). within is enforced IN-FOLD as
        # partial-match pruning (Flink semantics: a later start can
        # win after an earlier partial times out), not as the JVM
        # post-filter the other modes use — and the pruning doubles as
        # state reclamation: per-key state is bounded by the events
        # inside one window, Flink's own partial-match bound (without
        # within: one branch per transition class, O(pattern) longs).
        within_us = (
            None if within is None else _window_seconds(within) * 1_000_000
        )
        nfa_strict = contiguity == "strict_nfa"
        advance = lambda st0, rows, q: advance_relaxed_nfa_state(  # noqa: E731
            st0, rows, q, within_us, after_match,
            rels if use_rels else None, nfa_strict,
        )
        unpack = lambda p: _unpack_nfa_state(p, k, use_rels)  # noqa: E731
        pack = lambda st0: _pack_nfa_state(st0, k, use_rels)  # noqa: E731
        empty = ()

    def _behaviorally_empty(st: Any) -> bool:
        if machine:
            return st == ()  # no live branches
        # no closed prefix and the open run is the sentinel: a
        # sentinel run can never join a match window
        return st[0] == () and (st[1] is None or st[1][0] == -1)

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        st = unpack(list(state.get[0])) if state.exists else empty
        if use_rels:
            rows = [
                (ts, int(lab), float(v))
                for ts, lab, v in _ordered_rows_vals(pdfs, "stage_id")
            ]
        else:
            rows = [
                (ts, int(lab))
                for ts, lab in _ordered_rows(pdfs, "stage_id")
            ]
        matches, st = advance(st, rows, quants)
        if _behaviorally_empty(st):
            # drop the store entry so the store is bounded by keys
            # with LIVE partial matches
            state.remove()
        else:
            state.update(pack(st))
        if matches:
            out = {
                "user_id": [key[0]] * len(matches),
                "match_start": pd.to_datetime(
                    [m[0] for m in matches], unit="us"
                ),
                "match_end": pd.to_datetime(
                    [m[1] for m in matches], unit="us"
                ),
            }
            for i, n in enumerate(names):
                out[f"n_{n}"] = [m[2][i] for m in matches]
            yield pd.DataFrame(out)

    out = labeled.groupBy("user_id").applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if within is not None and not machine:
        out = out.filter(
            F.col("match_end")
            <= F.col("match_start") + F.expr(f"INTERVAL {within}")
        )
    return out


# ---------------------------------------------------------------------------
# Relaxed-contiguity EXACT NFA (Flink followedBy) — the deterministic
# multi-branch machine behind ``contiguity="relaxed_nfa"``
# ---------------------------------------------------------------------------

#: A relaxed-NFA BRANCH: (stage, start_us, last_us, counts) — stage in
#: 1..k, ``counts`` a k-tuple of consumed-event counts per stage
#: (counts[stage-1] is the live count, later stages 0), start/last the
#: first/last CONSUMED event timestamps. The machine state is a tuple
#: of branches, deduplicated to one (earliest-start) branch per
#: transition class — see :func:`advance_relaxed_nfa_state`. With
#: iterative conditions (``rels``) a branch carries two extra slots:
#: (..., firsts, prev_val) — the FIRST consumed value per stage
#: (None = not captured) and the last consumed value.
NfaBranch = tuple[int, int, int, tuple[int, ...]]
NfaState = tuple[NfaBranch, ...]

#: A relative (iterative) condition on one stage, evaluated per BRANCH
#: at consumption time (Flink IterativeCondition / MATCH_RECOGNIZE
#: navigation): ("first", j, op) compares the candidate event's value
#: against the FIRST consumed value of stage j in this partial match,
#: ("last", j, op) against stage j's LAST consumed value, and
#: ("prev", op) against the previously consumed event's value — which
#: is always the CURRENT stage's last consumed value, so the capture
#: state is just two k-vectors (firsts, lasts). op in > >= < <=.
#: Unset references (stage j not consumed yet / no prior event) pass.
RelSpec = tuple

_REL_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def _rel_ok(rel: RelSpec | None, firsts, lasts, cur_stage: int, v) -> bool:
    if rel is None:
        return True
    if rel[0] == "prev":
        # the previously consumed event always belongs to the branch's
        # current stage (stages only advance by consuming)
        ref = lasts[cur_stage - 1]
        op = rel[1]
    elif rel[0] == "last":
        ref = lasts[rel[1] - 1]
        op = rel[2]
    else:
        ref = firsts[rel[1] - 1]
        op = rel[2]
    if ref is None:
        return True  # unset reference: vacuously true (Flink: no
        # events accepted for that pattern yet)
    return _REL_OPS[op](v, ref)


def advance_relaxed_nfa_state(
    state: NfaState,
    rows: list[tuple[int, int]],
    quants: list[tuple[int, int | None]],
    within_us: int | None = None,
    after_match: str = "skip_past_last",
    rels: list[RelSpec | None] | None = None,
    strict: bool = False,
    capture: bool = False,
) -> tuple[list[tuple[int, int, tuple[int, ...]]], NfaState]:
    """Pure state transition for the EXACT relaxed-contiguity machine
    (Flink ``followedBy`` with AFTER MATCH SKIP PAST LAST EVENT): fold
    (ts_us, stage_label) rows — event-time ordered, labels pre-computed
    JVM-side by ``stage_label_expr`` — through a deterministic
    multi-branch NFA. Unlike the merged-burst ``relaxed`` mode (which
    drops sentinels and cuts maximal runs), this machine skips ANY
    non-consumable event per branch, so a stage can assemble its count
    across interior other-stage events (``A B A B`` matches
    ``A{2,2} followedBy B`` from the FIRST A, skipping the interior B)
    and a bounded stage consumes its run's PREFIX, skipping overflow
    (Flink's NFA), where merged-burst takes the suffix at the first
    stage and fails overrun middles.

    Transition rules per branch at (stage i, count c), on label l
    (first-match-wins labels make take/proceed/ignore MUTUALLY
    EXCLUSIVE, so the machine is deterministic — no backtracking):

    * TAKE: ``l == i`` and ``c < max_i`` — consume; completing the
      final stage's bound emits immediately;
    * PROCEED+TAKE: ``l == i+1`` and ``c >= min_i`` — finalize stage i,
      consume into stage i+1 (emits when i+1 == k with max_k == 1);
    * CLOSE: a branch at the FINAL stage with ``c >= min_k`` emits when
      any OTHER stage's label arrives — the merged maximal run closes
      (the run-quantified contract every mode of this builder shares;
      a NON-greedy Flink trailing loop under skip-past-last would emit
      at min-count instead — that policy is expressible here as
      ``max_count == min_count``). The closing event is NOT consumed:
      it is re-processed fresh (it may seed the next match);
    * IGNORE: anything else — the branch persists unchanged (relaxed
      contiguity; sentinel labels are invisible to every branch).

    SEEDING: every label-1 event seeds a new branch (Flink's
    always-live start state) unless the event completed a match
    (skip-past-last owns it). EMISSION: at the first event where any
    branch completes, the EARLIEST-START completing branch wins and
    every live branch is discarded — skip past last event, lossless
    because no branch can be seeded between the winner's last consumed
    event and its completion (any stage label in that gap would have
    closed the winner earlier), so every discarded branch started at or
    before the match end.

    STATE BOUND: branches whose (stage, capped count) transition class
    coincides advance in lockstep forever, and the earliest-start one
    wins every simultaneous completion (earlier starts weakly dominate
    later seeds in (stage, count) order — an invariant the reference
    differential in tests/test_relaxed_nfa.py does NOT assume), so the
    machine keeps one branch per class: state is O(sum of stage bounds)
    longs, independent of stream length.

    WITHIN (``within_us``): Flink's ``Pattern.within`` prunes PARTIAL
    matches — a branch whose window ``(start, start + within]`` cannot
    admit the current event is discarded, which lets a LATER start win
    a match a post-filter would silently drop (the post-filter contract
    the other modes keep is strictly weaker: it rejects the found match
    without re-searching). A satisfiable FINAL-stage branch whose
    window expires CLOSES (emits) instead — its consumed events all lie
    within the window, so the match is valid; only its greedy tail
    growth is cut. Expired branches necessarily started earlier than
    every in-window branch, so checking closers before consumption-
    completions preserves the earliest-start winner rule. Under within,
    branches of one transition class with different starts expire at
    different times, so the per-class dedup would be lossy — the
    machine keeps every live branch instead; state is then bounded by
    the key's event count inside one window (exactly Flink's
    partial-match state bound), and expiry reclaims it as the stream
    advances.

    AFTER MATCH (``after_match``): ``"skip_past_last"`` (the default,
    Flink skipPastLastEvent) emits the earliest-start completion and
    discards every live branch — matches are disjoint.
    ``"skip_to_next"`` (Flink skipToNext) emits EVERY completing
    branch — one match per start position (each deterministic branch's
    own earliest completion), overlapping matches allowed; only the
    completing branches are removed, and the per-class dedup is off
    (every start must emit separately), so live state is bounded by
    active starts (use ``within`` to bound it by one window's events,
    exactly as in Flink).

    STRICT mode (``strict=True``, the machine form of ``next``
    contiguity — MATCH_RECOGNIZE's row-pattern semantics): no event is
    ever skipped — an event a branch cannot consume (other label,
    bound full, rel failure, or the -1 sentinel, which must then REACH
    the fold) closes the branch if it is pattern-satisfiable and
    discards it otherwise. Seeding at every seed-target event still
    provides the bounded-first-stage SUFFIX freedom, and bound
    completion the LAST-stage prefix, so the rel-free strict machine
    is row-identical to the islands compiler (differentially pinned);
    rels make per-branch consumability real, which is exactly what
    SQL MATCH_RECOGNIZE's PREV()/FIRST() DEFINE clauses need — under
    strict contiguity PREV(row) == the match's previously consumed
    event, so the ("prev", op) spec IS the SQL-standard semantics.

    ITERATIVE CONDITIONS (``rels``, Flink IterativeCondition): an
    optional per-stage RELATIVE predicate evaluated per BRANCH at
    consumption time — ("first", j, op) compares the candidate event's
    ``value`` against the FIRST value this partial match consumed for
    stage j, ("prev", op) against its previously consumed event. Rows
    must then be (ts_us, label, value) triples, branches carry
    (firsts, prev) capture slots, and per-class dedup is off (captured
    values differentiate same-class branches). A rel-FAILING event is
    INVISIBLE to the branch (relaxed skip — it neither consumes nor
    closes; closes still fire on base-non-consumable stage labels),
    and unset references pass vacuously, so seeds always capture their
    first value. Only the base predicates are JVM-evaluated; the rel
    comparison is the one per-event Python operation the kernel adds.

    Returns ``(matches, new_state)`` with each match
    ``(start_us, end_us, per-stage counts)``. Associative over splits
    of an ordered sequence. Labels outside 1..k other than the -1
    sentinel act as a CLOSE-only flush (end-of-replay records)."""
    k = len(quants)
    if k == 1 and quants[0][1] is not None:
        raise ValueError(
            "single-stage bounded patterns are rejected by the compiler"
        )
    if all(lo == 0 for lo, _ in quants):
        raise ValueError(
            "pattern needs at least one mandatory stage (min_count >= 1)"
        )
    if any(hi is not None and hi < max(lo, 1) for lo, hi in quants):
        raise ValueError(f"invalid stage bounds: {quants}")
    if after_match not in ("skip_past_last", "skip_to_next"):
        raise ValueError(
            f"after_match must be skip_past_last|skip_to_next: "
            f"{after_match!r}"
        )
    past_last = after_match == "skip_past_last"
    use_rels = rels is not None and any(r is not None for r in rels)
    use_caps = use_rels or capture
    if use_rels:
        if len(rels) != k:
            raise ValueError("rels must have one entry per stage")
        for r in rels:
            if r is None:
                continue
            if r[0] == "prev":
                ok = len(r) == 2 and r[1] in _REL_OPS
            else:
                ok = (
                    len(r) == 3
                    and r[0] in ("first", "last")
                    and 1 <= r[1] <= k
                    and r[2] in _REL_OPS
                )
            if not ok:
                raise ValueError(f"invalid rel spec: {r!r}")
    branches = list(state)
    matches: list[tuple[int, int, tuple[int, ...]]] = []

    def _cls(b: NfaBranch) -> tuple[int, int]:
        stage = b[0]
        lo, hi = quants[stage - 1]
        cap = lo if hi is None else hi
        return (stage, min(b[3][stage - 1], cap))

    def _dedup(bs: list[NfaBranch]) -> list[NfaBranch]:
        best: dict[tuple[int, int], NfaBranch] = {}
        for b in bs:
            c = _cls(b)
            cur = best.get(c)
            if cur is None or b[1] < cur[1]:
                best[c] = b
        return sorted(best.values(), key=lambda b: (b[1], b[0]))

    # OPTIONAL stages (min_count == 0, Flink optional()/times(0,n)):
    # a proceed may CHAIN through consecutive optional stages —
    # from stage s the valid targets are s+1 .. max_target[s] (the
    # first mandatory stage after s, inclusive); seeds use s = 0, so
    # a pattern with optional leading stages can start mid-pattern.
    # A branch is pattern-SATISFIABLE at stage j once c >= min_j and
    # every later stage is optional; a satisfiable branch closes on
    # the first event it can neither take nor proceed with (or at
    # window expiry / end of data) — skipped stages emit count 0.
    max_target = [0] * k
    for s in range(k):
        t = s + 1
        while t < k and quants[t - 1][0] == 0:
            t += 1
        max_target[s] = t
    tail_opt = [False] * (k + 1)
    tail_opt[k] = True
    for j in range(k - 1, 0, -1):
        tail_opt[j] = tail_opt[j + 1] and quants[j][0] == 0

    def _satisf(b: NfaBranch) -> bool:
        j = b[0]
        return b[3][j - 1] >= quants[j - 1][0] and tail_opt[j]

    def _consumable(b: NfaBranch, lab: int) -> bool:
        stage = b[0]
        lo, hi = quants[stage - 1]
        c = b[3][stage - 1]
        if lab == stage:
            return hi is None or c < hi
        return stage < lab <= max_target[stage] and c >= lo

    def _emit(b: NfaBranch):
        if capture:
            return (b[1], b[2], b[3], b[4], b[5])
        return (b[1], b[2], b[3])

    for row in rows:
        ts_us, lab = row[0], row[1]
        v = row[2] if use_caps else 0.0
        if lab == -1 and not strict:
            continue  # relaxed contiguity: sentinels are invisible
        closers: list[NfaBranch] = []
        keep: list[NfaBranch] = []
        in_range = 1 <= lab <= k
        for b in branches:
            expired = within_us is not None and ts_us - b[1] > within_us
            can = in_range and _consumable(b, lab)
            if strict and can and use_rels:
                # strict contiguity: a rel failure IS a break, so full
                # consumability (base + rel) drives the close/discard
                target = b[0] if lab == b[0] else lab
                can = _rel_ok(rels[target - 1], b[4], b[5], b[0], v)
            if _satisf(b) and (expired or not can):
                closers.append(b)
            elif expired or (strict and not can):
                # discarded: timed-out partial (within), or a strict-
                # contiguity break (other label, bound full, rel fail,
                # sentinel)
                pass
            else:
                keep.append(b)
        branches = keep
        if not in_range:
            # flush record or (strict-mode) sentinel: close-only
            # trigger, no transitions or seeding
            if past_last:
                cut: int | None = None
                for b in sorted(closers, key=lambda b: b[1]):
                    if cut is None or b[1] > cut:
                        matches.append(_emit(b))
                        cut = b[2]
                if cut is not None:
                    branches = [b for b in keep if b[1] > cut]
            else:
                for b in sorted(closers, key=lambda b: b[1]):
                    matches.append(_emit(b))
            continue
        nxt: list[NfaBranch] = []
        done: list[NfaBranch] = []
        for b in branches:
            stage, start, counts = b[0], b[1], b[3]
            lo, hi = quants[stage - 1]
            c = counts[stage - 1]
            if lab == stage and (hi is None or c < hi):
                if use_rels and not _rel_ok(
                    rels[stage - 1], b[4], b[5], stage, v
                ):
                    nxt.append(b)  # rel-failing event: invisible
                    continue
                nc = counts[: stage - 1] + (c + 1,) + counts[stage:]
                if use_caps:
                    firsts = b[4]
                    if firsts[stage - 1] is None:
                        firsts = (
                            firsts[: stage - 1] + (v,) + firsts[stage:]
                        )
                    lasts = b[5][: stage - 1] + (v,) + b[5][stage:]
                    nb = (stage, start, ts_us, nc, firsts, lasts)
                else:
                    nb = (stage, start, ts_us, nc)
                if stage == k and hi is not None and c + 1 == hi:
                    done.append(nb)
                else:
                    nxt.append(nb)
            elif stage < lab <= max_target[stage] and c >= lo:
                if use_rels and not _rel_ok(
                    rels[lab - 1], b[4], b[5], stage, v
                ):
                    nxt.append(b)  # rel-failing event: invisible
                    continue
                nc = counts[:stage] + (0,) * (lab - stage - 1) + (1,)
                nc = nc + counts[lab:]
                if use_caps:
                    firsts = b[4][: lab - 1] + (v,) + b[4][lab:]
                    lasts = b[5][: lab - 1] + (v,) + b[5][lab:]
                    nb = (lab, start, ts_us, nc, firsts, lasts)
                else:
                    nb = (lab, start, ts_us, nc)
                if lab == k and quants[lab - 1][1] == 1:
                    done.append(nb)
                else:
                    nxt.append(nb)
            else:
                nxt.append(b)  # relaxed IGNORE: skip without consuming
        if lab <= max_target[0]:
            # seed (Flink's always-live start state; mid-pattern when
            # leading stages are optional); an immediately-complete
            # single-event seed competes like any consumption-completion
            # (it always has the latest start, so under skip-past-last
            # it only emits when disjoint from every earlier winner).
            # A rel on the seed stage passes vacuously (no captures).
            nc = (0,) * (lab - 1) + (1,) + (0,) * (k - lab)
            if use_caps:
                firsts = (None,) * (lab - 1) + (v,) + (None,) * (k - lab)
                nb = (lab, ts_us, ts_us, nc, firsts, firsts)
            else:
                nb = (lab, ts_us, ts_us, nc)
            if lab == k and quants[lab - 1][1] == 1:
                done.append(nb)
            else:
                nxt.append(nb)
        if past_last:
            # UNIFIED completion competition: close-completions (which
            # do not consume this event) and consumption-completions
            # compete in ONE greedy disjoint selection by start — each
            # emission discards everything started at or before its
            # match end (skip past last EVENT; the start filter also
            # suppresses this event's seed exactly when an emitted
            # match consumed the event). Without rels or optional
            # tails the candidate sets are label-disjoint and at most
            # one winner exists, reducing to the old two-phase rule;
            # with them, a later-started branch can close on the very
            # event an earlier branch completes by consuming, and only
            # a joint selection picks the true earliest start.
            if closers or done:
                cut2: int | None = None
                for b in sorted(closers + done, key=lambda b: b[1]):
                    if cut2 is None or b[1] > cut2:
                        matches.append(_emit(b))
                        cut2 = b[2]
                branches = [b for b in nxt if b[1] > cut2]
            else:
                branches = (
                    _dedup(nxt)
                    if within_us is None and not use_caps
                    else nxt
                )
        else:
            for b in sorted(closers + done, key=lambda b: b[1]):
                matches.append(_emit(b))
            branches = nxt
    return matches, tuple(branches)


def close_relaxed_nfa(
    state: NfaState,
    quants: list[tuple[int, int | None]],
    after_match: str = "skip_past_last",
    capture: bool = False,
) -> list[tuple[int, int, tuple[int, ...]]]:
    """End-of-data close for the relaxed-NFA machine: a pattern-
    satisfiable branch (its stage's min met, every later stage
    optional) emits exactly as a non-consumable label would have
    closed it. Under skip_past_last the earliest start wins (at most
    ONE match — every stage event after the winner's last consumed one
    was consumable by it, else it would have closed in-stream, so no
    later-starting candidate can exist past its end); under
    skip_to_next every satisfiable branch emits."""
    k = len(quants)
    tail_opt = True
    closers: list[NfaBranch] = []
    for j in range(k, 0, -1):
        for b in state:
            if b[0] == j and tail_opt and b[3][j - 1] >= quants[j - 1][0]:
                closers.append(b)
        tail_opt = tail_opt and quants[j - 1][0] == 0
    if not closers:
        return []

    def _emit(b):
        if capture:
            return (b[1], b[2], b[3], b[4], b[5])
        return (b[1], b[2], b[3])

    if after_match == "skip_to_next":
        return [_emit(b) for b in sorted(closers, key=lambda b: b[1])]
    # skip_past_last: greedy disjoint selection by start — without
    # iterative conditions at most one satisfiable branch can exist
    # past the winner's end (see above); with rel-invisible events,
    # later-started disjoint candidates are real and all emit.
    out: list = []
    cut: int | None = None
    for b in sorted(closers, key=lambda b: b[1]):
        if cut is None or b[1] > cut:
            out.append(_emit(b))
            cut = b[2]
    return out


def _f2i(x: float) -> int:
    return _struct.unpack("<q", _struct.pack("<d", x))[0]


def _i2f(n: int) -> float:
    return _struct.unpack("<d", _struct.pack("<q", n))[0]


def _pack_nfa_state(
    state: NfaState, k: int, with_rels: bool = False
) -> tuple[list[int]]:
    flat = [len(state)]
    for b in state:
        flat.extend((b[0], b[1], b[2]))
        flat.extend(b[3])
        if with_rels:
            # captured values ride the long-array state exactly via a
            # double<->long bit-cast; a bitmask long marks None slots
            # (firsts[j] and lasts[j] are None together — a stage's
            # first and last are captured by the same consumption)
            firsts, lasts = b[4], b[5]
            mask = 0
            for i, x in enumerate(firsts):
                if x is None:
                    mask |= 1 << i
            flat.append(mask)
            flat.extend(0 if x is None else _f2i(x) for x in firsts)
            flat.extend(0 if x is None else _f2i(x) for x in lasts)
    return (flat,)


def _unpack_nfa_state(
    packed: list[int], k: int, with_rels: bool = False
) -> NfaState:
    n = packed[0]
    w = 3 + k + ((2 * k + 1) if with_rels else 0)
    out = []
    for i in range(n):
        o = 1 + w * i
        b = (
            packed[o],
            packed[o + 1],
            packed[o + 2],
            tuple(packed[o + 3 : o + 3 + k]),
        )
        if with_rels:
            mask = packed[o + 3 + k]
            firsts = tuple(
                None if mask & (1 << j) else _i2f(packed[o + 4 + k + j])
                for j in range(k)
            )
            lasts = tuple(
                None if mask & (1 << j) else _i2f(packed[o + 4 + 2 * k + j])
                for j in range(k)
            )
            b = b + (firsts, lasts)
        out.append(b)
    return tuple(out)


ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("run_start", TimestampType()),
        StructField("run_end", TimestampType()),
        StructField("n_run", LongType()),
        StructField("next_type", StringType()),
        StructField("next_ts", TimestampType()),
    ]
)


def advance_absence_state(
    state: tuple[int, int, int],
    rows: list[tuple[int, str]],
    run_type: str = "click",
    trigger_type: str = "purchase",
    min_run: int = 2,
    within_us: int = 86_400_000_000,
) -> tuple[list[tuple[int, int, int, str, int]], tuple[int, int, int]]:
    """Pure state transition for the absence pattern: fold
    (ts_us, event_type) rows — already in event-time order — and emit
    an alert for every run of >= ``min_run`` that a WRONG event (or a
    too-late trigger) closes. Each alert is
    ``(run_start_us, run_end_us, n_run, next_type, next_ts_us)``.
    SILENCE alerts (no closing event at all) are the timer path's job
    (:func:`streaming_cep_absence`), not this fold's — the fold can't
    know the stream went quiet. The run fold itself is the shared
    :func:`_advance_run_state`; this wires in the exact COMPLEMENT of
    the match close predicate, so matches ∪ alerts partitions the
    closed-run set by construction."""

    def on_close(run_start, run_end, n, etype, ts_us):
        if n >= min_run and not (
            etype == trigger_type and ts_us <= run_end + within_us
        ):
            return (run_start, run_end, n, etype, ts_us)
        return None

    return _advance_run_state(state, rows, run_type, on_close)


def streaming_cep_absence(
    events: DataFrame,
    run_type: str = "click",
    trigger_type: str = "purchase",
    min_run: int = 2,
    within: str = "1 day",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Live ``notFollowedBy`` — both absence cases, Flink CEP timer
    semantics:

    * a run closed IN-STREAM by a non-trigger event or a too-late
      trigger alerts in that event's micro-batch (``next_type`` /
      ``next_ts`` carry the closer, like the batch op);
    * a run followed by SILENCE alerts when the event-time watermark
      passes ``run_end + within`` — ``EventTimeTimeout`` fires the
      per-key timer, the alert emits with null ``next_type``/
      ``next_ts``, and the expired partial match is discarded (a later
      run-type event starts a fresh run — ``within`` is the pattern
      window, exactly Flink's ``notFollowedBy(...).within(...)``).

    State per key is the same three longs as the match op; every open
    run carries a timer, so the state store is garbage-collected by
    watermark progress even for runs too short to ever alert.
    """
    within_us = _window_seconds(within) * 1_000_000
    events = events.withWatermark("ts", watermark)

    def _frame(
        key: tuple[Any, ...],
        alerts: list[tuple[int, int, int, str | None, int | None]],
    ) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(alerts),
                "run_start": pd.to_datetime(
                    [a[0] for a in alerts], unit="us"
                ),
                "run_end": pd.to_datetime([a[1] for a in alerts], unit="us"),
                "n_run": [a[2] for a in alerts],
                "next_type": pd.array(
                    [a[3] for a in alerts], dtype="object"
                ),
                "next_ts": pd.to_datetime([a[4] for a in alerts], unit="us"),
            }
        )

    def process(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            run_start, run_end, n = state.get
            state.remove()
            if n >= min_run:
                yield _frame(key, [(run_start, run_end, n, None, None)])
            return
        st = state.get if state.exists else (0, 0, 0)
        silence: list[tuple[int, int, int, str | None, int | None]] = []
        # Expiry check BEFORE folding new data: when a key receives
        # rows in the same micro-batch its timer would have fired
        # (hasTimedOut only fires for keys WITHOUT data), the stored
        # run's pattern window may already be watermark-expired — it
        # must alert and reset NOW, not silently extend across the
        # gap, or the output would depend on micro-batch boundaries
        # (the documented contract: an expired partial match fires and
        # a later run-type event starts a NEW run).
        if st[2] > 0:
            # CEIL the us→ms conversion and expire on STRICT `<` only:
            # the in-time predicate is `ts_us <= run_end_us + within_us`,
            # so a trigger landing exactly at (or within the truncated
            # sub-millisecond of) the deadline must still be able to
            # close the run. Floor + `<=` would let a spurious silence
            # alert preempt it the moment the watermark touches the
            # boundary — ceil + `<` matches Spark's strictly-greater
            # event-time-timer semantics (timer fires only once the
            # watermark is PAST setTimeoutTimestamp).
            stored_deadline_ms = (st[1] + within_us + 999) // 1000
            if stored_deadline_ms < state.getCurrentWatermarkMs():
                if st[2] >= min_run:
                    silence.append((st[0], st[1], st[2], None, None))
                st = (0, 0, 0)
        rows = _ordered_rows(pdfs, "event_type")
        alerts, st = advance_absence_state(
            st, rows, run_type, trigger_type, min_run, within_us
        )
        if st[2] > 0:
            # Same ceil + strict-inequality discipline as the pre-fold
            # check: keep the timer armed while deadline_ms >= watermark
            # so an exactly-at-deadline trigger in a later batch still
            # wins over the silence alert.
            deadline_ms = (st[1] + within_us + 999) // 1000
            wm_ms = state.getCurrentWatermarkMs()
            if deadline_ms >= wm_ms:
                state.update(tuple(int(x) for x in st))
                # Spark rejects timers at-or-before the watermark; when
                # the deadline ms equals the watermark the timer arms
                # one ms later and fires on the next watermark advance
                # (any in-time trigger at that boundary is already
                # watermark-late and filtered upstream).
                state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
            else:
                # watermark already past the pattern window (possible
                # when the group's events trail the global watermark):
                # no closing event can still arrive — fire now
                state.remove()
                if st[2] >= min_run:
                    silence.append((st[0], st[1], st[2], None, None))
        else:
            state.remove()
        # pre-fold expiry alert (if any) precedes this batch's closes;
        # a post-fold immediate-fire also lands in `silence` — readers
        # sort, so within-batch order is presentational only
        out = silence + alerts
        if out:
            yield _frame(key, out)

    return events.groupBy("user_id").applyInPandasWithState(
        process,
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
