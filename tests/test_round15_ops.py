"""Round-15 (optimization round 2) equivalence pins.

Every optimization this round that adds a fast path or restructures an
operator's internals gets a direct equivalence test here: the fast
path and the original distributed path must produce IDENTICAL rows on
the same input — the oracle-contract discipline (a declared query's
hash may never move).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_snappydata_spark.pipeline import text as T


# ---------------------------------------------------------------------------
# bpe_merges: driver-local merge fold == distributed vocab-frame loop
# ---------------------------------------------------------------------------

_word = st.text(alphabet="abcde", min_size=1, max_size=8)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(1, 6))
def test_bpe_driver_fold_matches_distributed_loop(spark, docs, n_merges):
    """The bounded-vocab driver fold must be bit-identical to the
    distributed merge loop: same winners, same tie-breaks, same
    two-pass replace semantics — on corpora tuned to produce heavy
    pair ties and same-letter runs (alphabet of 5, short words)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    orig = T.BPE_DRIVER_VOCAB_MAX
    try:
        T.BPE_DRIVER_VOCAB_MAX = 1 << 16
        fast = [tuple(r) for r in T.bpe_merges(df, n_merges).collect()]
        T.BPE_DRIVER_VOCAB_MAX = 0  # force the distributed loop
        slow = [tuple(r) for r in T.bpe_merges(df, n_merges).collect()]
    finally:
        T.BPE_DRIVER_VOCAB_MAX = orig
    assert fast == slow


# ---------------------------------------------------------------------------
# quality_auc / ccnet_buckets: naive-window fast path == cell machinery
# ---------------------------------------------------------------------------


def _docs_frame(spark, n=60):
    rows = [
        (
            i,
            ("the quick brown fox %d jumps over dogs " % i) * (1 + i % 3),
            ["en", "de", "fr"][i % 3],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_quality_auc_fast_path_matches_cell_path(spark):
    docs = _docs_frame(spark)
    orig = T.AUC_NAIVE_MAX
    try:
        T.AUC_NAIVE_MAX = 1 << 13
        fast = [tuple(r) for r in T.quality_auc(docs).collect()]
        T.AUC_NAIVE_MAX = 0  # force the cell machinery
        slow = [tuple(r) for r in T.quality_auc(docs).collect()]
    finally:
        T.AUC_NAIVE_MAX = orig
    assert fast == slow


def test_ccnet_buckets_fast_path_matches_cell_path(spark):
    docs = _docs_frame(spark)
    orig = T.CCNET_NAIVE_MAX
    try:
        T.CCNET_NAIVE_MAX = 1 << 14
        fast = [tuple(r) for r in T.ccnet_buckets(docs).collect()]
        T.CCNET_NAIVE_MAX = 0  # force the cell machinery
        slow = [tuple(r) for r in T.ccnet_buckets(docs).collect()]
    finally:
        T.CCNET_NAIVE_MAX = orig
    assert fast == slow
    assert len(fast) == 60


def test_cell_prefix_sums_streaming_stays_lazy(spark):
    """ADVICE r14: a streaming frame must not trip the eager LocalLimit
    probe (AnalysisException) — it takes the lazy naive-window branch
    and construction succeeds without running any job."""
    from flink_snappydata_spark.util import cell_prefix_sums

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("value").alias("v"), F.lit(1).alias("one"))
    )
    out = cell_prefix_sums(stream, "v", ["one"])
    assert out.isStreaming
    assert "cum_one" in out.columns


# ---------------------------------------------------------------------------
# range-partition + sortWithinPartitions total-order invariant (ADVICE r14)
# ---------------------------------------------------------------------------

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name,keys",
    [
        ("cep_relaxed_nfa", ["user_id", "match_start"]),
        ("match_recognize_prev", ["user_id", "match_start"]),
        ("image_decode_stats", ["doc_id"]),
        ("multimodal_features", ["doc_id"]),
    ],
)
def test_range_sort_queries_are_globally_sorted(spark, name, keys):
    """The r14 sort-first rewrites rely on an indirect invariant: rows
    of a repartitionByRange + sortWithinPartitions pipeline arrive in
    global key order because range partitions are key-disjoint and
    read in order, with no intervening shuffle. A future edit that
    inserts any exchange between the range layout and the in-partition
    sort would silently break the declared global order — this pins it
    directly on the collected output."""
    from flink_snappydata_spark import registry

    rows = registry.queries()[name](spark, SF_SMOKE).collect()
    assert rows, f"{name} returned no rows at smoke scale"
    got = [tuple(r[k] for k in keys) for r in rows]
    assert got == sorted(got)


# ---------------------------------------------------------------------------
# kmeans centroid update: one-aggregation array sums == Lloyd's replay
# ---------------------------------------------------------------------------


def test_kmeans_train_matches_python_lloyds_replay(spark):
    """The no-explode centroid update (one groupBy(cent_id) with DIM
    component sums) must reproduce Lloyd's bit-exactly: assignment by
    max cosine with ties to the lowest cent_id, truncated integer
    mean, empty clusters carrying forward — replayed here in pure
    Python over the same quantized integers."""
    import math
    import random

    from flink_snappydata_spark.pipeline import similarity as S

    rng = random.Random(42)
    dim, n, k, iters = S.DIM, 40, 4, 3
    vecs = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )

    # Pure-Python replay over the SAME quantization (round half away
    # from zero on the float32-widened double, like Spark's round).
    def q(x):
        import struct

        x32 = struct.unpack("f", struct.pack("f", x))[0]
        v = x32 * 1e6
        return int(math.floor(v + 0.5)) if v >= 0 else -int(
            math.floor(-v + 0.5)
        )

    qv = [[q(x) for x in v] for v in vecs]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a)
        nb = sum(y * y for y in b)
        return (d / 1e12) / math.sqrt((na / 1e12) * (nb / 1e12))

    cents = {c: qv[c][:] for c in range(k)}

    def assign():
        out = {}
        for i, v in enumerate(qv):
            best = max(
                cents.items(), key=lambda it: (cos(v, it[1]), -it[0])
            )[0]
            out[i] = best
        return out

    a = assign()
    for _ in range(iters - 1):
        new = {}
        for c in range(k):
            members = [qv[i] for i in a if a[i] == c]
            if not members:
                new[c] = cents[c]
                continue
            cnt = len(members)
            new[c] = [
                int((s - math.fmod(s, cnt)) / cnt)
                for s in (
                    sum(m[p] for m in members) for p in range(dim)
                )
            ]
        cents = new
        a = assign()
    from collections import defaultdict

    stats = defaultdict(list)
    for i, c in a.items():
        stats[c].append(i)
    expected = sorted(
        (c, len(ids), sum(ids), min(ids), max(ids))
        for c, ids in stats.items()
    )
    got = sorted(
        tuple(r)
        for r in S.kmeans_train(df, n_clusters=k, n_iters=iters).collect()
    )
    assert got == expected


def test_bpe_driver_fold_same_letter_runs(spark):
    """The two-pass replace's same-letter-run semantics ('a a a a'
    merges pairwise left-to-right, leaving the odd tail) must agree
    between the paths — the exact case the docstring pins."""
    df = spark.createDataFrame(
        [(0, "aaaa aaa aa bbbb abab"), (1, "aaaa aaaa cc")],
        "doc_id long, text string",
    )
    orig = T.BPE_DRIVER_VOCAB_MAX
    try:
        T.BPE_DRIVER_VOCAB_MAX = 1 << 16
        fast = [tuple(r) for r in T.bpe_merges(df, 4).collect()]
        T.BPE_DRIVER_VOCAB_MAX = 0
        slow = [tuple(r) for r in T.bpe_merges(df, 4).collect()]
    finally:
        T.BPE_DRIVER_VOCAB_MAX = orig
    assert fast == slow
    assert len(fast) >= 1
