"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Library-internal persisted intermediates (dedup candidate sets, LSH
# band tables, bucket keys...). Their consumers are lazy return values,
# so the producing function can never unpersist them itself; this
# registry lets a long-lived session (or the bench harness) drop them
# without clearing caches the CALLER owns (e.g. the table cache).
#
# A strong container is required: the JVM CacheManager keeps the cached
# plan alive regardless of Python references, so a WeakSet would drop
# the handle as soon as the producer returned and release_caches() would
# silently release nothing while blocks accumulate until eviction.
# Entries are held until release_caches() unpersists them and clears the
# set — bounded by one bench/query cycle, not the session lifetime.
_TRACKED_PERSISTS: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``persist()`` plus registration for :func:`release_caches`."""
    df.persist()
    _TRACKED_PERSISTS.append(df)
    return df


#: Leaf operators whose Catalyst size estimates do NOT scale with the
#: true data size: spark.range / createDataFrame / localCheckpoint /
#: foreachBatch frames report bytes that stay tiny no matter how much
#: data actually flows — the garbage-estimate shape that statically
#: broadcasts corpus-sized join sides (the round-9 OOM class).
#: Matched against leaf nodeName()s (plan-tree walk, not a substring
#: scan of the rendered plan — a string literal "Range (" in a filter
#: must not force a shuffle).
_ESTIMATE_BLIND_LEAVES = ("LogicalRDD", "LocalRelation", "Range")


def estimate_blind(df: DataFrame) -> bool:
    """True when ``df``'s plan contains an estimate-blind leaf — i.e.
    Catalyst's size statistics cannot be trusted to scale with the real
    input, so any join touching this frame must carry an explicit
    strategy hint rather than rely on the auto-broadcast threshold.

    File-backed scans (parquet/catalog tables) and cached relations
    keep honest, size-proportional stats and return False: there the
    planner's broadcast decision is correct AT EVERY SCALE (a 50 TB
    side estimates as 50 TB and is never statically broadcast), so a
    generic binary operator can safely leave the strategy to Catalyst.
    Same-corpus self-joins don't need this test — both sides are
    corpus-sized by construction at any scale, so they pin
    unconditionally.

    Streaming frames return False immediately: forcing batch
    optimization (``optimizedPlan()``) on a streaming plan raises
    AnalysisException, and the streaming execution path never uses the
    auto-broadcast estimate this guard exists to distrust — stream
    joins plan as state-store hash joins regardless.

    Classification walks the optimized plan's LEAF NODES by
    ``nodeName()`` rather than substring-matching the rendered plan, so
    a string literal like ``"LocalRelation"`` inside a filter predicate
    cannot false-positive into a forced shuffle.
    """
    if df.isStreaming:
        return False
    leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
    return any(
        leaves.apply(i).nodeName() in _ESTIMATE_BLIND_LEAVES
        for i in range(leaves.size())
    )


def release_caches() -> int:
    """Unpersist every library-internal intermediate persisted via
    :func:`tracked_persist`; returns how many were released. Call after
    the results depending on them have been fully consumed."""
    n = 0
    while _TRACKED_PERSISTS:
        df = _TRACKED_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release
        n += 1
    return n


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure ``df`` has at least the cluster's default parallelism.

    Local-mode fixtures are single-file, single-row-group parquet — one
    input split — which would serialize every downstream explode/agg on
    one core. Hash-repartitioning on ``cols`` (e.g. the group key) both
    spreads the work and lets the next ``groupBy(cols)`` reuse the
    partitioning without another exchange.

    At scale this is a no-op: a 100 TB table already scans as thousands
    of splits, so the partition count check fails and no shuffle is
    added. The check costs one driver-side plan conversion, no job.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *cols) if cols else df.repartition(target)
    return df


def range_spread(df: DataFrame, *cols: str) -> DataFrame:
    """:func:`spread`, but RANGE-partitioned on ``cols`` — for per-row
    kernel pipelines whose declared output is presentation-sorted on
    the same key.

    Establishing the range layout on the CHEAP input (ids before blob
    synthesis/decode) instead of ``orderBy`` on the kernel output
    means (a) the range-bound sampling job runs over the narrow input
    scan, not a second execution of the Python kernels, and (b) the
    final global order needs only ``sortWithinPartitions`` — no second
    exchange. Order-preserving 1:1 kernels keep rows inside their
    range partition, so in-partition sorting yields the same total
    order ``orderBy`` would. Unlike :func:`spread` this is NOT a
    no-op on already-parallel inputs — a total order needs the range
    layout at every scale — but it replaces the output sort's
    exchange rather than adding one.
    """
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism, df.rdd.getNumPartitions())
    return df.repartitionByRange(target, *cols)


def small_sorted(df: DataFrame, *cols: str) -> DataFrame:
    """Globally-ordered presentation sort for SMALL (aggregate- or
    pair-sized) results.

    ``orderBy`` range-partitions, and computing range bounds runs a
    sampling job that re-executes the entire child plan — for a query
    whose child is an expensive join/explode and whose output is a few
    hundred rows, that doubles the query. A hash shuffle to one
    partition plus an in-partition sort materializes the child exactly
    once and still yields a total order.

    Only for outputs bounded by aggregation (vocabulary counts,
    per-cluster stats): a single partition is the point, not a
    limitation. For outputs that are small on well-curated corpora but
    unbounded in the worst case (near-dup PAIR lists on a
    duplicate-heavy corpus are O(corpus)), never call this directly —
    go through :func:`presentation_sorted`, whose ``expect_small``
    hint keeps the ``orderBy`` escape hatch in the signature.
    """
    return df.repartition(1).sortWithinPartitions(*cols)


def presentation_sorted(
    df: DataFrame, *cols: str, expect_small: bool = True
) -> DataFrame:
    """Total-order presentation sort gated on a caller size hint.

    ``expect_small=True`` (the curated-corpus default, where near-dup
    pair/label outputs are a tiny fraction of the input) uses
    :func:`small_sorted` — one materialization of the (often expensive)
    child plan, no range-sampling job. ``expect_small=False`` (a
    duplicate-heavy corpus, where one row per paired document is still
    big) switches to a range-partitioned ``orderBy`` so the sort itself
    stays distributed; the price is ``orderBy``'s range-bound sampling
    pass over the child. Row content and order are identical either
    way — only the physical sort strategy changes.
    """
    if expect_small:
        return small_sorted(df, *cols)
    return df.orderBy(*cols)


def cell_prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    partition_cols: tuple[str, ...] = (),
    n_cells: int = 4096,
) -> DataFrame:
    """Inclusive (right-closed) running sums of ``sum_cols`` in
    ``order_col`` order within each ``partition_cols`` group — WITHOUT
    a window that holds a whole group, the hazard of the naive
    ``Window.partitionBy(keys).orderBy(v)`` spelling when a group's
    distinct-value frame is itself large (a cumulative CDF over 10⁸
    distinct cents would funnel through one task).

    The `quality_auc`/`ccnet_buckets` rank idiom, generalized: values
    bucket into ``n_cells`` fixed cells derived from the GLOBAL
    min/max by a monotone affine integer map (cell order = value
    order), per-(group, cell) subtotals take the strictly-lower-cell
    prefix on a window whose partitions hold ≤ n_cells narrow rows,
    and within-cell inclusive prefixes run on (group, cell)-partitioned
    windows holding ~1/n_cells of a group's values each. The cell
    offset table (≤ groups × n_cells rows) broadcasts back.

    Sums run in the input columns' own type (callers pass int64;
    results cast to long), and every per-value result is the SAME
    integer as the naive window's — callers' downstream divisions are
    bit-identical. ``sum_cols`` must be null-free (coalesce first).
    Adds one ``cum_<col>`` column per sum col; consumes the names
    ``_vmin/_vmax/_cell/_off_*`` internally.

    Bound: the broadcast offset table is ``groups × n_cells`` rows, so
    ``partition_cols`` must be LOW-cardinality (a type/language/source
    vocabulary — the current consumers use at most the event-type key).
    A high-cardinality group key (per-user, per-document) needs the
    `per_source_cap` bucket-histogram rank idiom instead, where offsets
    stay keyed and co-partitioned rather than broadcast.

    NOTE: for batch inputs, CONSTRUCTION IS EAGER — a bounded
    LocalLimit probe (one job) picks between the naive window and the
    cell machinery and materializes the input persist. Streaming
    inputs skip probe and persist and stay fully lazy (naive window).
    """
    from pyspark.sql import Window

    pc = list(partition_cols)
    # A streaming frame can neither persist nor run the LocalLimit
    # probe below (both are batch actions): fall through to the
    # fully-lazy naive window, whose unpartitioned global frame is the
    # only shape a bounded-state stream could window anyway.
    if df.isStreaming:
        base_w = Window.partitionBy(*pc) if pc else Window.partitionBy()
        in_w = base_w.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = df
        for c in sum_cols:
            out = out.withColumn(
                f"cum_{c}", F.sum(c).over(in_w).cast("long")
            )
        return out
    # The input executes once for the bounds and once into the persisted
    # cell-keyed frame; offsets and the final join both read the persist
    # (without it, an expensive upstream — a full-outer histogram merge,
    # say — would re-execute for every consumer of `g`).
    df = tracked_persist(df)
    # Small-input fast path: the cell machinery exists to keep any ONE
    # window partition bounded when the distinct-value frame is large
    # (10⁸ distinct cents through one task). When the whole input fits
    # a single window partition anyway — the common case for bounded
    # histograms like zipf_fit's distinct-frequency frame — the naive
    # window computes the IDENTICAL integer prefix sums in one job
    # where the cell path pays a bounds agg, a second persist, an
    # offsets window, and a broadcast join (~5 sequential tiny jobs,
    # measured 2-3 s of pure latency per query at fixture scale). The
    # probe is a LocalLimit short-circuit over the persist (the
    # _shingle_bound_cleared idiom), so it costs one bounded job and
    # doubles as the persist's materialization. NOTE: the probe is an
    # ACTION at DataFrame-construction time — building the returned
    # frame is eager for batch inputs (streaming inputs took the lazy
    # branch above).
    if df.limit(n_cells + 1).count() <= n_cells:
        base_w = Window.partitionBy(*pc) if pc else Window.partitionBy()
        in_w = base_w.orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = df
        for c in sum_cols:
            out = out.withColumn(
                f"cum_{c}", F.sum(c).over(in_w).cast("long")
            )
        return out
    bounds = df.agg(
        F.min(order_col).alias("_vmin"), F.max(order_col).alias("_vmax")
    )
    g = tracked_persist(
        df.crossJoin(F.broadcast(bounds)).withColumn(
            "_cell",
            F.expr(
                f"CAST((({order_col} - _vmin) * {n_cells})"
                " DIV (_vmax - _vmin + 1) AS BIGINT)"
            ),
        )
    )
    cell_w = (
        Window.partitionBy(*pc)
        .orderBy("_cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        g.groupBy(*pc, "_cell")
        .agg(*[F.sum(c).alias(f"_ct_{c}") for c in sum_cols])
        .select(
            *pc,
            "_cell",
            *[
                F.coalesce(F.sum(f"_ct_{c}").over(cell_w), F.lit(0))
                .cast("long")
                .alias(f"_off_{c}")
                for c in sum_cols
            ],
        )
    )
    in_w = (
        Window.partitionBy(*pc, "_cell")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = g.join(F.broadcast(offs), pc + ["_cell"])
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}",
            (F.col(f"_off_{c}") + F.sum(c).over(in_w)).cast("long"),
        )
    return out.drop(
        "_cell", "_vmin", "_vmax", *[f"_off_{c}" for c in sum_cols]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, replicate the dim.

    A hot join key concentrates one reducer at scale; AQE's skew-join
    split handles it after the fact, this handles it by construction:
    the fact side gets a uniform salt in [0, n_salts), the dim side is
    exploded n_salts× (it is the small side — replication is cheap), and
    the join key becomes (key, salt), spreading each hot key over
    ``n_salts`` tasks. Result is row-identical to ``fact.join(dim, on)``
    for any salt assignment; the salt column does not survive the join.

    Decision rule (plan evidence in tests/test_sampling.py's
    ``test_aqe_skew_split_*``): prefer plain join + AQE when the skew is
    merely an oversized shuffle partition of an eligible shuffled join —
    AQE marks the SortMergeJoin ``skew=true`` and splits it at runtime,
    but only when the partition exceeds BOTH
    ``skewedPartitionThresholdInBytes`` (default 256 MB) AND
    ``skewedPartitionFactor``× the median. Salt by construction when
    (a) the hot partition is big enough to stall a task yet under AQE's
    radar (the defaults-miss test shows the pathological join sails
    through unsplit), (b) the skewed shuffle feeds a non-join operator
    AQE can't split (grouped agg / window over the hot key), or (c) the
    join runs in a streaming micro-batch, where AQE is unavailable.
    """
    salted_fact = fact.withColumn(
        "_salt", F.floor(F.rand(seed) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_fact.join(salted_dim, [on, "_salt"]).drop("_salt")
