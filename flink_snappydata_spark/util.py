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
