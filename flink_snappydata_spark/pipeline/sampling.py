"""Dataset sampling / splitting for training-data pipelines.

Three ops a 100 TB corpus pipeline needs constantly:

* :func:`hash_split` — deterministic train/val/test assignment from a
  stable key hash. Reproducible across runs, clusters, and *engines*
  (integral keys use the portable multiplicative hash shared with
  sharding, so DuckDB/any-SQL reproduces the split bit-for-bit; other
  key types fall back to xxhash64); adding documents never reassigns
  existing ones, unlike ``randomSplit``.
* :func:`stratified_sample` — per-class Bernoulli sampling
  (``sampleBy``) to rebalance over-represented classes; seeded.
* :func:`approx_distinct_by` — HyperLogLog++ distinct-count sketch per
  group: constant memory per key versus the exact count's full shuffle
  of distinct values — the scale path for cardinality profiling.
"""

from __future__ import annotations

import zlib
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_snappydata_spark.pipeline.packing import portable_hash

SPLIT_BUCKETS = 10_000


def hash_split(
    df: DataFrame,
    key: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "fss-split-v1",
) -> DataFrame:
    """Attach a deterministic ``split`` column from a hash of ``key``.

    ``weights`` maps split name → fraction (must sum to ~1). The bucket
    is ``(portable_hash(key) + crc32(salt)) mod 10000`` for integral
    keys — pure BIGINT arithmetic any engine reproduces (the DuckDB
    oracle checks it bit-for-bit) — falling back to
    ``xxhash64(salt, key)`` for non-integral keys. Contiguous bucket
    ranges give each split its fraction. No shuffle, no state, no RNG —
    a row's split is a pure function of its key, so the assignment is
    identical on any cluster and stable under corpus growth.

    Versioning: stability holds WITHIN a hash scheme. Switching integral
    keys from xxhash64 to portable_hash+crc32 (the v1→v2 change that
    made the split oracle-checkable) was a one-time reassignment of
    every integral-keyed split — anyone holding splits materialized by
    the xxhash64 revision must regenerate train/val/test together, never
    mix old and new (cross-contamination). The salt doubles as the
    version tag; bump it (``fss-split-v2`` …) on any future scheme
    change so old and new assignments can't be confused.
    """
    weights = dict(weights or {"train": 0.98, "val": 0.01, "test": 0.01})
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if isinstance(df.schema[key].dataType, T.IntegralType):
        # crc32 of the salt is a driver-side constant — engine-neutral.
        salt_int = zlib.crc32(salt.encode())
        bucket = F.pmod(
            portable_hash(F.col(key).cast("long")) + F.lit(salt_int),
            F.lit(SPLIT_BUCKETS),
        )
    else:
        bucket = F.pmod(F.xxhash64(F.lit(salt), F.col(key)), F.lit(SPLIT_BUCKETS))
    expr = None
    upper = 0.0
    names = list(weights)
    for name in names[:-1]:
        upper += weights[name]
        cond = bucket < int(round(upper * SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def split_counts(documents: DataFrame) -> DataFrame:
    """(split, n_docs) for the default 98/1/1 split over doc_id — the
    declared-query surface for :func:`hash_split`; the portable hash
    makes the DuckDB oracle reproduce the assignment exactly."""
    return (
        hash_split(documents, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


def stratified_sample(
    df: DataFrame, col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Per-class Bernoulli sample (class → keep fraction). One scan, no
    shuffle; classes absent from ``fractions`` are dropped (fraction 0)."""
    return df.sampleBy(col, dict(fractions), seed=seed)


def approx_distinct_by(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.02
) -> DataFrame:
    """(group, approx_distinct, exact-shape schema) via HyperLogLog++.

    ``rsd`` is the target relative standard deviation. At 100 TB the
    exact count shuffles every distinct value; the sketch shuffles a
    fixed few-KB register set per group.
    """
    return (
        df.groupBy(group_col)
        .agg(F.approx_count_distinct(value_col, rsd).alias("approx_distinct"))
        .orderBy(group_col)
    )


def approx_distinct_verified(
    df: DataFrame, group_col: str, value_col: str,
    rsd: float = 0.02, tol: float = 0.06,
) -> DataFrame:
    """HLL++ sketch with an in-query exactness verdict: per group, the
    exact distinct count plus ``within_bound`` = |approx − exact| ≤
    tol·exact (tol = 3·rsd by default, a ≫3σ margin for HLL++).

    Sketch values are engine-specific, so the oracle checks the
    deterministic verdict + exact count instead (bound-verdict pattern);
    the production scale path is :func:`approx_distinct_by` — at 100 TB
    the exact count here exists only to judge the sketch.
    """
    return (
        df.groupBy(group_col)
        .agg(
            F.approx_count_distinct(value_col, rsd).alias("approx"),
            F.countDistinct(value_col).alias("exact_distinct"),
        )
        .select(
            group_col,
            "exact_distinct",
            (
                F.abs(F.col("approx") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * tol
            ).alias("within_bound"),
        )
        .orderBy(group_col)
    )
