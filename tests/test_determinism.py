"""Parallelism invariance: the exactness discipline's executable proof.

The engine claims results are bit-identical at any partition count
(integer-cents sums, quantized dot products, deterministic tie-breaks).
Run representative queries under different shuffle-partition settings
and shuffled input partitioning, and require exact equality — the
property that makes results reproducible when a job moves from 32 cores
to a 1000-executor cluster.
"""

from __future__ import annotations

import pandas as pd
import pytest

from flink_snappydata_spark import registry
from tests.conftest import SF_CORRECT

REPRESENTATIVE = [
    "q1_pricing_summary",     # money sums
    "star_join_revenue",      # joins + agg
    "grouped_zscore",         # pandas grouped-map with exact formula
    "dedup_minhash",          # hashing + LSH + verify joins
    "ann_cosine_topk",        # quantized dots + windowed top-k
    "wordcount_batch",        # explode + agg
    "seq_packing",            # window cumsum + integer-DIV packing
    "global_index",           # two-phase distributed rank
    "q21_waiting_supplier",   # windowed decorrelation + top-k tiebreak
    "label_centroids",        # exact int64 component sums
    # round-7 exactness claims
    "embedding_gram",         # mapInPandas partial-Gram reduction
    "unigram_surprisal",      # order-free integer-bits sums
    "repeated_passages",      # content-defined anchors + digest agg
    "canonical_pick",         # cluster argmax with doc_id tiebreak
    # round-8 exactness claims
    "bigram_surprisal",       # order-free integer-bits transition sums
    "dsir_weights",           # int64 bucket sums + broadcast stats
    "image_phash_dedup",      # deterministic kernel hash + digest agg
    "quality_auc",            # int64 midrank AUC via value-cell prefix
    "ccnet_buckets",          # two-phase keyed rank + NTILE arithmetic
    "pq_codebook",            # pure-integer Lloyd under squared-L2
    # late-round-8 exactness claims (cell_prefix_sums consumers + the
    # driver-literal power iteration)
    "quantile_transform",     # keyed two-phase CDF prefix
    "ks_drift",               # two-phase CDF compare, argmax tiebreak
    "activity_gini",          # DECIMAL rank-weighted sum via cell prefix
    "zipf_fit",               # closed-form band rank sums + integer OLS
    "embedding_top_pc",       # gram reduction + integer power iteration
    "trend_regression",       # DECIMAL OLS sufficient statistics
]


def _run(spark, name: str) -> pd.DataFrame:
    # Row ORDER is not part of the invariance claim (several registered
    # forms are deliberately unsorted — no corpus-sized presentation
    # sort — and the driver's value hash is order-insensitive); sort by
    # every column so the comparison pins VALUES bit-for-bit.
    pdf = registry.QUERIES[name].fn(spark, SF_CORRECT).toPandas()
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_under_parallelism(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _run(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _run(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    pd.testing.assert_frame_equal(
        wide.reset_index(drop=True), narrow.reset_index(drop=True)
    )
