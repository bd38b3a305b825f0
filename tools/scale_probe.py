#!/usr/bin/env python
"""Synthetic scale probe beyond the sf0.1 fixture ceiling.

Replicates the sf0.1 fixtures in memory with shifted ids (documents
get a distinct suffix, embeddings a distinct component offset, so ids
and texts stay unique) and times structure-neutral pipeline ops at
1x vs Nx. Pair-generating dedup ops are excluded by design:
replication makes every document part of an N-copy near-dup group — a
pathological workload no organic Nx corpus has (their scale discipline
is pinned by the prefix-filter / banding / cluster-bounding plan tests
instead).

Usage::

    python tools/scale_probe.py            # factor 10, all ops
    SPARK_GRAFT_PROBE_FACTOR=100 \
    SPARK_GRAFT_PROBE_OPS=bm25_topk,quality_scores,kmeans_train \
        python tools/scale_probe.py

Prints one `PROBE | op | base_s | scaled_s | ratio |` row per op
(median of 3 warm reps, full-plan noop sink).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from flink_snappydata_spark.catalog import load_table
from flink_snappydata_spark.pipeline import similarity as S
from flink_snappydata_spark.pipeline import text as T
from flink_snappydata_spark.session import get_spark
from flink_snappydata_spark.util import release_caches

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_documents(docs, k):
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytag{i}")).alias("text"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _offset_embedding(offset):
    """Per-replica component shift as a UNARY transform lambda.

    A defaulted second parameter (``lambda x, i=i: ...``) counts toward
    PySpark's lambda arity, turning the transform into the binary
    (element, index) form — the "offset" then binds to the array index,
    identical for every replica, and the replicated vectors come out
    bit-identical (ADVICE r6). Baking the offset into a closure over a
    prebuilt Column keeps the lambda single-parameter.
    """
    off = F.lit(offset)
    return F.transform("embedding", lambda x: x + off)


def replicated_embeddings(emb, k):
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
            F.col("label"),
            _offset_embedding(i * 1e-3).alias("embedding"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


OPS = {
    "bm25_topk": lambda d, e: T.bm25_topk(d),
    "novelty_scores": lambda d, e: T.novelty_scores(d),
    "quality_scores": lambda d, e: T.quality_scores(d),
    "kmeans_train": lambda d, e: S.kmeans_train(e),
    "embedding_outliers": lambda d, e: S.embedding_outliers(e),
    "ivf_topk": lambda d, e: S.ivf_topk(e),
    "brute_force_cosine_topk": lambda d, e: S.brute_force_cosine_topk(e),
}


def main() -> None:
    factor = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))
    wanted = os.environ.get("SPARK_GRAFT_PROBE_OPS")
    ops = (
        {n: OPS[n] for n in wanted.split(",")} if wanted else dict(OPS)
    )
    spark = get_spark(app_name="fss-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb1 = load_table(spark, SF_DIR, "embeddings")
    docs_n = replicated_documents(docs1, factor)
    emb_n = replicated_embeddings(emb1, factor)
    print(f"ROWS base docs={docs1.count()} emb={emb1.count()} factor={factor}")

    def median_time(fn, d, e):
        runs = []
        for _ in range(3):
            release_caches()
            t0 = time.perf_counter()
            fn(d, e).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return sorted(runs)[1]

    for name, fn in ops.items():
        base = median_time(fn, docs1, emb1)
        scaled = median_time(fn, docs_n, emb_n)
        print(f"PROBE | {name} | {base:.3f} | {scaled:.3f} | {scaled / base:.2f} |")


if __name__ == "__main__":
    main()
