"""Training-shard assembly: sequence packing, global indexing, and
deterministic sharding (north-star LLM-pipeline surface, SURVEY.md §2.9).

These are the operators that turn a curated corpus into trainable
shards: pack documents into fixed-token-capacity sequences, assign a
stable global position, and split into balanced output shards. All
three are pure column-expression / window plans — no Python in the hot
path — and every number is exact integer arithmetic so the DuckDB
oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Knuth multiplicative-hash constant (2^32 / phi), used for the
#: portable shard hash (identical BIGINT arithmetic in any engine).
_HASH_MULT = 2654435761
_HASH_MOD = 2**31


def pack_sequences(
    documents: DataFrame,
    capacity: int = 256,
    shard_col: str = "source",
) -> DataFrame:
    """Assign each document to a fixed-capacity training sequence.

    Contiguous greedy packing within each ``shard_col`` group: documents
    are laid out in ``doc_id`` order and a document belongs to the pack
    where its first token lands (``pack_id = running_offset DIV
    capacity``). A document crossing the boundary stays in the pack it
    started in — the deterministic "pack then overflow" discipline, so
    the assignment is a pure function of (order, token counts) and needs
    no sequential state.

    Scale: ONE window partitioned by the shard key — thousands of
    independent groups at 100 TB, never a global single-partition
    window. Token counts are whitespace counts computed JVM-side.
    """
    tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    ).cast("long")
    w = Window.partitionBy(shard_col).orderBy("doc_id")
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        documents.select(
            "doc_id", F.col(shard_col), tokens.alias("n_tokens")
        )
        .withColumn("offset", (cum - F.col("n_tokens")).cast("long"))
        # Integer DIV keeps the boundary exact (double division could
        # flip a doc across packs at large offsets).
        .withColumn("pack_id", F.expr(f"CAST(offset DIV {capacity} AS BIGINT)"))
        .drop("offset")
    )


def pack_stats(documents: DataFrame, capacity: int = 256) -> DataFrame:
    """Per-pack fill statistics — the declared-query surface for
    :func:`pack_sequences`: how full each assembled sequence is."""
    packed = pack_sequences(documents, capacity=capacity)
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("source", "pack_id")
    )


def global_index(documents: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Stable global position of every document in ``doc_id`` order —
    the distributed ``zipWithIndex``: ``idx = rank of doc_id`` (0-based).

    Two-phase rank, no global sort: (1) bucket by fixed arithmetic
    ranges of ``doc_id`` (boundaries derived from min/max, not sampling
    — re-execution can never re-draw them), count per bucket, and
    prefix-sum the tiny bucket histogram on the driver; (2) row_number
    within each bucket plus the bucket's offset. The only data shuffles
    are one count agg and one per-bucket window; the driver handles
    ``n_buckets`` integers, never rows.

    Skew note: arithmetic ranges assume roughly uniform ids (true for
    synthetic/monotonic ids). For adversarial id distributions raise
    ``n_buckets`` or pre-hash into a temporary sort key.
    """
    lo, hi, n = documents.agg(
        F.min("doc_id"), F.max("doc_id"), F.count(F.lit(1))
    ).first()
    if n == 0:
        return documents.select(
            "doc_id", F.lit(0).cast("long").alias("idx")
        ).limit(0)
    span = hi - lo + 1
    # Integer DIV — double division could mis-bucket near boundaries,
    # which would corrupt the cross-bucket rank.
    bucket = F.expr(
        f"CAST(((doc_id - {lo}) * {n_buckets}) DIV {span} AS BIGINT)"
    )
    with_bucket = documents.select("doc_id", bucket.alias("bucket"))
    hist = {
        r["bucket"]: r["cnt"]
        for r in with_bucket.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += hist.get(b, 0)
    spark = documents.sparkSession
    offset_df = spark.createDataFrame(offsets, "bucket long, offset long")
    w = Window.partitionBy("bucket").orderBy("doc_id")
    return (
        with_bucket.join(F.broadcast(offset_df), "bucket")
        .select(
            "doc_id",
            (F.row_number().over(w) - 1 + F.col("offset")).cast("long").alias("idx"),
        )
    )


def shard_assignment(documents: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic output-shard id per document: multiplicative hash
    of ``doc_id`` — portable BIGINT arithmetic (identical in any SQL
    engine, unlike engine-hash xxhash64), uniform across shards, and a
    pure function of the key (stable under corpus growth).

    Scale: zero shuffle — the shard id is a projection; the write path
    (:func:`write_sharded`) turns it into directory partitioning.
    """
    shard = F.pmod(
        F.pmod(F.col("doc_id") * _HASH_MULT, _HASH_MOD), n_shards
    ).cast("long")
    return documents.withColumn("shard", shard)


def shard_stats(documents: DataFrame, n_shards: int = 16) -> DataFrame:
    """Per-shard balance report — declared-query surface for
    :func:`shard_assignment` (counts + exact char volume per shard)."""
    return (
        shard_assignment(documents, n_shards)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .orderBy("shard")
    )


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    max_records_per_file: int = 100_000,
) -> None:
    """Write the corpus as hash-sharded parquet: one directory per
    shard (``shard=K/``), files capped at ``max_records_per_file`` rows
    so no single file becomes a straggler read at training time."""
    (
        shard_assignment(df, n_shards)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
