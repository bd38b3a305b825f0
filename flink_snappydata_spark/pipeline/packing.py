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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth multiplicative-hash constant (2^32 / phi), used for the
#: portable shard hash (identical BIGINT arithmetic in any engine).
_HASH_MULT = 2654435761
#: Second-word mixer (xxhash PRIME32_2) — folds in bits 31..62 of the
#: key so ids above 2^31 don't collide by their low word alone.
_HASH_MULT2 = 2246822519
_HASH_MOD = 2**31


def portable_hash(col: Column) -> Column:
    """[0, 2^31) hash of a non-negative BIGINT column in pure BIGINT
    arithmetic — every intermediate stays below 2^63 (the naive
    ``key * mult`` overflows int64 for keys above ~3.4e9, and engines
    disagree on overflow: Spark wraps, ANSI engines raise). Each 31-bit
    word of the key is reduced mod 2^31 *before* its multiply, so the
    worst product is 2^31 * 2654435761 < 2^63. Reproducible in any SQL
    engine via :func:`portable_hash_sql` (the DuckDB-oracle twin).
    """
    lo = F.pmod(col, F.lit(_HASH_MOD))
    hi = F.pmod(F.shiftright(col, 31), F.lit(_HASH_MOD))
    return F.pmod(
        F.pmod(lo * _HASH_MULT, _HASH_MOD) + F.pmod(hi * _HASH_MULT2, _HASH_MOD),
        F.lit(_HASH_MOD),
    )


def portable_hash_sql(col: str) -> str:
    """ANSI-SQL twin of :func:`portable_hash` for a non-negative BIGINT
    column/expression (``%`` equals ``pmod`` on non-negative operands)."""
    return (
        f"((({col} % {_HASH_MOD}) * {_HASH_MULT}) % {_HASH_MOD}"
        f" + ((({col} >> 31) % {_HASH_MOD}) * {_HASH_MULT2}) % {_HASH_MOD})"
        f" % {_HASH_MOD}"
    )


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
    pure function of the key (stable under corpus growth). The hash
    reduces each 31-bit word before multiplying (:func:`portable_hash`),
    so ids beyond 2^31 — guaranteed at 100 TB — can never overflow
    int64 (where Spark would wrap silently but ANSI engines raise).

    Scale: zero shuffle — the shard id is a projection; the write path
    (:func:`write_sharded`) turns it into directory partitioning.
    """
    shard = F.pmod(portable_hash(F.col("doc_id")), n_shards).cast("long")
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
