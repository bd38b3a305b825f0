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

from flink_snappydata_spark.util import tracked_persist

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


#: Range buckets per source for the two-phase packing cumsum — the
#: parallelism available WITHIN one dominant source.
PACK_BUCKETS = 32


def pack_sequences(
    documents: DataFrame,
    capacity: int = 256,
    shard_col: str = "source",
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Assign each document to a fixed-capacity training sequence.

    Contiguous greedy packing within each ``shard_col`` group: documents
    are laid out in ``doc_id`` order and a document belongs to the pack
    where its first token lands (``pack_id = running_offset DIV
    capacity``). A document crossing the boundary stays in the pack it
    started in — the deterministic "pack then overflow" discipline, so
    the assignment is a pure function of (order, token counts) and needs
    no sequential state.

    Scale: the running token sum is TWO-PHASE, never one window per
    source. A single ``Window.partitionBy(source)`` serializes a
    dominant source (one crawl dump = 40% of a 100 TB corpus) onto one
    task; instead doc_ids are cut into ``n_buckets`` arithmetic ranges,
    per-(source, bucket) token totals are prefix-summed over the tiny
    (sources x buckets)-row frame, and the within-bucket running sum —
    a (source, bucket)-partitioned window, ``n_buckets``-way parallel
    inside every source — adds the bucket's offset back. Identical
    output to the single-window formulation (pinned by tests); token
    counts are whitespace counts computed JVM-side.
    """
    tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    ).cast("long")
    lo, hi = documents.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:
        return documents.select(
            "doc_id",
            F.col(shard_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("pack_id"),
        ).limit(0)
    # Width-division (not multiply-then-divide) avoids the
    # multiply-overflow the old scheme had; monotone in doc_id, which is
    # all correctness needs — bucketing only sets parallelism.
    # Precondition: non-negative doc_ids (true for every producer here —
    # crc32/global_index ids are >= 0). With negative ids the span
    # (hi - lo) itself could exceed int64 and wrap.
    width = max(1, (hi - lo + n_buckets) // n_buckets)
    toks = documents.select(
        "doc_id",
        F.col(shard_col),
        tokens.alias("n_tokens"),
        F.expr(f"CAST((doc_id - {lo}) DIV {width} AS BIGINT)").alias("_pb"),
    )
    bucket_offsets = (
        toks.groupBy(shard_col, "_pb")
        .agg(F.sum("n_tokens").alias("_bucket_tokens"))
        .withColumn(
            "_bucket_offset",
            F.coalesce(
                F.sum("_bucket_tokens").over(
                    Window.partitionBy(shard_col)
                    .orderBy("_pb")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select(shard_col, "_pb", "_bucket_offset")
    )
    w = Window.partitionBy(shard_col, "_pb").orderBy("doc_id")
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.join(F.broadcast(bucket_offsets), [shard_col, "_pb"])
        .withColumn(
            "offset",
            (F.col("_bucket_offset") + cum - F.col("n_tokens")).cast("long"),
        )
        # Integer DIV keeps the boundary exact (double division could
        # flip a doc across packs at large offsets).
        .withColumn("pack_id", F.expr(f"CAST(offset DIV {capacity} AS BIGINT)"))
        .select("doc_id", shard_col, "n_tokens", "pack_id")
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


def _range_buckets(documents: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, bucket) by arithmetic id ranges — width division, which
    is monotone in doc_id and avoids the multiply-overflow of the old
    ``(doc_id - lo) * n_buckets`` scheme (which wrapped for spans near
    2^63). Precondition: non-negative doc_ids — with a negative ``lo``
    and large positive ``hi`` the span ``hi - lo`` itself wraps; every
    id producer in this package (crc32 content ids, global_index) emits
    ids >= 0. Boundaries derive from min/max, not sampling, so
    re-execution can never re-draw them."""
    lo, hi = documents.agg(F.min("doc_id"), F.max("doc_id")).first()
    if lo is None:  # empty input — caller checks for None
        return None
    width = max(1, (hi - lo + n_buckets) // n_buckets)
    return documents.select(
        "doc_id",
        F.expr(f"CAST((doc_id - {lo}) DIV {width} AS BIGINT)").alias("bucket"),
    )


def _balanced_buckets(
    documents: DataFrame, n_buckets: int, skew_factor: float
) -> tuple[DataFrame | None, list[tuple[int, int, int]]]:
    """(doc_id, b0, b1) bucket keys plus the ordered (b0, b1, count)
    histogram, auto-refined when ids cluster.

    Pass 1 cuts arithmetic ranges and aggregates (count, min, max) per
    bucket. If the largest bucket exceeds ``skew_factor`` x the mean —
    clustered ids, e.g. {1..k} ∪ {10^9..} after a dedup pass — every
    overweight bucket is re-cut by ITS OWN min/max into enough
    sub-ranges to meet the uniform target. Ids are unique, so a dense
    cluster's local span ≈ its count and the local re-cut is near
    uniform; one level of refinement suffices. All boundaries derive
    from aggregated min/max (deterministic under re-execution), and the
    driver only ever sees histograms, never rows.
    """
    keyed = _range_buckets(documents, n_buckets)
    if keyed is None:
        return None, []
    keyed = tracked_persist(keyed)
    hist = (
        keyed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("blo"),
             F.max("doc_id").alias("bhi"))
        .collect()
    )
    total = sum(r["cnt"] for r in hist)
    target = max(1, -(-total // n_buckets))  # ceil
    # Mean over ALL n_buckets (clustered ids leave most range buckets
    # EMPTY — a non-empty-only mean would mask exactly that skew).
    if max(r["cnt"] for r in hist) <= skew_factor * (total / n_buckets):
        counts = sorted((r["bucket"], 0, r["cnt"]) for r in hist)
        return keyed.select("doc_id", F.col("bucket").alias("b0"),
                            F.lit(0).cast("long").alias("b1")), counts
    # Per-bucket sub-cut spec: (b0 -> lo, width, n_sub); n_sub = 1 for
    # balanced buckets keeps the join one-pass for every row.
    spec = []
    for r in hist:
        n_sub = max(1, -(-r["cnt"] // target))
        width = max(1, (r["bhi"] - r["blo"] + n_sub) // n_sub)
        spec.append((r["bucket"], r["blo"], width))
    spark = documents.sparkSession
    spec_df = spark.createDataFrame(spec, "b0 long, blo long, swidth long")
    refined = (
        keyed.withColumnRenamed("bucket", "b0")
        .join(F.broadcast(spec_df), "b0")
        .select(
            "doc_id",
            "b0",
            F.expr("CAST((doc_id - blo) DIV swidth AS BIGINT)").alias("b1"),
        )
    )
    counts = sorted(
        (r["b0"], r["b1"], r["cnt"])
        for r in refined.groupBy("b0", "b1").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    return refined, counts


def global_index(
    documents: DataFrame, n_buckets: int = 64, skew_factor: float = 2.0
) -> DataFrame:
    """Stable global position of every document in ``doc_id`` order —
    the distributed ``zipWithIndex``: ``idx = rank of doc_id`` (0-based).

    Two-phase rank, no global sort: (1) bucket by arithmetic id ranges
    (auto-refined via :func:`_balanced_buckets` when ids cluster — no
    manual ``n_buckets`` tuning), prefix-sum the tiny bucket histogram
    on the driver; (2) row_number within each bucket plus the bucket's
    offset. The only data shuffles are one count agg and one per-bucket
    window; the driver handles histograms, never rows.
    """
    # Emptiness falls out of the min/max pass inside _balanced_buckets
    # (min is NULL iff empty) — no separate probe job.
    keyed, counts = _balanced_buckets(documents, n_buckets, skew_factor)
    if keyed is None:
        return documents.select(
            "doc_id", F.lit(0).cast("long").alias("idx")
        ).limit(0)
    offsets, acc = [], 0
    for b0, b1, cnt in counts:
        offsets.append((b0, b1, acc))
        acc += cnt
    spark = documents.sparkSession
    offset_df = spark.createDataFrame(offsets, "b0 long, b1 long, offset long")
    w = Window.partitionBy("b0", "b1").orderBy("doc_id")
    return (
        keyed.join(F.broadcast(offset_df), ["b0", "b1"])
        .select(
            "doc_id",
            (F.row_number().over(w) - 1 + F.col("offset")).cast("long").alias("idx"),
        )
    )


#: Epoch mixing constant for :func:`epoch_shuffle` (golden-ratio odd
#: constant; epoch * EPOCH_MIX stays far below 2^63 for any real epoch).
EPOCH_MIX = 2_654_435_769


def epoch_shuffle(
    documents: DataFrame,
    epoch: int = 1,
    n_buckets: int = 64,
    sort: bool = True,
) -> DataFrame:
    """Deterministic per-epoch training-data order: every document gets
    a ``shuffle_rank`` that is a pseudo-random permutation of
    ``0..n-1``, a pure function of ``(doc_id, epoch)`` — the
    "reshuffle the corpus each epoch, reproducibly" step of a training
    pipeline. Re-running an epoch anywhere yields the identical order;
    changing ``epoch`` re-permutes; no RNG state, no seed files.

    The sort key is the portable hash of (hash(doc_id) + epoch·MIX) —
    BIGINT-safe, oracle-reproducible — with a doc_id tiebreak so hash
    collisions cannot make the rank engine-dependent.

    Scale — same discipline as :func:`global_index`: NO global sort.
    Hash keys are uniform on [0, 2^31), so fixed equal-width key-range
    buckets balance automatically; the driver prefix-sums only the
    bucket histogram, and the rank is one per-bucket window plus the
    bucket offset. One count aggregation + one bucket-partitioned
    window are the only shuffles. ``sort=False`` skips the final
    doc_id presentation ``orderBy`` — the output is one row per
    document (corpus-sized), so downstream consumers that don't need a
    total display order (a join back onto the corpus, a sharded write)
    should take the unsorted form and avoid a full-corpus range sort.
    """
    key = portable_hash(
        portable_hash(F.col("doc_id")) + F.lit(int(epoch) * EPOCH_MIX)
    )
    width = (_HASH_MOD + n_buckets - 1) // n_buckets
    keyed = documents.select(
        "doc_id", key.alias("k")
    ).withColumn("b", F.expr(f"k DIV {width}"))
    counts = sorted(
        (r.b, r.cnt)
        for r in keyed.groupBy("b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for b, cnt in counts:
        offsets.append((b, acc))
        acc += cnt
    spark = documents.sparkSession
    if not offsets:
        return documents.select(
            "doc_id",
            F.lit(int(epoch)).cast("long").alias("epoch"),
            F.lit(0).cast("long").alias("shuffle_rank"),
        ).limit(0)
    offset_df = spark.createDataFrame(offsets, "b long, offset long")
    w = Window.partitionBy("b").orderBy("k", "doc_id")
    out = keyed.join(F.broadcast(offset_df), "b").select(
        "doc_id",
        F.lit(int(epoch)).cast("long").alias("epoch"),
        (F.row_number().over(w) - 1 + F.col("offset"))
        .cast("long")
        .alias("shuffle_rank"),
    )
    return out.orderBy("doc_id") if sort else out


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


# ---------------------------------------------------------------------------
# Z-order layout key (multi-dimensional clustering)
# ---------------------------------------------------------------------------

Z_BITS = 16


def zorder_sql(x: str, y: str, div: str = "DIV") -> str:
    """Morton/Z-order bit interleave of two ``Z_BITS``-bit non-negative
    ints as portable integer arithmetic (``div`` = the engine's integer
    division spelling: Spark ``DIV``, DuckDB ``//``). Bit i of x lands
    at position 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x}) {div} {2 ** i}) % 2) * {4 ** i}")
        terms.append(f"((({y}) {div} {2 ** i}) % 2) * {2 * 4 ** i}")
    return " + ".join(terms)


def zorder_key(events: DataFrame, sort: bool = True) -> DataFrame:
    """Z-order (Morton) layout key over (user_id, value-cents) — the
    multi-dimensional clustering key a lakehouse computes before
    range-partitioning its files so that BOTH ``user_id`` predicates
    AND ``value`` predicates prune file ranges (a single-column sort
    can only serve one). Returns ``(event_id, user_id, value_cents,
    zkey)``; the intended consumer is
    ``repartitionByRange/sortWithinPartitions(zkey)`` at write time.

    Both dimensions are masked to :data:`Z_BITS` bits (the layout key
    needs locality, not injectivity — masking wraps ids beyond 2^16
    into the same key space). The interleave is pure integer
    arithmetic from one shared generator (:func:`zorder_sql`), so the
    oracle runs the LITERAL same expression.

    Scale: MAP-ONLY — one scan, one codegen'd integer expression per
    row, no shuffle (the downstream range-partition shuffle belongs to
    the writer that uses the key). ``sort=False`` (the registered
    form) skips the O(corpus) presentation sort.
    """
    from flink_snappydata_spark.functions.exact import cents

    out = events.select(
        "event_id",
        "user_id",
        cents("value").alias("value_cents"),
        F.expr(
            zorder_sql(
                f"user_id % {2 ** Z_BITS}",
                f"CAST(ROUND(value * 100, 0) AS BIGINT) % {2 ** Z_BITS}",
                div="DIV",
            )
        )
        .cast("long")
        .alias("zkey"),
    )
    if not sort:
        return out
    from flink_snappydata_spark.util import presentation_sorted

    return presentation_sorted(out, "event_id", expect_small=False)


def zonemap_skip_stats(events: DataFrame, block_rows: int = 1024) -> DataFrame:
    """Zone-map (block min/max) data-skipping audit — the measurement
    behind every lakehouse "files skipped" statistic and the payoff
    meter for :func:`zorder_key`: build per-block min/max statistics in
    ``event_id`` layout order, then report how many blocks (and rows)
    two canonical predicates could skip without reading.

    Blocks are ``event_id DIV block_rows`` (the write order). The two
    probes are derived from the data's own bounds so both engines agree
    bit-for-bit: a *time* predicate ``ts >= tmin + 9·(tmax−tmin)/10``
    (the "last 10% of time" dashboard query) and a *value* predicate of
    the same shape. Because ingest time correlates with write order,
    the ts zone maps prune almost every block, while the uncorrelated
    ``value`` column prunes none — the measured gap IS the argument for
    re-clustering (Z-order) the layout. All arithmetic is int64 (epoch
    micros / value cents, floor division).

    Returns one row: ``(n_blocks, n_rows, ts_blocks_skipped,
    ts_rows_skipped, val_blocks_skipped, val_rows_skipped)``.

    Scale: one map-side-combined aggregation to the block frame
    (corpus/block_rows rows — this is the zone-map *index*, the thing
    small enough to sit on a driver or in a catalog), a 1-row bounds
    aggregate over that frame cross-joined back, and a single-row
    summary. The raw events are scanned exactly once; predicates are
    evaluated against the index only.
    """
    from flink_snappydata_spark.functions.exact import cents

    blocks = (
        events.groupBy(
            (F.col("event_id") / F.lit(block_rows))
            .cast("long")
            .alias("block_id")
        )
        .agg(
            # ts ships as TIMESTAMP or TIMESTAMP_NTZ depending on the
            # fixture generation; the session pins UTC, so the cast is
            # wall-clock-identical either way and matches epoch_us.
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
                "min_ts"
            ),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
                "max_ts"
            ),
            F.min(cents("value")).alias("min_val"),
            F.max(cents("value")).alias("max_val"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    bounds = blocks.agg(
        F.min("min_ts").alias("tmin"),
        F.max("max_ts").alias("tmax"),
        F.min("min_val").alias("vmin"),
        F.max("max_val").alias("vmax"),
    )
    j = blocks.crossJoin(F.broadcast(bounds)).select(
        "n_rows",
        (
            F.col("max_ts")
            < F.col("tmin")
            + F.expr("(tmax - tmin) * 9 DIV 10").cast("long")
        ).alias("ts_skip"),
        (
            F.col("max_val")
            < F.col("vmin") + F.expr("(vmax - vmin) DIV 2").cast("long")
        ).alias("val_skip"),
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n_rows").alias("n_rows"),
        F.sum(F.col("ts_skip").cast("long")).alias("ts_blocks_skipped"),
        F.sum(F.when(F.col("ts_skip"), F.col("n_rows")).otherwise(F.lit(0)))
        .alias("ts_rows_skipped"),
        F.sum(F.col("val_skip").cast("long")).alias("val_blocks_skipped"),
        F.sum(F.when(F.col("val_skip"), F.col("n_rows")).otherwise(F.lit(0)))
        .alias("val_rows_skipped"),
    )
