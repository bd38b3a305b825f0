"""Unit tests for the training-shard assembly operators
(pipeline/packing.py) and the text hygiene additions beyond what the
oracle parity sweep already pins."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from flink_snappydata_spark.pipeline.packing import (
    global_index,
    pack_sequences,
    portable_hash,
    portable_hash_sql,
    shard_assignment,
    write_sharded,
)
from flink_snappydata_spark.pipeline.text import pii_redaction


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_portable_hash_no_overflow_matches_duckdb(spark):
    """The naive `id * 2654435761` overflows int64 above ~3.47e9 (Spark
    wraps, ANSI engines raise) — round-2 advisor finding. The two-word
    reduce-before-multiply hash must agree bit-for-bit with its SQL twin
    run in DuckDB across the whole non-negative BIGINT range."""
    import duckdb

    ids = [0, 1, 3_470_000_000, 2**31, 2**31 + 7, 2**40 + 123, 2**62 + 999]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.h
        for r in df.select("doc_id", portable_hash(F.col("doc_id")).alias("h")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT doc_id, " + portable_hash_sql("doc_id") + " AS h "
            "FROM (SELECT unnest(" + str(ids) + "::BIGINT[]) AS doc_id)"
        ).fetchall()
    )
    assert got == want
    assert all(0 <= v < 2**31 for v in got.values())
    # ids differing only above bit 31 must not collide wholesale
    assert got[2**31] != got[0]


def test_pack_sequences_boundary(spark):
    # capacity 10; token counts 4,4,4 -> offsets 0,4,8: the third doc
    # starts inside pack 0 (offset 8 < 10) and overflows it.
    rows = [(i, "s", "w " * 4) for i in range(3)]
    got = {
        r.doc_id: (r.n_tokens, r.pack_id)
        for r in pack_sequences(_docs(spark, rows), capacity=10).collect()
    }
    assert got == {0: (4, 0), 1: (4, 0), 2: (4, 0)}
    # capacity 8: offsets 0,4,8 -> third doc opens pack 1 exactly.
    got = {
        r.doc_id: r.pack_id
        for r in pack_sequences(_docs(spark, rows), capacity=8).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1}


def test_pack_sequences_per_shard_independent(spark):
    rows = [(1, "a", "x y z"), (2, "b", "x y z"), (3, "a", "x")]
    got = {
        (r.source, r.doc_id): r.pack_id
        for r in pack_sequences(_docs(spark, rows), capacity=4).collect()
    }
    # each source packs from offset 0 independently
    assert got == {("a", 1): 0, ("b", 2): 0, ("a", 3): 0}


def test_global_index_skewed_ids(spark):
    # Heavily clustered ids: most buckets empty, one bucket dense.
    ids = [0, 1, 2, 3, 4, 10_000_000, 10_000_001, 99_999_999]
    df = _docs(spark, [(i, "s", "t") for i in ids])
    got = {r.doc_id: r.idx for r in global_index(df, n_buckets=8).collect()}
    assert got == {v: i for i, v in enumerate(sorted(ids))}


def test_global_index_single_doc(spark):
    df = _docs(spark, [(42, "s", "t")])
    assert [(r.doc_id, r.idx) for r in global_index(df).collect()] == [(42, 0)]


def test_write_sharded_roundtrip(spark, tmp_path):
    rows = [(i, "s", f"doc {i}") for i in range(100)]
    path = str(tmp_path / "shards")
    write_sharded(_docs(spark, rows), path, n_shards=4, max_records_per_file=10)
    back = spark.read.parquet(path)
    assert back.count() == 100
    # directory partitioning materialized and consistent with the
    # in-plan assignment
    want = {
        (r.doc_id, r.shard)
        for r in shard_assignment(_docs(spark, rows), 4).collect()
    }
    got = {(r.doc_id, int(r.shard)) for r in back.select("doc_id", "shard").collect()}
    assert got == want
    # file-size cap respected
    for f in glob.glob(f"{path}/shard=*/*.parquet"):
        n = spark.read.parquet(f).count()
        assert n <= 10


def test_pack_sequences_skewed_source_parallel(spark):
    """One source holding 90% of rows must spread over >1 (source,
    bucket) group — a per-source window would serialize it onto a
    single task at 100 TB — while matching the single-window semantics
    exactly."""
    rows = [(i, "big", "w " * (i % 5 + 1)) for i in range(90)] + [
        (100 + i, "small", "w w") for i in range(10)
    ]
    df = _docs(spark, rows)
    got = {
        r.doc_id: (r.n_tokens, r.pack_id)
        for r in pack_sequences(df, capacity=16, n_buckets=8).collect()
    }
    # naive single-stream reference per source
    want = {}
    for src in {"big", "small"}:
        off = 0
        for doc_id, _, text in sorted(r for r in rows if r[1] == src):
            n = len(text.split())
            want[doc_id] = (n, off // 16)
            off += n
    assert got == want
    # the dominant source really occupies >1 bucket group
    from flink_snappydata_spark.pipeline import packing as pk

    lo, hi = df.agg(F.min("doc_id"), F.max("doc_id")).first()
    width = max(1, (hi - lo + 8) // 8)
    n_groups = (
        df.filter(F.col("source") == "big")
        .select(F.expr(f"CAST((doc_id - {lo}) DIV {width} AS BIGINT)").alias("b"))
        .distinct()
        .count()
    )
    assert n_groups > 1


def test_global_index_clustered_ids_rebalanced(spark):
    """Clustered ids (dense {0..k} plus a dense block at 10^9 — the
    post-dedup id-gap shape) hotspot arithmetic range buckets; the
    auto-refinement must split the hot buckets without changing the
    rank."""
    from flink_snappydata_spark.pipeline.packing import _balanced_buckets

    ids = list(range(200)) + [10**9 + i for i in range(200)]
    df = spark.createDataFrame([(i, "s", "t") for i in ids],
                               "doc_id long, source string, text string")
    got = {r.doc_id: r.idx for r in global_index(df, n_buckets=8).collect()}
    assert got == {d: i for i, d in enumerate(sorted(ids))}
    _, counts = _balanced_buckets(df.select("doc_id"), 8, 2.0)
    sizes = [c for _, _, c in counts]
    # unrefined: two buckets of 200 each (mean 50); refined: near target
    assert max(sizes) <= 2 * -(-len(ids) // 8)


def test_pii_redaction_direct(spark):
    df = _docs(
        spark,
        [
            (1, "s", "mail a.b+c@foo-bar.org then 8.8.8.8 and +44 20 7946 0958 done"),
            (2, "s", "no pii here"),
        ],
    )
    got = {r.doc_id: r for r in pii_redaction(df, synthesize=False).collect()}
    assert got[1].n_emails == 1 and got[1].n_ips == 1 and got[1].n_phones == 1
    assert got[1].clean_text == "mail <EMAIL> then <IP> and <PHONE> done"
    assert got[2].n_emails == got[2].n_ips == got[2].n_phones == 0
    assert got[2].clean_text == "no pii here"


def test_chunking_reconstructs_text(spark):
    import pytest

    from flink_snappydata_spark.pipeline.text import chunk_documents

    texts = ["x" * 5, "ab" * 300, "q" * 512, "z" * 513, "hello world " * 100]
    df = _docs(spark, [(i, "s", t) for i, t in enumerate(texts)])
    rows = chunk_documents(df, chunk_chars=512, overlap=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, t in enumerate(texts):
        chunks = [c for _, c in sorted(by_doc[i])]
        rebuilt = chunks[0] + "".join(c[64:] for c in chunks[1:])
        assert rebuilt == t, f"doc {i} reconstruction"
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=64, overlap=64)


def test_packing_ops_on_empty_input(spark):
    from flink_snappydata_spark.pipeline.packing import (
        pack_sequences,
        shard_assignment,
    )

    empty = _docs(spark, []).filter("doc_id IS NOT NULL").limit(0)
    assert pack_sequences(empty).count() == 0
    assert global_index(empty).count() == 0
    assert shard_assignment(empty).count() == 0


def test_chunking_empty_text(spark):
    from flink_snappydata_spark.pipeline.text import chunk_documents

    df = _docs(spark, [(1, "s", "")])
    rows = chunk_documents(df).collect()
    assert len(rows) == 1 and rows[0].chunk_text == "" and rows[0].chunk_len == 0


def test_epoch_shuffle_is_permutation_and_deterministic(spark):
    from flink_snappydata_spark.catalog import load_table
    from flink_snappydata_spark.pipeline import packing
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    e1 = {r.doc_id: r.shuffle_rank for r in packing.epoch_shuffle(docs, 1).collect()}
    assert set(e1.values()) == set(range(n))  # a true permutation
    again = {
        r.doc_id: r.shuffle_rank for r in packing.epoch_shuffle(docs, 1).collect()
    }
    assert again == e1  # pure function of (doc_id, epoch)
    e2 = {r.doc_id: r.shuffle_rank for r in packing.epoch_shuffle(docs, 2).collect()}
    assert set(e2.values()) == set(range(n))
    assert e2 != e1  # the epoch actually re-permutes


def test_epoch_shuffle_matches_hash_replay(spark):
    """Rank equals the python replay of the double portable hash with a
    doc_id tiebreak — on skewed ids beyond 2^31 (the overflow zone the
    31-bit word reduction exists for)."""
    from flink_snappydata_spark.pipeline import packing

    M, M1, M2 = 2**31, 2654435761, 2246822519

    def ph(x):
        return ((x % M) * M1 % M + ((x >> 31) % M) * M2 % M) % M

    ids = [0, 1, 7, 2**31 - 1, 2**31, 2**40 + 3, 2**62 - 1]
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r.doc_id: (r.epoch, r.shuffle_rank)
        for r in packing.epoch_shuffle(docs, epoch=3).collect()
    }
    keys = sorted(
        (ph(ph(i) + 3 * packing.EPOCH_MIX), i) for i in ids
    )
    want = {i: (3, rank) for rank, (_, i) in enumerate(keys)}
    assert got == want


def test_epoch_shuffle_empty(spark):
    from flink_snappydata_spark.pipeline import packing

    docs = spark.createDataFrame([], "doc_id long")
    assert packing.epoch_shuffle(docs).collect() == []
