"""Batch sources/sinks (§2.1) and physical-plan scale assertions.

The plan tests are the 100 TB discipline made executable: filters must
reach the parquet scan, projections must prune the read schema,
dimension joins must broadcast, and hot paths must stay inside
whole-stage codegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_snappydata_spark.catalog import load_table
from flink_snappydata_spark.operators import relational, wordcount
from flink_snappydata_spark.plans import (
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    pushed_filters,
    read_schema_columns,
)
from flink_snappydata_spark.sources import (
    JdbcScanOptions,
    from_collection,
    jdbc_reader,
    read_csv,
    read_text,
    scan_table,
    write_csv,
    write_text,
)

SF = "/root/testdata/sf0.001"

#: Deterministic embedded fixture (reference embeds a static text block
#: as its only reproducible input, ``WordCountData.java:31-67``; ours is
#: original text with a known word histogram).
COLLECTION_LINES = [
    "spark counts words and words count spark",
    "every shuffle moves rows between executors",
    "broadcast the small side and skip the shuffle",
]


# ---------------------------------------------------------------------------
# Sources / sinks
# ---------------------------------------------------------------------------


def test_text_sink_source_roundtrip(spark, tmp_path):
    path = str(tmp_path / "txt")
    df = from_collection(spark, [(line,) for line in COLLECTION_LINES], "value: string")
    write_text(df, path)
    back = read_text(spark, path)
    assert sorted(r.value for r in back.collect()) == sorted(COLLECTION_LINES)


def test_csv_sink_source_roundtrip(spark, tmp_path):
    path = str(tmp_path / "csv")
    counts = wordcount.word_count(
        from_collection(spark, [(line,) for line in COLLECTION_LINES], "text: string")
    )
    write_csv(counts, path, sep=" ")
    back = read_csv(spark, path, sep=" ", schema="word string, cnt long")
    assert {(r.word, r.cnt) for r in back.collect()} == {
        (r.word, r.cnt) for r in counts.collect()
    }
    # ground truth: "words"/"word count" histogram of the fixture
    got = {r.word: r.cnt for r in back.collect()}
    assert got["spark"] == 2 and got["words"] == 2 and got["shuffle"] == 2


def test_collection_source_wordcount(spark):
    df = from_collection(spark, [(line,) for line in COLLECTION_LINES], "text: string")
    got = {r.word: r.cnt for r in wordcount.word_count(df).collect()}
    assert got["the"] == 2 and got["and"] == 2


def test_scan_table_default_is_select_star(spark):
    df = scan_table(spark, SF, "region")
    assert df.count() == 5
    assert df.columns == ["r_regionkey", "r_name"]


def test_scan_table_sql_pushdown(spark):
    df = scan_table(
        spark, SF, "orders",
        "select o_orderkey, o_totalprice from orders where o_totalprice > 100000.0",
    )
    assert pushed_filters(df), "filter must reach the parquet scan"
    assert read_schema_columns(df) == [["o_orderkey", "o_totalprice"]]
    assert df.count() > 0


def test_jdbc_options_validation(spark):
    with pytest.raises(ValueError):
        JdbcScanOptions(url="", table="t")
    with pytest.raises(ValueError):
        JdbcScanOptions(url="jdbc:postgresql://h/db", table="")
    with pytest.raises(ValueError):
        JdbcScanOptions(
            url="jdbc:postgresql://h/db", table="t", partition_column="id"
        )  # stride opts must travel together
    opts = JdbcScanOptions(
        url="jdbc:postgresql://h/db", table="t",
        partition_column="id", lower_bound=0, upper_bound=1000, num_partitions=8,
        fetchsize=1024,
    )
    # construction only — no database in this container
    assert jdbc_reader(spark, opts) is not None


# ---------------------------------------------------------------------------
# Plan discipline (the 100 TB checklist, executable)
# ---------------------------------------------------------------------------


def test_q1_scan_pushes_filter_and_prunes_columns(spark):
    q1 = relational.pricing_summary(load_table(spark, SF, "lineitem"))
    assert any("l_shipdate" in f for f in pushed_filters(q1))
    (cols,) = read_schema_columns(q1)
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, "read schema must prune to the 7 referenced columns"
    assert codegen_span_count(q1) >= 1


def test_dim_join_broadcasts(spark):
    df = relational.broadcast_dim_join(
        load_table(spark, SF, "lineitem"), load_table(spark, SF, "part")
    )
    assert broadcast_join_count(df) == 1
    # fact side never shuffles for the join itself; the only exchanges
    # are the agg partial/final boundary and the final ordering.
    assert exchange_count(df) <= 2


def test_star_join_broadcasts_all_dims(spark):
    df = relational.star_join_revenue(
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "orders"),
        load_table(spark, SF, "customer"),
        load_table(spark, SF, "nation"),
        load_table(spark, SF, "region"),
    )
    assert broadcast_join_count(df) == 4, "all four dim joins broadcast"


def test_q4_exists_decorrelates_to_pruned_semi_join(spark):
    """The EXISTS subquery must become a semi join whose probe side
    reads only (l_orderkey, l_returnflag), with both date and returnflag
    filters pushed to the scans."""
    from flink_snappydata_spark.plans import formatted_plan

    q4 = relational.q4_order_priority(
        load_table(spark, SF, "orders"), load_table(spark, SF, "lineitem")
    )
    assert "LeftSemi" in formatted_plan(q4)
    assert any("o_orderdate" in f for f in pushed_filters(q4))
    assert any("l_returnflag" in f for f in pushed_filters(q4))
    assert ["l_orderkey", "l_returnflag"] in read_schema_columns(q4)


def test_q18_semi_join_and_broadcasts(spark):
    """Q18's IN subquery runs as a semi join against the pre-aggregated
    qualifying keys; the dim joins broadcast."""
    from flink_snappydata_spark.plans import formatted_plan

    q18 = relational.q18_large_volume_customer(
        load_table(spark, SF, "customer"),
        load_table(spark, SF, "orders"),
        load_table(spark, SF, "lineitem"),
    )
    plan = formatted_plan(q18)
    assert "LeftSemi" in plan
    assert broadcast_join_count(q18) >= 1
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"


def test_filter_pushdown_through_projection(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 30)
    assert any("l_quantity" in f for f in pushed_filters(df))
    assert read_schema_columns(df) == [["l_orderkey", "l_quantity"]]


def test_json_sink_source_roundtrip(spark, tmp_path):
    from flink_snappydata_spark.sources import read_json, write_json

    path = str(tmp_path / "json")
    df = spark.range(5).selectExpr("id", "id * 2 AS doubled", "CAST(id AS STRING) AS s")
    write_json(df, path)
    back = read_json(spark, path, schema="id long, doubled long, s string")
    assert sorted(map(tuple, back.select("id", "doubled", "s").collect())) == sorted(
        map(tuple, df.collect())
    )


def test_orc_sink_source_roundtrip(spark, tmp_path):
    from flink_snappydata_spark.sources import read_orc, write_orc

    path = str(tmp_path / "orc")
    df = load_table(spark, SF, "nation")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jdbc_write_options_validation(spark):
    from flink_snappydata_spark.sources import JdbcWriteOptions, jdbc_writer

    with pytest.raises(ValueError):
        JdbcWriteOptions(url="", table="t")
    with pytest.raises(ValueError):
        JdbcWriteOptions(url="jdbc:postgresql://h/db", table="t", batchsize=0)
    with pytest.raises(ValueError):
        JdbcWriteOptions(
            url="jdbc:postgresql://h/db", table="t", isolation_level="BOGUS"
        )
    opts = JdbcWriteOptions(
        url="jdbc:postgresql://h/db", table="t", truncate=True,
        batchsize=5000, isolation_level="READ_COMMITTED",
    )
    df = load_table(spark, SF, "region")
    assert jdbc_writer(df, opts) is not None  # construction only


def test_q5_broadcasts_dims_two_fact_shuffles(spark):
    """Q5's 6-way join: every dimension lookup broadcasts; only the two
    fact joins shuffle."""
    q5 = relational.q5_local_supplier_volume(
        load_table(spark, SF, "customer"),
        load_table(spark, SF, "orders"),
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "supplier"),
        load_table(spark, SF, "nation"),
        load_table(spark, SF, "region"),
    )
    assert broadcast_join_count(q5) >= 4
    assert exchange_count(q5) <= 3, "fact shuffles only (+presentation sort)"


def test_q19_disjunctive_predicate_keeps_equi_join(spark):
    """The OR-of-ANDs must not degrade the part join to a cartesian:
    Catalyst keeps the p_partkey equi-key and evaluates the branches as
    a residual filter; the brand/size/quantity legs push to the scans."""
    from flink_snappydata_spark.plans import formatted_plan

    q19 = relational.q19_discounted_revenue(
        load_table(spark, SF, "lineitem"), load_table(spark, SF, "part")
    )
    plan = formatted_plan(q19)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert broadcast_join_count(q19) == 1
    assert len(pushed_filters(q19)) > 0


def test_q21_single_pass_over_joined_fact(spark):
    """The EXISTS/NOT-EXISTS decorrelation must not re-scan lineitem:
    exactly one lineitem scan feeds the (order, supplier) rollup, with
    the per-order counts computed as window aggregates over it."""
    from flink_snappydata_spark.plans import formatted_plan

    q21 = relational.q21_waiting_supplier(
        load_table(spark, SF, "supplier"),
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "orders"),
    )
    plan = formatted_plan(q21)
    assert plan.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in plan


def test_exact_dedup_shuffle_key_is_digest(spark):
    """exact_dedup must shuffle 32-byte digests, not document bodies."""
    from flink_snappydata_spark.pipeline.dedup import exact_dedup
    from flink_snappydata_spark.plans import formatted_plan

    df = exact_dedup(load_table(spark, SF, "documents"))
    assert "sha2" in formatted_plan(df)


def test_jdbc_live_roundtrip_embedded_derby(spark):
    """The reference's core path is a live JDBC scan with parallel
    splits (SnappyDataInputFormat.java:74-114). Embedded Derby (ships in
    Spark's JVM) exercises the SAME builders end-to-end without external
    infra: stride-partitioned read (4 concurrent range scans) and a
    truncate + batchsize write."""
    from flink_snappydata_spark.sources import (
        JdbcScanOptions,
        JdbcWriteOptions,
        jdbc_reader,
        jdbc_writer,
    )

    url = "jdbc:derby:memory:fss_live;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    rows = [(i, f"name-{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "id int, name string")

    wopts = JdbcWriteOptions(url=url, table="people", driver=driver,
                             batchsize=25)
    jdbc_writer(df, wopts, mode="overwrite").save()

    ropts = JdbcScanOptions(
        url=url, table="people", driver=driver,
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4, fetchsize=50,
    )
    back = jdbc_reader(spark, ropts).load()
    # stride partitioning really produced 4 concurrent range scans
    assert back.rdd.getNumPartitions() == 4
    assert sorted((r.id, r.name) for r in back.collect()) == rows

    # truncate write: table replaced in place (no drop/recreate), rows swapped
    df2 = spark.createDataFrame([(1000, "only")], "id int, name string")
    w2 = JdbcWriteOptions(url=url, table="people", driver=driver,
                          truncate=True)
    jdbc_writer(df2, w2, mode="overwrite").save()
    again = jdbc_reader(
        spark, JdbcScanOptions(url=url, table="people", driver=driver)
    ).load()
    assert [(r.id, r.name) for r in again.collect()] == [(1000, "only")]
