"""Live Kafka end-to-end tests — skip-marked until a broker exists.

The sandbox has no Kafka broker, so these tests probe
``localhost:9092`` at collection time and skip cleanly when absent;
on a machine with a broker (and the ``spark-sql-kafka-0-10`` package
on the classpath) they light up and prove the three reference paths
end-to-end:

* ``kafka_string_stream`` — consumer → tumbling windowed count,
  reference ``KafkaWindowWordCount.scala:18-31`` (FlinkKafkaConsumer010
  → 5 s tumbling count).
* ``kafka_json_table_stream`` — JSON payload → declared typed columns,
  reference ``ParquetTableJoin.scala:32-43`` (Kafka010JsonTableSource +
  TableSchema).
* ``kafka_sink`` — producer writing the wire ``value`` column,
  reference ``TimeWindowWordCount.scala:20-22`` (FlinkKafkaProducer010,
  Kafka stamps ingestion time itself).

The broker-independent halves (option wiring, value decode/encode,
windowing on a file-stream twin) are covered in test_streaming.py.
"""

from __future__ import annotations

import json
import socket
import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_snappydata_spark.streaming import runtime

KAFKA_HOST, KAFKA_PORT = "localhost", 9092
BOOTSTRAP = f"{KAFKA_HOST}:{KAFKA_PORT}"


def _broker_reachable() -> bool:
    try:
        with socket.create_connection((KAFKA_HOST, KAFKA_PORT), timeout=1):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _broker_reachable(),
    reason=f"no Kafka broker reachable at {BOOTSTRAP} "
    "(start one — e.g. `docker run -p 9092:9092 apache/kafka` — "
    "to exercise the live consumer/producer paths)",
)


def _produce(spark, topic: str, values: list[str]) -> None:
    """Produce via Spark's own batch Kafka sink (no extra client lib);
    skips if the spark-sql-kafka package is absent from the classpath."""
    df = spark.createDataFrame([(v,) for v in values], ["value"])
    try:
        runtime.encode_kafka_output(df).write.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("topic", topic).save()
    except Exception as e:  # pragma: no cover - classpath-dependent
        if "kafka" in str(e).lower() and (
            "DATA_SOURCE_NOT_FOUND" in str(e) or "ClassNotFound" in str(e)
        ):
            pytest.skip("spark-sql-kafka package not on the classpath")
        raise


def test_kafka_string_stream_windowed_count_live(spark, tmp_path):
    """KafkaWindowWordCount end-to-end: produce lines, consume as a
    string stream, tumbling count, assert the word totals."""
    topic = f"fss-str-{uuid.uuid4().hex[:8]}"
    _produce(spark, topic, ["alpha beta", "alpha", "beta beta"])
    time.sleep(1)
    stream = runtime.kafka_string_stream(
        spark, BOOTSTRAP, topic, starting_offsets="earliest"
    )
    words = stream.select(
        F.explode(F.split(F.col("value"), r"\s+")).alias("word"), "timestamp"
    )
    counts = (
        words.withWatermark("timestamp", "10 seconds")
        .groupBy(F.window("timestamp", "5 seconds"), "word")
        .count()
    )
    runtime.run_to_memory_sink(counts, "kafka_wc_live", output_mode="complete")
    got = {
        (r.word): r.total
        for r in spark.table("kafka_wc_live")
        .groupBy("word")
        .agg(F.sum("count").alias("total"))
        .collect()
    }
    assert got == {"alpha": 2, "beta": 3}


def test_kafka_json_table_stream_live(spark):
    """Kafka010JsonTableSource parity: JSON payloads projected into the
    declared typed schema."""
    topic = f"fss-json-{uuid.uuid4().hex[:8]}"
    rows = [{"sym": "AAPL", "px": 101.5}, {"sym": "MSFT", "px": 42.0}]
    _produce(spark, topic, [json.dumps(r) for r in rows])
    time.sleep(1)
    schema = T.StructType(
        [
            T.StructField("sym", T.StringType()),
            T.StructField("px", T.DoubleType()),
        ]
    )
    stream = runtime.kafka_json_table_stream(
        spark, BOOTSTRAP, topic, schema, starting_offsets="earliest"
    )
    runtime.run_to_memory_sink(stream, "kafka_json_live")
    got = {(r.sym, r.px) for r in spark.table("kafka_json_live").collect()}
    assert got == {("AAPL", 101.5), ("MSFT", 42.0)}


def test_kafka_sink_roundtrip_live(spark, tmp_path):
    """FlinkKafkaProducer010 parity: stream results out through the
    producer sink, read the topic back, verify the wire values."""
    in_topic = f"fss-in-{uuid.uuid4().hex[:8]}"
    out_topic = f"fss-out-{uuid.uuid4().hex[:8]}"
    _produce(spark, in_topic, ["one", "two"])
    time.sleep(1)
    stream = runtime.kafka_string_stream(
        spark, BOOTSTRAP, in_topic, starting_offsets="earliest"
    )
    upper = stream.select(F.upper("value").alias("value"))
    q = runtime.kafka_sink(
        upper, BOOTSTRAP, out_topic, checkpoint=str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination()
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", out_topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    got = {r.value for r in runtime.decode_kafka_string(back).select("value").collect()}
    assert got == {"ONE", "TWO"}
