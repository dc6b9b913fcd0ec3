"""Real-broker Kafka round-trip — closes S1/S2/S11 end-to-end.

The reference reads and writes an actual Kafka cluster
(``/root/reference/prediction/preprocessing/spark.py:164-176, 279-297``;
producer ``/root/reference/crawl_data/producer_v2.py``). The engine's
parse chain is transport-agnostic and its plan-construction parity is
pinned broker-free by the file-source twin (T7 duality,
``tests/test_streaming.py``) — but only a live broker can exercise
``format("kafka")`` itself. This module does exactly that, behind an
EXPLICIT env-gate (the same pattern as the codec gates in
``tests/test_multimodal.py``):

- **broker**: ``$SPARK_GRAFT_KAFKA_BOOTSTRAP`` (``host:port``), else a
  TCP probe of ``localhost:9092``. No broker → skip, stating so.
- **connector**: the ``spark-sql-kafka-0-10`` provider must be on the
  session classpath (launch with ``--packages
  org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>``; the
  sandbox image ships no connector jar and no Maven access). Missing →
  skip, stating so.

When both are present: produce the weather fixtures through the batch
``format("kafka")`` writer (the S11 production shape; the broker-free
two-phase-commit twin is ``sources/feed_sink.py``), read them back with
the BATCH kafka source (S1) and the STREAMING source via
``read_event_stream(source="kafka")`` (S2, availableNow), push both
through ``parse_raw_events``, and require row-for-row equality with the
file-source twin on every payload-derived column. ``kafka_timestamp`` is
excluded from the comparison — the broker stamps its own log-append
time; every fixture carries an explicit payload time so no parsed column
falls back to it.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import socket
import uuid

import pytest

from pyspark.sql import functions as F

from bigdata_weather_system_spark.schemas import RAW_KAFKA_SCHEMA
from bigdata_weather_system_spark.sources.raw_events import parse_raw_events
from bigdata_weather_system_spark.streaming.pipeline import read_event_stream

KTS = dt.datetime(2025, 11, 12, 4, 0, 0)

#: Payload-derived columns under comparison (everything parse_raw_events
#: yields except the transport-assigned kafka_timestamp).
COMPARE_COLS = [
    "key",
    "location",
    "event_timestamp",
    "temperature",
    "windspeed",
    "winddirection",
    "is_day",
    "weathercode",
]


def _payloads(n: int = 24) -> list[dict]:
    base = dt.datetime(2025, 11, 12, 3, 0, 0)
    out = []
    for i in range(n):
        t = base + dt.timedelta(minutes=15 * i)
        out.append(
            {
                "location_name": f"station-{i % 5}",
                "latitude": str(10.5 + i * 0.01),
                "longitude": str(106.6 + i * 0.01),
                "time": t.strftime("%Y-%m-%dT%H:%M"),
                "interval": "900",
                "temperature": str(25.0 + (i % 7) * 0.5),
                "windspeed": str(2.0 + (i % 3)),
                "winddirection": str((i * 37) % 360),
                "is_day": str(int(6 <= t.hour < 18)),
                "weathercode": str((i * 13) % 100),
            }
        )
    return out


def _raw_rows(payloads):
    return [
        (
            p["location_name"].encode("utf-8"),
            json.dumps(p).encode("utf-8"),
            KTS,
        )
        for p in payloads
    ]


def _reachable_bootstrap() -> str | None:
    explicit = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    for cand in ([explicit] if explicit else ["localhost:9092"]):
        host, _, port = cand.partition(":")
        try:
            with socket.create_connection((host, int(port or "9092")), 1.5):
                return cand
        except (OSError, ValueError):
            continue
    return None


def _connector_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


@pytest.fixture()
def kafka_bootstrap(spark) -> str:
    bootstrap = _reachable_bootstrap()
    if bootstrap is None:
        pytest.skip(
            "no Kafka broker reachable (set SPARK_GRAFT_KAFKA_BOOTSTRAP or "
            "run one on localhost:9092) — the file-source twin in "
            "test_streaming.py pins the parse chain broker-free"
        )
    if not _connector_on_classpath(spark):
        pytest.skip(
            "spark-sql-kafka-0-10 connector not on the session classpath "
            "(launch with --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark version>)"
        )
    return bootstrap


def _canon(df):
    rows = (
        df.select(*COMPARE_COLS)
        .orderBy("key", "event_timestamp", "weathercode")
        .collect()
    )
    return [tuple(r) for r in rows]


def test_kafka_batch_roundtrip_matches_file_twin(spark, kafka_bootstrap):
    """S11 produce (format('kafka') batch writer) → S1 batch read →
    parse chain == file-source twin, payload column for payload column."""
    topic = f"bdws-rt-{uuid.uuid4().hex[:12]}"
    payloads = _payloads()
    df = spark.createDataFrame(_raw_rows(payloads), schema=RAW_KAFKA_SCHEMA)
    (
        df.select("key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", kafka_bootstrap)
        .option("topic", topic)
        .save()
    )
    kraw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", kafka_bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select("key", "value", "timestamp")
    )
    got = _canon(parse_raw_events(kraw, keep_payload=False))
    want = _canon(parse_raw_events(df, keep_payload=False))
    assert len(got) == len(payloads)
    assert got == want


def test_kafka_streaming_source_matches_file_twin(
    spark, kafka_bootstrap, tmp_path
):
    """S2: read_event_stream(source='kafka') (the registered streaming
    reader shape) drained with availableNow == the same rows the batch
    source and the file twin yield."""
    topic = f"bdws-rt-{uuid.uuid4().hex[:12]}"
    payloads = _payloads()
    df = spark.createDataFrame(_raw_rows(payloads), schema=RAW_KAFKA_SCHEMA)
    (
        df.select("key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", kafka_bootstrap)
        .option("topic", topic)
        .save()
    )
    stream = read_event_stream(
        spark,
        source="kafka",
        kafka_bootstrap=kafka_bootstrap,
        topic=topic,
        starting_offsets="earliest",
    )
    name = f"kafka_rt_{uuid.uuid4().hex[:8]}"
    q = (
        parse_raw_events(stream, keep_payload=False)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _canon(spark.table(name))
    want = _canon(parse_raw_events(df, keep_payload=False))
    assert got == want
