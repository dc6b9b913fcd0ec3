"""Raw JSON event parse chain (sources/raw_events.py) — weather-shaped fixtures.

Exercises the FIXTURES.md §1 requirements: multi-format timestamps, missing
metrics, error rows, broker-time fallback, Unicode keys, payload retention.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from bigdata_weather_system_spark.schemas import RAW_KAFKA_SCHEMA
from bigdata_weather_system_spark.sources.raw_events import parse_raw_events

KTS = dt.datetime(2025, 11, 12, 4, 0, 0)


def make_raw(spark, payloads):
    rows = [
        (p.get("location_name", "k").encode("utf-8"), json.dumps(p).encode("utf-8"), KTS)
        for p in payloads
    ]
    return spark.createDataFrame(rows, schema=RAW_KAFKA_SCHEMA)


BASE = {
    "location_name": "Phường Phú An, Thành phố Hồ Chí Minh",
    "latitude": "11.0486457",
    "longitude": "106.6020209",
    "time": "2025-11-12T03:45",
    "interval": "900",
    "temperature": "28.9",
    "windspeed": "3.2",
    "winddirection": "117",
    "is_day": "1",
    "weathercode": "95",
}


def test_parse_typed_columns(spark):
    df = parse_raw_events(make_raw(spark, [BASE]))
    row = df.collect()[0]
    assert row.location == BASE["location_name"]
    assert row.temperature == pytest.approx(28.9)
    assert row.weathercode == 95
    assert row.is_day == 1
    assert row.latitude == pytest.approx(11.0486457)
    assert row.event_timestamp == dt.datetime(2025, 11, 12, 3, 45)
    assert row.kafka_timestamp == KTS
    assert row.payload["windspeed"] == "3.2"


@pytest.mark.parametrize(
    "time_str,expected",
    [
        ("2025-11-12T03:45", dt.datetime(2025, 11, 12, 3, 45)),
        ("2025-11-12 03:45:10", dt.datetime(2025, 11, 12, 3, 45, 10)),
        ("2025-11-12T03:45:10Z", dt.datetime(2025, 11, 12, 3, 45, 10)),
    ],
)
def test_multi_format_timestamp(spark, time_str, expected):
    p = dict(BASE, time=time_str)
    df = parse_raw_events(make_raw(spark, [p]))
    assert df.collect()[0].event_timestamp == expected


def test_unparseable_time_falls_back_to_broker_time(spark):
    p = dict(BASE, time="not-a-time")
    df = parse_raw_events(make_raw(spark, [p]))
    assert df.collect()[0].event_timestamp == KTS


def test_timestamp_key_fallback(spark):
    p = dict(BASE)
    del p["time"]
    p["timestamp"] = "2025-11-12 02:00:00"
    df = parse_raw_events(make_raw(spark, [p]))
    assert df.collect()[0].event_timestamp == dt.datetime(2025, 11, 12, 2, 0, 0)


def test_error_rows_dropped(spark):
    err = {"location_name": "X", "message": "Lỗi khi gọi API"}
    df = parse_raw_events(make_raw(spark, [BASE, err]))
    assert df.count() == 1
    kept = parse_raw_events(make_raw(spark, [BASE, err]), drop_error_rows=False)
    assert kept.count() == 2


def test_missing_metrics_null(spark):
    df = parse_raw_events(make_raw(spark, [BASE]))
    row = df.collect()[0]
    assert row.humidity is None and row.pressure is None


def test_payload_dropped_when_disabled(spark):
    df = parse_raw_events(make_raw(spark, [BASE]), keep_payload=False)
    assert "payload" not in df.columns


def test_location_falls_back_to_key(spark):
    p = dict(BASE)
    del p["location_name"]
    rows = [("MyKey".encode(), json.dumps(p).encode(), KTS)]
    raw = spark.createDataFrame(rows, schema=RAW_KAFKA_SCHEMA)
    assert parse_raw_events(raw).collect()[0].location == "MyKey"


def test_parse_is_streaming_safe(spark):
    """The chain must contain no stateful ops so it applies to readStream."""
    df = parse_raw_events(make_raw(spark, [BASE]))
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "Aggregate" not in plan and "Window" not in plan
