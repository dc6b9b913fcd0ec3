"""applyInPandasWithState: per-key state must accumulate across
micro-batches (not reset per batch) and emit updated snapshots."""

from __future__ import annotations

import datetime as dt

import pytest

from bigdata_weather_system_spark.sources.raw_events import parse_raw_events
from bigdata_weather_system_spark.streaming import (
    read_event_stream,
    running_value_profile,
)

from test_streaming import payload, stream_dir, wait_for, write_batch  # noqa: F401


def test_running_profile_accumulates_across_batches(spark, stream_dir, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    write_batch(
        stream_dir,
        "b1.json",
        [payload("hanoi", t0, 20.0), payload("hue", t0, 30.0)],
        t0,
    )
    raw = read_event_stream(spark, path=stream_dir, max_files_per_trigger=1)
    profile = running_value_profile(parse_raw_events(raw, keep_payload=False))
    q = (
        profile.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_profile")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            r.location: r
            for r in spark.table("running_profile").collect()
        }
        assert rows["hanoi"].n_events == 1
        assert rows["hanoi"].avg_value == 20.0

        # second micro-batch touches hanoi again — state must carry over
        t1 = t0 + dt.timedelta(minutes=5)
        write_batch(
            stream_dir,
            "b2.json",
            [payload("hanoi", t1, 40.0)],
            t1,
        )
        q.processAllAvailable()
        # update-mode memory sink appends updated rows; take the latest
        # snapshot per key = the row with the highest n_events
        latest = {}
        for r in spark.table("running_profile").collect():
            cur = latest.get(r.location)
            if cur is None or r.n_events > cur.n_events:
                latest[r.location] = r
        assert latest["hanoi"].n_events == 2
        assert latest["hanoi"].sum_value == 60.0
        assert latest["hanoi"].avg_value == 30.0
        assert latest["hanoi"].min_value == 20.0
        assert latest["hanoi"].max_value == 40.0
        assert latest["hue"].n_events == 1  # untouched key keeps its state
    finally:
        q.stop()


def _protobuf_available() -> bool:
    # transformWithStateInPandas talks to the JVM state server over
    # protobuf; the operator is gated on the lib being importable.
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas requires google.protobuf "
    "(unavailable in this environment)",
)
def test_transform_with_state_profile_accumulates(spark, stream_dir, tmp_path):
    """transformWithStateInPandas twin: same lifetime-profile semantics on
    the Spark 4 arbitrary-state API (ValueState on the processor handle)."""
    from bigdata_weather_system_spark.streaming import running_value_profile_tws

    t0 = dt.datetime(2024, 2, 1, 9, 0)
    write_batch(
        stream_dir,
        "b1.json",
        [payload("hanoi", t0, 10.0), payload("hue", t0, 20.0)],
        t0,
    )
    raw = read_event_stream(spark, path=stream_dir, max_files_per_trigger=1)
    profile = running_value_profile_tws(parse_raw_events(raw, keep_payload=False))
    q = (
        profile.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_profile_tws")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.location: r for r in spark.table("running_profile_tws").collect()}
        assert rows["hanoi"].n_events == 1
        assert rows["hanoi"].avg_value == 10.0

        t1 = t0 + dt.timedelta(minutes=5)
        write_batch(stream_dir, "b2.json", [payload("hanoi", t1, 30.0)], t1)
        q.processAllAvailable()
        latest = {}
        for r in spark.table("running_profile_tws").collect():
            cur = latest.get(r.location)
            if cur is None or r.n_events > cur.n_events:
                latest[r.location] = r
        assert latest["hanoi"].n_events == 2
        assert latest["hanoi"].sum_value == 40.0
        assert latest["hanoi"].min_value == 10.0
        assert latest["hanoi"].max_value == 30.0
        # hue untouched by batch 2 — its snapshot stays at one event
        assert latest["hue"].n_events == 1
    finally:
        q.stop()


def test_streaming_anomaly_flags_running_state(spark, stream_dir):
    """Online 3-sigma flags against lifetime per-key state: a spike after
    enough baseline observations is emitted with its z-score; baseline
    points and early points (n_prior < 5) are not."""
    import datetime as dt

    from bigdata_weather_system_spark.sources.raw_events import (
        parse_raw_events,
    )
    from bigdata_weather_system_spark.streaming import read_event_stream
    from bigdata_weather_system_spark.streaming.stateful import (
        streaming_anomaly_flags,
    )

    t0 = dt.datetime(2025, 11, 14, 10, 0)
    base = [
        payload("A", t0 + dt.timedelta(minutes=i), 20.0 + (i % 3) * 0.5)
        for i in range(6)
    ]
    write_batch(stream_dir, "b1.json", base, t0)

    raw = read_event_stream(spark, "files", stream_dir)
    flags = streaming_anomaly_flags(parse_raw_events(raw, keep_payload=False))
    q = (
        flags.writeStream.outputMode("append")
        .format("memory")
        .queryName("anomaly_flags_test")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("anomaly_flags_test").count() == 0  # baseline only

        write_batch(
            stream_dir,
            "b2.json",
            [
                payload("A", t0 + dt.timedelta(minutes=10), 100.0),  # spike
                payload("A", t0 + dt.timedelta(minutes=11), 20.5),  # normal
            ],
            t0,
        )
        q.processAllAvailable()
        rows = spark.table("anomaly_flags_test").collect()
        assert len(rows) == 1
        assert rows[0].value == 100.0 and rows[0].zscore > 3
    finally:
        q.stop()
