"""Sequence-builder invariants (FIXTURES.md §4)."""

from __future__ import annotations

import datetime as dt

from bigdata_weather_system_spark.operators.sequences import build_sequences


def make_events(spark, n_per_key=30, keys=("a", "b")):
    rows = [
        (k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=5 * i), float(i))
        for k in keys
        for i in range(n_per_key)
    ]
    return spark.createDataFrame(rows, "location string, event_timestamp timestamp, v double")


def test_sequence_shape_and_invariants(spark):
    df = make_events(spark)
    out = build_sequences(df, seq_len=24, forecast_len=2, feature_cols=("v",))
    rows = out.collect()
    # 30 rows per key; valid windows need 24 history rows AND 2 leads:
    # row indexes 23..27 (0-based) qualify → 5 per key
    assert len(rows) == 10
    for r in rows:
        assert len(r.sequence) == 24
        assert len(r.target_sequence) == 2
        assert r.target == r.target_sequence[0]
        assert r.start_timestamp == r.sequence[0].event_timestamp
        assert r.end_timestamp == r.sequence[23].event_timestamp
        # chronological within the window
        times = [e.event_timestamp for e in r.sequence]
        assert times == sorted(times)
        # target is strictly after the window end
        assert r.target.event_timestamp > r.end_timestamp
        # values are consecutive: window of i..i+23 then target i+24
        assert r.target.v == r.sequence[23].v + 1


def test_sequence_excludes_tail_rows(spark):
    df = make_events(spark, n_per_key=24, keys=("solo",))
    out = build_sequences(df, seq_len=24, forecast_len=1, feature_cols=("v",))
    # exactly 24 rows: the single complete window has no lead → excluded
    assert out.count() == 0
