"""Unit tests for operators/temporal.py — behaviors the DuckDB oracle
can't pin: as-of tolerance, unmatched-left nulls, equal-timestamp bounds,
session boundary determinism."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row, functions as F

from bigdata_weather_system_spark.operators.temporal import (
    asof_join,
    range_band_join,
    session_profiles,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 10:00:00"), lid=1),
            Row(k="a", ts=_ts("2024-01-01 12:00:00"), lid=2),
            Row(k="a", ts=_ts("2024-01-01 09:00:00"), lid=3),  # before any right
            Row(k="b", ts=_ts("2024-01-01 10:00:00"), lid=4),  # no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 09:30:00"), rid=10),
            Row(k="a", ts=_ts("2024-01-01 10:00:00"), rid=11),  # == left lid=1 ts
            Row(k="a", ts=_ts("2024-01-01 11:59:00"), rid=12),
        ]
    )
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark, asof_frames):
    left, right = asof_frames
    out = {
        r.lid: r.rid
        for r in asof_join(left, right, on=["k"], right_cols=["rid"]).collect()
    }
    assert out[1] == 11  # equal timestamp counts (<= bound)
    assert out[2] == 12  # latest of the three priors
    assert out[3] is None  # left row precedes all right rows
    assert out[4] is None  # key with no right side at all


def test_asof_tolerance_nulls_stale_matches(spark, asof_frames):
    left, right = asof_frames
    out = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on=["k"], right_cols=["rid"], tolerance_seconds=60
        ).collect()
    }
    assert out[1] == 11  # 0 s gap, inside tolerance
    assert out[2] == 12  # 60 s gap, inclusive bound
    assert out[3] is None and out[4] is None


def test_asof_preserves_left_rowcount(spark, asof_frames):
    left, right = asof_frames
    assert asof_join(left, right, on=["k"], right_cols=["rid"]).count() == left.count()


def test_sessionize_gap_boundaries(spark):
    rows = [
        Row(k="u", ts=_ts("2024-01-01 10:00:00"), i=1),
        Row(k="u", ts=_ts("2024-01-01 10:30:00"), i=2),  # 1800 s == gap → same
        Row(k="u", ts=_ts("2024-01-01 11:00:01"), i=3),  # 1801 s > gap → new
        Row(k="u", ts=_ts("2024-01-01 11:00:01"), i=4),  # tie ts → same session
        Row(k="v", ts=_ts("2024-01-01 10:00:00"), i=5),  # other key restarts at 1
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.i: r.session_id
        for r in sessionize(
            df, ["k"], "ts", gap_seconds=1800, tiebreak_cols=["i"]
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_session_profiles_aggregates(spark):
    rows = [
        Row(k="u", ts=_ts("2024-01-01 10:00:00"), value=1.0, i=1),
        Row(k="u", ts=_ts("2024-01-01 10:10:00"), value=2.0, i=2),
        Row(k="u", ts=_ts("2024-01-01 20:00:00"), value=4.0, i=3),
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r.k, r.session_id): (r.n_events, r.total_value)
        for r in session_profiles(
            df, ["k"], "ts", gap_seconds=3600, value_col="value", tiebreak_cols=["i"]
        ).collect()
    }
    assert out == {("u", 1): (2, 3.0), ("u", 2): (1, 4.0)}


def test_range_band_join_half_open_intervals(spark):
    df = spark.createDataFrame([Row(i=1, v=99.9), Row(i=2, v=100.0), Row(i=3, v=500.0)])
    bands = spark.createDataFrame(
        [Row(band="low", lo=0.0, hi=100.0), Row(band="high", lo=100.0, hi=500.0)]
    )
    out = {r.i: r.band for r in range_band_join(df, bands, "v").collect()}
    assert out == {1: "low", 2: "high"}  # 500.0 falls outside every [lo, hi)


def test_asof_forward_direction(spark):
    from bigdata_weather_system_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 25.0, 2), ("b", 5.0, 3)], ["k", "ts", "lid"]
    )
    right = spark.createDataFrame(
        [("a", 10.0, "same"), ("a", 20.0, "next"), ("a", 30.0, "later")],
        ["k", "ts", "tag"],
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["tag"], direction="forward",
    )
    got = {r.lid: r.tag for r in out.collect()}
    # equal timestamps match (inclusive >=); missing future → null
    assert got == {1: "same", 2: "later", 3: None}

    bounded = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["tag"], direction="forward", tolerance_seconds=4.0,
    )
    got_b = {r.lid: r.tag for r in bounded.collect()}
    assert got_b == {1: "same", 2: None, 3: None}


def test_resample_to_grid_fills_gaps_and_keeps_latest_per_bucket(spark):
    from datetime import datetime

    from bigdata_weather_system_spark.operators.temporal import resample_to_grid

    rows = [
        # user a: buckets 0h and 3h observed, 1h/2h gaps; two obs in
        # bucket 0 — the later one (v=2.0, id=11) must win
        ("a", datetime(2024, 1, 1, 0, 10), 1.0, 10),
        ("a", datetime(2024, 1, 1, 0, 50), 2.0, 11),
        ("a", datetime(2024, 1, 1, 3, 5), 9.0, 12),
        # user b: single observation → single grid row
        ("b", datetime(2024, 1, 1, 5, 0), 7.0, 13),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, eid long")
    out = resample_to_grid(
        df, key_cols=["k"], ts_col="ts", step_seconds=3600,
        value_cols=["v"], tiebreak_cols=["eid"],
    ).orderBy("k", "grid_ts")
    got = [(r.k, r.grid_ts.hour, r.is_observed, r.v_ffill) for r in out.collect()]
    assert got == [
        ("a", 0, True, 2.0),
        ("a", 1, False, 2.0),
        ("a", 2, False, 2.0),
        ("a", 3, True, 9.0),
        ("b", 5, True, 7.0),
    ]


def test_resample_lerp_interpolates_time_weighted(spark):
    from datetime import datetime

    from bigdata_weather_system_spark.operators.temporal import resample_to_grid

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0), 10.0, 1),
        ("a", datetime(2024, 1, 1, 3, 0), 40.0, 2),  # 3-bucket gap: 1h, 2h
        ("a", datetime(2024, 1, 1, 4, 0), 0.0, 3),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, eid long")
    out = resample_to_grid(
        df, key_cols=["k"], ts_col="ts", step_seconds=3600,
        value_cols=["v"], tiebreak_cols=["eid"], interpolate=True,
    ).orderBy("grid_ts")
    got = [(r.grid_ts.hour, r.is_observed, r.v_lerp) for r in out.collect()]
    assert got == [
        (0, True, 10.0),
        (1, False, 20.0),  # 1/3 of the way 10 → 40
        (2, False, 30.0),  # 2/3
        (3, True, 40.0),
        (4, True, 0.0),
    ]


def test_resample_lerp_skips_null_valued_observation_anchors(spark):
    """A bucket observed with a NULL value must be interpolated across —
    its timestamp must not become an interpolation anchor."""
    from datetime import datetime

    from bigdata_weather_system_spark.operators.temporal import resample_to_grid

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0), 10.0, 1),
        ("a", datetime(2024, 1, 1, 1, 0), None, 2),  # observed, null value
        ("a", datetime(2024, 1, 1, 4, 0), 50.0, 3),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, eid long")
    out = resample_to_grid(
        df, key_cols=["k"], ts_col="ts", step_seconds=3600,
        value_cols=["v"], tiebreak_cols=["eid"], interpolate=True,
    ).orderBy("grid_ts")
    got = [(r.grid_ts.hour, r.is_observed, r.v_lerp) for r in out.collect()]
    # anchors are 0h (10.0) and 4h (50.0): 10 + 10*h at every grid point
    assert got == [
        (0, True, 10.0),
        (1, True, 20.0),   # observed but null → interpolated, not anchored
        (2, False, 30.0),
        (3, False, 40.0),
        (4, True, 50.0),
    ]


def test_resample_accepts_overlapping_column_roles(spark):
    """ts/value columns may double as tiebreaks — the internal projection
    must dedupe or the rank window hits AMBIGUOUS_REFERENCE."""
    from datetime import datetime

    from bigdata_weather_system_spark.operators.temporal import resample_to_grid

    rows = [("a", datetime(2024, 1, 1, 0, 0), 1.0), ("a", datetime(2024, 1, 1, 2, 0), 3.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_to_grid(
        df, key_cols=["k"], ts_col="ts", step_seconds=3600,
        value_cols=["v"], tiebreak_cols=["v", "ts"],
    ).orderBy("grid_ts")
    got = [(r.grid_ts.hour, r.v_ffill) for r in out.collect()]
    assert got == [(0, 1.0), (1, 1.0), (2, 3.0)]


def test_interval_containment_join_buckets_and_bounds(spark):
    """Bucketized containment: exclusive hi, multi-bucket intervals, and
    the left variant keeping unmatched points."""
    from bigdata_weather_system_spark.operators.temporal import (
        interval_containment_join,
    )

    points = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 10.0), ("a", 3, 25.0), ("b", 4, 5.0)],
        "k string, pid long, p double",
    )
    intervals = spark.createDataFrame(
        # [0,10) and a 3-bucket-wide [8,26) for key a; none for b
        [("a", 100, 0.0, 10.0), ("a", 200, 8.0, 26.0)],
        "k string, iid long, lo double, hi double",
    )
    inner = interval_containment_join(
        points, intervals, ["k"], "p", "lo", "hi", bucket_width=10.0
    )
    got = sorted((r.pid, r.iid) for r in inner.collect())
    # p=10.0 is NOT in [0,10) (exclusive hi) but IS in [8,26)
    assert got == [(1, 100), (2, 200), (3, 200)]

    left = interval_containment_join(
        points, intervals, ["k"], "p", "lo", "hi", bucket_width=10.0, how="left"
    )
    by_pid = {}
    for r in left.collect():
        by_pid.setdefault(r.pid, []).append(r.iid)
    assert by_pid[4] == [None]  # unmatched point survives
    assert sorted(by_pid[1]) == [100]


def test_interval_containment_left_duplicate_points(spark):
    """Two distinct point rows with the same (key, point value) must each
    match exactly their own intervals — no cross-multiplication through
    the rejoin (regression: joining back on (keys, point) fanned each
    duplicate out by the other's match count)."""
    from bigdata_weather_system_spark.operators.temporal import (
        interval_containment_join,
    )

    points = spark.createDataFrame(
        # duplicate (k='a', p=5.0) with distinct pids, plus one unmatched dup
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 99.0), ("a", 4, 99.0)],
        "k string, pid long, p double",
    )
    intervals = spark.createDataFrame(
        [("a", 100, 0.0, 10.0), ("a", 200, 4.0, 6.0)],
        "k string, iid long, lo double, hi double",
    )
    left = interval_containment_join(
        points, intervals, ["k"], "p", "lo", "hi", bucket_width=10.0, how="left"
    )
    rows = left.collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.iid)
    # each duplicate point matches both intervals ONCE (2 rows, not 4)
    assert sorted(by_pid[1]) == [100, 200]
    assert sorted(by_pid[2]) == [100, 200]
    # unmatched duplicates each survive as a single null row
    assert by_pid[3] == [None]
    assert by_pid[4] == [None]
    assert len(rows) == 6


def test_scd2_intervals_collapse_consecutive_states(spark):
    from bigdata_weather_system_spark.operators.temporal import scd2_intervals

    rows = [
        (1, "a", 10, 100),
        (1, "a", 20, 101),  # same state → same interval
        (1, "b", 30, 102),  # change
        (1, "a", 40, 103),  # back to a → NEW interval (not merged with v1)
        (2, "x", 10, 200),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, state string, ts long, event_id long"
    )
    out = scd2_intervals(
        df, ["user_id"], "state", "ts", tiebreak_cols=["event_id"]
    ).collect()
    u1 = sorted(
        [r for r in out if r.user_id == 1], key=lambda r: r.version
    )
    assert [(r.state, r.valid_from, r.valid_to, r.n_events) for r in u1] == [
        ("a", 10, 30, 2),
        ("b", 30, 40, 1),
        ("a", 40, None, 1),
    ]
    assert [r.is_current for r in u1] == [False, False, True]
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current


def test_ohlc_bars_open_close_ordering_and_ties(spark):
    import datetime as dt

    from bigdata_weather_system_spark.operators.temporal import ohlc_bars

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("k", t0, 5.0, 2),          # same ts as event 1 — higher id
        ("k", t0, 3.0, 1),          # tie on ts → open decided by event_id
        ("k", t0 + dt.timedelta(hours=1), 9.0, 3),
        ("k", t0 + dt.timedelta(hours=7), 1.0, 4),  # next 6h bucket
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, value double, event_id long"
    )
    out = {
        r.bucket: r
        for r in ohlc_bars(
            df, ["k"], "ts", "value", "event_id", bucket_secs=21600
        ).collect()
    }
    b0, b1 = sorted(out)
    assert out[b0].open == 3.0  # lowest (ts, event_id), not lowest value
    assert out[b0].close == 9.0
    assert out[b0].high == 9.0 and out[b0].low == 3.0 and out[b0].n == 3
    assert out[b1].open == out[b1].close == 1.0 and out[b1].n == 1
