"""Service-facade parity tests on weather-shaped fixtures (FIXTURES.md §1/§5).

Quirks under test: case-insensitive lookup, 12-events/hour scaling, modal
tie-breaks, injectable clock, hourly/daily/bucket regimes, persistence
prediction rollup.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from bigdata_weather_system_spark.schemas import RAW_KAFKA_SCHEMA
from bigdata_weather_system_spark.service import WeatherService, coerce_value
from bigdata_weather_system_spark.sources.raw_events import parse_raw_events

NOW = dt.datetime(2025, 11, 14, 12, 0, 0)
LOCS = ["Hà Nội", "Phường Phú An, Thành phố Hồ Chí Minh", "Đà Nẵng"]


def fixture_events(spark):
    """3 locations × 3 days × 12 events/hour (hours 0-11), plus dups, an
    error row, and an unparseable-time row."""
    rows = []
    for li, loc in enumerate(LOCS):
        for day in range(3):
            date = NOW.date() - dt.timedelta(days=2 - day)
            for hour in range(12):
                for i in range(12):
                    ts = dt.datetime.combine(date, dt.time(hour, i * 5))
                    payload = {
                        "location_name": loc,
                        "time": ts.isoformat(timespec="minutes"),
                        "temperature": str(20.0 + li + hour * 0.5),
                        "windspeed": str(3.0 + i * 0.1),
                        "winddirection": "117",
                        "weathercode": str([0, 1, 0, 2][i % 4]),
                        "interval": "900",
                        "is_day": "1",
                        "latitude": str(10.0 + li),
                        "longitude": str(106.0 + li),
                    }
                    rows.append(
                        (
                            loc.encode(),
                            json.dumps(payload).encode(),
                            ts + dt.timedelta(seconds=30),
                        )
                    )
    # duplicate (location, event_time) with later kafka ts — newer wins
    dup = dict(json.loads(rows[0][1]))
    dup["temperature"] = "99.9"
    rows.append((rows[0][0], json.dumps(dup).encode(), rows[0][2] + dt.timedelta(hours=1)))
    # error row
    rows.append(
        (
            LOCS[0].encode(),
            json.dumps({"location_name": LOCS[0], "message": "Lỗi khi gọi API"}).encode(),
            NOW,
        )
    )
    return spark.createDataFrame(rows, RAW_KAFKA_SCHEMA)


@pytest.fixture(scope="module")
def service(spark):
    parsed = parse_raw_events(fixture_events(spark)).cache()
    parsed.count()
    return WeatherService(lambda: parsed, now_fn=lambda: NOW)


def test_list_latest(service):
    recs = service.list_latest()
    assert len(recs) == 3
    assert [r["location"] for r in recs] == sorted(LOCS)
    for r in recs:
        # latest event of the newest day, hour 11, minute 55
        assert r["event_timestamp"].hour == 11 and r["event_timestamp"].minute == 55
        assert r["event_timestamp"].date() == NOW.date()


def test_get_location_case_insensitive(service):
    r = service.get_location("hà nội")
    assert r is not None and r["location"] == "Hà Nội"
    assert service.get_location("NOPE") is None


def test_details_payload_coercion(service):
    r = service.get_location(LOCS[0])
    det = r["details"]
    assert det["interval"] == 900 and isinstance(det["interval"], int)
    assert det["is_day"] == 1
    assert isinstance(det["temperature"], float)


def test_average_day(service):
    r = service.get_weather_average_day(LOCS[0].lower(), NOW.date())
    assert r is not None
    # temps = 20 + hour*0.5 for hours 0..11 → avg = 20 + 2.75
    assert r["average_temperature"] == pytest.approx(22.75, abs=0.01)
    assert service.get_weather_average_day(LOCS[0], "1999-01-01") is None


def test_days(service):
    days = service.get_weather_days(LOCS[1])
    assert len(days) == 3
    assert days == sorted(days)
    assert days[-1] == NOW.date().isoformat()


def test_hourly_regime(service):
    recs = service.get_recent_history_with_step(LOCS[0], hours=24, step=1)
    assert len(recs) == 12  # hours 0-11 today
    hours = [r["hour"] for r in recs]
    assert hours == sorted(hours)
    # modal weathercode: codes cycle 0,1,0,2 → 0 wins (6 of 12)
    assert all(r["weathercode"] == 0 for r in recs)
    assert recs[0]["n_events"] == 12


def test_daily_regime(service):
    recs = service.get_recent_history_with_step(LOCS[0], hours=168, step=24)
    assert len(recs) == 3  # only 3 days of data within today-6..today
    assert [r["day"] for r in recs] == sorted(r["day"] for r in recs)
    # oldest day carries the injected duplicate event → 145
    assert [r["n_events"] for r in recs] == [145, 144, 144]


def test_generic_regime_bucket_counts(service):
    # 2 "hours" at step "1 hour" → 24 events in 12-event buckets → 2 buckets
    recs = service.get_recent_history_with_step(LOCS[0], hours=2, step=1)
    assert len(recs) == 2
    assert all(r["n_events"] == 12 for r in recs)


def test_generic_regime_scalable_variant(service):
    recs = service.get_recent_history_with_step(
        LOCS[0], hours=2, step=1, scalable_buckets=True
    )
    # event-time buckets: same events, hour-aligned → 2 buckets of 12
    assert len(recs) == 2
    assert sum(r["n_events"] for r in recs) == 24


def test_dedup_duplicate_event_prefers_later_arrival(service):
    # the dup row (temp 99.9) has the same event_timestamp as the original;
    # latest-per-key ordering uses kafka_timestamp as tie-break
    recs = service.get_recent_history(LOCS[0], hours=1000)
    first_day_first = [
        r
        for r in recs
        if r["event_timestamp"] == dt.datetime.combine(NOW.date() - dt.timedelta(days=2), dt.time(0, 0))
    ]
    # both rows exist in raw history (no dedup in get_recent_history)
    assert len(first_day_first) == 2


def test_sequence_and_prediction(service):
    seq = service.get_sequence_for_location(LOCS[2], 24)
    assert len(seq) == 24
    times = [r["event_timestamp"] for r in seq]
    assert times == sorted(times)
    env = service.predict_weather(LOCS[2], steps=2)
    # reference envelope (spark.py:1559-1574)
    assert env["key"] == env["location"] == LOCS[2]
    assert env["steps"] == 2
    assert env["based_on"]["sequence_length"] == 24
    preds = env["predictions"]
    assert len(preds) == 2  # hourly rollup of 24 5-min steps
    assert all(p["n_steps"] == 12 for p in preds)
    assert preds[0]["weathercode"] == 0
    last_temp = seq[-1]["temperature"]
    assert preds[0]["temperature"] == pytest.approx(last_temp)
    # error branches map to the reference's {"error": ...} contract
    assert "error" in service.predict_weather(LOCS[2], steps=0)
    assert "error" in service.predict_weather("NOPE")


def test_coerce_value_table():
    assert coerce_value("true") is True
    assert coerce_value("False") is False
    assert coerce_value("42") == 42 and isinstance(coerce_value("42"), int)
    assert coerce_value("42.5") == 42.5
    assert coerce_value("abc") == "abc"
    assert coerce_value(7) == 7


def test_hourly_regime_day_boundary_sweep(service):
    """VERDICT r6 Next #8: the hourly regime keys on the driver clock's
    DATE (reference spark.py:588-589) — a date-equality filter, not a
    rolling 24 h window. Sweeping `now` across midnight pins the
    dispatch: one second before midnight the full day is still served;
    at 00:00:00 the new date has no rows yet and the answer is empty;
    and at 00:00:00 OF the data day the same 12 buckets come back even
    though every event is 'in the future' relative to the clock — the
    quirk a timestamp-comparison rewrite would silently break."""
    data_day = dt.datetime(2025, 11, 14, 0, 0, 0)
    for now in (
        dt.datetime(2025, 11, 14, 23, 59, 59),
        data_day,  # 00:00:00 of the data day — time-of-day must not matter
    ):
        recs = service.get_recent_history_with_step(
            LOCS[0], hours=24, step=1, now=now
        )
        assert len(recs) == 12, now
        assert [r["hour"] for r in recs] == list(range(12))
    after_midnight = service.get_recent_history_with_step(
        LOCS[0], hours=24, step=1, now=dt.datetime(2025, 11, 15, 0, 0, 0)
    )
    assert after_midnight == []


def test_daily_regime_window_boundary_sweep(service):
    """The daily regime serves today−6..today by driver-clock date
    (reference spark.py:694-698). Sweep `now` across the 23:59→00:00
    edge and the trailing edge where fixture days age out: crossing
    midnight from the 14th to the 15th must NOT drop day 12 (still
    inside the 7-day window); by the 19th only days 13-14 remain; past
    the 20th the window is empty."""
    def days(now):
        recs = service.get_recent_history_with_step(
            LOCS[0], hours=168, step=24, now=now
        )
        return [r["day"] for r in recs]

    assert days(dt.datetime(2025, 11, 14, 23, 59, 59)) == [
        "2025-11-12", "2025-11-13", "2025-11-14",
    ]
    assert days(dt.datetime(2025, 11, 15, 0, 0, 0)) == [
        "2025-11-12", "2025-11-13", "2025-11-14",
    ]
    assert days(dt.datetime(2025, 11, 19, 0, 0, 0)) == [
        "2025-11-13", "2025-11-14",
    ]
    assert days(dt.datetime(2025, 11, 21, 0, 0, 0)) == []
