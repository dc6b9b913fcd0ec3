"""HTTP facade golden tests — route parity with /root/reference/main.py:56-133.

The router is exercised both as a pure function (status/payload per route,
including 404/400/422 branches) and end-to-end over a real socket with the
stdlib client, on the same weather fixture the service tests use.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.request
from urllib.parse import quote

import pytest

from bigdata_weather_system_spark.service import WeatherService
from bigdata_weather_system_spark.service.http_app import route, serve
from bigdata_weather_system_spark.sources.raw_events import parse_raw_events

from test_service import NOW, LOCS, fixture_events


@pytest.fixture(scope="module")
def service(spark):
    parsed = parse_raw_events(fixture_events(spark)).cache()
    parsed.count()
    return WeatherService(lambda: parsed, now_fn=lambda: NOW)


def test_root(service):
    status, body = route(service, "/", {}, spark_master="local[4]",
                         kafka_topic="weather")
    assert status == 200
    assert body == {
        "message": "Weather service is up",
        "spark_master": "local[4]",
        "kafka_topic": "weather",
    }


def test_list_weather_and_limit(service):
    status, body = route(service, "/weather", {})
    assert status == 200
    assert body["count"] == 3
    assert [r["location"] for r in body["results"]] == sorted(LOCS)

    status, body = route(service, "/weather", {"limit": ["1"]})
    assert status == 200 and body["count"] == 1

    # FastAPI Query(gt=0) semantics → 422 on violation / non-int
    assert route(service, "/weather", {"limit": ["0"]})[0] == 422
    assert route(service, "/weather", {"limit": ["abc"]})[0] == 422


def test_get_location_and_404(service):
    status, body = route(service, f"/weather/{LOCS[0].lower()}", {})
    assert status == 200 and body["location"] == LOCS[0]

    status, body = route(service, "/weather/NOPE", {})
    assert status == 404 and "NOPE" in body["detail"]


def test_average_day_route(service):
    date = NOW.date().isoformat()
    status, body = route(service, f"/weather/average_day/{LOCS[0]}/{date}", {})
    assert status == 200
    assert body["average_temperature"] == pytest.approx(22.75, abs=0.01)

    status, _ = route(service, f"/weather/average_day/{LOCS[0]}/1999-01-01", {})
    assert status == 404


def test_days_route(service):
    status, body = route(service, f"/weather/days/{LOCS[1]}", {})
    assert status == 200
    assert body["location"] == LOCS[1] and len(body["days"]) == 3

    assert route(service, "/weather/days/NOPE", {})[0] == 404


def test_recent_with_step_route(service):
    status, body = route(
        service, f"/weather/recent_with_step/{LOCS[0]}",
        {"hours": ["24"], "step": ["1"]},
    )
    assert status == 200 and body["count"] == 12
    assert route(
        service, f"/weather/recent_with_step/{LOCS[0]}", {"hours": ["x"]}
    )[0] == 422


def test_predict_route(service):
    status, body = route(service, f"/weather/predict/{LOCS[0]}",
                         {"steps": ["2"]})
    assert status == 200
    assert body["location"] == LOCS[0]
    assert len(body["predictions"]) >= 1

    # unknown location → insufficient context → error envelope → 400
    # (the reference's predict route only 404s on a falsy record, which
    # its service never returns — error dicts map to 400)
    assert route(service, "/weather/predict/NOPE", {})[0] == 400
    # steps outside FastAPI's ge=1/le=48 bounds → 422
    assert route(service, f"/weather/predict/{LOCS[0]}", {"steps": ["0"]})[0] == 422
    assert route(service, f"/weather/predict/{LOCS[0]}", {"steps": ["49"]})[0] == 422


def test_unknown_routes(service):
    assert route(service, "/nope", {})[0] == 404
    assert route(service, "/weather/days/x/y", {})[0] == 404


def test_end_to_end_socket(service):
    httpd = serve(service, host="127.0.0.1", port=0, spark_master="local[4]")
    port = httpd.server_address[1]
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as resp:
                return resp.status, json.loads(resp.read().decode("utf-8"))

        status, body = get("/")
        assert status == 200 and body["message"] == "Weather service is up"

        status, body = get("/weather?limit=2")
        assert status == 200 and body["count"] == 2

        # percent-encoded unicode location keys resolve (case-insensitive)
        status, body = get("/weather/" + quote(LOCS[0].lower()))
        assert status == 200 and body["location"] == LOCS[0]

        with pytest.raises(urllib.error.HTTPError) as ei:
            get("/weather/NOPE")
        assert ei.value.code == 404
        assert json.loads(ei.value.read().decode("utf-8"))["detail"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_fastapi_adapter_gate(service):
    """The FastAPI twin is import-gated: without fastapi it raises with
    guidance pointing at the stdlib frontend; with it, make_app would
    serve the SAME route() dispatcher (no second semantics to drift)."""
    from bigdata_weather_system_spark.service import fastapi_app

    if fastapi_app.fastapi is None:
        with pytest.raises(ImportError, match="http_app.serve"):
            fastapi_app.make_app(service)
    else:  # pragma: no cover - only in fastapi-equipped environments
        app = fastapi_app.make_app(service)
        assert app is not None
