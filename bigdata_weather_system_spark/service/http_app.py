"""Thin HTTP layer over :class:`WeatherService`.

Route-for-route equivalent of the reference's FastAPI app
(``/root/reference/main.py:56-133``): the same 7 GET endpoints, the same
response envelopes, the same 404/400 semantics. FastAPI/uvicorn aren't in
this container, so the wrapper is stdlib ``http.server`` — the HTTP layer
is deliberately dumb plumbing; every queryable behavior (case-insensitive
lookup, ×12 scaling, tie-breaks, prediction rollup) lives in
``service/weather.py`` where it is golden-tested.

Design split: :func:`route` is a pure (path, query) → (status, payload)
function — testable without sockets — and :class:`WeatherHandler` adapts
it to ``BaseHTTPRequestHandler``. Parameter validation mirrors FastAPI's:
constraint violations (``limit`` ≤ 0, ``steps`` outside 1..48, non-integer
ints) return 422 with a ``detail`` body.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit

from .weather import WeatherService


def _int_param(query: dict, name: str, default: int | None):
    """FastAPI-style int query param: absent → default, non-int → 422."""
    vals = query.get(name)
    if not vals:
        return default
    try:
        return int(vals[0])
    except ValueError as exc:
        raise _Invalid(f"query parameter '{name}' must be an integer") from exc


class _Invalid(Exception):
    pass


def route(
    service: WeatherService,
    path: str,
    query: dict[str, list[str]],
    spark_master: str = "local",
    kafka_topic: str = "weather",
) -> tuple[int, dict]:
    """Dispatch one GET request; returns (status_code, JSON payload).

    Mirrors /root/reference/main.py:56-133 route by route, including the
    'not record → 404' and "'error' in record → 400" branches.
    """
    parts = [unquote(p) for p in path.strip("/").split("/") if p != ""]
    try:
        if not parts:
            return 200, {
                "message": "Weather service is up",
                "spark_master": spark_master,
                "kafka_topic": kafka_topic,
            }
        if parts[0] != "weather":
            return 404, {"detail": "Not Found"}

        if len(parts) == 1:
            limit = _int_param(query, "limit", None)
            if limit is not None and limit <= 0:
                raise _Invalid("limit must be greater than 0")
            records = (
                service.list_latest()
                if limit is None
                else service.list_latest(limit=limit)
            )
            return 200, {"count": len(records), "results": records}

        if parts[1] == "average_day" and len(parts) == 4:
            record = service.get_weather_average_day(parts[2], parts[3])
            if not record:
                return 404, {
                    "detail": "No weather data available for location key "
                    f"'{parts[2]}' and date '{parts[3]}'"
                }
            return 200, record

        if parts[1] == "days" and len(parts) == 3:
            days = service.get_weather_days(parts[2])
            if not days:
                return 404, {
                    "detail": "No weather data available for location key "
                    f"'{parts[2]}'"
                }
            return 200, {"location": parts[2], "days": days}

        if parts[1] == "recent_with_step" and len(parts) == 3:
            hours = _int_param(query, "hours", 24)
            step = _int_param(query, "step", 1)
            records = service.get_recent_history_with_step(
                parts[2], hours=hours, step=step
            )
            return 200, {"count": len(records), "results": records}

        if parts[1] == "predict" and len(parts) == 3:
            steps = _int_param(query, "steps", 1)
            if not 1 <= steps <= 48:
                raise _Invalid("steps must be between 1 and 48")
            record = service.predict_weather(parts[2], steps=steps)
            if not record:
                return 404, {
                    "detail": "No weather data available for location key "
                    f"'{parts[2]}'"
                }
            if "error" in record:
                return 400, {"detail": record["error"]}
            return 200, record

        if len(parts) == 2:
            record = service.get_location(parts[1])
            if not record:
                return 404, {
                    "detail": "No weather data available for location key "
                    f"'{parts[1]}'"
                }
            return 200, record

        return 404, {"detail": "Not Found"}
    except _Invalid as exc:
        return 422, {"detail": str(exc)}


def make_handler(
    service: WeatherService,
    spark_master: str = "local",
    kafka_topic: str = "weather",
):
    """Build a request-handler class closed over the service."""

    class WeatherHandler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlsplit(self.path)
            status, payload = route(
                service,
                url.path,
                parse_qs(url.query),
                spark_master=spark_master,
                kafka_topic=kafka_topic,
            )
            body = json.dumps(payload, ensure_ascii=False, default=str).encode(
                "utf-8"
            )
            self.send_response(status)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet test runs
            pass

    return WeatherHandler


def serve(
    service: WeatherService,
    host: str = "0.0.0.0",
    port: int = 8000,
    spark_master: str = "local",
    kafka_topic: str = "weather",
) -> ThreadingHTTPServer:
    """Start (and return) a threaded HTTP server; caller owns shutdown().

    Threaded because Spark collect() calls inside a handler can overlap —
    the SparkSession is thread-safe and queries are independent.
    """
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(service, spark_master, kafka_topic)
    )
    import threading

    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd
