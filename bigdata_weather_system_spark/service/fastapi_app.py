"""FastAPI adapter for :class:`WeatherService` — the framework twin of
``http_app.py``.

This sandbox ships no ``fastapi``, so the 7 GET endpoints of the
reference app (/root/reference/main.py:56-133) are served by the stdlib
``http.server`` stand-in in ``http_app.py``, whose pure
``route(path, query) -> (status, payload)`` dispatcher carries ALL the
endpoint semantics (404/400/422 parity, quirk-for-quirk). When an
environment does have FastAPI, this module exposes the same dispatcher
through it: every route delegates to :func:`http_app.route`, so the two
frontends cannot drift.

Usage (only in a FastAPI-equipped environment)::

    from bigdata_weather_system_spark.service.fastapi_app import make_app
    app = make_app(service)           # uvicorn module:app
"""

from __future__ import annotations

from .weather import WeatherService

try:  # pragma: no cover - exercised only where fastapi is installed
    import fastapi
except ImportError:  # pragma: no cover
    fastapi = None


def make_app(
    service: WeatherService,
    spark_master: str = "local",
    kafka_topic: str = "weather",
):
    """Build a FastAPI app over the shared route dispatcher.

    Raises ImportError with guidance when fastapi is absent (this
    sandbox): use ``http_app.serve`` instead — identical semantics.
    """
    if fastapi is None:  # pragma: no cover
        raise ImportError(
            "fastapi is not installed in this environment; use "
            "bigdata_weather_system_spark.service.http_app.serve — the "
            "stdlib frontend over the same route() dispatcher."
        )

    from fastapi import Request
    from fastapi.responses import JSONResponse

    from .http_app import route

    app = fastapi.FastAPI(title="weather")

    @app.get("/{full_path:path}")
    def dispatch(full_path: str, request: Request):  # pragma: no cover
        status, payload = route(
            service,
            "/" + full_path,
            {k: request.query_params.getlist(k) for k in request.query_params},
            spark_master=spark_master,
            kafka_topic=kafka_topic,
        )
        return JSONResponse(status_code=status, content=payload)

    return app
