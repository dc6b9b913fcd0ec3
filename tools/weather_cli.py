"""CLI inspection mode — parity with the reference's shell interface
(`prediction/preprocessing/spark.py:1577-1620`): list latest records or
inspect one location from a terminal, no HTTP layer needed.

The event feed comes from the engine's custom `weather_sim` Python data
source (the in-repo stand-in for the reference's Kafka topic), parsed by
the same chain every other source uses.

Usage:
  python tools/weather_cli.py list [--limit N] [--cycles N]
  python tools/weather_cli.py get LOCATION [--cycles N]
  python tools/weather_cli.py history LOCATION [--hours N] [--step N]
  python tools/weather_cli.py predict LOCATION [--steps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_weather_system_spark.session import get_spark  # noqa: E402
from bigdata_weather_system_spark.service.weather import (  # noqa: E402
    WeatherService,
    persistence_predictor,
)
from bigdata_weather_system_spark.sources.raw_events import parse_raw_events  # noqa: E402
from bigdata_weather_system_spark.sources.weather_sim import register_weather_sim  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("command", choices=["list", "get", "history", "predict"])
    ap.add_argument("location", nargs="?", default=None)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--cycles", type=int, default=24)
    ap.add_argument("--hours", type=int, default=24)
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()
    if args.command != "list" and not args.location:
        ap.error(f"{args.command} requires LOCATION")

    spark = get_spark(app_name="weather-cli")
    register_weather_sim(spark)
    raw = spark.read.format("weather_sim").option("cycles", str(args.cycles)).load()
    events = parse_raw_events(raw, keep_payload=True)
    # Driver-clock regimes (SURVEY §2.11 quirks) anchor on "today"; pin the
    # injectable clock to the feed's max event time so the sim data is
    # always "current" regardless of when the CLI runs.
    import pyspark.sql.functions as F

    latest_ts = events.agg(F.max("event_timestamp")).first()[0]
    svc = WeatherService(lambda: events, now_fn=lambda: latest_ts)

    if args.command == "list":
        out = svc.list_latest(limit=args.limit)
    elif args.command == "get":
        out = svc.get_location(args.location)
    elif args.command == "history":
        out = svc.get_recent_history_with_step(
            args.location, hours=args.hours, step=args.step
        )
    else:
        out = svc.predict_weather(
            args.location, steps=args.steps, predictor=persistence_predictor
        )
    print(json.dumps(out, indent=2, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
