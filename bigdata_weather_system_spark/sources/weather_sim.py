"""Synthetic Open-Meteo-like feed as a PySpark Python Data Source.

The reference's upstream is a REST crawler that polls ~N locations every
5 minutes and publishes kafka-shaped JSON events (S10/S11,
``/root/reference/crawl_data/producer_v2.py:47-228``). Here that feeder
becomes an ENGINE-NATIVE source via the PySpark 4 Python Data Source API:

- ``spark.read.format("weather_sim")`` — bounded snapshot of N crawl
  cycles, one input partition per location (the natural parallelism of a
  per-location poller), with location-equality filter pushdown that
  prunes partitions before any row is generated;
- ``spark.readStream.format("weather_sim")`` — the same rows as a
  micro-batch stream, one crawl cycle per batch, offset = cycle index
  (replayable: ``readBetweenOffsets`` regenerates any committed range,
  which is what makes the source exactly-once-compatible).

Rows are (key, value, timestamp) exactly like the Kafka transport, so
they feed the SAME ``parse_raw_events`` chain as every other source
(T7 duality). All values derive from crc32 of (location, cycle) — fully
deterministic, no network, no RNG state.
"""

from __future__ import annotations

import datetime as dt
import json
import zlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DEFAULT_LOCATIONS = ("hanoi", "danang", "hue", "cantho", "haiphong")
DEFAULT_START = "2024-01-01T00:00:00"
DEFAULT_CYCLES = 12
INTERVAL_SECONDS = 300

SCHEMA_DDL = "key string, value string, timestamp timestamp"


def _seed(location: str, cycle: int) -> int:
    return zlib.crc32(f"{location}:{cycle}".encode())


def _event(location: str, cycle: int, start: dt.datetime) -> tuple:
    """One kafka-shaped observation row, bit-deterministic per (loc, cycle)."""
    s = _seed(location, cycle)
    event_ts = start + dt.timedelta(seconds=cycle * INTERVAL_SECONDS)
    payload = {
        "location_name": location,
        "time": event_ts.isoformat(timespec="minutes"),
        "interval": str(INTERVAL_SECONDS),
        "temperature": str(round(15.0 + (s % 2000) / 100.0, 2)),
        "windspeed": str(round((s // 7 % 400) / 10.0, 1)),
        "winddirection": str(s // 11 % 360),
        "humidity": str(40 + s // 13 % 60),
        "weathercode": str((s // 17) % 4),
        "is_day": str(1 if 6 <= event_ts.hour < 18 else 0),
        "latitude": str(round(8.0 + (_seed(location, 0) % 1200) / 100.0, 4)),
        "longitude": str(round(102.0 + (_seed(location, 1) % 800) / 100.0, 4)),
    }
    # broker timestamp trails event time by a few deterministic seconds
    kafka_ts = event_ts + dt.timedelta(seconds=s % 30)
    return (location, json.dumps(payload, sort_keys=True), kafka_ts)


def _parse_options(options) -> tuple[list[str], dt.datetime, int]:
    locs = [
        loc.strip()
        for loc in options.get("locations", ",".join(DEFAULT_LOCATIONS)).split(",")
        if loc.strip()
    ]
    start = dt.datetime.fromisoformat(options.get("start", DEFAULT_START))
    cycles = int(options.get("cycles", DEFAULT_CYCLES))
    return locs, start, cycles


class WeatherSimBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._locs, self._start, self._cycles = _parse_options(options)
        # arrow=true switches read() to yield pyarrow.RecordBatch — the
        # vectorized transfer path (one batch per partition instead of
        # row-at-a-time tuple pickling); results are bit-identical
        self._arrow = options.get("arrow", "false").lower() == "true"

    def pushFilters(self, filters):
        """Prune location partitions from key-equality predicates.

        Supported: EqualTo/In on ``key``. Everything else is returned
        unhandled so Spark re-applies it above the scan — pushdown here is
        an optimization, never a correctness dependency.
        """
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("key",):
                self._locs = [loc for loc in self._locs if loc == f.value]
            elif isinstance(f, In) and f.attribute == ("key",):
                allowed = set(f.value)
                self._locs = [loc for loc in self._locs if loc in allowed]
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        # one partition per location — a 10k-location crawl fans out to
        # 10k independent tasks, exactly like the threaded poller but
        # scheduled by Spark
        return [InputPartition(loc) for loc in self._locs]

    def read(self, partition: InputPartition) -> Iterator:
        if partition is None:
            # pushFilters can prune every location; Spark plans the empty
            # partition list as a single None partition — an empty result,
            # not an error
            return
        loc = partition.value
        rows = [_event(loc, cycle, self._start) for cycle in range(self._cycles)]
        if not self._arrow:
            yield from rows
            return
        import pyarrow as pa

        keys, values, timestamps = zip(*rows) if rows else ((), (), ())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(keys, type=pa.string()),
                pa.array(values, type=pa.string()),
                pa.array(timestamps, type=pa.timestamp("us")),
            ],
            names=["key", "value", "timestamp"],
        )


class WeatherSimStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self._locs, self._start, self._cycles = _parse_options(options)

    def initialOffset(self) -> dict:
        return {"cycle": 0}

    def _rows(self, lo: int, hi: int) -> Iterator[tuple]:
        # a LIST iterator, not a generator: the simple-stream prefetch
        # cache copy.copy()s the iterator (generators aren't copyable) and
        # calls next() on it when offsets don't advance (lists aren't
        # iterators) — iter(list) satisfies both sides of the protocol
        return iter(
            [
                _event(loc, cycle, self._start)
                for cycle in range(lo, hi)
                for loc in self._locs
            ]
        )

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        cycle = start["cycle"]
        if cycle >= self._cycles:  # feed exhausted — report no new data
            return iter(()), {"cycle": cycle}
        return self._rows(cycle, cycle + 1), {"cycle": cycle + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic regeneration of any committed range = replayable
        # source, the property exactly-once sinks need on restart
        return self._rows(start["cycle"], end["cycle"])


class WeatherSimDataSource(DataSource):
    """format("weather_sim") — options: locations (csv), start (ISO), cycles."""

    @classmethod
    def name(cls) -> str:
        return "weather_sim"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> WeatherSimBatchReader:
        return WeatherSimBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> WeatherSimStreamReader:
        return WeatherSimStreamReader(self.options)


def register_weather_sim(spark) -> None:
    spark.dataSource.register(WeatherSimDataSource)
