"""Kafka-producer-shaped sink as a PySpark Python Data Source writer.

The reference publishes events with a Kafka producer and a final
``flush(timeout=10)`` barrier (S11,
``/root/reference/crawl_data/producer_v2.py:22-44, 217-223``). This is the
same capability engine-native and broker-free: ``df.write.format(
"weather_feed").option("path", dir).save()`` emits one JSONL shard per
input partition with Kafka-transport fields (key, value, timestamp), under
a real two-phase commit:

- executors write to hidden ``.inprogress-<uuid>`` temp files and return
  a :class:`WriterCommitMessage` naming the temp shard and its row count;
- the driver's ``commit`` renames every temp shard into place and writes
  a ``_FEED_COMMITTED`` manifest (shard → rows) — readers only see fully
  written files, exactly the all-or-nothing contract the producer's
  ``flush`` approximates;
- ``abort`` deletes the temp files, leaving the directory untouched.

A failed/straggling speculative task never publishes: its temp shard is
not in the commit messages, so it is ignored and cleaned by abort.
"""

from __future__ import annotations

import dataclasses
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclasses.dataclass
class FeedCommitMessage(WriterCommitMessage):
    temp_name: str
    final_name: str
    n_rows: int


class WeatherFeedWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("weather_feed sink requires option('path', ...)")
        self._overwrite = overwrite

    def write(self, iterator) -> FeedCommitMessage:
        os.makedirs(self._path, exist_ok=True)
        shard = uuid.uuid4().hex
        temp_name = f".inprogress-{shard}"
        n = 0
        with open(os.path.join(self._path, temp_name), "w") as f:
            for row in iterator:
                rec = {
                    "key": row.key,
                    "value": row.value,
                    "timestamp": row.timestamp.isoformat()
                    if row.timestamp is not None
                    else None,
                }
                f.write(json.dumps(rec) + "\n")
                n += 1
        return FeedCommitMessage(
            temp_name=temp_name, final_name=f"feed-{shard}.jsonl", n_rows=n
        )

    def commit(self, messages) -> None:
        manifest = {}
        for m in messages:
            if m is None:
                continue
            os.rename(
                os.path.join(self._path, m.temp_name),
                os.path.join(self._path, m.final_name),
            )
            manifest[m.final_name] = m.n_rows
        if self._overwrite:
            # honor mode("overwrite"): clear shards from prior commits so
            # directory-globbing readers can't see stale rows alongside
            # the new manifest (deleted AFTER the renames — a crash here
            # leaves extra files but never a manifest naming missing ones)
            for name in os.listdir(self._path):
                if name.startswith("feed-") and name not in manifest:
                    os.remove(os.path.join(self._path, name))
        with open(os.path.join(self._path, "_FEED_COMMITTED"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self._path, m.temp_name))
            except FileNotFoundError:
                pass


class WeatherFeedDataSource(DataSource):
    """format("weather_feed") — options: path (required)."""

    @classmethod
    def name(cls) -> str:
        return "weather_feed"

    def schema(self) -> str:
        return "key string, value string, timestamp timestamp"

    def writer(self, schema: StructType, overwrite: bool) -> WeatherFeedWriter:
        return WeatherFeedWriter(self.options, overwrite)


def register_weather_feed(spark) -> None:
    spark.dataSource.register(WeatherFeedDataSource)
