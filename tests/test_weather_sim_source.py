"""Custom Python Data Source (weather_sim): batch + streaming reads of the
synthetic crawler feed, partition-pruning filter pushdown, offset replay,
and parse-chain integration (T7 duality — same rows as the Kafka path)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_weather_system_spark.sources.raw_events import parse_raw_events
from bigdata_weather_system_spark.sources.weather_sim import (
    DEFAULT_CYCLES,
    DEFAULT_LOCATIONS,
    WeatherSimBatchReader,
    WeatherSimStreamReader,
    register_weather_sim,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_weather_sim(spark)
    yield
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_batch_read_shape_and_determinism(spark):
    df = spark.read.format("weather_sim").load()
    assert df.count() == len(DEFAULT_LOCATIONS) * DEFAULT_CYCLES
    assert df.columns == ["key", "value", "timestamp"]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, spark.read.format("weather_sim").load().collect()))
    assert a == b

    custom = (
        spark.read.format("weather_sim")
        .option("locations", "x,y")
        .option("cycles", "3")
        .load()
    )
    assert custom.count() == 6


def test_filter_pushdown_prunes_location_partitions(spark):
    flt = spark.read.format("weather_sim").load().filter(F.col("key") == "hanoi")
    rows = flt.collect()
    assert len(rows) == DEFAULT_CYCLES
    assert {r.key for r in rows} == {"hanoi"}


def test_push_filters_unit_semantics():
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    r = WeatherSimBatchReader({})
    unsupported = r.pushFilters(
        [EqualTo(("key",), "hanoi"), GreaterThan(("timestamp",), 0)]
    )
    assert [type(f).__name__ for f in unsupported] == ["GreaterThan"]
    assert [p.value for p in r.partitions()] == ["hanoi"]

    r2 = WeatherSimBatchReader({})
    r2.pushFilters([In(("key",), ("hue", "danang"))])
    assert sorted(p.value for p in r2.partitions()) == ["danang", "hue"]


def test_stream_offsets_and_replay():
    r = WeatherSimStreamReader({"cycles": "2", "locations": "a,b"})
    off0 = r.initialOffset()
    batch1, off1 = r.read(off0)
    assert off1 == {"cycle": 1} and len(list(batch1)) == 2
    batch2, off2 = r.read(off1)
    assert off2 == {"cycle": 2} and len(list(batch2)) == 2
    # exhausted: no new rows, offset does not advance
    empty, off3 = r.read(off2)
    assert off3 == off2 and list(empty) == []
    # deterministic replay of a committed range (exactly-once restart path)
    replay = list(r.readBetweenOffsets(off0, off2))
    fresh = list(r._rows(0, 2))
    assert replay == fresh and len(replay) == 4


def test_streaming_read_feeds_parse_chain(spark, tmp_path):
    stream = (
        spark.readStream.format("weather_sim")
        .option("cycles", "4")
        .option("locations", "hanoi,hue")
        .load()
    )
    parsed = parse_raw_events(stream, keep_payload=False)
    q = (
        parsed.writeStream.outputMode("append")
        .format("memory")
        .queryName("weather_sim_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_sim"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.table("weather_sim_stream")
        assert out.count() == 8
        assert out.filter(
            F.col("temperature").isNull() | F.col("event_timestamp").isNull()
        ).count() == 0
        # batch/stream duality: identical parsed rows from the batch reader
        batch = parse_raw_events(
            spark.read.format("weather_sim")
            .option("cycles", "4")
            .option("locations", "hanoi,hue")
            .load(),
            keep_payload=False,
        )
        cols = ["location", "event_timestamp", "temperature", "windspeed"]
        assert sorted(map(tuple, out.select(cols).collect())) == sorted(
            map(tuple, batch.select(cols).collect())
        )
    finally:
        q.stop()


def test_arrow_batch_read_path_matches_row_path(spark):
    rowpath = spark.read.format("weather_sim").load()
    arrow = spark.read.format("weather_sim").option("arrow", "true").load()
    assert sorted(map(tuple, arrow.collect())) == sorted(
        map(tuple, rowpath.collect())
    )


def test_weather_feed_sink_two_phase_commit(spark, tmp_path):
    import json as _json
    import os as _os

    from bigdata_weather_system_spark.sources.feed_sink import (
        register_weather_feed,
    )

    register_weather_feed(spark)
    out = str(tmp_path / "feed_out")
    src = spark.read.format("weather_sim").option("cycles", "6").load()
    src.write.format("weather_feed").option("path", out).mode("append").save()

    files = sorted(_os.listdir(out))
    assert "_FEED_COMMITTED" in files
    assert not any(f.startswith(".inprogress") for f in files)
    with open(_os.path.join(out, "_FEED_COMMITTED")) as f:
        manifest = _json.load(f)
    assert sum(manifest.values()) == src.count()
    # shards referenced by the manifest all exist and round-trip
    rows = []
    for shard in manifest:
        with open(_os.path.join(out, shard)) as f:
            rows += [_json.loads(line) for line in f]
    assert len(rows) == src.count()
    back = spark.createDataFrame(rows)
    assert sorted(r.key for r in back.select("key").distinct().collect()) == sorted(
        r.key for r in src.select("key").distinct().collect()
    )


def test_filter_pruning_all_partitions_yields_empty_not_crash(spark):
    """When pushFilters prunes every location, Spark plans the empty
    partition list as a single None partition — the read must return an
    empty result, not AttributeError on partition.value."""
    from pyspark.sql import functions as F

    df = (
        spark.read.format("weather_sim")
        .option("locations", "Hanoi,Hue")
        .option("cycles", "2")
        .load()
        .filter(F.col("key") == "Nowhere")
    )
    assert df.count() == 0
