"""Bucketed co-located joins must plan with zero Exchange operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_weather_system_spark.sources.bucketed import (
    co_located_join,
    write_bucketed,
)


@pytest.fixture()
def warehouse(spark, tmp_path):
    # session-scoped spark already has a warehouse dir; tables are dropped
    # after each test to keep the catalog clean
    yield
    for t in ("b_orders", "b_lines"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    from bigdata_weather_system_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    lines = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lines, "b_lines", ["o_orderkey"], n_buckets=8)

    # disable broadcast so the test proves bucketing (not broadcast) removed
    # the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "b_orders", "b_lines", on=["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan

        # and the join result is correct vs. the plain join
        expected = orders.join(lines, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_date_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    from bigdata_weather_system_spark.sources.bucketed import write_date_partitioned
    from bigdata_weather_system_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(ev, path, ts_col="ts")

    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == F.lit("2024-01-15").cast("date"))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan
    # pruning actually happened: the filtered scan reads one partition dir
    n_days = back.select("event_date").distinct().count()
    assert n_days > 1
    expected = ev.filter(F.to_date("ts") == F.lit("2024-01-15").cast("date")).count()
    assert one_day.count() == expected


def test_backfill_rewrites_only_named_partitions(spark, tmp_path):
    """Dynamic-partition backfill: the corrected date's partition changes,
    all other partitions' FILES are untouched (same inodes), and
    re-running the backfill is a no-op on content."""
    import datetime as dt
    import glob
    import os

    from pyspark.sql import functions as F

    from bigdata_weather_system_spark.sources.bucketed import (
        backfill_partitions,
        write_date_partitioned,
    )

    path = str(tmp_path / "facts")
    base = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10), 10.0),
            (2, dt.datetime(2024, 1, 2, 10), 20.0),
            (3, dt.datetime(2024, 1, 3, 10), 30.0),
        ],
        "id long, ts timestamp, v double",
    )
    write_date_partitioned(base, path)
    untouched_files = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{path}/event_date=2024-01-0[13]/*.parquet")
    }

    # corrected day-2 data PLUS a stray day-3 row the filter must drop
    fix = spark.createDataFrame(
        [
            (2, dt.datetime(2024, 1, 2, 10), 21.5),
            (99, dt.datetime(2024, 1, 3, 10), 999.0),
        ],
        "id long, ts timestamp, v double",
    )
    backfill_partitions(fix, path, ["2024-01-02"])

    got = {
        r.id: r.v
        for r in spark.read.parquet(path).select("id", "v").collect()
    }
    assert got == {1: 10.0, 2: 21.5, 3: 30.0}  # stray 99 filtered out
    for f, mtime in untouched_files.items():
        assert os.stat(f).st_mtime_ns == mtime, f"{f} was rewritten"

    # idempotent: re-running converges to identical content
    backfill_partitions(fix, path, ["2024-01-02"])
    again = {
        r.id: r.v
        for r in spark.read.parquet(path).select("id", "v").collect()
    }
    assert again == got
