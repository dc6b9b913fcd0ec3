"""Columnar-format coverage beyond parquet: ORC round trip with predicate
pushdown, and text formats (JSON lines / CSV) already exercised elsewhere.

Avro is NOT covered: spark-avro is an external package and this
environment is offline — format support is a one-line ``.format("avro")``
swap once the jar is present.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_weather_system_spark.sources.tables import load_table

from conftest import TEST_SF_DIR


def test_orc_roundtrip_preserves_rows_and_schema(spark, tmp_path):
    ev = load_table(spark, TEST_SF_DIR, "events")
    path = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == ev.count()
    assert dict(back.dtypes) == dict(ev.dtypes)
    a = ev.agg(F.sum("value"), F.count("*")).head()
    b = back.agg(F.sum("value"), F.count("*")).head()
    assert a == b


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    ev = load_table(spark, TEST_SF_DIR, "events")
    path = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(path)
    q = (
        spark.read.orc(path)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "value")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan orc" in l)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)" in plan
    # column pruning: the scan must not read props/user_id
    assert "props" not in scan and "user_id" not in scan
