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


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appended batches with an evolved schema (new column) must read back
    as the union schema under mergeSchema, old rows null-filled — the
    contract a long-lived ingest directory relies on."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
