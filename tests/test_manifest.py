"""Manifest-index tests: footer-only stats build, file pruning on point
and range lookups, and exact-result equivalence with a full scan."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.layout import write_zordered
from bigdata_weather_system_spark.sources.manifest import (
    build_manifest,
    pruned_read,
    write_manifest,
)
from bigdata_weather_system_spark.sources.tables import load_table

from conftest import TEST_SF_DIR


def _clustered_events(spark, tmp_path) -> str:
    ev = load_table(spark, TEST_SF_DIR, "events").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("tsd"),
        "value",
    )
    path = str(tmp_path / "events_z")
    write_zordered(ev, ["user_id", "tsd"], path, n_files=8, bits=10)
    return path


def test_build_manifest_matches_actual_extremes(spark, tmp_path):
    path = _clustered_events(spark, tmp_path)
    man = build_manifest(spark, path, ["user_id"]).collect()
    assert len(man) == len(glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    total = df.count()
    assert sum(r.n_rows for r in man) == total
    lo = min(r.min_user_id for r in man)
    hi = max(r.max_user_id for r in man)
    got = df.agg(F.min("user_id"), F.max("user_id")).head()
    assert (lo, hi) == (float(got[0]), float(got[1]))


def test_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    path = _clustered_events(spark, tmp_path)
    mpath = str(tmp_path / "manifest")
    write_manifest(spark, path, ["user_id", "tsd"], mpath)
    man = spark.read.parquet(mpath)

    users = spark.read.parquet(path).agg(
        F.min("user_id"), F.max("user_id")
    ).head()
    lo = float(users[0])
    hi = lo + (float(users[1]) - lo) * 0.05  # narrow slice

    pruned = pruned_read(spark, path, "user_id", lo, hi, manifest=man)
    full = spark.read.parquet(path).filter(
        (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
    )
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in full.collect()
    )
    # the z-clustered layout must let the manifest drop some files
    n_total = len(glob.glob(os.path.join(path, "*.parquet")))
    n_kept = len(pruned.inputFiles())
    assert n_kept < n_total, f"kept {n_kept}/{n_total}"


def test_pruned_read_empty_range_returns_empty_with_schema(spark, tmp_path):
    path = _clustered_events(spark, tmp_path)
    out = pruned_read(spark, path, "user_id", -10.0, -5.0)
    assert out.count() == 0
    assert "event_id" in out.columns


def test_delete_rows_by_key_rewrites_only_affected_files(spark, tmp_path):
    path = _clustered_events(spark, tmp_path)  # z-ordered on (user_id, tsd)
    before_files = set(glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    total = df.count()
    users = [r.user_id for r in df.select("user_id").distinct().collect()]
    victims = sorted(users)[:2]
    n_victim_rows = df.filter(F.col("user_id").isin(victims)).count()
    assert n_victim_rows > 0

    from bigdata_weather_system_spark.sources.manifest import (
        delete_rows_by_key,
    )

    stats = delete_rows_by_key(spark, path, "user_id", victims)
    assert stats["rows_deleted"] == n_victim_rows
    # the clustered layout must localize the victims to a strict subset
    assert 0 < stats["files_rewritten"] < stats["files_total"]

    after = spark.read.parquet(path)
    assert after.count() == total - n_victim_rows
    assert after.filter(F.col("user_id").isin(victims)).count() == 0
    # untouched files are still present with their original names
    untouched = before_files & set(glob.glob(os.path.join(path, "*.parquet")))
    assert len(untouched) == stats["files_total"] - stats["files_rewritten"]
