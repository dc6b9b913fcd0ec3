"""Geo operator tests: haversine sanity, cell-join exactness vs brute
force (including the antimeridian seam), geometry validation, and
arg-min tie determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.geo import (
    EARTH_RADIUS_KM,
    haversine_km,
    nearest_join,
    within_radius_pairs,
)


def _haversine_py(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = (p2 - p1) / 2
    dlam = math.radians(lon2 - lon1) / 2
    a = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlam) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_haversine_known_values(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 1.0), (0.0, 0.0, 90.0, 0.0), (10.0, 10.0, 10.0, 10.0)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    got = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    # 1 degree of longitude at the equator ~ 111.19 km; pole ~ quarter meridian
    assert abs(got[0]["d"] - 111.195) < 0.01
    assert abs(got[1]["d"] - math.pi * EARTH_RADIUS_KM / 2) < 0.01
    assert got[2]["d"] == 0.0


def test_within_radius_matches_brute_force_with_antimeridian(spark):
    # a cluster straddling +-180, a cluster at mid-latitude, and isolates
    pts = [
        (1, 10.0, 179.8),
        (2, 10.1, -179.9),   # ~ 40 km from #1 across the seam
        (3, -45.0, 30.0),
        (4, -44.8, 30.3),    # ~ 32 km from #3
        (5, 55.0, -120.0),   # isolate
        (6, -59.9, 0.0),     # band edge isolate
    ]
    df = spark.createDataFrame(pts, "user_id int, lat double, lon double")
    got = {
        (r["a_id"], r["b_id"])
        for r in within_radius_pairs(
            df, id_col="user_id", radius_km=100.0, cell_deg=2.0, max_abs_lat=60.0
        ).collect()
    }
    expect = {
        (a, b)
        for i, (a, la, lo) in enumerate(pts)
        for b, lb, lb2 in (p for p in pts[i + 1:])
        if round(_haversine_py(la, lo, lb, lb2), 6) <= 100.0
    }
    assert got == expect
    assert (1, 2) in got  # the seam pair must survive the lon wrap


def test_within_radius_rejects_undersized_cells(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "user_id int, lat double, lon double")
    with pytest.raises(ValueError, match="too small"):
        within_radius_pairs(
            df, id_col="user_id", radius_km=500.0, cell_deg=1.0, max_abs_lat=60.0
        )


def test_nearest_join_argmin_tie_breaks_on_station_id(spark):
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "user_id int, lat double, lon double")
    # two stations exactly equidistant from the point -> lower id wins
    st = spark.createDataFrame(
        [(7, 0.0, 1.0), (3, 0.0, -1.0), (9, 50.0, 50.0)],
        "station_id int, s_lat double, s_lon double",
    )
    got = nearest_join(pts, st).collect()
    assert len(got) == 1
    assert got[0]["station_id"] == 3
    assert abs(got[0]["dist_km"] - 111.195) < 0.01


def test_within_radius_empty_and_singleton_inputs(spark):
    empty = spark.createDataFrame([], "user_id int, lat double, lon double")
    assert (
        within_radius_pairs(
            empty, id_col="user_id", radius_km=100.0, cell_deg=2.0
        ).count()
        == 0
    )
    one = spark.createDataFrame([(1, 0.0, 0.0)], "user_id int, lat double, lon double")
    assert (
        within_radius_pairs(one, id_col="user_id", radius_km=100.0, cell_deg=2.0).count()
        == 0
    )


def test_points_outside_lat_band_are_excluded_not_wrong(spark):
    # a polar point must be filtered (the cell geometry proof only holds
    # inside the band), never silently mis-bucketed
    pts = spark.createDataFrame(
        [(1, 75.0, 0.0), (2, 75.1, 0.0), (3, 10.0, 10.0), (4, 10.1, 10.0)],
        "user_id int, lat double, lon double",
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in within_radius_pairs(
            pts, id_col="user_id", radius_km=100.0, cell_deg=2.0, max_abs_lat=60.0
        ).collect()
    }
    assert got == {(3, 4)}
