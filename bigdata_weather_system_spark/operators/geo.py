"""Geospatial operators: haversine distance, grid binning, broadcast
nearest-neighbor assignment, and an exact cell-bucketed within-radius
pair join.

A weather pipeline is intrinsically spatial (the reference keys every
record by a location string and fans one query out per location,
prediction/preprocessing/spark.py:164-176 — its "spatial index" is the
Kafka topic key). This module supplies the real spatial operators that
design needs at scale:

- ``haversine_km`` — great-circle distance as a pure column expression
  (JVM-side, whole-stage codegen; no UDF).
- ``grid_cell`` — integer (row, col) cell ids for equal-angle binning;
  a plain hash aggregation, the canonical heat-map / density op.
- ``nearest_join`` — assign each point the nearest of a SMALL station
  set via a broadcast nested-loop join + arg-min. With ~10^4 stations
  (the real-world weather-station count) the station side broadcasts,
  so the plan is a map-side pass over the big point table — no shuffle
  of the points at all. Arg-min is ``min(struct(dist, station_id))``:
  deterministic tie-break on station id, no window needed.
- ``within_radius_pairs`` — all point pairs within R km, EXACTLY, via
  cell bucketing: each point emits its 3x3 cell neighborhood as join
  keys, pairs are generated only within matching cells, then the true
  haversine predicate filters candidates. With cell size >= the radius
  in BOTH axes the neighborhood provably contains every true pair, so
  the result equals the brute-force O(n^2) self-join while the work is
  O(sum of cell-pair sizes). The latitude band must be bounded away
  from the poles so a longitude degree stays wide enough — the caller
  passes ``max_abs_lat`` and the helper validates the geometry.

Longitude cells wrap modulo 360 so the +-180 meridian is a normal cell
boundary, not a seam that loses pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088
KM_PER_LAT_DEGREE = 111.132  # meridian arc, spherical model


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (degree) coordinate pairs.

    2R * asin(sqrt(sin^2(dphi/2) + cos(phi1)cos(phi2)sin^2(dlambda/2))) —
    numerically stable at small distances (unlike the plain law of
    cosines) and a pure builtin-function expression on both Spark and
    any ANSI engine, so oracles can replicate it verbatim.
    """
    dphi = F.radians(lat2 - lat1) / 2.0
    dlam = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlam) * F.sin(dlam)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    """Equal-angle grid cell ids: (row from -90, col from -180), ints."""
    row = F.floor((lat + F.lit(90.0)) / F.lit(float(cell_deg))).cast("int")
    col = F.floor((lon + F.lit(180.0)) / F.lit(float(cell_deg))).cast("int")
    return row, col


def nearest_join(
    points: DataFrame,
    stations: DataFrame,
    *,
    point_cols: tuple[str, str] = ("lat", "lon"),
    station_cols: tuple[str, str] = ("s_lat", "s_lon"),
    station_id: str = "station_id",
    dist_col: str = "dist_km",
    round_digits: int = 6,
) -> DataFrame:
    """Assign every point row its nearest station (broadcast arg-min).

    The station table MUST be broadcast-small (real weather networks are
    ~10^2..10^4 stations). The plan is then: map-side nested-loop join
    fanning each point row out |stations| times, immediately collapsed
    by a partial-aggregating ``min(struct(...))`` — the shuffle carries
    one row per point-side group, never the fan-out. Distances are
    rounded before the arg-min so the comparison is reproducible across
    engines; ties break on station id (struct ordering), deterministic.
    """
    plat, plon = point_cols
    slat, slon = station_cols
    d = F.round(
        haversine_km(F.col(plat), F.col(plon), F.col(slat), F.col(slon)),
        round_digits,
    )
    key_cols = [c for c in points.columns]
    joined = points.join(F.broadcast(stations))
    best = (
        joined.groupBy(*key_cols)
        .agg(F.min(F.struct(d.alias(dist_col), F.col(station_id))).alias("_b"))
        .select(*key_cols, F.col(f"_b.{station_id}"), F.col(f"_b.{dist_col}"))
    )
    return best


def within_radius_pairs(
    points: DataFrame,
    *,
    id_col: str,
    radius_km: float,
    cell_deg: float = 1.0,
    max_abs_lat: float = 60.0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    round_digits: int = 6,
) -> DataFrame:
    """EXACT all-pairs within ``radius_km``, via 3x3 cell-neighborhood
    bucketing (a.id < b.id, each unordered pair once).

    Exactness argument: two points within R km differ by at most
    R/111.132 degrees latitude and, inside the |lat| <= max_abs_lat
    band, at most R/(111.132*cos(max_abs_lat)) degrees longitude. If
    both bounds are <= cell_deg, the pair's home cells differ by at most
    1 in each axis, so the 3x3 neighborhood join enumerates every true
    pair — validated here, not assumed. Longitude cells wrap mod 360.

    Scale shape: the quadratic is confined to individual cells (skew =
    densest cell); the join is a plain shuffle on cell keys. Compare
    the O(n^2) global cross-join this replaces.
    """
    import math

    lat_span = radius_km / KM_PER_LAT_DEGREE
    lon_span = radius_km / (KM_PER_LAT_DEGREE * math.cos(math.radians(max_abs_lat)))
    if lat_span > cell_deg or lon_span > cell_deg:
        raise ValueError(
            f"cell_deg={cell_deg} too small for radius {radius_km} km at "
            f"|lat|<={max_abs_lat} (needs >= {max(lat_span, lon_span):.4f} deg)"
        )
    n_cols = int(round(360.0 / cell_deg))

    pts = points.where(F.abs(F.col(lat_col)) <= F.lit(float(max_abs_lat)))
    row, col = grid_cell(F.col(lat_col), F.col(lon_col), cell_deg)
    home = pts.select(
        F.col(id_col), F.col(lat_col), F.col(lon_col),
        row.alias("_cy"), col.alias("_cx"),
    )
    # probe side: each point emits its 9 neighbor cells as keys
    probe = (
        home.select(
            F.col(id_col).alias("a_id"),
            F.col(lat_col).alias("a_lat"),
            F.col(lon_col).alias("a_lon"),
            F.explode(
                F.array(*[
                    F.struct(
                        (F.col("_cy") + F.lit(dy)).alias("cy"),
                        F.pmod(F.col("_cx") + F.lit(dx), F.lit(n_cols)).alias("cx"),
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ])
            ).alias("_n"),
        )
        .select("a_id", "a_lat", "a_lon", F.col("_n.cy"), F.col("_n.cx"))
    )
    build = home.select(
        F.col(id_col).alias("b_id"),
        F.col(lat_col).alias("b_lat"),
        F.col(lon_col).alias("b_lon"),
        F.col("_cy").alias("cy"),
        F.pmod(F.col("_cx"), F.lit(n_cols)).alias("cx"),
    )
    d = F.round(
        haversine_km(F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")),
        round_digits,
    )
    return (
        probe.join(build, on=["cy", "cx"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(d <= F.lit(float(radius_km)))
        .select(
            F.col("a_id"), F.col("b_id"), d.alias("dist_km"),
        )
    )
