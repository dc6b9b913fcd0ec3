"""Contract queries: the geospatial family.

The reference's spatial model is a location STRING used as a Kafka key
and an equality filter (prediction/preprocessing/spark.py:164-176,
getData.py crawl loop) — it never computes with coordinates. A weather
engine at 100 TB needs the real thing: distance math, spatial binning,
nearest-station assignment, containment joins, and radius self-joins.

Coordinates are derived deterministically from md5 of the entity key
(the same cross-engine hash idiom the sampling/split families use), so
both Spark and the DuckDB oracle see bit-identical positions without
any new test data: lat in [-60, 60) and lon in [-180, 180) with 1e-4
degree resolution. The +-60 latitude band keeps longitude degrees wide
enough for the cell-bucketed radius join to be provably exact.

All trig happens on doubles in both engines; distances are rounded to 6
decimals BEFORE any comparison (arg-min, radius predicate) so a
last-ulp libm difference cannot flip a decision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..operators.geo import grid_cell, haversine_km, nearest_join, within_radius_pairs
from .core import register, _t

# --- deterministic coordinates, Spark side --------------------------------


def _hash_coord(prefix: str, key: Column, offset: int, modulus: int, shift: float) -> Column:
    h = F.md5(F.concat(F.lit(prefix), key.cast("string")))
    raw = F.conv(F.substring(h, offset, 15), 16, 10).cast("long")
    return (raw % modulus) / 10000.0 - shift


def _with_coords(df: DataFrame, key: str, prefix: str, lat: str = "lat", lon: str = "lon") -> DataFrame:
    return df.withColumn(
        lat, _hash_coord(prefix, F.col(key), 1, 1_200_000, 60.0)
    ).withColumn(lon, _hash_coord(prefix, F.col(key), 17, 3_600_000, 180.0))


# --- deterministic coordinates, oracle side -------------------------------

def _sql_coord(prefix: str, key_expr: str, offset: int, modulus: int, shift: float) -> str:
    return (
        f"CAST(('0x' || substring(md5('{prefix}' || CAST({key_expr} AS VARCHAR)),"
        f" {offset}, 15)) AS BIGINT) % {modulus} / 10000.0 - {shift}"
    )


_USER_COORDS_CTE = f"""
u AS (
  SELECT user_id,
         {_sql_coord('u:', 'user_id', 1, 1_200_000, 60.0)}  AS lat,
         {_sql_coord('u:', 'user_id', 17, 3_600_000, 180.0)} AS lon
  FROM (SELECT DISTINCT user_id FROM events)
)
"""

_SQL_HAVERSINE = (
    "2 * 6371.0088 * asin(sqrt("
    " sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    "   * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)))"
)


def _events_with_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_coords(_t(spark, sf_dir, "events"), "user_id", "u:")


def _distinct_users_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id").distinct()
    return _with_coords(ev, "user_id", "u:")


# ---------------------------------------------------------------------------
# Grid density: equal-angle binning — one hash aggregation
# ---------------------------------------------------------------------------

@register(
    "geo_grid_density",
    oracle=f"""
    WITH e AS (
      SELECT CAST(floor(({_sql_coord('u:', 'user_id', 1, 1_200_000, 60.0)} + 90.0) / 5.0) AS INT)  AS cell_row,
             CAST(floor(({_sql_coord('u:', 'user_id', 17, 3_600_000, 180.0)} + 180.0) / 5.0) AS INT) AS cell_col,
             user_id, value
      FROM events
    )
    SELECT cell_row, cell_col,
           count(*)                    AS n_events,
           count(DISTINCT user_id)     AS n_users,
           round(avg(value), 6)        AS avg_value
    FROM e GROUP BY cell_row, cell_col
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density surface: 5-degree equal-angle cells over the event
    stream, each user acting as a mobile sensor at its hashed position.

    Plan shape: the coordinates and cell ids are pure column expressions
    derived IN the scan projection (no join against a user-dimension
    table), so the whole query is scan -> project -> one hash aggregation
    with map-side partials. At 100 TB this is embarrassingly parallel;
    cell count is bounded by the grid (24x72), so the final shuffle
    carries at most ~1.7k groups per partition.
    """
    ev = _events_with_coords(spark, sf_dir)
    row, col = grid_cell(F.col("lat"), F.col("lon"), 5.0)
    return (
        ev.select(row.alias("cell_row"), col.alias("cell_col"), "user_id", "value")
        .groupBy("cell_row", "cell_col")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest station: broadcast nested-loop + arg-min
# ---------------------------------------------------------------------------

_NEAREST_DIST = _SQL_HAVERSINE.format(
    lat1="u.lat", lon1="u.lon", lat2="s.s_lat", lon2="s.s_lon"
)

@register(
    "geo_nearest_station",
    oracle=f"""
    WITH {_USER_COORDS_CTE},
    s AS (
      SELECT n_nationkey AS station_id,
             {_sql_coord('s:', 'n_nationkey', 1, 1_200_000, 60.0)}  AS s_lat,
             {_sql_coord('s:', 'n_nationkey', 17, 3_600_000, 180.0)} AS s_lon
      FROM nation
    ),
    d AS (
      SELECT u.user_id, s.station_id, round({_NEAREST_DIST}, 6) AS dist_km
      FROM u CROSS JOIN s
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY dist_km, station_id) AS rn
      FROM d
    )
    SELECT station_id,
           count(*)                 AS n_users,
           round(avg(dist_km), 4)   AS avg_dist_km,
           round(min(dist_km), 4)   AS min_dist_km,
           round(max(dist_km), 4)   AS max_dist_km
    FROM r WHERE rn = 1
    GROUP BY station_id
    """,
)
def geo_nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each user its nearest weather station (stations = the 25
    nations at hashed positions), then profile each station's catchment.

    Plan shape: the station table broadcasts, so the nearest-neighbor
    search is a map-side nested loop over the point table — each point
    row fans out 25x and collapses immediately in the partial arg-min
    aggregate (``min(struct(dist, id))``), so the shuffle carries one
    row per user. No window, no global sort. This is THE plan for
    point-to-small-reference-set assignment at any scale; the oracle
    spells the same semantics as cross join + row_number.
    """
    users = _distinct_users_coords(spark, sf_dir)
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("station_id")
    )
    stations = _with_coords(nation, "station_id", "s:", lat="s_lat", lon="s_lon")
    assigned = nearest_join(
        users, stations,
        point_cols=("lat", "lon"), station_cols=("s_lat", "s_lon"),
        station_id="station_id",
    )
    return assigned.groupBy("station_id").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("dist_km"), 4).alias("avg_dist_km"),
        F.round(F.min("dist_km"), 4).alias("min_dist_km"),
        F.round(F.max("dist_km"), 4).alias("max_dist_km"),
    )


# ---------------------------------------------------------------------------
# Containment join: events in literal bounding boxes (non-equi broadcast)
# ---------------------------------------------------------------------------

_BOXES = [
    # (box_id, lat_min, lat_max, lon_min, lon_max) — none cross the antimeridian
    (1, -60.0, -20.0, -180.0, -60.0),
    (2, -60.0, -20.0, -60.0, 60.0),
    (3, -60.0, -20.0, 60.0, 180.0),
    (4, -20.0, 20.0, -90.0, 90.0),
    (5, 20.0, 60.0, -180.0, 0.0),
    (6, 20.0, 60.0, 0.0, 180.0),
]

_BOX_VALUES = ", ".join(
    f"({i}, {lat_lo}, {lat_hi}, {lon_lo}, {lon_hi})"
    for i, lat_lo, lat_hi, lon_lo, lon_hi in _BOXES
)

@register(
    "geo_bbox_events_join",
    oracle=f"""
    WITH e AS (
      SELECT user_id, value,
             {_sql_coord('u:', 'user_id', 1, 1_200_000, 60.0)}  AS lat,
             {_sql_coord('u:', 'user_id', 17, 3_600_000, 180.0)} AS lon
      FROM events
    )
    SELECT b.box_id,
           count(*)                AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(avg(value), 6)    AS avg_value
    FROM e
    JOIN (VALUES {_BOX_VALUES})
         AS b(box_id, lat_min, lat_max, lon_min, lon_max)
      ON e.lat >= b.lat_min AND e.lat < b.lat_max
     AND e.lon >= b.lon_min AND e.lon < b.lon_max
    GROUP BY b.box_id
    """,
)
def geo_bbox_events_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-rectangle containment join: events against a small set of
    (possibly overlapping) regions, aggregated per region.

    Plan shape: the 6-row region table broadcasts, so the non-equi
    containment predicate runs as a BroadcastNestedLoopJoin — a map-side
    filter-fanout, no shuffle of the fact side before the final 6-group
    aggregation. Half-open bounds ([min, max)) keep overlapping region
    edges unambiguous. For thousands of regions instead of 6, the scale
    path is the interval/band join the temporal family already ships
    (``events_value_band_join``) applied per axis.
    """
    ev = _events_with_coords(spark, sf_dir)
    boxes = spark.createDataFrame(
        _BOXES, "box_id int, lat_min double, lat_max double, lon_min double, lon_max double"
    )
    cond = (
        (F.col("lat") >= F.col("lat_min")) & (F.col("lat") < F.col("lat_max"))
        & (F.col("lon") >= F.col("lon_min")) & (F.col("lon") < F.col("lon_max"))
    )
    return (
        ev.join(F.broadcast(boxes), on=cond)
        .groupBy("box_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Within-radius pairs: exact cell-bucketed self-join
# ---------------------------------------------------------------------------

_PAIR_DIST = _SQL_HAVERSINE.format(
    lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon"
)

@register(
    "geo_within_radius_pairs",
    oracle=f"""
    WITH {_USER_COORDS_CTE}
    SELECT a.user_id               AS a_id,
           b.user_id               AS b_id,
           round({_PAIR_DIST}, 6)  AS dist_km
    FROM u a JOIN u b ON a.user_id < b.user_id
    WHERE round({_PAIR_DIST}, 6) <= 500.0
    """,
)
def geo_within_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All user pairs within 500 km — EXACT, via 10-degree cell
    bucketing with a 3x3 neighborhood probe instead of the O(n^2)
    cross-join the oracle runs.

    Exactness: 500 km spans <= 4.5 deg latitude and <= 9.0 deg
    longitude inside the |lat| <= 60 band (every hashed coordinate is in
    it by construction), both under the 10-deg cell size, so any true
    pair lands in the same or an adjacent cell; the operator validates
    this bound and wraps longitude cells mod 360 so the +-180 meridian
    loses nothing. Scale shape: candidate generation is a shuffle join
    on cell ids — the quadratic survives only INSIDE the densest cell
    (for uniform-ish sensors, a constant), versus the oracle's global
    n^2/2. This is the pattern every "sensors near each other" /
    spatial-dedup pass needs at 100 TB.
    """
    users = _distinct_users_coords(spark, sf_dir)
    return within_radius_pairs(
        users, id_col="user_id", radius_km=500.0, cell_deg=10.0, max_abs_lat=60.0
    ).select(
        F.col("a_id"), F.col("b_id"), F.col("dist_km")
    )


_PATH_DIST = _SQL_HAVERSINE.format(
    lat1="p_lat", lon1="p_lon", lat2="lat", lon2="lon"
)

@register(
    "geo_user_path_length",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             {_sql_coord('u:', 'user_id', 1, 1_200_000, 60.0)}
               + ({_sql_coord('e:', 'event_id', 1, 1_000, 0.05)}) AS lat,
             {_sql_coord('u:', 'user_id', 17, 3_600_000, 180.0)}
               + ({_sql_coord('e:', 'event_id', 17, 1_000, 0.05)}) AS lon
      FROM events
    ),
    l AS (
      SELECT user_id, lat, lon,
             lag(lat) OVER w AS p_lat,
             lag(lon) OVER w AS p_lon
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, round({_PATH_DIST}, 6) AS leg
      FROM l WHERE p_lat IS NOT NULL
    )
    SELECT user_id,
           count(*)              AS n_moves,
           round(sum(leg), 4)    AS total_km,
           round(max(leg), 6)    AS max_leg_km,
           round(avg(leg), 6)    AS avg_leg_km
    FROM s GROUP BY user_id
    """,
)
def geo_user_path_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory length per mobile sensor: each event sits at the
    user's base position plus a per-event jitter (~+-5.5 km per axis,
    hashed from the event id), and the path is the sum of haversine
    legs between consecutive fixes in event-time order — the
    GPS-track / fleet-telemetry primitive (distance traveled, longest
    hop, mean hop).

    Plan shape: positions derive in the scan projection, one lag window
    per user partition, one hash aggregation — a single shuffle on
    user_id serves both. Legs are rounded to 6 BEFORE summing so both
    engines add identical sequences; the total rounds to 4 because the
    shuffle-order of the final sum differs (~1e-10).
    """
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "ts", "event_id",
        (
            _hash_coord("u:", F.col("user_id"), 1, 1_200_000, 60.0)
            + _hash_coord("e:", F.col("event_id"), 1, 1_000, 0.05)
        ).alias("lat"),
        (
            _hash_coord("u:", F.col("user_id"), 17, 3_600_000, 180.0)
            + _hash_coord("e:", F.col("event_id"), 17, 1_000, 0.05)
        ).alias("lon"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = e.select(
        "user_id", "lat", "lon",
        F.lag("lat").over(w).alias("p_lat"),
        F.lag("lon").over(w).alias("p_lon"),
    )
    s = l.where(F.col("p_lat").isNotNull()).select(
        "user_id",
        F.round(
            haversine_km(F.col("p_lat"), F.col("p_lon"), F.col("lat"), F.col("lon")),
            6,
        ).alias("leg"),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.round(F.sum("leg"), 4).alias("total_km"),
        F.round(F.max("leg"), 6).alias("max_leg_km"),
        F.round(F.avg("leg"), 6).alias("avg_leg_km"),
    )


@register(
    "degree_days_daily",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, round(avg(value), 6) AS t_mean
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day, t_mean,
           round(CASE WHEN t_mean < 18.0 THEN 18.0 - t_mean ELSE 0.0 END, 6)
             AS hdd,
           round(CASE WHEN t_mean > 24.0 THEN t_mean - 24.0 ELSE 0.0 END, 6)
             AS cdd
    FROM d
    """,
)
def degree_days_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heating / cooling degree days — the canonical climate-energy
    metric the reference's daily profile stops short of: per day, the
    mean reading (value as temperature proxy) and its shortfall below
    18 C (HDD) / excess above 24 C (CDD). One hash aggregation; the
    degree-day algebra runs on the ALREADY-ROUNDED daily mean so both
    engines branch on identical doubles."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.avg("value"), 6).alias("t_mean")
    )
    return d.select(
        "day", "t_mean",
        F.round(
            F.when(F.col("t_mean") < 18.0, 18.0 - F.col("t_mean")).otherwise(0.0), 6
        ).alias("hdd"),
        F.round(
            F.when(F.col("t_mean") > 24.0, F.col("t_mean") - 24.0).otherwise(0.0), 6
        ).alias("cdd"),
    )


@register(
    "geo_density_clusters",
    oracle=f"""
    WITH RECURSIVE {_USER_COORDS_CTE},
    pairs AS (
      SELECT a.user_id AS id_a, b.user_id AS id_b
      FROM u a JOIN u b ON a.user_id < b.user_id
      WHERE round({_PAIR_DIST}, 6) <= 500.0
    ),
    und AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT src AS user_id, count(*) AS nn FROM und GROUP BY src),
    core AS (SELECT user_id FROM deg WHERE nn >= 2),
    ce AS (
      SELECT e.src, e.dst FROM und e
      JOIN core c1 ON e.src = c1.user_id
      JOIN core c2 ON e.dst = c2.user_id
    ),
    reach(node, r) AS (
      SELECT user_id, user_id FROM core
      UNION
      SELECT ce.src, r2.r FROM ce JOIN reach r2 ON ce.dst = r2.node
    ),
    cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id, cast(count(*) AS BIGINT) AS n_core
    FROM cc GROUP BY cluster_id
    """,
)
def geo_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based spatial clustering (DBSCAN* — the core-point-only
    variant of Campello et al.): a user is a CORE sensor if >= 2 others
    sit within eps = 500 km, and clusters are the connected components
    of the core-core eps-graph. Border/noise points are excluded by
    design (DBSCAN* semantics), which keeps the result order-independent
    — classic DBSCAN's border assignment depends on visit order and
    cannot be a parity gate.

    Built ENTIRELY by composing the engine's existing scale paths:
    candidate pairs from the exact cell-bucketed radius join (never the
    O(n^2) cross join the oracle runs), degrees from one hash agg,
    components from the size-dispatched union-find / min-label
    machinery the dedup family ships. This is the published recipe for
    billion-point geo clustering — grid-partitioned DBSCAN — expressed
    in the operators this repo already has.
    """
    from ..operators.dedup import connected_components

    users = _distinct_users_coords(spark, sf_dir)
    pairs = within_radius_pairs(
        users, id_col="user_id", radius_km=500.0, cell_deg=10.0, max_abs_lat=60.0
    )
    und = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst")).unionAll(
        pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("nn"))
    core = deg.where(F.col("nn") >= 2).select(F.col("src").alias("user_id"))
    ce = (
        und.join(core.select(F.col("user_id").alias("src")), "src")
        .join(core.select(F.col("user_id").alias("dst")), "dst")
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    cc = connected_components(ce)
    # isolated core sensors (no core neighbor) are their own cluster
    labeled = core.join(
        cc.select(F.col("node").alias("user_id"), "cluster_id"), "user_id", "left"
    ).select(
        "user_id", F.coalesce(F.col("cluster_id"), F.col("user_id")).alias("cluster_id")
    )
    return labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_core"))


@register(
    "weather_pipeline_end_to_end",
    oracle=f"""
    WITH {_USER_COORDS_CTE},
    s AS (
      SELECT n_nationkey AS station_id,
             {_sql_coord('s:', 'n_nationkey', 1, 1_200_000, 60.0)}  AS s_lat,
             {_sql_coord('s:', 'n_nationkey', 17, 3_600_000, 180.0)} AS s_lon
      FROM nation
    ),
    d AS (
      SELECT u.user_id, s.station_id, round({_NEAREST_DIST}, 6) AS dist_km,
             row_number() OVER (PARTITION BY u.user_id
                                ORDER BY round({_NEAREST_DIST}, 6), s.station_id)
               AS rn
      FROM u CROSS JOIN s
    ),
    assign AS (SELECT user_id, station_id FROM d WHERE rn = 1),
    clean AS (
      SELECT e.user_id, e.ts, e.value
      FROM events e
      WHERE e.value IS NOT NULL AND e.event_type <> 'error'
    ),
    hourly AS (
      SELECT a.station_id, date_trunc('hour', c.ts) AS hour,
             round(avg(c.value), 6) AS avg_value,
             count(*)               AS n_obs
      FROM clean c JOIN assign a ON c.user_id = a.user_id
      GROUP BY a.station_id, date_trunc('hour', c.ts)
    ),
    fc AS (
      SELECT station_id, hour, avg_value, n_obs,
             lag(avg_value) OVER (PARTITION BY station_id ORDER BY hour)
               AS persisted
      FROM hourly
    )
    SELECT station_id,
           cast(count(*) AS BIGINT)               AS n_hours,
           cast(sum(n_obs) AS BIGINT)             AS n_obs,
           round(avg(avg_value), 6)               AS mean_hourly_value,
           round(avg(CASE WHEN persisted IS NOT NULL
                          THEN abs(avg_value - persisted) END), 6)
             AS persistence_mae
    FROM fc GROUP BY station_id
    """,
)
def weather_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole product loop COMPOSED from already-oracled
    stages — clean (null/error rows out, the parse-chain semantics) →
    nearest-station assignment (broadcast arg-min, the geo family) →
    per-station hourly profile (the A2 aggregation) → persistence
    forecast + MAE backtest (the forecasting family) — as ONE
    declarative plan with no materialization between stages. This entry
    pins that the stages compose without interference: predicate
    pushdown still reaches the scan through four stage boundaries, and
    the station assignment broadcast does not block the hourly partial
    aggregation.

    Per-station MAE of hour-over-hour persistence is the operational
    skill baseline every forecast deployment reports first.
    """
    ev = _t(spark, sf_dir, "events")
    clean = ev.where(
        F.col("value").isNotNull() & (F.col("event_type") != "error")
    ).select("user_id", "ts", "value")
    users = _distinct_users_coords(spark, sf_dir)
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("station_id")
    )
    stations = _with_coords(nation, "station_id", "s:", lat="s_lat", lon="s_lon")
    assign = nearest_join(
        users, stations,
        point_cols=("lat", "lon"), station_cols=("s_lat", "s_lon"),
        station_id="station_id",
    ).select("user_id", "station_id")
    hourly = (
        clean.join(assign, "user_id")
        .groupBy("station_id", F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("station_id").orderBy("hour")
    fc = hourly.withColumn("persisted", F.lag("avg_value").over(w))
    return fc.groupBy("station_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n_obs").alias("n_obs"),
        F.round(F.avg("avg_value"), 6).alias("mean_hourly_value"),
        F.round(
            F.avg(
                F.when(
                    F.col("persisted").isNotNull(),
                    F.abs(F.col("avg_value") - F.col("persisted")),
                )
            ),
            6,
        ).alias("persistence_mae"),
    )


@register(
    "geo_idw_station_interpolation",
    oracle=f"""
    WITH {_USER_COORDS_CTE},
    uv AS (
      SELECT user_id, round(avg(value), 6) AS user_value
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT n_nationkey AS station_id,
             {_sql_coord('s:', 'n_nationkey', 1, 1_200_000, 60.0)}  AS s_lat,
             {_sql_coord('s:', 'n_nationkey', 17, 3_600_000, 180.0)} AS s_lon
      FROM nation
    ),
    d AS (
      SELECT s.station_id, uv.user_value,
             1.0 / (round({_NEAREST_DIST}, 6) * round({_NEAREST_DIST}, 6)
                    + 1.0) AS w
      FROM s CROSS JOIN u
      JOIN uv ON uv.user_id = u.user_id
    )
    SELECT station_id,
           round(sum(w * user_value) / sum(w), 6) AS idw_value,
           round(sum(w), 6)                       AS total_weight,
           cast(count(*) AS BIGINT)               AS n_sources
    FROM d GROUP BY station_id
    """,
)
def geo_idw_station_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distance-weighted spatial interpolation: estimate the
    field value AT each station from every sensor's mean reading,
    weighted by 1/(d^2 + 1) — the Shepard's-method baseline that real
    gridded weather products start from (kriging's cheap, assumption-
    free cousin). The +1 km^2 regularizer bounds the weight of a sensor
    sitting exactly on a station.

    Plan shape: sensor means from one hash agg; the station x sensor
    weight matrix is a broadcast nested loop (stations are the small
    side) collapsing immediately into per-station partial sums — the
    shuffle carries 25 rows. Distances are rounded before weighting so
    both engines build identical weights; the weighted mean rounds at 6
    (sum order ~1e-12).
    """
    users = _distinct_users_coords(spark, sf_dir)
    uv = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.avg("value"), 6).alias("user_value"))
    )
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("station_id")
    )
    stations = _with_coords(nation, "station_id", "s:", lat="s_lat", lon="s_lon")
    d = F.round(
        haversine_km(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")), 6
    )
    w = 1.0 / (d * d + 1.0)
    pts = users.join(uv, "user_id")
    return (
        pts.join(F.broadcast(stations))
        .select("station_id", "user_value", w.alias("w"))
        .groupBy("station_id")
        .agg(
            F.round(F.sum(F.col("w") * F.col("user_value")) / F.sum("w"), 6).alias(
                "idw_value"
            ),
            F.round(F.sum("w"), 6).alias("total_weight"),
            F.count(F.lit(1)).alias("n_sources"),
        )
    )


@register(
    "geo_bearing_rose",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             {_sql_coord('u:', 'user_id', 1, 1_200_000, 60.0)}
               + ({_sql_coord('e:', 'event_id', 1, 1_000, 0.05)}) AS lat,
             {_sql_coord('u:', 'user_id', 17, 3_600_000, 180.0)}
               + ({_sql_coord('e:', 'event_id', 17, 1_000, 0.05)}) AS lon
      FROM events
    ),
    l AS (
      SELECT user_id, lat, lon,
             lag(lat) OVER w AS p_lat,
             lag(lon) OVER w AS p_lon
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    b AS (
      SELECT round({_SQL_HAVERSINE.format(lat1='p_lat', lon1='p_lon',
                                          lat2='lat', lon2='lon')}, 6) AS leg,
             degrees(atan2(
               sin(radians(lon - p_lon)) * cos(radians(lat)),
               cos(radians(p_lat)) * sin(radians(lat))
               - sin(radians(p_lat)) * cos(radians(lat))
                 * cos(radians(lon - p_lon)))) AS brg
      FROM l WHERE p_lat IS NOT NULL
    )
    SELECT CAST(floor(((brg + 360.0) % 360.0) / 45.0) AS INTEGER) AS sector,
           cast(count(*) AS BIGINT)   AS n_moves,
           round(sum(leg), 4)         AS total_km,
           round(avg(leg), 6)         AS avg_leg_km
    FROM b GROUP BY 1
    """,
)
def geo_bearing_rose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movement rose: initial great-circle bearing of every consecutive
    fix pair, binned into the eight 45-degree compass sectors (0 = N±22
    ... starting at due north, clockwise) with distance totals — the
    wind-rose / drift-direction histogram of meteorology, here applied
    to sensor displacement. The forward-azimuth formula
    atan2(sin dλ·cos φ2, cos φ1·sin φ2 − sin φ1·cos φ2·cos dλ) is pure
    column trig in both engines; legs round at 6 before summing, the
    sector floor is a measure-zero-boundary decision on hashed
    coordinates. Same single user-partition window as the path-length
    query — the two share a physical plan prefix.
    """
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "ts", "event_id",
        (
            _hash_coord("u:", F.col("user_id"), 1, 1_200_000, 60.0)
            + _hash_coord("e:", F.col("event_id"), 1, 1_000, 0.05)
        ).alias("lat"),
        (
            _hash_coord("u:", F.col("user_id"), 17, 3_600_000, 180.0)
            + _hash_coord("e:", F.col("event_id"), 17, 1_000, 0.05)
        ).alias("lon"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l = e.select(
        "lat", "lon",
        F.lag("lat").over(w).alias("p_lat"),
        F.lag("lon").over(w).alias("p_lon"),
    ).where(F.col("p_lat").isNotNull())
    dlam = F.radians(F.col("lon") - F.col("p_lon"))
    brg = F.degrees(
        F.atan2(
            F.sin(dlam) * F.cos(F.radians(F.col("lat"))),
            F.cos(F.radians(F.col("p_lat"))) * F.sin(F.radians(F.col("lat")))
            - F.sin(F.radians(F.col("p_lat")))
            * F.cos(F.radians(F.col("lat")))
            * F.cos(dlam),
        )
    )
    leg = F.round(
        haversine_km(F.col("p_lat"), F.col("p_lon"), F.col("lat"), F.col("lon")), 6
    )
    b = l.select(
        F.floor(F.pmod(brg + 360.0, F.lit(360.0)) / 45.0).cast("int").alias("sector"),
        leg.alias("leg"),
    )
    return b.groupBy("sector").agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.round(F.sum("leg"), 4).alias("total_km"),
        F.round(F.avg("leg"), 6).alias("avg_leg_km"),
    )


@register(
    "geo_catchment_centroid",
    oracle=f"""
    WITH {_USER_COORDS_CTE},
    s AS (
      SELECT n_nationkey AS station_id,
             {_sql_coord('s:', 'n_nationkey', 1, 1_200_000, 60.0)}  AS s_lat,
             {_sql_coord('s:', 'n_nationkey', 17, 3_600_000, 180.0)} AS s_lon
      FROM nation
    ),
    d AS (
      SELECT u.user_id, u.lat, u.lon, s.station_id,
             round({_NEAREST_DIST}, 6) AS dist_km,
             row_number() OVER (PARTITION BY u.user_id
                                ORDER BY round({_NEAREST_DIST}, 6), s.station_id)
               AS rn
      FROM u CROSS JOIN s
    ),
    a AS (SELECT user_id, lat, lon, station_id FROM d WHERE rn = 1),
    v AS (
      SELECT station_id,
             avg(cos(radians(lat)) * cos(radians(lon))) AS x,
             avg(cos(radians(lat)) * sin(radians(lon))) AS y,
             avg(sin(radians(lat)))                     AS z,
             count(*)                                   AS n_users
      FROM a GROUP BY station_id
    )
    SELECT station_id, CAST(n_users AS BIGINT) AS n_users,
           round(degrees(atan2(z, sqrt(x * x + y * y))), 6) AS centroid_lat,
           round(degrees(atan2(y, x)), 6)                   AS centroid_lon,
           round(sqrt(x * x + y * y + z * z), 6)            AS resultant_norm
    FROM v
    """,
)
def geo_catchment_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical centroid of each station's catchment: users' positions
    averaged AS 3-D UNIT VECTORS and projected back to lat/lon — the
    correct way to average coordinates (a naive lat/lon mean tears
    apart at the antimeridian and biases toward the poles). The
    resultant norm rides along as the dispersion readout (1 = all
    users stacked on one point, near 0 = spread around the globe —
    the same quantity directional statistics calls the mean resultant
    length). One broadcast arg-min assignment (the nearest-station
    plan) and one partial-aggregated vector mean per station.
    """
    users = _distinct_users_coords(spark, sf_dir)
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("station_id")
    )
    stations = _with_coords(nation, "station_id", "s:", lat="s_lat", lon="s_lon")
    assigned = nearest_join(
        users, stations,
        point_cols=("lat", "lon"), station_cols=("s_lat", "s_lon"),
        station_id="station_id",
    )
    lat_r, lon_r = F.radians(F.col("lat")), F.radians(F.col("lon"))
    v = assigned.groupBy("station_id").agg(
        F.avg(F.cos(lat_r) * F.cos(lon_r)).alias("x"),
        F.avg(F.cos(lat_r) * F.sin(lon_r)).alias("y"),
        F.avg(F.sin(lat_r)).alias("z"),
        F.count(F.lit(1)).alias("n_users"),
    )
    return v.select(
        "station_id",
        F.col("n_users").cast("long").alias("n_users"),
        F.round(
            F.degrees(
                F.atan2(
                    F.col("z"),
                    F.sqrt(F.col("x") * F.col("x") + F.col("y") * F.col("y")),
                )
            ),
            6,
        ).alias("centroid_lat"),
        F.round(F.degrees(F.atan2(F.col("y"), F.col("x"))), 6).alias("centroid_lon"),
        F.round(
            F.sqrt(
                F.col("x") * F.col("x")
                + F.col("y") * F.col("y")
                + F.col("z") * F.col("z")
            ),
            6,
        ).alias("resultant_norm"),
    )


@register(
    "station_assignment_margin",
    oracle=f"""
    WITH {_USER_COORDS_CTE},
    s AS (
      SELECT n_nationkey AS station_id,
             {_sql_coord('s:', 'n_nationkey', 1, 1_200_000, 60.0)}  AS s_lat,
             {_sql_coord('s:', 'n_nationkey', 17, 3_600_000, 180.0)} AS s_lon
      FROM nation
    ),
    d AS (
      SELECT u.user_id, s.station_id,
             round({_NEAREST_DIST}, 6) AS dist_km,
             row_number() OVER (PARTITION BY u.user_id
                                ORDER BY round({_NEAREST_DIST}, 6), s.station_id)
               AS rn
      FROM u CROSS JOIN s
    ),
    top2 AS (
      SELECT a.user_id,
             any_value(CASE WHEN a.rn = 1 THEN a.station_id END) AS station_id,
             any_value(CASE WHEN a.rn = 1 THEN a.dist_km END)    AS d1,
             any_value(CASE WHEN a.rn = 2 THEN a.dist_km END)    AS d2
      FROM d a WHERE a.rn <= 2 GROUP BY a.user_id
    )
    SELECT station_id,
           cast(count(*) AS BIGINT) AS n_users,
           cast(sum(CASE WHEN d2 - d1 < 100.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unstable,
           round(avg(d2 - d1), 4)   AS avg_margin_km,
           round(min(d2 - d1), 6)   AS min_margin_km
    FROM top2 GROUP BY station_id
    """,
)
def station_assignment_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment stability: for every user, the DISTANCE MARGIN between
    its nearest and second-nearest station — the quantity that says
    whether a catchment assignment would survive sensor position noise
    or a station move (margin < 100 km = borderline, the Voronoi-edge
    population). Per station: catchment size, borderline count, mean
    and worst margin. The top-2 selection reuses the broadcast fan-out
    with a two-element sorted take (min of struct and min of the
    complement via conditional aggregation) — no per-user sort beyond
    the 25-row fan-in.
    """
    users = _distinct_users_coords(spark, sf_dir)
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("station_id")
    )
    stations = _with_coords(nation, "station_id", "s:", lat="s_lat", lon="s_lon")
    dist = F.round(
        haversine_km(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")), 6
    )
    fan = users.join(F.broadcast(stations)).select(
        "user_id", "station_id", dist.alias("dist_km")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("dist_km", "station_id")
    top2 = (
        fan.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.any_value(
                F.when(F.col("rn") == 1, F.col("station_id")), ignoreNulls=True
            ).alias("station_id"),
            F.any_value(
                F.when(F.col("rn") == 1, F.col("dist_km")), ignoreNulls=True
            ).alias("d1"),
            F.any_value(
                F.when(F.col("rn") == 2, F.col("dist_km")), ignoreNulls=True
            ).alias("d2"),
        )
    )
    m = F.col("d2") - F.col("d1")
    return top2.groupBy("station_id").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(m < 100.0, 1).otherwise(0)).alias("n_unstable"),
        F.round(F.avg(m), 4).alias("avg_margin_km"),
        F.round(F.min(m), 6).alias("min_margin_km"),
    )
