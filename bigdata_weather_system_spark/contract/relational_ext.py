"""Contract queries: extended relational coverage.

The reference uses exactly one join shape (left equi-join, SURVEY §2.3);
Spark provides the whole family for free. These entries pin the rest —
full outer / right / cross joins, grouping sets — plus the temporal
operators a pipeline engine needs and Spark lacks as built-ins: backward
as-of join, gap sessionization, broadcast range-band join
(operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, Window, functions as F

from ..operators.skew import salted_aggregate
from ..operators.temporal import asof_join, range_band_join, session_profiles
from .core import register, _t


# ---------------------------------------------------------------------------
# As-of join (backward): latest click at or before each purchase
# ---------------------------------------------------------------------------

@register(
    "asof_click_before_purchase",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, c.click_event_id, c.click_ts,
           round(epoch(p.ts) - epoch(c.click_ts), 6) AS gap_seconds
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.click_ts <= p.ts
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: attribute each purchase to the user's latest
    click at or before it (union + forward-fill plan, one shuffle)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_event_id", "click_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "click_event_id",
        "click_ts",
        F.round(
            F.col("ts").cast("double") - F.col("click_ts").cast("double"), 6
        ).alias("gap_seconds"),
    )


# ---------------------------------------------------------------------------
# Sessionization (gap-based)
# ---------------------------------------------------------------------------

@register(
    "sessionize_events",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 21600
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM x
    )
    SELECT user_id, session_id,
           min(ts)             AS session_start,
           max(ts)             AS session_end,
           count(*)            AS n_events,
           round(sum(value),2) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (6 h inactivity) — lag + cumulative-sum windows,
    then one aggregation per session. Batch twin of F.session_window."""
    ev = _t(spark, sf_dir, "events")
    return session_profiles(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        gap_seconds=21600,
        value_col="value",
        tiebreak_cols=["event_id"],
    )


@register(
    "events_to_session_intervals",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 21600
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM x
    ),
    iv AS (
      SELECT user_id, session_id,
             epoch(min(ts)) AS lo, epoch(max(ts)) + 1 AS hi
      FROM s GROUP BY user_id, session_id
    )
    SELECT e.event_id, e.user_id, iv.session_id
    FROM events e JOIN iv
      ON e.user_id = iv.user_id
     AND epoch(e.ts) >= iv.lo AND epoch(e.ts) < iv.hi
    """,
)
def events_to_session_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large×large interval containment join via bucketization
    (operators/temporal.py interval_containment_join): each session
    interval explodes to its covered 6-hour buckets, each event maps to
    one bucket, and the containment join becomes a shuffled equi-join on
    (user, bucket) with the exact range predicate as a post-filter — the
    scale path range_band_join's broadcast nested loop cannot take.
    Self-consistency oracle: intervals are the sessionizer's own bounds,
    so each event lands back in its session."""
    from ..operators.temporal import interval_containment_join

    ev = _t(spark, sf_dir, "events")
    sessions = session_profiles(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        gap_seconds=21600,
        value_col="value",
        tiebreak_cols=["event_id"],
    )
    intervals = sessions.select(
        "user_id",
        "session_id",
        F.col("session_start").cast("double").alias("lo"),
        (F.col("session_end").cast("double") + 1).alias("hi"),
    )
    points = ev.select(
        "event_id", "user_id", F.col("ts").cast("double").alias("_p")
    )
    out = interval_containment_join(
        points,
        intervals,
        key_cols=["user_id"],
        point_col="_p",
        lo_col="lo",
        hi_col="hi",
        bucket_width=21600.0,
    )
    return out.select("event_id", "user_id", "session_id")


@register(
    "events_resampled_6h",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             make_timestamp((floor(epoch(ts) / 21600) * 21600)::BIGINT * 1000000)
               AS grid_ts,
             value,
             row_number() OVER (PARTITION BY user_id, floor(epoch(ts) / 21600)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    latest AS (SELECT user_id, grid_ts, value FROM obs WHERE rn = 1),
    bounds AS (
      SELECT user_id, min(grid_ts) AS mn, max(grid_ts) AS mx
      FROM latest GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 21600 SECOND)) AS grid_ts
      FROM bounds
    )
    SELECT g.user_id, g.grid_ts,
           l.grid_ts IS NOT NULL AS is_observed,
           round(last_value(l.value IGNORE NULLS)
                   OVER (PARTITION BY g.user_id ORDER BY g.grid_ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS value_ffill
    FROM grid g LEFT JOIN latest l
      ON g.user_id = l.user_id AND g.grid_ts = l.grid_ts
    """,
)
def events_resampled_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular 6-hour-grid resample per user with forward fill — dense
    grid via per-key sequence() explode, latest-per-bucket dedup,
    co-partitioned left join, last(ignorenulls) fill (operators/
    temporal.py resample_to_grid). Gap-filling twin of the reference's
    dense-cadence assumption (spark.py:809-810)."""
    from ..operators.temporal import resample_to_grid

    ev = _t(spark, sf_dir, "events")
    out = resample_to_grid(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        step_seconds=21600,
        value_cols=["value"],
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "grid_ts",
        "is_observed",
        F.round("value_ffill", 6).alias("value_ffill"),
    )


@register(
    "events_resampled_6h_lerp",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             make_timestamp((floor(epoch(ts) / 21600) * 21600)::BIGINT * 1000000)
               AS grid_ts,
             value,
             row_number() OVER (PARTITION BY user_id, floor(epoch(ts) / 21600)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    latest AS (SELECT user_id, grid_ts, value FROM obs WHERE rn = 1),
    bounds AS (
      SELECT user_id, min(grid_ts) AS mn, max(grid_ts) AS mx
      FROM latest GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 21600 SECOND)) AS grid_ts
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.grid_ts,
             l.grid_ts IS NOT NULL AS is_observed,
             l.value AS v,
             CASE WHEN l.value IS NOT NULL THEN g.grid_ts END AS ots
      FROM grid g LEFT JOIN latest l
        ON g.user_id = l.user_id AND g.grid_ts = l.grid_ts
    ),
    w AS (
      SELECT user_id, grid_ts, is_observed, v,
             last_value(v IGNORE NULLS) OVER wp   AS prev_v,
             epoch(last_value(ots IGNORE NULLS) OVER wp)  AS prev_t,
             first_value(v IGNORE NULLS) OVER wn  AS next_v,
             epoch(first_value(ots IGNORE NULLS) OVER wn) AS next_t
      FROM j
      WINDOW
        wp AS (PARTITION BY user_id ORDER BY grid_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wn AS (PARTITION BY user_id ORDER BY grid_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, grid_ts, is_observed,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN next_v IS NULL THEN prev_v
                      ELSE prev_v + (next_v - prev_v)
                           * ((epoch(grid_ts) - prev_t) / (next_t - prev_t))
                 END, 6) AS value_lerp
    FROM w
    """,
)
def events_resampled_6h_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular 6-hour grid with time-weighted LINEAR INTERPOLATION across
    gaps (forward fill past the last observation) — one extra backward
    window pass over the same key partitioning as the ffill variant."""
    from ..operators.temporal import resample_to_grid

    ev = _t(spark, sf_dir, "events")
    out = resample_to_grid(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        step_seconds=21600,
        value_cols=["value"],
        tiebreak_cols=["event_id"],
        interpolate=True,
    )
    return out.select(
        "user_id",
        "grid_ts",
        "is_observed",
        F.round("value_lerp", 6).alias("value_lerp"),
    )


# ---------------------------------------------------------------------------
# Range-band join (broadcast non-equi)
# ---------------------------------------------------------------------------

_BANDS = [("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 500.0)]


@register(
    "events_value_band_join",
    oracle="""
    SELECT e.event_id, e.value, b.band
    FROM events e
    JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 250.0), ('high', 250.0, 500.0))
         b(band, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    """,
)
def events_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join against a tiny broadcast band table."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [Row(band=b, lo=lo, hi=hi) for b, lo, hi in _BANDS]
    )
    return range_band_join(ev, bands, "value").select("event_id", "value", "band")


# ---------------------------------------------------------------------------
# Join family completion: full outer / right / cross
# ---------------------------------------------------------------------------

@register(
    "user_customer_full_outer",
    oracle="""
    SELECT coalesce(e.user_id, o.o_custkey) AS entity_id,
           e.n_events,
           round(e.events_value, 2) AS events_value,
           o.n_orders,
           round(o.orders_value, 2) AS orders_value
    FROM (SELECT user_id, count(*) AS n_events, sum(value) AS events_value
          FROM events GROUP BY user_id) e
    FULL OUTER JOIN
         (SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS orders_value
          FROM orders GROUP BY o_custkey) o
      ON e.user_id = o.o_custkey
    """,
)
def user_customer_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (agg-below-join keeps the
    shuffled rows to one per key regardless of fact-table size)."""
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("events_value"),
        )
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("orders_value"),
        )
    )
    joined = ev.join(orders, ev.user_id == orders.o_custkey, "full_outer")
    return joined.select(
        F.coalesce(F.col("user_id"), F.col("o_custkey")).alias("entity_id"),
        "n_events",
        F.round("events_value", 2).alias("events_value"),
        "n_orders",
        F.round("orders_value", 2).alias("orders_value"),
    )


@register(
    "orders_right_join_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def orders_right_join_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — every customer survives, order columns nullable."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "nation_region_cross",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region_name
    FROM nation n CROSS JOIN region r
    """,
)
def nation_region_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two small dims (Cartesian capability pin)."""
    n = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("nation"))
    r = _t(spark, sf_dir, "region").select(F.col("r_name").alias("region_name"))
    return n.crossJoin(r)


# ---------------------------------------------------------------------------
# Grouping sets (beyond the cube/rollup entries in scalars_grouping)
# ---------------------------------------------------------------------------

@register(
    "grouping_sets_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators (SQL surface —
    cube/rollup cover the DataFrame API variants)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# Skew-safe aggregation (operators/skew.py) — results identical to the
# plain single-stage groupBy, which is exactly what the oracle pins.
# ---------------------------------------------------------------------------

@register(
    "salted_event_type_stats",
    oracle="""
    SELECT event_type,
           round(sum(value), 2) AS sum_value,
           min(value)           AS min_value,
           max(value)           AS max_value,
           count(*)             AS n_rows
    FROM events GROUP BY event_type
    """,
)
def salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a low-cardinality (worst-case
    skew-prone) key: stage 1 groups on (key, salt) so no reducer sees a
    whole hot key, stage 2 merges partials. Sum rounding happens after the
    final merge so the result matches the plain groupBy bit-for-bit at the
    compare precision."""
    ev = _t(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        key_cols=["event_type"],
        salt_source_col="event_id",
        n_salts=16,
        sum_cols=["value"],
        min_cols=["value"],
        max_cols=["value"],
    )
    return out.select(
        "event_type",
        F.round("sum_value", 2).alias("sum_value"),
        F.col("min_value"),
        F.col("max_value"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# Subquery shapes (TPC-H Q4/Q15/Q17/Q18/Q22): the decorrelation patterns a
# warehouse engine must plan well — EXISTS → semi-join, correlated scalar
# aggregate → agg + re-join, scalar subquery → broadcast cross join.
# ---------------------------------------------------------------------------

@register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped correlated EXISTS: orders with a lineitem shipped
    >60 days after order date, counted per priority. The EXISTS
    decorrelates to a left-semi join with a non-equi conjunct; the
    aggregation runs on the deduplicated order rows (never the multiplied
    fact-fact join)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped scalar subquery over an aggregate: supplier(s)
    hitting the max quarterly revenue. The scalar max is a 1-row broadcast
    cross join against the (small) per-supplier aggregate — no re-scan of
    the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
    s = _t(spark, sf_dir, "supplier")
    return s.join(top, F.col("s_suppkey") == F.col("l_suppkey")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated scalar aggregate: revenue from
    below-half-average-quantity orders of one brand. Decorrelated as a
    per-part avg aggregate joined back to the (brand-pruned) lineitems —
    the brand filter semi-joins first so the avg runs only over the ~1/25
    of parts that survive."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11").select(
        "p_partkey"
    )
    brand_li = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    cut = brand_li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("_qty_cut")
    )
    return (
        brand_li.join(cut, on="l_partkey")
        .filter(F.col("l_quantity") < F.col("_qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped IN-over-HAVING: big-volume orders with their
    customers. The IN list is an aggregate → semi-join; it prunes orders
    BEFORE the customer/lineitem joins, so the wide join only sees the
    ~2% of orders that qualify."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            # parquet yields timestamp_ntz; align with the oracle's TIMESTAMP
            # under the UTC session (value-preserving cast)
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS n_custs, round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped global scalar subquery + NOT EXISTS: above-average
    balances with no recent orders, profiled per nation. The global avg is
    a 1-row broadcast; the NOT EXISTS is an anti-join against the
    date-pruned orders projection."""
    c = _t(spark, sf_dir, "customer")
    cut = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_cut"))
    rich = c.crossJoin(F.broadcast(cut)).filter(F.col("c_acctbal") > F.col("_cut"))
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    idle = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "session_window_profiles",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) >= 21600
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS sid
      FROM x
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 6 HOUR AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def session_window_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native session_window aggregation in BATCH mode (the built-in
    sibling of the lag+cumsum sessionizer in operators/temporal.py;
    session_end = last event + gap). Boundary semantics: session windows
    are half-open [ts, ts+gap), so a successor EXACTLY gap seconds later
    starts a NEW session (oracle uses >=) — unlike the sessionizer's
    strictly-greater rule. One hash agg with window merging — no
    analytic-window pre-pass."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "6 hours"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "asof_next_purchase_after_click",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_event_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts, p.purchase_event_id, p.purchase_ts,
           round(epoch(p.purchase_ts) - epoch(c.ts), 6) AS gap_seconds
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND p.purchase_ts >= c.ts
    """,
)
def asof_next_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: attribute each click to the user's next purchase
    at or after it (conversion attribution). Same single-shuffle tagged
    union plan as the backward variant, filled from the future."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="purchase_ts",
        right_cols=["purchase_event_id", "purchase_ts"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_event_id",
        "purchase_ts",
        F.round(
            F.col("purchase_ts").cast("double") - F.col("ts").cast("double"), 6
        ).alias("gap_seconds"),
    )


@register(
    "monthly_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS delta,
           round((revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month), 6) AS growth_rate
    FROM m
    """,
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: date_trunc rollup + global lag
    window. The unpartitioned window runs AFTER aggregation — one row per
    month, so the single-partition sort is O(months) no matter the fact
    size (the safe place for a global window, unlike W3's row-level one,
    SURVEY §4.3)."""
    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.to_date(
                F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
            ).alias("month")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("growth_rate"),
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             extract(year FROM l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped 6-way join: bilateral trade volume between two
    nations by year. The two nation dims broadcast (pruned to 2 rows by
    the disjunctive predicate BEFORE the join via Catalyst constraint
    propagation); the fact-fact joins shuffle on their keys."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             extract(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit rollup: 5-way join with a LIKE-pruned part
    dim (supply cost proxied at 60% of retail — no partsupp table in this
    schema). part/supplier/nation broadcast; the filter on p_name prunes
    the fact rows through the join, not after it."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("timestamp")).cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped scalar filter-aggregate: every predicate reaches
    the parquet scan (sargable range filters on three columns), one
    partial+final sum, zero joins — the pure scan-throughput query."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q10_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue,
           round(c.c_acctbal, 2) AS acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: top-20 customers by returned-item revenue in a
    quarter — date-pruned fact joins, broadcast nation, TakeOrdered
    top-k with a unique tie-break."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    joined = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            "c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "nation",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0.0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped conditional-aggregate ratio: promo revenue share
    in one month. One broadcast join, both sums in a single partial+final
    agg pass (no second scan for the denominator)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_share")
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive predicate join (OR of brand/size/qty
    conjunctions): Catalyst extracts the common p_partkey equi-key so the
    join stays hash-based with the OR as a post-join filter, and pushes
    the derivable brand/size disjunction down to the part scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "daily_bounce_rate",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 21600
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    ),
    sess AS (
      SELECT user_id, session_id,
             date_trunc('day', min(ts)) AS day,
             count(*) AS n_events
      FROM s GROUP BY user_id, session_id
    )
    SELECT day,
           cast(count(*) AS BIGINT) AS n_sessions,
           cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS bounce_rate
    FROM sess GROUP BY day
    """,
)
def daily_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce-rate rollup over gap-sessionization (6h inactivity gap,
    same session definition as ``sessionize_events``): sessions
    attributed to the day they START, a bounce = a single-event session.
    Window + two aggregations, all on the user key then the (small)
    session relation — the engagement KPI computed without a distinct
    pass over raw events."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts").cast("double") - F.lag(F.col("ts")).over(w).cast("double")
    new_s = F.when(gap.isNull() | (gap > 21600), 1).otherwise(0)
    s = ev.select(
        "user_id",
        "ts",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_id"),
    )
    sess = s.groupBy("user_id", "session_id").agg(
        # to_date, not date_trunc: Spark's date_trunc returns TIMESTAMP
        # while the oracle's returns DATE
        F.to_date(F.min("ts")).alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = (F.col("n_events") == 1).cast("long")
    return sess.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(bounce).alias("n_bounces"),
        F.round(
            F.sum(bounce).cast("double") / F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
    )


@register(
    "incremental_join_view_delta",
    oracle="""
    WITH cutoff AS (SELECT min(ts) + INTERVAL 25 DAY AS c FROM events),
    e_old AS (SELECT user_id, event_type, value FROM events, cutoff
              WHERE ts < c),
    e_new AS (SELECT user_id, event_type, value FROM events, cutoff
              WHERE ts >= c),
    c_old AS (SELECT c_custkey, c_nationkey FROM customer
              WHERE c_custkey % 10 <> 0),
    c_new AS (SELECT c_custkey, c_nationkey FROM customer
              WHERE c_custkey % 10 = 0),
    delta AS (
      SELECT e.user_id, e.event_type, e.value, c.c_nationkey
      FROM e_new e JOIN c_old c ON e.user_id = c.c_custkey
      UNION ALL
      SELECT e.user_id, e.event_type, e.value, c.c_nationkey
      FROM e_old e JOIN c_new c ON e.user_id = c.c_custkey
      UNION ALL
      SELECT e.user_id, e.event_type, e.value, c.c_nationkey
      FROM e_new e JOIN c_new c ON e.user_id = c.c_custkey
    )
    SELECT c_nationkey, event_type,
           cast(count(*) AS BIGINT) AS n_new_rows,
           round(sum(value), 4) AS new_value
    FROM delta GROUP BY c_nationkey, event_type
    """,
)
def incremental_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a join view (events ⋈ customer) under
    inserts on BOTH sides: the last 5 days of events and every 10th
    customer arrive as deltas, and the view's new rows come from the
    three delta-join terms (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) — refresh cost scales
    with the change, never a view recompute. The contract aggregates the
    delta per (nation, type); tests/test_operators_core.py additionally
    pins delta ∪ old-view ≡ full recompute."""
    from ..operators.profile import incremental_join_delta

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts"
    )
    cut = ev.agg((F.min("ts") + F.expr("INTERVAL 25 DAYS")).alias("_cut"))
    ev = ev.crossJoin(F.broadcast(cut))
    e_old = ev.filter(F.col("ts") < F.col("_cut")).drop("_cut", "ts")
    e_new = ev.filter(F.col("ts") >= F.col("_cut")).drop("_cut", "ts")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    c_old = cust.filter(F.col("user_id") % 10 != 0)
    c_new = cust.filter(F.col("user_id") % 10 == 0)
    delta = incremental_join_delta(e_old, c_old, e_new, c_new, ["user_id"])
    return delta.groupBy("c_nationkey", "event_type").agg(
        F.count(F.lit(1)).alias("n_new_rows"),
        F.round(F.sum("value"), 4).alias("new_value"),
    )


@register(
    "session_type_pmi",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 21600
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_type,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM x
    ),
    inc AS (SELECT DISTINCT user_id, session_id, event_type FROM s),
    n AS (SELECT count(DISTINCT (user_id, session_id))::DOUBLE AS n_sessions
          FROM inc),
    tf AS (SELECT event_type, count(*)::DOUBLE AS n FROM inc
           GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*)::DOUBLE AS n_ab
      FROM inc a JOIN inc b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
       AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b,
           cast(p.n_ab AS BIGINT) AS n_cooccur,
           round(ln((p.n_ab / n.n_sessions)
                    / ((ta.n / n.n_sessions) * (tb.n / n.n_sessions))), 6)
             AS pmi
    FROM pairs p
    JOIN tf ta ON ta.event_type = p.type_a
    JOIN tf tb ON tb.event_type = p.type_b
    CROSS JOIN n
    """,
)
def session_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring in
    a session: PMI(a,b) = ln(p(a,b) / p(a)p(b)) over session-level
    incidence — the association metric (beyond raw co-counts) that
    separates 'genuinely travel together' from 'both merely frequent'.
    Session incidence dedups to one row per (session, type); pairs come
    from the grouped-postings core; marginals broadcast back."""
    from ..operators.dedup import pair_up

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts").cast("double") - F.lag(F.col("ts")).over(w).cast("double")
    new_s = F.when(gap.isNull() | (gap > 21600), 1).otherwise(0)
    inc = (
        ev.select(
            "user_id",
            "event_type",
            F.sum(new_s).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("session_id"),
        )
        .distinct()
    )
    inc = inc.withColumn(
        "_sess", F.concat_ws("#", F.col("user_id"), F.col("session_id"))
    ).cache()
    n = inc.agg(
        F.countDistinct("_sess").cast("double").alias("n_sessions")
    )
    tf = inc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    pairs = (
        pair_up(inc, ["_sess"], ["event_type"])
        .select(F.col("a.event_type").alias("type_a"),
                F.col("b.event_type").alias("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    )
    ta = tf.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    tb = tf.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    pmi = F.log(
        (F.col("n_ab") / F.col("n_sessions"))
        / ((F.col("na") / F.col("n_sessions")) * (F.col("nb") / F.col("n_sessions")))
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_cooccur"),
            F.round(pmi, 6).alias("pmi"),
        )
    )


@register(
    "discount_whatif_grid",
    oracle="""
    WITH s AS (SELECT CAST(unnest([-0.01, 0.0, 0.01]) AS DOUBLE) AS shift)
    SELECT round(shift, 2) + 0.0 AS discount_shift,
           cast(count(*) AS BIGINT) AS n_rows,
           round(sum(l_extendedprice
                     * (1 - least(greatest(l_discount + shift, 0.0), 0.1))),
                 2) AS scenario_revenue
    FROM lineitem CROSS JOIN s
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
    GROUP BY shift
    """,
)
def discount_whatif_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counterfactual pricing grid (the what-if generalization of TPC-H
    Q6): revenue for 1996 shipments under discount shifts of ±1 point,
    discounts clamped to [0, 0.10]. The scenario dimension is a 3-row
    broadcast cross join, so ALL scenarios price in ONE scan of the
    fact table — the scenario-grid shape that turns N re-runs of a
    what-if into one pass at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    scen = spark.createDataFrame(
        [(-0.01,), (0.0,), (0.01,)], "shift double"
    )
    clamped = F.least(
        F.greatest(F.col("l_discount") + F.col("shift"), F.lit(0.0)),
        F.lit(0.1),
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .crossJoin(F.broadcast(scen))
        .groupBy(F.round("shift", 2).alias("discount_shift"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - clamped)), 2
            ).alias("scenario_revenue"),
        )
    )


@register(
    "order_documents_nested",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             count(*) AS n_lines,
             CAST(sum(l_quantity) AS BIGINT) AS total_qty,
             -- (l_orderkey, l_linenumber) is NOT unique in the synthetic
             -- data — order ties by the token itself so both engines
             -- agg in the same order
             md5(string_agg(CAST(l_partkey AS VARCHAR) || ':'
                            || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
                            ',' ORDER BY l_linenumber,
                            CAST(l_partkey AS VARCHAR) || ':'
                            || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)))
               AS lines_md5
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, c.c_name, n.n_name,
           cast(li.n_lines AS BIGINT) AS n_lines,
           li.total_qty, li.lines_md5
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN li ON li.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 100 = 0
    """,
)
def order_documents_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested document assembly — the relational→document build that
    feeds serving caches and LLM-context pipelines: each order becomes
    one record with its customer/nation dimensions and its lineitems
    collapsed to an ORDERED nested array (here fingerprinted to an md5 so
    the gate compares the nested content without shipping it). The
    lineitem side pre-aggregates to one row per order BEFORE the joins
    (partial aggregation + a narrow array build; the wide fact never
    joins row-level), dims broadcast, and the selective key filter
    prunes at the scan."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    lines = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber"),
                F.concat_ws(
                    ":",
                    F.col("l_partkey").cast("string"),
                    F.col("l_quantity").cast("long").cast("string"),
                ).alias("_tok"),
            ).alias("_s"),
            F.col("l_quantity"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("long").alias("total_qty"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("_s")),
                        lambda s: s["_tok"],
                    ),
                    ",",
                )
            ).alias("lines_md5"),
        )
    )
    return (
        o.join(lines, o["o_orderkey"] == lines["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "o_orderkey", "c_name", "n_name",
            "n_lines", "total_qty", "lines_md5",
        )
    )


@register(
    "value_decile_features",
    oracle="""
    SELECT event_id, event_type,
           cast(ntile(10) OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS INT) AS decile
    FROM events
    """,
)
def value_decile_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretizer (ML feature binning): each row's within-type
    value decile via ntile — rank-based, so it is exactly reproducible
    across engines (no bin-edge float compares) and robust to outliers by
    construction. One per-type window; the tie-break on event_id makes
    bucket assignment deterministic under equal values."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(10).over(w).alias("decile"),
    )


@register(
    "event_type_target_encoding",
    oracle="""
    WITH s AS (
      SELECT event_type, sum(value) AS tot, count(value) AS n
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CASE WHEN s.n > 1 AND e.value IS NOT NULL
                THEN round((s.tot - e.value) / (s.n - 1), 6) END
             AS loo_type_mean
    FROM events e JOIN s USING (event_type)
    """,
)
def event_type_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the categorical featurizer that
    replaces a category with its target mean EXCLUDING the row itself
    (the standard leakage guard: including the row lets the encoder
    memorize the label). One per-category aggregate broadcast back; the
    per-row math is (sum − x)/(n − 1), null for singleton categories and
    null targets."""
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.sum("value").alias("tot"), F.count("value").alias("n")
    )
    j = ev.join(F.broadcast(s), "event_type")
    loo = F.when(
        (F.col("n") > 1) & F.col("value").isNotNull(),
        F.round((F.col("tot") - F.col("value")) / (F.col("n") - 1), 6),
    )
    return j.select("event_id", "event_type", loo.alias("loo_type_mean"))


@register(
    "bloom_filter_prefilter_audit",
    oracle="""
    WITH keys AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ), kpos AS (
      SELECT k, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 15))
                     AS BIGINT) % 65536 AS pos FROM keys
      UNION ALL
      SELECT k, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 15))
                     AS BIGINT) % 65536 FROM keys
      UNION ALL
      SELECT k, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 17, 15))
                     AS BIGINT) % 65536 FROM keys
    ), bloom AS (
      SELECT pos // 32 AS word, bit_or(CAST(1 AS BIGINT) << (pos % 32)) AS bits
      FROM kpos GROUP BY pos // 32
    ), probes AS (
      SELECT DISTINCT l_orderkey AS k FROM lineitem
    ), ppos AS (
      SELECT k, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 15))
                     AS BIGINT) % 65536 AS pos FROM probes
      UNION ALL
      SELECT k, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 9, 15))
                     AS BIGINT) % 65536 FROM probes
      UNION ALL
      SELECT k, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 17, 15))
                     AS BIGINT) % 65536 FROM probes
    ), hits AS (
      SELECT p.k,
             sum(CASE WHEN (b.bits & (CAST(1 AS BIGINT) << (p.pos % 32))) <> 0
                      THEN 1 ELSE 0 END) AS n_hit
      FROM ppos p LEFT JOIN bloom b ON b.word = p.pos // 32
      GROUP BY p.k
    ), verdicts AS (
      SELECT h.k, h.n_hit = 3 AS maybe,
             EXISTS (SELECT 1 FROM keys x WHERE x.k = h.k) AS actual
      FROM hits h
    )
    SELECT count(*)                                        AS n_probed,
           CAST(sum(actual::INT) AS BIGINT)                AS n_actual,
           CAST(sum(maybe::INT) AS BIGINT)                 AS n_maybe,
           CAST(sum((maybe AND NOT actual)::INT) AS BIGINT) AS n_false_pos,
           round(sum((maybe AND NOT actual)::INT)
                 / CAST(count(*) - sum(actual::INT) AS DOUBLE), 6)
                                                           AS false_pos_rate,
           CAST(sum((actual AND NOT maybe)::INT) AS BIGINT) = 0
                                                           AS no_false_negatives
    FROM verdicts
    """,
)
def bloom_filter_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Bloom filter built AS DATA and audited end-to-end — the
    mechanics behind runtime-filter semi-join pruning made explicit
    (session.py enables Spark's own injected bloom; this query shows the
    same trick as plain column algebra, the way you'd ship a pre-filter
    to another system). Build: urgent-order keys hash through k=3
    md5-derived functions into an m=65536-bit filter stored as 2048
    (word, bits) rows via map-side-combining ``bit_or``. Probe: every
    distinct lineitem key re-derives its 3 positions and joins the
    BROADCAST word relation — a fact-scan-sized join against a
    constant-size filter. The audit joins the exact semi-join truth:
    zero false negatives (the Bloom guarantee, asserted as a column),
    and the measured false-positive rate (expected (1−e^(−kn/m))^k ≈
    0.2% at sf0.01). 32-bit words keep every shifted mask positive in
    both engines' signed-64 arithmetic."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    keys = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )

    def positions(df):
        md5 = F.md5(F.col("k").cast("string"))
        parts = [
            F.conv(F.substring(md5, off, 15), 16, 10).cast("bigint") % 65536
            for off in (1, 9, 17)
        ]
        return df.select("k", F.explode(F.array(*parts)).alias("pos"))

    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
    bloom = (
        positions(keys)
        .groupBy((F.col("pos") / 32).cast("long").alias("word"))
        .agg(F.bit_or(mask).alias("bits"))
    )
    probes = li.select(F.col("l_orderkey").alias("k")).distinct()
    hits = (
        positions(probes)
        .join(
            F.broadcast(bloom),
            (F.col("pos") / 32).cast("long") == F.col("word"),
            "left",
        )
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("bits").bitwiseAND(
                        F.expr(
                            "shiftleft(CAST(1 AS BIGINT),"
                            " CAST(pos % 32 AS INT))"
                        )
                    )
                    != 0,
                    1,
                ).otherwise(0)
            ).alias("n_hit")
        )
    )
    verdicts = hits.join(
        keys.withColumn("actual", F.lit(True)), "k", "left"
    ).select(
        "k",
        (F.col("n_hit") == 3).alias("maybe"),
        F.coalesce(F.col("actual"), F.lit(False)).alias("actual"),
    )
    fp = (F.col("maybe") & ~F.col("actual")).cast("int")
    return verdicts.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.col("actual").cast("int")).alias("n_actual"),
        F.sum(F.col("maybe").cast("int")).alias("n_maybe"),
        F.sum(fp).alias("n_false_pos"),
        F.round(
            F.sum(fp)
            / (F.count(F.lit(1)) - F.sum(F.col("actual").cast("int"))).cast(
                "double"
            ),
            6,
        ).alias("false_pos_rate"),
        (F.sum((F.col("actual") & ~F.col("maybe")).cast("int")) == 0).alias(
            "no_false_negatives"
        ),
    )


@register(
    "revenue_share_hierarchy",
    oracle="""
    WITH cr AS (
      SELECT c.c_custkey, n.n_name AS nation, r.r_name AS region,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY c.c_custkey, n.n_name, r.r_name
    )
    SELECT c_custkey, nation, region, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY nation), 6)
             AS share_of_nation,
           round(sum(revenue) OVER (PARTITION BY nation)
                 / sum(revenue) OVER (PARTITION BY region), 6)
             AS nation_share_of_region,
           round(sum(revenue) OVER (PARTITION BY region)
                 / sum(revenue) OVER (), 6)
             AS region_share_of_total
    FROM cr
    """,
)
def revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent contribution down the region > nation > customer
    hierarchy — the drill-down table every BI layer renders: each
    customer's share of its nation, the nation's share of its region,
    the region's share of the world, all in one result.

    Plan shape: the fact aggregation (orders grouped to customers) does
    the heavy lifting with broadcast dimension joins; the three share
    levels are window sums over the CUSTOMER-grain result — sibling
    partitions (nation ⊂ region ⊂ all), so Spark evaluates them in one
    window chain without re-shuffling the fact table. Customer revenue
    is rounded to 2 before the share algebra; shares round at 6, far
    above the ~1e-16 relative wobble of unordered partition sums.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cr = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("c_custkey", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    wn = Window.partitionBy("nation")
    wr = Window.partitionBy("region")
    wall = Window.partitionBy()
    return cr.select(
        "c_custkey", "nation", "region", "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(wn), 6).alias("share_of_nation"),
        F.round(F.sum("revenue").over(wn) / F.sum("revenue").over(wr), 6).alias(
            "nation_share_of_region"
        ),
        F.round(F.sum("revenue").over(wr) / F.sum("revenue").over(wall), 6).alias(
            "region_share_of_total"
        ),
    )
