"""Contract queries: extended relational coverage.

The reference uses exactly one join shape (left equi-join, SURVEY §2.3);
Spark provides the whole family for free. These entries pin the rest —
full outer / right / cross joins, grouping sets — plus the temporal
operators a pipeline engine needs and Spark lacks as built-ins: backward
as-of join, gap sessionization, broadcast range-band join
(operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from ..operators.latest import dedup_latest
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
