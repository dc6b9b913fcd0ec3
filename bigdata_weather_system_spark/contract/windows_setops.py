"""Contract queries: analytic windows, sequences, set operations.

Window coverage beyond the reference's row_number/collect_list/lead
(SURVEY §2.5 "all available built-in if we choose to expose them") plus the
set-operation family the reference lacks entirely (SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..operators.sequences import build_sequences
from ..operators.windows import with_neighbors, with_rolling_agg, with_running_agg
from .core import register, _t


# ---------------------------------------------------------------------------
# Window frames / analytics
# ---------------------------------------------------------------------------

@register(
    "running_sum_per_user",
    oracle="""
    SELECT event_id, user_id, ts, value,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_sum
    FROM events
    """,
)
def running_sum_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum — rows frame, one shuffle on the key."""
    ev = _t(spark, sf_dir, "events")
    out = with_running_agg(
        ev, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()], "value"
    )
    return out.select(
        "event_id", "user_id", "ts", "value", F.round("running_sum", 2).alias("running_sum")
    )


@register(
    "rolling_avg_per_user",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 11 PRECEDING AND CURRENT ROW), 6)
             AS rolling_avg
    FROM events
    """,
)
def rolling_avg_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-12-row rolling average (W5's scalar cousin)."""
    ev = _t(spark, sf_dir, "events")
    out = with_rolling_agg(
        ev, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()], "value", 12
    )
    return out.select(
        "event_id", "user_id", F.round("rolling_avg", 6).alias("rolling_avg")
    )


@register(
    "lead_lag_events",
    oracle="""
    SELECT event_id, user_id, value,
           lead(value, 1) OVER w AS next_value,
           lag(value, 1)  OVER w AS prev_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lead_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 lead + lag (forecast-target pattern, getSample.py:171-186)."""
    ev = _t(spark, sf_dir, "events")
    out = with_neighbors(
        ev, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()], "value"
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("next_value"),
        F.col("prev_value"),
    )


@register(
    "event_rank_analytics",
    oracle="""
    SELECT event_id, user_id, value,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS dense_rnk,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
    """,
)
def event_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank over a unique ordering."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("dense_rnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# Sequence builder (W5/W6/W7) — scalar oracle + full nested rows-only query
# ---------------------------------------------------------------------------

@register(
    "sequence_window_stats",
    oracle="""
    SELECT user_id, event_id,
           cnt AS seq_len,
           round(win_avg, 6) AS seq_avg_value,
           first_ts AS seq_start_ts
    FROM (
      SELECT user_id, event_id,
             count(*)   OVER w AS cnt,
             avg(value) OVER w AS win_avg,
             first_value(ts) OVER w AS first_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    ) WHERE cnt = 24
    """,
)
def sequence_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar projection of the trailing-24 sequence frame (oracle-checkable
    stand-in for the nested array<struct> builder, which DuckDB can't hash
    portably)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-23, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("seq_len"),
            F.round(F.avg("value").over(w), 6).alias("seq_avg_value"),
            F.first("ts").over(w).alias("seq_start_ts"),
        )
        .filter(F.col("seq_len") == 24)
    )


@register(
    "build_training_sequences",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) AS us,
             CAST(CAST(round(value, 6) AS DECIMAL(20,6)) AS VARCHAR) AS v6,
             event_type
      FROM events
    )
    SELECT user_id, start_us, end_us, sequence_repr, target_repr
    FROM (
      SELECT user_id,
             first_value(us) OVER w24 AS start_us,
             us AS end_us,
             count(*) OVER w24 AS cnt,
             string_agg(us || '|' || v6 || '|' || event_type, ';') OVER w24
               AS sequence_repr,
             concat_ws(';',
               lead(us || '|' || v6, 1) OVER wo,
               lead(us || '|' || v6, 2) OVER wo,
               lead(us || '|' || v6, 3) OVER wo) AS target_repr,
             lead(us, 3) OVER wo AS t3
      FROM e
      WINDOW
        w24 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW),
        wo  AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE cnt = 24 AND t3 IS NOT NULL
    """,
)
def build_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full nested sequence builder (array<struct> windows + lead targets),
    serialized to deterministic strings for the driver's canonicalizer.

    The query exercises the real nested operator
    (``operators.sequences.build_sequences`` — reference parity:
    ``/root/reference/prediction/preprocessing/getSample.py:150-214``) and
    then flattens each ``array<struct>`` column into a pipe/semicolon string:
    nested list-of-struct values are unhashable in the driver's pandas canon
    (the round-1 red row) and don't hash portably across Spark/DuckDB anyway.
    Timestamps are rendered as ``unix_micros`` longs and floats through a
    DECIMAL(20,6) cast so both engines print bit-identical tokens. The raw
    nested output stays covered by tests/test_sequences.py.
    """
    ev = _t(spark, sf_dir, "events")
    seq = build_sequences(
        ev,
        key_cols=("user_id",),
        ts_col="ts",
        feature_cols=("value", "event_type"),
        target_cols=("value",),
        seq_len=24,
        forecast_len=3,
        ts_as_string=False,
        tiebreak_cols=("event_id",),
    )

    def _v6(col):
        return F.round(col, 6).cast("decimal(20,6)").cast("string")

    elem = lambda s: F.concat_ws(  # noqa: E731
        "|",
        F.unix_micros(s["event_timestamp"]).cast("string"),
        _v6(s["value"]),
        s["event_type"],
    )
    telem = lambda s: F.concat_ws(  # noqa: E731
        "|",
        F.unix_micros(s["event_timestamp"]).cast("string"),
        _v6(s["value"]),
    )
    return seq.select(
        "user_id",
        F.unix_micros("start_timestamp").alias("start_us"),
        F.unix_micros("end_timestamp").alias("end_us"),
        F.array_join(F.transform("sequence", elem), ";").alias("sequence_repr"),
        F.array_join(F.transform("target_sequence", telem), ";").alias(
            "target_repr"
        ),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7 — absent in reference, full family here)
# ---------------------------------------------------------------------------

@register(
    "active_users_union",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
)
def active_users_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@register(
    "purchasers_who_errored",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """,
)
def purchasers_who_errored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "clickers_minus_purchasers",
    oracle="""
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def clickers_minus_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)  # EXCEPT (distinct) semantics


@register(
    "rolling_1h_value_stats",
    oracle="""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER w, 6) AS avg_1h,
           CAST(count(*) OVER w AS BIGINT) AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def rolling_1h_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour TIME-RANGE window frame (vs. the row-count frames in
    rolling_avg_per_user): rangeBetween on unix_micros, inclusive [-1h, 0].
    Range frames bound by event time, not row position, so sparse/ bursty
    keys get correct physics — the shape behind rate limits and rolling
    SLAs."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@register(
    "click_user_bag_except_purchases",
    oracle="""
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def click_user_bag_except_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): each purchase cancels ONE click per
    user — multiplicities survive, unlike the distinct except in
    clickers_minus_purchasers. Spark plans this as a counted anti
    pattern, no dedup of the surviving duplicates."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.exceptAll(purchases)


@register(
    "click_user_bag_intersect_purchases",
    oracle="""
    SELECT user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def click_user_bag_intersect_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: min-multiplicity per user across the two bags."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersectAll(purchases)
