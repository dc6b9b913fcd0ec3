"""DRAFT — wave 28 queries, not yet imported by contract/__init__.
Registered (moved into diagnostics_ops/warehouse_ops and the import
list) after the in-flight artifact chain completes so the running
suite's doc-drift counts stay consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core import register, _t


NB_MOMENTS_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    s AS (
      SELECT event_type, count(*) AS n, sum(c) AS sc, sum(c * c) AS scc
      FROM daily GROUP BY event_type
    ),
    mo AS (
      SELECT event_type, n,
             sc * 1.0 / n AS m,
             (scc - sc * 1.0 * sc / n) / (n - 1) AS v
      FROM s
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round(m, 6) AS mean_daily,
           round(v, 6) AS var_daily,
           v > m AS fit_valid,
           CASE WHEN v > m THEN round(m * m / (v - m), 6) END AS nb_r,
           CASE WHEN v > m THEN round(m / v, 6) END AS nb_p
    FROM mo
"""


def nb_moments_fit_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit on daily counts per type
    (r̂ = m²/(s²−m), p̂ = m/s²) — the model the overdispersion gate
    dispatches TO when it rejects Poisson; a type whose variance does
    not exceed its mean gets fit_valid = false and NULL parameters
    instead of a garbage fit. Same two bounded aggregations as the
    dispersion test; the parameters are closed-form from the same three
    sums."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    n = F.col("n")
    m = F.col("sc") * 1.0 / n
    v = (F.col("scc") - F.col("sc") * 1.0 * F.col("sc") / n) / (n - 1)
    valid = v > m
    return s.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.round(m, 6).alias("mean_daily"),
        F.round(v, 6).alias("var_daily"),
        valid.alias("fit_valid"),
        F.when(valid, F.round(m * m / (v - m), 6)).alias("nb_r"),
        F.when(valid, F.round(m / v, 6)).alias("nb_p"),
    )


SEASONAL_STRENGTH_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) + 1 AS dow,
             sum(value) / count(*) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    g AS (
      SELECT event_type, count(*) AS n, sum(y) AS sy, sum(y * y) AS syy
      FROM daily GROUP BY event_type
    ),
    dw AS (
      SELECT event_type, dow, count(*) AS nw, sum(y) AS syw
      FROM daily GROUP BY event_type, dow
    ),
    ss AS (
      SELECT d.event_type,
             any_value(g.n) AS n,
             any_value(g.syy - g.sy * g.sy / g.n) AS ss_total,
             sum(d.nw * (d.syw / d.nw - g.sy / g.n)
                      * (d.syw / d.nw - g.sy / g.n)) AS ss_between
      FROM dw d JOIN g ON g.event_type = d.event_type
      GROUP BY d.event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           round(ss_between / ss_total, 6) AS weekday_eta2,
           ss_between / ss_total > 0.2 AS strongly_seasonal
    FROM ss
"""


def weekday_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal-strength index per type: η² = SS_between(weekday)
    / SS_total over the daily mean series — the share of day-to-day
    variance the weekly cycle explains, the scalar that decides whether
    the forecasting family should bother with weekday seasonality
    (complementing the periodogram, which finds the PERIOD; this scores
    a KNOWN period's strength). Two bounded aggregations on the daily
    relation; the between-group sum reuses the same raw sums."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg((F.sum("value") / F.count(F.lit(1))).alias("y"))
    daily = daily.withColumn("dow", F.dayofweek("day") + 1)
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dw = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("nw"), F.sum("y").alias("syw")
    )
    j = dw.join(F.broadcast(g), "event_type")
    mean_all = F.col("sy") / F.col("n")
    dev = F.col("syw") / F.col("nw") - mean_all
    ss = j.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.first(
            F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
        ).alias("ss_total"),
        F.sum(F.col("nw") * dev * dev).alias("ss_between"),
    )
    eta2 = F.col("ss_between") / F.col("ss_total")
    return ss.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(eta2, 6).alias("weekday_eta2"),
        (eta2 > 0.2).alias("strongly_seasonal"),
    )


COLD_START_ORACLE = """
    WITH tagged AS (
      SELECT o.o_custkey AS cust, l.l_partkey AS part,
             CAST(('0x' || substring(md5(CAST(o.o_orderkey AS VARCHAR)),
                                     1, 15)) AS BIGINT) % 10 < 8
               AS in_train
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    train_parts AS (
      SELECT DISTINCT part FROM tagged WHERE in_train
    ),
    train_custs AS (
      SELECT DISTINCT cust FROM tagged WHERE in_train
    ),
    test AS (
      SELECT DISTINCT cust, part FROM tagged WHERE NOT in_train
    )
    SELECT CAST(count(*) AS BIGINT) AS n_test_pairs,
           CAST(sum(CASE WHEN tp.part IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS cold_part_pairs,
           CAST(sum(CASE WHEN tc.cust IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS cold_cust_pairs,
           round(sum(CASE WHEN tp.part IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS cold_part_rate,
           round(sum(CASE WHEN tc.cust IS NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS cold_cust_rate
    FROM test t
    LEFT JOIN train_parts tp ON tp.part = t.part
    LEFT JOIN train_custs tc ON tc.cust = t.cust
"""


def recommender_cold_start_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cold-start exposure audit for the recommender family: hash-split
    orders 80/20 into train/test and measure what share of held-out
    (customer, part) interactions involve a part (or customer) NEVER
    seen in training — the number that bounds any collaborative model's
    reachable recall before content features enter (ALS simply cannot
    score an unseen id). Distinct projections + two left anti-style
    joins on bounded id relations; the md5 split convention matches the
    registry's other split buckets."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    tagged = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("cust"),
        F.col("l_partkey").alias("part"),
        (
            F.conv(
                F.substring(
                    F.md5(F.col("o_orderkey").cast("string")), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % 10
            < 8
        ).alias("in_train"),
    )
    train_parts = (
        tagged.filter("in_train").select("part").distinct()
        .withColumn("seen_p", F.lit(1))
    )
    train_custs = (
        tagged.filter("in_train").select("cust").distinct()
        .withColumn("seen_c", F.lit(1))
    )
    test = tagged.filter(~F.col("in_train")).select("cust", "part").distinct()
    j = test.join(train_parts, "part", "left").join(
        train_custs, "cust", "left"
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_test_pairs"),
        F.sum(F.when(F.col("seen_p").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("cold_part_pairs"),
        F.sum(F.when(F.col("seen_c").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("cold_cust_pairs"),
        F.round(
            F.sum(F.when(F.col("seen_p").isNull(), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("cold_part_rate"),
        F.round(
            F.sum(F.when(F.col("seen_c").isNull(), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("cold_cust_rate"),
    )
