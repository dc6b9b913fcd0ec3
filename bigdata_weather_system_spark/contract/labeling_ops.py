"""Contract queries: ML label construction + evaluation-protocol ops.

A training-data engine's last mile is LABELING and split protocol: the
triple-barrier first-passage label (the standard way to turn a value
series into supervised targets without lookahead bias), purged
walk-forward cross-validation folds (time-ordered splits with an
embargo so labels that leak across the boundary are excluded), and a
Qini uplift curve over a hashed treatment assignment (the
incrementality read-out for targeting models). Each is a per-key window
pass or a fixed-bin aggregation — no global sorts, no iteration, no
Python row path — so the plans are unchanged at 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core import register, _t


@register(
    "triple_barrier_labels",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             list(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN 1 FOLLOWING
                               AND 20 FOLLOWING) AS fut
      FROM events WHERE value IS NOT NULL
    ),
    hits AS (
      SELECT user_id, event_id, value,
             coalesce(len(fut), 0) AS n_future,
             list_min(list_filter(list_transform(fut,
               (x, i) -> CASE WHEN x >= value * 1.2 THEN i END),
               y -> y IS NOT NULL)) AS up_i,
             list_min(list_filter(list_transform(fut,
               (x, i) -> CASE WHEN x <= value * 0.8 THEN i END),
               y -> y IS NOT NULL)) AS down_i
      FROM seq
    )
    SELECT user_id, event_id,
           CAST(n_future AS BIGINT) AS n_future,
           CAST(CASE
             WHEN up_i IS NOT NULL
                  AND (down_i IS NULL OR up_i < down_i) THEN 1
             WHEN down_i IS NOT NULL
                  AND (up_i IS NULL OR down_i <= up_i) THEN -1
             ELSE 0 END AS INT) AS label,
           CAST(CASE
             WHEN up_i IS NOT NULL
                  AND (down_i IS NULL OR up_i < down_i) THEN up_i
             WHEN down_i IS NOT NULL
                  AND (up_i IS NULL OR down_i <= up_i) THEN down_i
             END AS BIGINT) AS steps_to_hit
    FROM hits
    """,
)
def triple_barrier_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple-barrier labeling (the de-facto standard for supervised
    targets on a value series): for every event, scan the next 20
    values in that user's series and label +1 if the +20%% barrier is
    touched first, −1 if the −20%% barrier is touched first (ties go to
    the lower barrier — the conservative convention), 0 if neither is
    hit before the 20-step vertical barrier. The whole scan is a
    per-key window frame (ROWS 1..20 FOLLOWING collect) + an
    array-lambda first-crossing search — no self-join against the
    future, no lookahead leak, no Python. Cost is one per-key window
    pass with a bounded 20-element frame at any scale; the label
    horizon is a constant, never a data-dependent blowup. Indices are
    1-based on both engines (Spark's 0-based transform index is
    shifted)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, 20)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "value",
        F.collect_list("value").over(w).alias("fut"),
    )
    up_i = F.array_min(
        F.filter(
            F.transform(
                F.col("fut"),
                lambda x, i: F.when(
                    x >= F.col("value") * 1.2, i + 1
                ),
            ),
            lambda y: y.isNotNull(),
        )
    )
    down_i = F.array_min(
        F.filter(
            F.transform(
                F.col("fut"),
                lambda x, i: F.when(
                    x <= F.col("value") * 0.8, i + 1
                ),
            ),
            lambda y: y.isNotNull(),
        )
    )
    hits = seq.select(
        "user_id",
        "event_id",
        F.size("fut").cast("long").alias("n_future"),
        up_i.alias("up_i"),
        down_i.alias("down_i"),
    )
    up_first = F.col("up_i").isNotNull() & (
        F.col("down_i").isNull() | (F.col("up_i") < F.col("down_i"))
    )
    down_first = F.col("down_i").isNotNull() & (
        F.col("up_i").isNull() | (F.col("down_i") <= F.col("up_i"))
    )
    return hits.select(
        "user_id",
        "event_id",
        "n_future",
        F.when(up_first, F.lit(1))
        .when(down_first, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("label"),
        F.when(up_first, F.col("up_i"))
        .when(down_first, F.col("down_i"))
        .cast("long")
        .alias("steps_to_hit"),
    )


@register(
    "walk_forward_cv_folds",
    oracle="""
    WITH span AS (
      SELECT epoch(min(ts)) AS e0, epoch(max(ts)) + 1 AS e1 FROM events
    ),
    tagged AS (
      SELECT LEAST(CAST(floor((epoch(ts) - e0) * 5.0 / (e1 - e0))
                        AS INT), 4) AS fold,
             epoch(ts) AS e, e0, e1
      FROM events CROSS JOIN span
    ),
    folds AS (SELECT unnest([1, 2, 3, 4]) AS test_fold),
    marked AS (
      SELECT f.test_fold,
             CASE
               WHEN t.fold = f.test_fold THEN 'test'
               WHEN t.fold < f.test_fold
                    AND t.e >= t.e0 + (t.e1 - t.e0) * f.test_fold / 5
                        - 172800 THEN 'embargoed'
               WHEN t.fold < f.test_fold THEN 'train'
               ELSE 'future'
             END AS role
      FROM tagged t CROSS JOIN folds f
    )
    SELECT CAST(test_fold AS INT) AS test_fold,
           CAST(count(*) FILTER (WHERE role = 'train') AS BIGINT)
             AS n_train,
           CAST(count(*) FILTER (WHERE role = 'test') AS BIGINT)
             AS n_test,
           CAST(count(*) FILTER (WHERE role = 'embargoed') AS BIGINT)
             AS n_embargoed
    FROM marked GROUP BY test_fold
    """,
)
def walk_forward_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged walk-forward cross-validation protocol: the time span is
    cut into 5 equal folds; for each test fold k ∈ 1..4 the train set
    is every EARLIER fold minus a 2-day embargo immediately before the
    test window (events whose labels would leak across the boundary —
    the purging step that separates honest time-series CV from silently
    contaminated CV). All fold arithmetic is integer epoch math against
    one broadcast (min, max) aggregate, so both engines compute
    bit-identical assignments; the 4× fan-out collapses immediately to
    per-fold counts (map-side combine, 4 rows out). The report is what
    a training pipeline asserts before fitting: every fold has train
    data, and embargoed counts stay a small fraction."""
    ev = _t(spark, sf_dir, "events").select("ts")
    span = ev.agg(
        F.unix_timestamp(F.min("ts")).alias("e0"),
        (F.unix_timestamp(F.max("ts")) + 1).alias("e1"),
    )
    tagged = ev.crossJoin(F.broadcast(span)).select(
        F.least(
            F.floor(
                (F.unix_timestamp("ts") - F.col("e0"))
                * 5.0
                / (F.col("e1") - F.col("e0"))
            ).cast("int"),
            F.lit(4),
        ).alias("fold"),
        F.unix_timestamp("ts").alias("e"),
        "e0",
        "e1",
    )
    folds = spark.range(1, 5).select(F.col("id").cast("int").alias("test_fold"))
    marked = tagged.crossJoin(F.broadcast(folds)).select(
        "test_fold",
        F.when(F.col("fold") == F.col("test_fold"), F.lit("test"))
        .when(
            (F.col("fold") < F.col("test_fold"))
            & (
                F.col("e")
                >= F.col("e0")
                + (F.col("e1") - F.col("e0"))
                * F.col("test_fold")
                / 5
                - 172800
            ),
            F.lit("embargoed"),
        )
        .when(F.col("fold") < F.col("test_fold"), F.lit("train"))
        .otherwise(F.lit("future"))
        .alias("role"),
    )
    return marked.groupBy("test_fold").agg(
        F.count(F.when(F.col("role") == "train", F.lit(1)))
        .cast("long")
        .alias("n_train"),
        F.count(F.when(F.col("role") == "test", F.lit(1)))
        .cast("long")
        .alias("n_test"),
        F.count(F.when(F.col("role") == "embargoed", F.lit(1)))
        .cast("long")
        .alias("n_embargoed"),
    )


@register(
    "uplift_qini_by_bin",
    oracle="""
    WITH obs AS (
      SELECT GREATEST(LEAST(CAST(floor(value / 10) AS INT), 9), 0) AS b,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS treated,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events WHERE value IS NOT NULL
    ),
    per_bin AS (
      SELECT b,
             count(*) FILTER (WHERE treated = 1) AS nt,
             sum(conv) FILTER (WHERE treated = 1) AS ct,
             count(*) FILTER (WHERE treated = 0) AS nc,
             sum(conv) FILTER (WHERE treated = 0) AS cc
      FROM obs GROUP BY b
    ),
    cum AS (
      SELECT b, nt, ct, nc, cc,
             sum(nt) OVER w AS cum_nt, sum(ct) OVER w AS cum_ct,
             sum(nc) OVER w AS cum_nc, sum(cc) OVER w AS cum_cc
      FROM per_bin
      WINDOW w AS (ORDER BY b DESC ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT CAST(b AS INT) AS score_bin,
           CAST(nt AS BIGINT) AS n_treated,
           CAST(ct AS BIGINT) AS conv_treated,
           CAST(nc AS BIGINT) AS n_control,
           CAST(cc AS BIGINT) AS conv_control,
           round(ct * 1.0 / nt - cc * 1.0 / nc, 6) AS uplift,
           round(cum_ct - cum_cc * 1.0 * cum_nt / cum_nc, 4) AS qini
    FROM cum
    """,
)
def uplift_qini_by_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve over a hashed 50/50 treatment assignment:
    events are scored into 10 value bins (the 'model score'); per bin
    the treated/control conversion rates give the incremental uplift,
    and the Qini statistic Q(b) = cumΣconv_t − cumΣconv_c·(cumN_t/
    cumN_c), accumulated from the highest score down, is the standard
    targeting read-out ('how many extra conversions if we treat only
    the top-k bins?'). The treatment hash is the same md5 convention as
    the registry's split buckets, so assignment is deterministic and
    identical in both engines. One row-level pass to 10 bin aggregates,
    then window sums over the 10-row relation — the descending
    cumulative is bounded by the bin count, never the data."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = F.greatest(
        F.least(F.floor(F.col("value") / 10).cast("int"), F.lit(9)),
        F.lit(0),
    )
    treated = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % 2
    )
    conv = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    obs = ev.select(
        b.alias("b"), treated.alias("treated"), conv.alias("conv")
    )
    per_bin = obs.groupBy("b").agg(
        F.count(F.when(F.col("treated") == 1, F.lit(1))).alias("nt"),
        F.sum(F.when(F.col("treated") == 1, F.col("conv"))).alias("ct"),
        F.count(F.when(F.col("treated") == 0, F.lit(1))).alias("nc"),
        F.sum(F.when(F.col("treated") == 0, F.col("conv"))).alias("cc"),
    )
    # 10-row relation: the partitionless cumulative is bounded by the
    # bin count, never the data
    w = (
        Window.orderBy(F.col("b").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_bin.select(
        "*",
        F.sum("nt").over(w).alias("cum_nt"),
        F.sum("ct").over(w).alias("cum_ct"),
        F.sum("nc").over(w).alias("cum_nc"),
        F.sum("cc").over(w).alias("cum_cc"),
    )
    return cum.select(
        F.col("b").cast("int").alias("score_bin"),
        F.col("nt").cast("long").alias("n_treated"),
        F.col("ct").cast("long").alias("conv_treated"),
        F.col("nc").cast("long").alias("n_control"),
        F.col("cc").cast("long").alias("conv_control"),
        F.round(
            F.col("ct") * 1.0 / F.col("nt")
            - F.col("cc") * 1.0 / F.col("nc"),
            6,
        ).alias("uplift"),
        F.round(
            F.col("cum_ct")
            - F.col("cum_cc") * 1.0 * F.col("cum_nt") / F.col("cum_nc"),
            4,
        ).alias("qini"),
    )
