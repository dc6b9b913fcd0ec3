"""Contract queries: ALS collaborative filtering over the customer-part
purchase matrix (implicit-feedback ratings = purchase counts).

An iterative least-squares factorization has no SQL twin, so the factor
query is rows-only and the oracle-checked surface is the training
contract (boolean floors the gate hashes) plus an exact numpy-reference
comparison in tests/test_recommend.py — the same pattern the k-means /
BPE iterative operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .core import register, _t


def _purchase_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("rating"))
    )


@register("als_item_factors")  # rows-only: iterative solver, no SQL twin
def als_item_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS item embeddings (k=4, 2 alternating rounds, λ=0.1) for the
    customer-part purchase matrix — the classic distributed
    recommendation factorization (Zhou et al. 2008), built on the
    engine's own join + applyInPandas primitives: each half-step solves
    thousands of k×k ridge systems inside Arrow batches, factors live in
    DataFrames between rounds, per-entity accumulation is
    partner-id-sorted so the run is bit-deterministic. Factor L2 norms
    ship (not raw vectors) so the gate's canonicalizer never sorts list
    cells."""
    from ..operators.recommend import als_train

    # four half-steps (2 iterations × 2 sides) each re-derive the
    # ratings join+agg from lineitem×orders without this pin — cache the
    # small (user, item, rating) relation once per invocation (guide §5;
    # the training contract below already does)
    ratings = _purchase_ratings(spark, sf_dir).cache()
    _, item_f = als_train(
        ratings, "user_id", "item_id", "rating", k=4, iterations=2, reg=0.1
    )
    norm = F.sqrt(
        F.aggregate(
            "factors", F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return item_f.select(
        "item_id", F.round(norm, 6).alias("factor_norm")
    )


@register(
    "als_training_contract",
    oracle="""
    SELECT true AS rmse_decreased,
           true AS rmse_beats_mean_baseline,
           true AS covers_all_entities,
           true AS factors_finite
    """,
)
def als_training_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked ALS training floors: (1) training RMSE after round
    2 does not regress past 5% of round 1 — ALS monotonically decreases
    the REGULARIZED objective, so plain RMSE can jitter by the λ·‖x‖²
    share once converged (observed on an exactly-low-rank toy matrix);
    the tolerance pins 'still converging or converged', not noise
    (below 1e-3 both rounds are at machine-level fit and the compare is
    vacuous),
    (2) the factorization beats the global-mean-rating baseline,
    (3) every user and item received a factor row, (4) all factors are
    finite."""
    from ..operators.recommend import als_rmse, als_train

    ratings = _purchase_ratings(spark, sf_dir).cache()
    u1, v1 = als_train(
        ratings, "user_id", "item_id", "rating", k=4, iterations=1, reg=0.1
    )
    u2, v2 = als_train(
        ratings, "user_id", "item_id", "rating", k=4, iterations=2, reg=0.1
    )
    r1 = als_rmse(ratings, u1, v1, "user_id", "item_id", "rating").select(
        F.col("rmse").alias("rmse1")
    )
    r2 = als_rmse(ratings, u2, v2, "user_id", "item_id", "rating").select(
        F.col("rmse").alias("rmse2")
    )
    base = ratings.agg(F.avg("rating").alias("_mu"))
    rb = (
        ratings.crossJoin(F.broadcast(base))
        .agg(
            F.sqrt(
                F.avg(
                    (F.col("rating") - F.col("_mu"))
                    * (F.col("rating") - F.col("_mu"))
                )
            ).alias("rmse_base")
        )
    )
    counts = (
        ratings.agg(
            F.countDistinct("user_id").alias("_nu"),
            F.countDistinct("item_id").alias("_ni"),
        )
        .crossJoin(u2.agg(F.count(F.lit(1)).alias("_fu")))
        .crossJoin(v2.agg(F.count(F.lit(1)).alias("_fi")))
    )
    bad = (
        u2.select(F.explode("factors").alias("x"))
        .unionByName(v2.select(F.explode("factors").alias("x")))
        .agg(
            F.sum(
                (F.isnan("x") | F.col("x").isNull()).cast("long")
            ).alias("_bad")
        )
    )
    return (
        r1.crossJoin(r2)
        .crossJoin(rb)
        .crossJoin(counts)
        .crossJoin(bad)
        .select(
            (
                F.col("rmse2")
                <= F.greatest(F.col("rmse1") * 1.05 + 1e-6, F.lit(1e-3))
            ).alias("rmse_decreased"),
            (F.col("rmse2") < F.col("rmse_base")).alias(
                "rmse_beats_mean_baseline"
            ),
            (
                (F.col("_fu") == F.col("_nu"))
                & (F.col("_fi") == F.col("_ni"))
            ).alias("covers_all_entities"),
            (F.col("_bad") == 0).alias("factors_finite"),
        )
    )


@register(
    "recommender_cold_start_audit",
    oracle="""
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
""",
)
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

