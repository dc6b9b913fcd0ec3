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

    ratings = _purchase_ratings(spark, sf_dir)
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
