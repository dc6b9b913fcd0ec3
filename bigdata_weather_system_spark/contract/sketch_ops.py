"""Contract queries: mergeable sketch aggregates (DataSketches).

The scale path for distinct counts and quantiles: exact versions shuffle
every distinct key (fine until key cardinality explodes); sketches are
CONSTANT-SIZE mergeable state — per-partition partials union
associatively, so incremental maintenance (yesterday's sketch + today's
delta) costs one merge instead of a recount over history. These are the
sketch twins of `distinct_users_per_type` / `value_percentiles_per_type`
(the exact, oracle-checked versions); sketch binaries are
engine-specific, so these entries are rows-only with accuracy pinned
against the exact values in tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .core import register, _t


@register("hll_distinct_users_rollup")  # sketch binary → engine-specific
def hll_distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL rollup: per-(type, day) sketches built once, then
    per-type totals come from ``hll_union_agg`` over the DAILY sketches —
    no second pass over raw rows. This is the incremental-maintenance
    shape: materialize the daily sketch table, and any rollup (weekly,
    all-time, sliced) is a union of a few KB blobs."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("long")
            .alias("approx_distinct_users"),
        )
    )


@register("kll_value_quantiles")  # sketch binary → engine-specific
def kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches per event type: p50/p90/p99 of ``value`` read
    from one constant-size sketch per group instead of a full sort or an
    exact percentile shuffle. Accuracy vs the exact percentiles is pinned
    in tests; at 100 TB the sketch is the only viable per-key quantile
    when groups have billions of rows."""
    ev = _t(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sketch")
    )
    return sk.select(
        "event_type",
        F.round(
            F.kll_sketch_get_quantile_double(F.col("sketch"), F.lit(0.5)), 4
        ).alias("p50_value"),
        F.round(
            F.kll_sketch_get_quantile_double(F.col("sketch"), F.lit(0.9)), 4
        ).alias("p90_value"),
        F.round(
            F.kll_sketch_get_quantile_double(F.col("sketch"), F.lit(0.99)), 4
        ).alias("p99_value"),
    )
