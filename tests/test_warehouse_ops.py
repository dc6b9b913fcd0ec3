"""Warehouse-ops invariants: exact penny reconciliation for the
largest-remainder proration, ABC class partitioning, and DP noise
reproducibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_weather_system_spark.contract import warehouse_ops
from tests.conftest import TEST_SF_DIR
from bigdata_weather_system_spark.sources.tables import load_table


def test_proration_sums_exactly_to_budget(spark):
    alloc = warehouse_ops.order_discount_proration(spark, TEST_SF_DIR)
    orders = load_table(spark, TEST_SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 5).cast("long").alias("budget"),
    )
    per_order = alloc.groupBy("l_orderkey").agg(F.sum("alloc_cents").alias("got"))
    bad = per_order.join(orders, on="l_orderkey").where(
        F.col("got") != F.col("budget")
    )
    assert bad.count() == 0
    # every allocation is a nonnegative integer number of cents
    assert alloc.where(F.col("alloc_cents") < 0).count() == 0


def test_proration_matches_independent_python_reimplementation(spark):
    # pure-Python largest-remainder over the collected sf0.001 tables,
    # compared per-order as a multiset (composite line keys repeat in
    # the synthetic lineitem, so no row-level join key exists)
    import math
    from collections import Counter, defaultdict

    got = defaultdict(Counter)
    for r in warehouse_ops.order_discount_proration(spark, TEST_SF_DIR).collect():
        got[r["l_orderkey"]][(r["l_linenumber"], r["alloc_cents"])] += 1

    li = load_table(spark, TEST_SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).collect()
    budgets = {
        r["o_orderkey"]: int(math.floor(r["o_totalprice"] * 5))
        for r in load_table(spark, TEST_SF_DIR, "orders").collect()
    }
    by_order = defaultdict(list)
    for r in li:
        by_order[r["l_orderkey"]].append(
            (r["l_linenumber"], int(math.floor(r["l_extendedprice"] * 100 + 0.5)))
        )
    want = defaultdict(Counter)
    for ok, lines in by_order.items():
        budget, total = budgets[ok], sum(c for _, c in lines)
        rows = [
            (ln, c, (budget * c) // total, (budget * c) % total)
            for ln, c in lines
        ]
        leftover = budget - sum(b for _, _, b, _ in rows)
        order = sorted(rows, key=lambda r: (-r[3], r[0], r[1]))
        for rk, (ln, c, base, _) in enumerate(order, start=1):
            want[ok][(ln, base + (1 if rk <= leftover else 0))] += 1
    assert got == want


def test_abc_classes_partition_all_parts(spark):
    res = {r["abc_class"]: r for r in warehouse_ops.part_revenue_abc(spark, TEST_SF_DIR).collect()}
    n_parts = (
        load_table(spark, TEST_SF_DIR, "lineitem").select("l_partkey").distinct().count()
    )
    assert set(res) <= {"A", "B", "C"}
    assert sum(r["n_parts"] for r in res.values()) == n_parts
    assert abs(sum(r["revenue_share"] for r in res.values()) - 1.0) < 1e-4
    # Pareto shape: the A head covers more revenue per part than the C tail
    if "A" in res and "C" in res:
        a, c = res["A"], res["C"]
        assert a["revenue"] / a["n_parts"] > c["revenue"] / c["n_parts"]


def test_dp_noise_is_seed_deterministic_and_bounded(spark):
    one = warehouse_ops.dp_noisy_event_counts(spark, TEST_SF_DIR).collect()
    two = warehouse_ops.dp_noisy_event_counts(spark, TEST_SF_DIR).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))
    for r in one:
        # Laplace(b=2): |noise| beyond ~30 means a broken inverse-CDF
        assert abs(r["laplace_noise"]) < 30.0
        assert abs(r["n_noisy"] - r["n_true"] - r["laplace_noise"]) < 1e-4


def test_fifo_matching_conserves_flow(spark):
    from pyspark.sql.window import Window

    m = warehouse_ops.fifo_credit_matching(spark, TEST_SF_DIR)
    ev = load_table(spark, TEST_SF_DIR, "events")
    dep = ev.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.sum("value").alias("dep")
    )
    dra = ev.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.sum("value").alias("dra")
    )
    per_user = m.groupBy("user_id").agg(F.sum("matched").alias("matched"))
    j = per_user.join(dep, "user_id").join(dra, "user_id").collect()
    assert j
    for r in j:
        # total matched flow = min(total deposits, total draws)
        assert abs(r["matched"] - min(r["dep"], r["dra"])) < 1e-3
    # every individual match is positive
    assert m.where(F.col("matched") <= 0).count() == 0


def test_next_greater_unbounded_matches_brute_force(spark):
    from bigdata_weather_system_spark.operators.windows import next_greater_unbounded

    rows = [
        # user 1: 3 1 4 1 5 — classic; user 2: descending, all null
        (10, 1, 100, 3.0), (11, 1, 200, 1.0), (12, 1, 300, 4.0),
        (13, 1, 400, 1.0), (14, 1, 500, 5.0),
        (20, 2, 100, 9.0), (21, 2, 200, 7.0), (22, 2, 300, 5.0),
        # user 3: equal plateau then rise (strictness check)
        (30, 3, 100, 2.0), (31, 3, 200, 2.0), (32, 3, 300, 2.5),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, value double")
    got = {
        r["event_id"]: (r["next_id"], r["steps_ahead"])
        for r in next_greater_unbounded(
            df, key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", id_col="event_id",
        ).collect()
    }
    assert got[10] == (12, 2)
    assert got[11] == (12, 1)
    assert got[12] == (14, 2)
    assert got[13] == (14, 1)
    assert got[14] == (None, None)
    assert got[20] == (None, None) and got[21] == (None, None) and got[22] == (None, None)
    assert got[30] == (32, 2)  # strictly greater skips the equal plateau
    assert got[31] == (32, 1)


def test_next_greater_unbounded_stack_carries_across_arrow_batches(spark):
    """The per-partition stack scan streams Arrow batches with a carried
    stack (round-9: replaced whole-partition pd.concat). Force 2-row
    batches so every scenario—resolution across a batch boundary, a key
    boundary inside a batch, an unresolved run spanning batches—actually
    crosses batches, and pin the exact output."""
    from bigdata_weather_system_spark.operators.windows import (
        next_greater_unbounded,
    )

    rows = [
        # user 1: long descending run (stays on the stack across many
        # batches) resolved by a single late spike, then a tail null
        (10, 1, 100, 9.0), (11, 1, 200, 8.0), (12, 1, 300, 7.0),
        (13, 1, 400, 6.0), (14, 1, 500, 5.0), (15, 1, 600, 10.0),
        (16, 1, 700, 1.0),
        # user 2 starts mid-batch after user 1's tail
        (20, 2, 100, 2.0), (21, 2, 200, 2.0), (22, 2, 300, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "2")
    try:
        got = {
            r["event_id"]: (r["next_id"], r["steps_ahead"])
            for r in next_greater_unbounded(
                df, key_col="user_id", order_cols=["ts", "event_id"],
                value_col="value", id_col="event_id",
            ).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert got == {
        10: (15, 5), 11: (15, 4), 12: (15, 3), 13: (15, 2), 14: (15, 1),
        15: (None, None), 16: (None, None),
        20: (22, 2), 21: (22, 1), 22: (None, None),
    }


def test_growth_accounting_identity_holds(spark):
    from bigdata_weather_system_spark.contract.analytics_ext import (
        weekly_growth_accounting,
    )

    rows = weekly_growth_accounting(spark, TEST_SF_DIR).collect()
    ev = load_table(spark, TEST_SF_DIR, "events")
    actives = {
        r["wk"]: r["n"]
        for r in ev.select(
            "user_id",
            (F.floor(F.col("ts").cast("double") / 604800)).cast("long").alias("wk"),
        )
        .distinct()
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        expected = actives.get(r["wk"], 0)
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == expected


def test_shapley_efficiency_axiom(spark):
    from bigdata_weather_system_spark.contract.analytics_ext import (
        shapley_channel_attribution,
    )

    rows = shapley_channel_attribution(spark, TEST_SF_DIR).collect()
    assert len(rows) == 4
    # efficiency: total credit telescopes to v(all four) - v(empty)
    ev = load_table(spark, TEST_SF_DIR, "events")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("double")).alias("first_purchase"))
    )
    e = ev.join(fp, "user_id", "left").where(
        F.col("first_purchase").isNull()
        | (F.col("ts").cast("double") < F.col("first_purchase"))
    )
    bit = lambda t, b: b * F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    expo = e.groupBy("user_id").agg(
        (bit("click", 1) + bit("view", 2) + bit("signup", 4) + bit("error", 8)).alias("s"),
        F.max(F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0)).alias("conv"),
    )
    stats = {
        r["s"]: (r["n"], r["c"])
        for r in expo.groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c"))
        .collect()
    }
    v_full = stats.get(15, (1, 0))[1] / stats.get(15, (1, 0))[0] if 15 in stats else 0.0
    v_empty = stats.get(0, (1, 0))[1] / stats.get(0, (1, 0))[0] if 0 in stats else 0.0
    total = sum(r["shapley_credit"] for r in rows)
    assert abs(total - (v_full - v_empty)) < 1e-4
