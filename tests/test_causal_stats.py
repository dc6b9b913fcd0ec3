"""Semantic unit tests for the wave-4 contract family: Kalman filter
convergence vs a numpy reference, ANOVA/Welch agreement with closed-form
numpy computation, association-rule identities (lift symmetry, support
bounds), stratified-ATE accounting identities, and RRF fusion ordering."""

from __future__ import annotations

import math

import numpy as np

from bigdata_weather_system_spark.contract import causal_stats_ext as cse
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


# ---------------------------------------------------------------------------
# Kalman filter
# ---------------------------------------------------------------------------

def _np_kalman(values, q=0.04, r=0.25):
    x, p = float(values[0]), 1.0
    for z in values[1:]:
        p_pred = p + q
        k = p_pred / (p_pred + r)
        x = x + k * (float(z) - x)
        p = (1.0 - k) * p_pred
    return x, p


def test_kalman_matches_numpy_reference(spark):
    out = {
        r["user_id"]: r
        for r in _rows(cse.kalman_filter_value_per_user(spark, TEST_SF_DIR))
    }
    # Recompute per-user from the raw parquet with the numpy reference.
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    for uid, rows in by_user.items():
        rows.sort()
        vals = [v for _, _, v in rows][:64]
        x, p = _np_kalman(vals)
        got = out[uid]
        assert got["n_events"] == len(vals)
        assert abs(got["x_filtered"] - x) < 1e-5, uid
        assert abs(got["p_final"] - p) < 6e-7, uid  # 6dp round in query


def test_kalman_variance_converges_to_steady_state(spark):
    # Steady state: p* solves p = (1-k)(p+q) with k=(p+q)/(p+q+r)
    # => p*^2 + q p* - q r = 0.
    q, r = 0.04, 0.25
    p_star = (-q + math.sqrt(q * q + 4 * q * r)) / 2
    rows = _rows(cse.kalman_filter_value_per_user(spark, TEST_SF_DIR))
    long_hist = [r for r in rows if r["n_events"] >= 30]
    assert long_hist, "expected some users with >=30 events"
    for r_ in long_hist:
        assert abs(r_["p_final"] - p_star) < 2e-6  # 6dp round + residual


# ---------------------------------------------------------------------------
# Welch t-test / ANOVA vs numpy
# ---------------------------------------------------------------------------

def _group_values(spark, etype):
    return np.array(
        [
            r.value
            for r in spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
            .filter(f"value IS NOT NULL AND event_type = '{etype}'")
            .select("value")
            .collect()
        ]
    )


def test_welch_matches_numpy(spark):
    got = _rows(cse.welch_ttest_purchase_vs_click(spark, TEST_SF_DIR))[0]
    a = _group_values(spark, "purchase")
    b = _group_values(spark, "click")
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert got["n_purchase"] == len(a) and got["n_click"] == len(b)
    assert abs(got["t_stat"] - t) < 1e-4
    assert abs(got["welch_dof"] - dof) < 1e-2
    assert got["significant_05"] == (abs(t) > 1.959964)


def test_anova_matches_numpy(spark):
    got = _rows(cse.anova_value_by_type(spark, TEST_SF_DIR))[0]
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    groups: dict = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(r.value)
    arrs = [np.array(v) for v in groups.values()]
    n = sum(len(a) for a in arrs)
    k = len(arrs)
    gm = sum(a.sum() for a in arrs) / n
    ssb = sum(len(a) * (a.mean() - gm) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k_groups"] == k and got["n_total"] == n
    assert abs(got["f_stat"] - f) / max(abs(f), 1.0) < 1e-6
    assert abs(got["eta_sq"] - ssb / (ssb + ssw)) < 1e-6
    assert got["df1"] == k - 1 and got["df2"] == n - k


# ---------------------------------------------------------------------------
# Association rules
# ---------------------------------------------------------------------------

def test_association_rule_identities(spark):
    rows = _rows(cse.basket_brand_association_rules(spark, TEST_SF_DIR))
    assert rows, "expected rules at min-support 20"
    for r in rows:
        assert r["brand_a"] < r["brand_b"]  # canonical pair orientation
        assert r["n_ab"] >= 20
        assert 0 < r["support"] <= 1
        assert 0 < r["conf_a_to_b"] <= 1 and 0 < r["conf_b_to_a"] <= 1
        # lift = conf(a->b) / support(b) = conf(b->a) / support(a):
        # verify via the identity lift * n_a * n_b == n_ab * n_orders
        # indirectly: conf_a_to_b / conf_b_to_a == n_b / n_a relation is
        # hard without n_a; check symmetry through the two confidences:
        # lift == conf_a_to_b * n_orders / n_b means
        # conf_a_to_b / lift == n_b / n_orders in (0, 1].
        assert 0 < r["conf_a_to_b"] / r["lift"] <= 1 + 1e-9
        assert 0 < r["conf_b_to_a"] / r["lift"] <= 1 + 1e-9
        # confidence >= support always (n_item <= n_orders).
        assert r["conf_a_to_b"] >= r["support"] - 1e-9
        assert r["conf_b_to_a"] >= r["support"] - 1e-9


# ---------------------------------------------------------------------------
# Stratified ATE
# ---------------------------------------------------------------------------

def test_stratified_ate_accounting(spark):
    rows = _rows(cse.stratified_ate_purchase(spark, TEST_SF_DIR))
    assert len(rows) == 5
    assert sorted(r["stratum"] for r in rows) == [1, 2, 3, 4, 5]
    n_all = sum(r["n_users"] for r in rows)
    for r in rows:
        assert r["n_treated"] + r["n_control"] == r["n_users"]
        if r["mean_treated"] is not None and r["mean_control"] is not None:
            diff = r["mean_treated"] - r["mean_control"]
            assert abs(r["stratum_effect"] - round(diff, 6)) < 2e-6
            # contribution == weight * effect (rounding slack)
            w = r["n_users"] / n_all
            assert abs(r["ate_contribution"] - w * diff) < 1e-4
    # ntile(5): bucket sizes differ by at most one.
    sizes = [r["n_users"] for r in rows]
    assert max(sizes) - min(sizes) <= 1


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------

def test_rrf_fusion_ordering_and_bounds(spark):
    rows = _rows(cse.retrieval_rrf_fusion(spark, TEST_SF_DIR))
    assert 0 < len(rows) <= 20
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        expected = 0.0
        if r["rank_q1"] is not None:
            assert 1 <= r["rank_q1"] <= 50
            expected += 1.0 / (60 + r["rank_q1"])
        if r["rank_q2"] is not None:
            assert 1 <= r["rank_q2"] <= 50
            expected += 1.0 / (60 + r["rank_q2"])
        assert r["rank_q1"] is not None or r["rank_q2"] is not None
        assert abs(r["rrf_score"] - expected) < 1e-6
    # A doc ranked in both lists must beat one ranked only once at the
    # same positions — the fusion property: max single-list score is
    # 1/61, min double-list score is 2/110 > 1/61.
    doubled = [
        r
        for r in rows
        if r["rank_q1"] is not None and r["rank_q2"] is not None
    ]
    if doubled:
        assert max(scores) >= 2.0 / (60 + 50)
