"""Semantic tests for wave 9: Nelson-Aalen vs python recompute, FD
audit vs exact recompute, Dirichlet query likelihood vs python."""

from __future__ import annotations

import math

import numpy as np

from bigdata_weather_system_spark.contract import analytics_ext, llm_ops
from bigdata_weather_system_spark.contract import pipeline_ops
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_nelson_aalen_matches_python(spark):
    got = {
        r["duration_s"]: r
        for r in _rows(analytics_ext.nelson_aalen_hazard(spark, TEST_SF_DIR))
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    per: dict = {}
    for r in ev:
        u = per.setdefault(r.user_id, {"start": r.ts, "buy": None, "last": r.ts})
        u["start"] = min(u["start"], r.ts)
        u["last"] = max(u["last"], r.ts)
        if r.event_type == "purchase":
            u["buy"] = min(u["buy"], r.ts) if u["buy"] else r.ts
    durs = []
    for u in per.values():
        if u["last"] <= u["start"]:
            continue
        end = u["buy"] or u["last"]
        durs.append(
            (round((end - u["start"]).total_seconds(), 3), u["buy"] is not None)
        )
    times = sorted({t for t, _ in durs})
    H = 0.0
    V = 0.0
    for t in times:
        d = sum(1 for tt, obs in durs if tt == t and obs)
        n = sum(1 for tt, _ in durs if tt >= t)
        if d == 0:
            continue
        H += d / n
        V += d / (n * n)
        g = got[t]
        assert g["n_events"] == d and g["n_at_risk"] == n
        assert abs(g["cum_hazard"] - H) < 1e-5
        assert abs(g["hazard_var"] - V) < 1e-5
        assert abs(g["na_survival"] - math.exp(-H)) < 1e-5
    # NA survival upper-bounds KM survival pointwise (1-x <= e^-x).
    km = {
        r["duration_s"]: r["survival"]
        for r in _rows(analytics_ext.km_time_to_purchase(spark, TEST_SF_DIR))
    }
    for t, g in got.items():
        if t in km and km[t] is not None:
            assert g["na_survival"] >= km[t] - 1e-6


def test_fd_audit_matches_exact_recompute(spark):
    rows = _rows(
        pipeline_ops.functional_dependency_audit(spark, TEST_SF_DIR)
    )
    assert len(rows) == 5
    for r in rows:
        t = spark.read.parquet(f"{TEST_SF_DIR}/{r['tbl']}.parquet")
        data = t.select(r["determinant"], r["dependent"]).collect()
        groups: dict = {}
        for row in data:
            groups.setdefault(row[0], set()).add(row[1])
        counts: dict = {}
        for row in data:
            counts[row[0]] = counts.get(row[0], 0) + 1
        viol = {k for k, v in groups.items() if len(v) > 1}
        assert r["n_groups"] == len(groups)
        assert r["n_violating_groups"] == len(viol)
        assert r["n_rows_in_violation"] == sum(counts[k] for k in viol)
        assert abs(
            r["fd_strength"] - (1 - len(viol) / len(groups))
        ) < 1e-6
    # primary-key FDs must be exact
    exact = {
        (r["tbl"], r["determinant"], r["dependent"]): r["fd_strength"]
        for r in rows
    }
    assert exact[("orders", "o_orderkey", "o_orderstatus")] == 1.0


def test_query_likelihood_matches_python(spark):
    got = {
        r["doc_id"]: r
        for r in _rows(
            llm_ops.doc_query_likelihood_search(spark, TEST_SF_DIR)
        )
    }
    docs = spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet").collect()
    toks = {d.doc_id: [w for w in d.text.lower().split() if w] for d in docs}
    c_len = sum(len(v) for v in toks.values())
    terms = ["spark", "join", "vector"]
    ctf = {
        t: sum(v.count(t) for v in toks.values()) for t in terms
    }
    mu = 300.0
    scored = []
    for did, v in toks.items():
        s = sum(
            math.log(v.count(t) + mu * ctf[t] / c_len)
            - math.log(mu + len(v))
            for t in terms
        )
        scored.append((-round(s, 6), did, s))
    scored.sort()
    top = scored[:20]
    assert set(got) == {did for _, did, _ in top}
    for _, did, s in top:
        assert abs(got[did]["ql_score"] - s) < 2e-6, did


def test_gmm_em_matches_numpy(spark):
    from bigdata_weather_system_spark.contract.pca_ops import (
        gmm_em_value_mixture,
    )

    got = _rows(gmm_em_value_mixture(spark, TEST_SF_DIR))[0]
    x = np.array(
        [
            r.value
            for r in spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
            .filter("value IS NOT NULL")
            .select("value")
            .collect()
        ]
    )
    q25, q75 = np.percentile(x, 25), np.percentile(x, 75)
    w2, mu1, mu2 = 0.5, round(q25, 9), round(q75, 9)
    s1 = s2 = round((q75 - q25) ** 2, 9)
    two_pi = 6.283185307179586
    for _ in range(5):
        d1 = (1 - w2) * np.exp(-((x - mu1) ** 2) / (2 * s1)) / np.sqrt(
            two_pi * s1
        )
        d2 = w2 * np.exp(-((x - mu2) ** 2) / (2 * s2)) / np.sqrt(
            two_pi * s2
        )
        denom = d1 + d2
        r2 = np.where(denom > 0, d2 / np.where(denom > 0, denom, 1), 0.5)
        w2 = round(float(r2.mean()), 9)
        mu1 = round(float(((1 - r2) * x).sum() / (1 - r2).sum()), 9)
        mu2 = round(float((r2 * x).sum() / r2.sum()), 9)
        s1 = round(
            float(
                ((1 - r2) * x * x).sum() / (1 - r2).sum()
                - (((1 - r2) * x).sum() / (1 - r2).sum()) ** 2
            ),
            9,
        )
        s2 = round(
            float(
                (r2 * x * x).sum() / r2.sum()
                - ((r2 * x).sum() / r2.sum()) ** 2
            ),
            9,
        )
    assert got["n_rows"] == len(x)
    assert abs(got["weight_2"] - w2) < 1e-5
    assert abs(got["mean_1"] - mu1) < 1e-4
    assert abs(got["mean_2"] - mu2) < 1e-4
    assert abs(got["sd_1"] - np.sqrt(s1)) < 1e-4
    assert abs(got["sd_2"] - np.sqrt(s2)) < 1e-4
    # mixture sanity: weights form a distribution, components separate
    assert abs(got["weight_1"] + got["weight_2"] - 1.0) < 1e-9
    assert got["sd_1"] > 0 and got["sd_2"] > 0
    assert got["mean_1"] < got["mean_2"]


def test_reconciled_forecast_is_coherent(spark):
    from bigdata_weather_system_spark.contract.analytics_ext import (
        reconciled_weekly_forecast,
    )

    rows = _rows(reconciled_weekly_forecast(spark, TEST_SF_DIR))
    assert rows, "expected forecast rows"
    by_h: dict = {}
    for r in rows:
        by_h.setdefault(r["horizon_day"], []).append(r)
    for h, rs in by_h.items():
        top = rs[0]["top_forecast"]
        assert all(abs(r["top_forecast"] - top) < 1e-9 for r in rs)
        # coherence: reconciled bottoms sum back to the top forecast
        assert abs(sum(r["reconciled_forecast"] for r in rs) - top) < 1e-3
        # reconciliation preserves bottom-forecast proportions
        bsum = sum(r["base_forecast"] for r in rs)
        for r in rs:
            expected = top * r["base_forecast"] / bsum
            assert abs(r["reconciled_forecast"] - expected) < 1e-4
