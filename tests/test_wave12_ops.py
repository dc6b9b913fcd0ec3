"""Semantic tests for wave 12: RANSAC consensus properties vs a numpy
reimplementation, gains-table accounting identities, and IPF margin
convergence."""

from __future__ import annotations

import hashlib

import numpy as np

from bigdata_weather_system_spark.contract.analytics_ext import (
    ransac_trend_per_type,
)
from bigdata_weather_system_spark.contract.cleaning_ops import (
    classifier_gains_table,
)
from bigdata_weather_system_spark.contract.eval_ops import ipf_raked_weights
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_ransac_matches_numpy_reimplementation(spark):
    got = {
        r["event_type"]: r for r in _rows(ransac_trend_per_type(spark, TEST_SF_DIR))
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("event_type", "event_id", "ts", "value")
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(
            (r.event_id, r.ts.timestamp(), r.value)
        )
    for etype, rows in by_type.items():
        t0 = min(t for _, t, _ in rows)
        pts = [(eid, (t - t0) / 3600.0, v) for eid, t, v in rows]
        best = None
        for c in range(16):
            ranked = sorted(
                pts,
                key=lambda p: (
                    hashlib.md5(f"{p[0]}|{c}".encode()).hexdigest(),
                    p[0],
                ),
            )
            (_, x1, y1), (_, x2, y2) = ranked[0], ranked[1]
            if x1 == x2:
                continue
            slope = (y2 - y1) / (x2 - x1)
            inter = y1 - slope * x1
            n_in = sum(
                1 for _, x, y in pts if abs(y - (inter + slope * x)) <= 15.0
            )
            if best is None or (n_in, -c) > (best[0], -best[1]):
                best = (n_in, c, slope, inter)
        n_in, c, slope, inter = best
        g = got[etype]
        assert g["candidate_id"] == c, etype
        assert g["n_inliers"] == n_in, etype
        xin = np.array(
            [x for _, x, y in pts if abs(y - (inter + slope * x)) <= 15.0]
        )
        yin = np.array(
            [y for _, x, y in pts if abs(y - (inter + slope * x)) <= 15.0]
        )
        b_hat = (
            len(xin) * (xin * yin).sum() - xin.sum() * yin.sum()
        ) / (len(xin) * (xin * xin).sum() - xin.sum() ** 2)
        a_hat = (yin.sum() - b_hat * xin.sum()) / len(xin)
        assert abs(g["slope_refit"] - b_hat) < 1e-4, etype
        assert abs(g["intercept_refit"] - a_hat) < 1e-3, etype


def test_gains_table_accounting(spark):
    rows = sorted(
        _rows(classifier_gains_table(spark, TEST_SF_DIR)),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_all = sum(r["n_docs"] for r in rows)
    pos_all = sum(r["n_pos"] for r in rows)
    # deciles balanced to within 1 row
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # cumulative capture is nondecreasing and ends at 1
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-9
    for r in rows:
        expected_lift = (r["n_pos"] / r["n_docs"]) / (pos_all / n_all)
        assert abs(r["lift"] - expected_lift) < 1e-5


def test_ipf_weights_match_margins(spark):
    rows = _rows(ipf_raked_weights(spark, TEST_SF_DIR))
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .selectExpr("event_type", "(dayofweek(ts) - 1) AS wd")
        .collect()
    )
    col_tot: dict = {}
    row_tot: dict = {}
    for r in ev:
        col_tot[r.wd] = col_tot.get(r.wd, 0) + 1
        row_tot[r.event_type] = row_tot.get(r.event_type, 0) + 1
    # final scale was by column: column margins reproduce (near-)exactly
    col_w: dict = {}
    for r in rows:
        col_w[r["weekday"]] = col_w.get(r["weekday"], 0.0) + r["raked_weight"]
    for wd, tot in col_tot.items():
        assert abs(col_w[wd] - tot) / tot < 1e-3, wd
    # row margins converge to within a few percent after 3 rounds
    for r in rows:
        assert r["row_margin_gap"] < 0.05
    # weights positive wherever the sample had mass
    assert all(r["raked_weight"] > 0 for r in rows)


def test_ahash_near_dups_lossless_vs_bruteforce(spark):
    """The 8-band bucketing must find EVERY pair within Hamming 6
    (pigeonhole losslessness) — verified against an all-pairs numpy
    recompute of the aHash over real decoded buffers."""
    from bigdata_weather_system_spark.contract.cleaning_ops import (
        media_ahash_near_dups,
    )

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in _rows(media_ahash_near_dups(spark, TEST_SF_DIR))
    }
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    def ahash(mid):
        h, w = 16 + mid % 16, 16 + mid % 24
        n = h * w * 3
        pix = ((mid + np.arange(n, dtype=np.int64)) % 256).reshape(h, w, 3)
        gs = pix.sum(axis=2)
        r = np.minimum(7, np.arange(h)[:, None] * 8 // h)
        cc = np.minimum(7, np.arange(w)[None, :] * 8 // w)
        cell_sum = np.zeros((8, 8), dtype=np.int64)
        cell_n = np.zeros((8, 8), dtype=np.int64)
        np.add.at(
            cell_sum,
            (np.broadcast_to(r, (h, w)), np.broadcast_to(cc, (h, w))),
            gs,
        )
        np.add.at(
            cell_n,
            (np.broadcast_to(r, (h, w)), np.broadcast_to(cc, (h, w))),
            1,
        )
        cm = cell_sum / cell_n
        gm = 0.0
        for i in range(8):
            for j in range(8):
                gm += cm[i, j]
        gm /= 64.0
        return (cm > gm).astype(np.int8).reshape(64)

    hs = {mid: ahash(mid) for mid in ids}
    expected = {}
    sids = sorted(ids)
    for i, a in enumerate(sids):
        for b in sids[i + 1:]:
            d = int((hs[a] != hs[b]).sum())
            if d <= 6:
                expected[(a, b)] = d
    assert got == expected


def test_ips_ope_matches_python(spark):
    from bigdata_weather_system_spark.contract.eval_ops import (
        ips_policy_value_estimate,
    )

    got = _rows(ips_policy_value_estimate(spark, TEST_SF_DIR))[0]
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("event_type IN ('click','view') AND value IS NOT NULL")
        .select("event_type", "ts", "value")
        .collect()
    )
    logged = [
        (r.event_type, 0 if r.ts.hour < 12 else 1, 1.0 if r.value > 60 else 0.0)
        for r in ev
    ]
    n = len(logged)
    p = {}
    for a, _, _ in logged:
        p[a] = p.get(a, 0) + 1
    p = {a: c / n for a, c in p.items()}
    q: dict = {}
    cnt: dict = {}
    for a, ctx, r in logged:
        q[(a, ctx)] = q.get((a, ctx), 0.0) + r
        cnt[(a, ctx)] = cnt.get((a, ctx), 0) + 1
    q = {k: v / cnt[k] for k, v in q.items()}
    tgt = lambda ctx: "click" if ctx == 0 else "view"  # noqa: E731
    ips = sum(
        (1.0 if a == tgt(ctx) else 0.0) * r / p[a] for a, ctx, r in logged
    ) / n
    wsum = sum((1.0 if a == tgt(ctx) else 0.0) / p[a] for a, ctx, _ in logged)
    snips = sum(
        (1.0 if a == tgt(ctx) else 0.0) * r / p[a] for a, ctx, r in logged
    ) / wsum
    dm = sum(q[(tgt(ctx), ctx)] for _, ctx, _ in logged) / n
    dr = dm + sum(
        (1.0 if a == tgt(ctx) else 0.0) / p[a] * (r - q[(a, ctx)])
        for a, ctx, r in logged
    ) / n
    assert got["n_logged"] == n
    assert abs(got["ips_value"] - ips) < 1e-5
    assert abs(got["snips_value"] - snips) < 1e-5
    assert abs(got["dm_value"] - dm) < 1e-5
    assert abs(got["dr_value"] - dr) < 1e-5
    # all four estimate the same quantity: they should be in a sane band
    vals = [got["ips_value"], got["snips_value"], got["dm_value"], got["dr_value"]]
    assert all(0 <= v <= 1 for v in vals)


def test_bitemporal_revisions_are_late_arrivals(spark):
    from bigdata_weather_system_spark.contract.cdc_ext import (
        bitemporal_state_lookup,
    )

    rows = _rows(bitemporal_state_lookup(spark, TEST_SF_DIR))
    assert rows
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("event_type IN ('signup','purchase')")
        .select("user_id", "ts", "event_type", "event_id")
        .collect()
    )
    import datetime as dt

    tmin = min(
        r.ts
        for r in spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .select("ts")
        .collect()
    )
    v_time = tmin + dt.timedelta(days=20)
    t_time = tmin + dt.timedelta(days=21)
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for row in rows:
        hist = sorted(
            by_user[row["user_id"]],
            key=lambda r: (r.ts, r.event_id),
            reverse=True,
        )
        now = next((r.event_type for r in hist if r.ts <= v_time), None)
        then = next(
            (
                r.event_type
                for r in hist
                if r.ts <= v_time
                and r.ts + dt.timedelta(days=2) <= t_time
            ),
            None,
        )
        assert row["state_known_now"] == now
        assert row["state_known_then"] == then
        assert row["was_revised"] == (now != then)
    # at least the semantics hold: any revision implies the winning
    # record arrived within the 2-day ingestion lag of the pin
    assert any(r["was_revised"] for r in rows) or all(
        not r["was_revised"] for r in rows
    )


def test_adf_matches_numpy_ols(spark):
    from bigdata_weather_system_spark.contract.cdc_ext import (
        adf_unit_root_per_type,
    )

    got = {
        r["event_type"]: r
        for r in _rows(adf_unit_root_per_type(spark, TEST_SF_DIR))
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    for etype, rows in by_type.items():
        rows.sort()
        y = np.array([v for _, _, v in rows])
        x, dy = y[:-1], np.diff(y)
        n = len(x)
        X = np.column_stack([np.ones(n), x])
        coef, *_ = np.linalg.lstsq(X, dy, rcond=None)
        alpha, beta = coef
        resid = dy - X @ coef
        se = np.sqrt(
            (resid @ resid / (n - 2)) / ((x - x.mean()) ** 2).sum()
        )
        g = got[etype]
        assert g["n_obs"] == n
        assert abs(g["beta"] - beta) < 1e-5, etype
        assert abs(g["adf_t_stat"] - beta / se) < 1e-3, etype
        assert g["stationary_05"] == (beta / se < -2.86)
        # synthetic iid-ish values mean-revert hard: t should be very negative
        assert g["adf_t_stat"] < -2.86


def test_watermark_curve_is_monotone(spark):
    from bigdata_weather_system_spark.contract.cdc_ext import (
        watermark_tuning_curve,
    )

    rows = sorted(
        _rows(watermark_tuning_curve(spark, TEST_SF_DIR)),
        key=lambda r: r["watermark_delay_s"],
    )
    assert [r["watermark_delay_s"] for r in rows] == [0, 3600, 21600, 86400]
    n = rows[0]["n_events"]
    assert all(r["n_events"] == n for r in rows)
    drops = [r["n_dropped"] for r in rows]
    # longer watermark delay can only drop FEWER events
    assert drops == sorted(drops, reverse=True)
    for r in rows:
        assert abs(r["drop_rate"] - r["n_dropped"] / n) < 1e-6


def test_bh_fdr_matches_python(spark):
    import math

    from bigdata_weather_system_spark.contract.causal_stats_ext import (
        type_mean_shift_fdr,
    )

    got = {
        r["event_type"]: r
        for r in _rows(type_mean_shift_fdr(spark, TEST_SF_DIR))
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("event_type", "value")
        .collect()
    )
    groups: dict = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(r.value)

    def phi(z):  # same A&S 7.1.26 polynomial as the query
        x = z / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592
        ) * t
        return 0.5 * (1.0 + (1.0 - poly * math.exp(-x * x)))

    stats = {}
    all_vals = [v for vs in groups.values() for v in vs]
    for etype, vs in groups.items():
        rest = [v for k, g in groups.items() if k != etype for v in g]
        n1, n2 = len(vs), len(rest)
        m1 = sum(vs) / n1
        m2 = sum(rest) / n2
        v1 = sum((v - m1) ** 2 for v in vs) / (n1 - 1)
        v2 = sum((v - m2) ** 2 for v in rest) / (n2 - 1)
        z = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
        p = 2.0 * (1.0 - phi(abs(z)))
        stats[etype] = (z, p)
        assert abs(got[etype]["z_stat"] - z) < 1e-3, etype
        assert abs(got[etype]["p_value"] - p) < 1e-4, etype
    # BH step-up recompute
    m = len(stats)
    ordered = sorted(stats.items(), key=lambda kv: (kv[1][1], kv[0]))
    k_max = 0
    for i, (etype, (_, p)) in enumerate(ordered, 1):
        if p <= i * 0.10 / m:
            k_max = i
    for i, (etype, _) in enumerate(ordered, 1):
        assert got[etype]["p_rank"] == i
        assert got[etype]["rejected_fdr10"] == (i <= k_max), etype
    del all_vals
