"""Semantic pins for the labeling/protocol wave: lookahead-free
triple-barrier labels vs a pure-python replay, CV-fold accounting
identities, and Qini curve invariants."""

from __future__ import annotations

import math

from bigdata_weather_system_spark.contract.labeling_ops import (
    triple_barrier_labels,
    uplift_qini_by_bin,
    walk_forward_cv_folds,
)
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_triple_barrier_matches_python_replay(spark):
    got = {
        (r["user_id"], r["event_id"]): r
        for r in _rows(triple_barrier_labels(spark, TEST_SF_DIR))
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    n_checked = 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda p: (p[0], p[1]))
        vals = [v for _, _, v in rows]
        for i, (_, eid, v) in enumerate(rows):
            fut = vals[i + 1 : i + 21]
            up = next((j + 1 for j, x in enumerate(fut) if x >= v * 1.2), None)
            dn = next((j + 1 for j, x in enumerate(fut) if x <= v * 0.8), None)
            if up is not None and (dn is None or up < dn):
                label, steps = 1, up
            elif dn is not None and (up is None or dn <= up):
                label, steps = -1, dn
            else:
                label, steps = 0, None
            g = got[(uid, eid)]
            assert g["n_future"] == len(fut)
            assert g["label"] == label, (uid, eid, label, g)
            assert g["steps_to_hit"] == steps
            n_checked += 1
    assert n_checked == len(got)


def test_walk_forward_folds_accounting(spark):
    rows = {r["test_fold"]: r for r in _rows(walk_forward_cv_folds(spark, TEST_SF_DIR))}
    assert set(rows) == {1, 2, 3, 4}
    total = spark.read.parquet(f"{TEST_SF_DIR}/events.parquet").count()
    prev_train = -1
    for k in (1, 2, 3, 4):
        r = rows[k]
        # every fold must actually have train and test data
        assert r["n_train"] > 0 and r["n_test"] > 0
        # train+embargo can never exceed everything before the test fold
        assert r["n_train"] + r["n_embargoed"] + r["n_test"] <= total
        # walk-forward: later folds have at least as much usable history
        assert r["n_train"] + r["n_embargoed"] > prev_train
        prev_train = r["n_train"] + r["n_embargoed"]


def test_qini_curve_invariants(spark):
    rows = sorted(
        _rows(uplift_qini_by_bin(spark, TEST_SF_DIR)),
        key=lambda r: -r["score_bin"],
    )
    assert len(rows) == 10
    for r in rows:
        assert r["conv_treated"] <= r["n_treated"]
        assert r["conv_control"] <= r["n_control"]
        assert math.isclose(
            r["uplift"],
            r["conv_treated"] / r["n_treated"]
            - r["conv_control"] / r["n_control"],
            abs_tol=2e-6,
        )
    # the last cumulative point is the overall incremental conversions
    cum_ct = sum(r["conv_treated"] for r in rows)
    cum_cc = sum(r["conv_control"] for r in rows)
    cum_nt = sum(r["n_treated"] for r in rows)
    cum_nc = sum(r["n_control"] for r in rows)
    assert math.isclose(
        rows[-1]["qini"], cum_ct - cum_cc * cum_nt / cum_nc, abs_tol=2e-4
    )


def test_boxcox_grid_picks_single_best(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        boxcox_lambda_grid,
    )

    rows = _rows(boxcox_lambda_grid(spark, TEST_SF_DIR))
    assert len(rows) == 6
    assert sum(1 for r in rows if r["is_best"]) == 1
    # every lambda sees the same observation count
    assert len({r["n_obs"] for r in rows}) == 1


def test_hashing_audit_is_consistent(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        hashing_collision_audit,
    )

    (row,) = _rows(hashing_collision_audit(spark, TEST_SF_DIR))
    assert row["n_buckets_occupied"] <= min(row["n_keys"], 1024)
    assert row["max_bucket_load"] >= 1
    assert 0.0 <= row["collision_rate"] < 1.0
    assert row["matches_birthday_model"] is True


def test_cms_drift_never_undercounts_and_deltas_close(spark):
    from bigdata_weather_system_spark.contract.sketch_ops import (
        token_cms_drift,
    )

    rows = _rows(token_cms_drift(spark, TEST_SF_DIR))
    assert len(rows) == 10
    for r in rows:
        assert r["never_undercounts"] is True
        assert r["delta_exact"] == r["exact_h1"] - r["exact_h0"]
        assert r["delta_est"] == r["est_h1"] - r["est_h0"]


def test_edge_support_counts_each_triangle_thrice(spark):
    import pyspark.sql.functions as F
    from bigdata_weather_system_spark.contract.graph_ops import (
        part_edge_triangle_support,
    )
    from bigdata_weather_system_spark.operators.graph import (
        cooccurrence_edges,
        triangle_stats,
    )

    support = _rows(part_edge_triangle_support(spark, TEST_SF_DIR))
    total_credits = sum(r["n_triangles"] for r in support)
    li = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet")
    # same weight >= 2 repeat-co-purchase filter as the query
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey").filter(
        F.col("weight") >= 2
    )
    (tri_row,) = triangle_stats(edges).collect()
    assert total_credits == 3 * tri_row["n_triangles"]
    for r in support:
        assert r["u"] < r["v"]
        assert r["max_truss_level"] == r["n_triangles"] + 2


def test_power_grid_is_monotone_in_effect(spark):
    from bigdata_weather_system_spark.contract.causal_stats_ext import (
        ab_test_power_grid,
    )

    rows = sorted(_rows(ab_test_power_grid(spark, TEST_SF_DIR)),
                  key=lambda r: r["mde"])
    assert len(rows) == 5
    powers = [r["power"] for r in rows]
    assert powers == sorted(powers)
    for r in rows:
        assert 0.0 <= r["power"] <= 1.0
        assert r["powered_80"] == (r["power"] >= 0.8)


def test_qte_quantiles_are_monotone_within_arm(spark):
    from bigdata_weather_system_spark.contract.causal_stats_ext import (
        quantile_treatment_effects,
    )

    rows = sorted(_rows(quantile_treatment_effects(spark, TEST_SF_DIR)),
                  key=lambda r: r["quantile"])
    assert [r["quantile"] for r in rows] == [0.1, 0.25, 0.5, 0.75, 0.9]
    tq = [r["treated_q"] for r in rows]
    cq = [r["control_q"] for r in rows]
    assert tq == sorted(tq) and cq == sorted(cq)
    for r in rows:
        assert math.isclose(r["qte"], r["treated_q"] - r["control_q"],
                            abs_tol=2e-4)


def test_waterfill_exhausts_budget_exactly(spark):
    from bigdata_weather_system_spark.contract.warehouse_ops import (
        waterfill_budget_allocation,
    )

    rows = _rows(waterfill_budget_allocation(spark, TEST_SF_DIR))
    total_demand = sum(r["demand"] for r in rows)
    total_alloc = sum(r["allocation"] for r in rows)
    # budget = half of demand, and water-filling spends ALL of it
    assert math.isclose(total_alloc, total_demand * 0.5, rel_tol=1e-6)
    for r in rows:
        assert r["allocation"] <= r["demand"] + 1e-9
        if r["fully_served"]:
            assert math.isclose(r["allocation"], r["demand"], abs_tol=1e-3)
    # unserved types all sit at the common water level
    levels = {r["allocation"] for r in rows if not r["fully_served"]}
    assert len(levels) <= 1


def test_changepoint_split_matches_numpy(spark):
    import numpy as np
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        best_split_changepoint_per_type,
    )

    got = {
        r["event_type"]: r
        for r in _rows(best_split_changepoint_per_type(spark, TEST_SF_DIR))
    }
    daily = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .selectExpr("event_type", "to_date(ts) AS day", "value")
        .groupBy("event_type", "day")
        .agg({"value": "avg"})
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r["avg(value)"]))
    for etype, pts in series.items():
        pts.sort()
        y = np.array([v for _, v in pts])
        n = len(y)
        sse_tot = float(((y - y.mean()) ** 2).sum())
        best = None
        for i in range(1, n):
            l, r_ = y[:i], y[i:]
            sse = float(((l - l.mean()) ** 2).sum()) + float(
                ((r_ - r_.mean()) ** 2).sum()
            )
            gain = sse_tot - sse
            if best is None or gain > best[0] + 1e-12:
                best = (gain, i)
        g = got[etype]
        assert g["n_left"] == best[1]
        assert math.isclose(g["sse_gain"], best[0], rel_tol=1e-6, abs_tol=1e-4)
        assert 0.0 <= g["gain_ratio"] <= 1.0


def test_lorenz_curve_is_convex_and_ends_at_one(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        lorenz_value_concentration,
    )

    rows = sorted(_rows(lorenz_value_concentration(spark, TEST_SF_DIR)),
                  key=lambda r: r["decile"])
    assert rows[-1]["cum_user_share"] == 1.0
    assert rows[-1]["cum_value_share"] == 1.0
    shares = [r["cum_value_share"] for r in rows]
    assert shares == sorted(shares)
    # Lorenz curve lies at or below the diagonal
    for r in rows:
        assert r["cum_value_share"] <= r["cum_user_share"] + 1e-9


def test_prr_screen_accounting(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        error_prr_by_weekday,
    )

    rows = _rows(error_prr_by_weekday(spark, TEST_SF_DIR))
    assert len(rows) == 7
    assert {r["dow"] for r in rows} == set(range(1, 8))
    for r in rows:
        assert r["n_errors"] <= r["n_events"]
        assert r["prr"] > 0
        assert r["signal"] == (r["n_errors"] >= 3 and r["prr"] > 2.0)


def test_wasserstein_matches_numpy_grid(spark):
    import numpy as np
    from bigdata_weather_system_spark.contract.causal_stats_ext import (
        wasserstein_value_shift,
    )

    (row,) = _rows(wasserstein_value_shift(spark, TEST_SF_DIR))
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL AND event_type IN ('click','purchase')")
        .select("event_type", "value")
        .collect()
    )
    c = np.array([r.value for r in ev if r.event_type == "click"])
    p = np.array([r.value for r in ev if r.event_type == "purchase"])
    grid = [i / 20.0 for i in range(1, 20)]
    qc = np.quantile(c, grid)
    qp = np.quantile(p, grid)
    w1 = float(np.abs(qc - qp).mean())
    assert row["n_click"] == len(c) and row["n_purchase"] == len(p)
    assert math.isclose(row["w1_distance"], w1, rel_tol=1e-3, abs_tol=5e-4)
    assert row["w1_distance"] >= 0


def test_competing_risks_cif_sums_to_one(spark):
    from bigdata_weather_system_spark.contract.causal_stats_ext import (
        competing_risks_incidence,
    )

    rows = _rows(competing_risks_incidence(spark, TEST_SF_DIR))
    last_day = max(r["day"] for r in rows)
    # at the horizon, per-cause incidences partition the user base
    final = {}
    for r in rows:
        final[r["cause"]] = max(
            final.get(r["cause"], 0.0), r["cum_incidence"]
        )
    assert math.isclose(sum(final.values()), 1.0, abs_tol=1e-5)
    # each cause's CIF is non-decreasing in time
    by_cause: dict = {}
    for r in sorted(rows, key=lambda x: x["day"]):
        prev = by_cause.get(r["cause"], 0.0)
        assert r["cum_incidence"] >= prev - 1e-12
        by_cause[r["cause"]] = r["cum_incidence"]


def test_thompson_posteriors_are_conjugate_updates(spark):
    from bigdata_weather_system_spark.contract.causal_stats_ext import (
        thompson_arm_posteriors,
    )

    rows = _rows(thompson_arm_posteriors(spark, TEST_SF_DIR))
    for r in rows:
        assert r["alpha"] == 1 + r["n_wins"]
        assert r["beta"] == 1 + r["n_plays"] - r["n_wins"]
        a, b = r["alpha"], r["beta"]
        assert math.isclose(r["posterior_mean"], a / (a + b), abs_tol=2e-6)
        assert r["posterior_var"] > 0


def test_heaps_law_growth_is_monotone_and_sublinear(spark):
    from bigdata_weather_system_spark.contract.llm_ops import (
        heaps_law_vocab_growth,
    )

    rows = sorted(_rows(heaps_law_vocab_growth(spark, TEST_SF_DIR)),
                  key=lambda r: r["decile"])
    assert len(rows) == 10
    vocab = [r["vocab"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert vocab == sorted(vocab) and toks == sorted(toks)
    assert all(v <= t for v, t in zip(vocab, toks))
    betas = {r["heaps_beta"] for r in rows}
    assert len(betas) == 1
    beta = betas.pop()
    # sublinear always; the synthetic corpus has a CLOSED ~31-token
    # vocabulary, so its curve saturates in decile 1 and beta == 0.0
    # exactly — natural text would land in (0.4, 0.6)
    assert 0.0 <= beta < 1.0
    assert vocab[0] == vocab[-1]  # saturation is real in this corpus


def test_source_similarity_sketch_tracks_exact(spark):
    from bigdata_weather_system_spark.contract.llm_ops import (
        source_shingle_similarity,
    )

    rows = _rows(source_shingle_similarity(spark, TEST_SF_DIR))
    n_src = len({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert 0.0 <= r["jaccard_exact"] <= 1.0
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert r["within_band"] is True


def test_ece_mce_relationship_and_bounds(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        expected_calibration_error,
    )

    (row,) = _rows(expected_calibration_error(spark, TEST_SF_DIR))
    assert 0.0 <= row["ece"] <= row["mce"] <= 1.0
    assert 1 <= row["n_bins"] <= 10


def test_gumbel_return_levels_grow_with_horizon(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        gumbel_daily_max_extremes,
    )

    rows = _rows(gumbel_daily_max_extremes(spark, TEST_SF_DIR))
    daily_max = {}
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .selectExpr("event_type", "to_date(ts) AS d", "value")
        .groupBy("event_type", "d")
        .agg({"value": "max"})
        .collect()
    )
    for r in ev:
        daily_max.setdefault(r.event_type, []).append(r["max(value)"])
    for r in rows:
        assert r["gumbel_beta"] > 0
        assert r["return_level_365d"] > r["return_level_100d"]
        # return level extrapolates BEYOND the observed block maxima
        assert r["return_level_365d"] > max(
            daily_max[r["event_type"]]
        ) * 0.5
        import numpy as np

        mx = np.array(daily_max[r["event_type"]])
        beta = mx.std(ddof=1) * math.sqrt(6) / math.pi
        mu = mx.mean() - 0.5772156649015329 * beta
        assert math.isclose(r["gumbel_mu"], mu, rel_tol=1e-4)
        assert math.isclose(r["gumbel_beta"], beta, rel_tol=1e-4)


def test_periodogram_shares_bounded_and_one_dominant(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        seasonality_periodogram,
    )

    rows = _rows(seasonality_periodogram(spark, TEST_SF_DIR))
    by_type: dict = {}
    for r in rows:
        assert 0.0 <= r["power_share"] <= 1.0
        by_type.setdefault(r["event_type"], []).append(r)
    for etype, rs in by_type.items():
        assert len(rs) == 3
        assert sum(1 for r in rs if r["dominant"]) == 1
        dom = next(r for r in rs if r["dominant"])
        assert dom["power_share"] == max(r["power_share"] for r in rs)


def test_nb_fit_consistent_with_overdispersion_gate(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        event_count_overdispersion,
        nb_moments_fit_per_type,
    )

    fit = {r["event_type"]: r for r in _rows(nb_moments_fit_per_type(spark, TEST_SF_DIR))}
    gate = {
        r["event_type"]: r
        for r in _rows(event_count_overdispersion(spark, TEST_SF_DIR))
    }
    for t, r in fit.items():
        assert r["fit_valid"] == (r["var_daily"] > r["mean_daily"])
        if r["fit_valid"]:
            m, v = r["mean_daily"], r["var_daily"]
            assert math.isclose(r["nb_r"], m * m / (v - m), rel_tol=1e-4)
            assert math.isclose(r["nb_p"], m / v, rel_tol=1e-4)
            assert 0.0 < r["nb_p"] <= 1.0
        # same daily relation as the gate
        assert gate[t]["n_days"] == r["n_days"]


def test_seasonal_strength_is_a_variance_share(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        weekday_seasonal_strength,
    )

    rows = _rows(weekday_seasonal_strength(spark, TEST_SF_DIR))
    for r in rows:
        assert 0.0 <= r["weekday_eta2"] <= 1.0
        assert r["strongly_seasonal"] == (r["weekday_eta2"] > 0.2)


def test_cold_start_rates_are_shares(spark):
    from bigdata_weather_system_spark.contract.recommend_ops import (
        recommender_cold_start_audit,
    )

    (row,) = _rows(recommender_cold_start_audit(spark, TEST_SF_DIR))
    assert row["n_test_pairs"] > 0
    assert 0 <= row["cold_part_pairs"] <= row["n_test_pairs"]
    assert 0 <= row["cold_cust_pairs"] <= row["n_test_pairs"]
    assert math.isclose(
        row["cold_part_rate"],
        row["cold_part_pairs"] / row["n_test_pairs"],
        abs_tol=2e-6,
    )


def test_burrows_delta_symmetry_and_positivity(spark):
    from bigdata_weather_system_spark.contract.llm_ops import (
        burrows_delta_sources,
    )

    rows = _rows(burrows_delta_sources(spark, TEST_SF_DIR))
    n_src = len({r["source_a"] for r in rows} | {r["source_b"] for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["burrows_delta"] >= 0
        assert 1 <= r["n_marker_tokens"] <= 20


def test_simpson_detector_slope_consistency(spark):
    import numpy as np
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        simpson_slope_reversal,
    )

    rows = _rows(simpson_slope_reversal(spark, TEST_SF_DIR))
    assert len({r["slope_global"] for r in rows}) == 1
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .selectExpr("event_type", "CAST(hour(ts) AS DOUBLE) AS x", "value AS y")
        .collect()
    )
    x = np.array([r.x for r in ev])
    y = np.array([r.y for r in ev])
    g = np.polyfit(x, y, 1)[0]
    assert math.isclose(rows[0]["slope_global"], g, rel_tol=1e-3, abs_tol=1e-5)
    for r in rows:
        assert r["sign_reversed"] == (
            (r["slope_type"] > 0) != (r["slope_global"] > 0)
        ) or abs(r["slope_type"]) < 1e-5


def test_kish_ess_bounds(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        kish_effective_sample_size,
    )

    rows = _rows(kish_effective_sample_size(spark, TEST_SF_DIR))
    for r in rows:
        assert 1.0 <= r["kish_ess"] <= r["n_rows"] + 0.01
        assert 0.0 < r["efficiency"] <= 1.0 + 1e-9
        assert r["weights_degenerate"] == (r["efficiency"] < 0.5)


def test_hurst_in_plausible_band_and_shared_per_type(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        hurst_rescaled_range,
    )

    rows = _rows(hurst_rescaled_range(spark, TEST_SF_DIR))
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for etype, rs in by_type.items():
        hs = {r["hurst_h"] for r in rs}
        assert len(hs) == 1  # one fitted slope per type
        h = hs.pop()
        # R/S estimates land in (0, 1.2) for any real series
        assert 0.0 < h < 1.2
        sizes = sorted(r["block_size"] for r in rs)
        assert sizes in ([32, 64], [32, 64, 128])
        # mean log(R/S) grows with block size
        srt = sorted(rs, key=lambda r: r["block_size"])
        vals = [r["mean_log_rs"] for r in srt]
        assert vals == sorted(vals)


def test_runs_test_matches_python_replay(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        runs_test_randomness,
    )

    got = {r["event_type"]: r for r in _rows(runs_test_randomness(spark, TEST_SF_DIR))}
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in ev:
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    for etype, pts in series.items():
        pts.sort(key=lambda p: (p[0], p[1]))
        ys = [v for _, _, v in pts]
        mean = sum(ys) / len(ys)
        signs = [1 if v > mean else 0 for v in ys]
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        n1 = sum(signs)
        n2 = len(signs) - n1
        g = got[etype]
        assert g["n_above"] == n1 and g["n_below"] == n2
        assert g["n_runs"] == runs
        mu = 2.0 * n1 * n2 / (n1 + n2) + 1
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
        )
        z = (runs - mu) / math.sqrt(var)
        assert math.isclose(g["z_stat"], z, rel_tol=1e-3, abs_tol=5e-4)


def test_srm_check_counts_partition_users(spark):
    from bigdata_weather_system_spark.contract.causal_stats_ext import (
        assignment_srm_check,
    )

    (row,) = _rows(assignment_srm_check(spark, TEST_SF_DIR))
    assert row["n_treated"] + row["n_control"] == row["n_users"]
    assert row["chi2_stat"] >= 0
    # a content-hashed 50/50 split must NOT trip the SRM alarm
    assert row["srm_detected"] is False


def test_halflife_consistent_with_adf_beta(spark):
    from bigdata_weather_system_spark.contract.cdc_ext import (
        adf_unit_root_per_type,
    )
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        mean_reversion_halflife,
    )

    hl = {r["event_type"]: r for r in _rows(mean_reversion_halflife(spark, TEST_SF_DIR))}
    adf = {r["event_type"]: r for r in _rows(adf_unit_root_per_type(spark, TEST_SF_DIR))}
    for t, r in hl.items():
        # identical regression as ADF: betas agree exactly
        assert math.isclose(r["ar_beta"], adf[t]["beta"], abs_tol=2e-6)
        if r["reverting"]:
            expect = -math.log(2) / math.log(1 + r["ar_beta"])
            assert math.isclose(r["halflife_steps"], expect, rel_tol=1e-3)
            assert r["halflife_steps"] > 0
        else:
            assert r["halflife_steps"] is None
