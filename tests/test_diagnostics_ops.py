"""Semantic pins for the diagnostics wave: decomposition identities,
statistical invariants, and numpy cross-checks beyond the oracle parity
gate (which already value-matches every query against DuckDB)."""

from __future__ import annotations

import math

import numpy as np

from bigdata_weather_system_spark.contract.diagnostics_ops import (
    ams_f2_user_sketch,
    brier_score_decomposition,
    event_count_overdispersion,
    ljung_box_white_noise,
    price_elasticity_per_brand,
    purchase_rd_effect_at_50,
)
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_brier_murphy_identity_closes(spark):
    (row,) = _rows(brier_score_decomposition(spark, TEST_SF_DIR))
    assert row["decomposition_closes"] is True
    # the rounded components must also reconstruct the rounded score
    # to within the rounding tolerance
    recon = row["uncertainty"] + row["reliability"] - row["resolution"]
    assert abs(recon - row["brier_score"]) < 2e-6
    # proper-score sanity: all components non-negative, BS in [0, 1]
    assert 0.0 <= row["brier_score"] <= 1.0
    assert row["reliability"] >= 0.0
    assert row["resolution"] >= 0.0
    assert 0.0 <= row["uncertainty"] <= 0.25


def test_ljung_box_matches_numpy(spark):
    got = {r["event_type"]: r for r in _rows(ljung_box_white_noise(spark, TEST_SF_DIR))}
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
        rows.sort(key=lambda p: (p[0], p[1]))
        y = np.array([v for _, _, v in rows])
        d = y - y.mean()
        n = len(y)
        s0 = float(d @ d)
        q = 0.0
        for k in (1, 2, 3):
            rk = float(d[k:] @ d[:-k]) / s0
            q += rk * rk / (n - k)
        q *= n * (n + 2.0)
        assert got[etype]["n_obs"] == n
        assert math.isclose(got[etype]["lb_q3"], q, rel_tol=1e-3, abs_tol=5e-4)
        assert got[etype]["reject_white_noise_05"] == (q > 7.8147)


def test_overdispersion_matches_numpy(spark):
    got = {
        r["event_type"]: r
        for r in _rows(event_count_overdispersion(spark, TEST_SF_DIR))
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .selectExpr("event_type", "to_date(ts) AS day")
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r["count"])
    for etype, counts in by_type.items():
        c = np.array(counts, dtype=float)
        n = len(c)
        mean, var = c.mean(), c.var(ddof=1)
        disp = var / mean
        z = ((n - 1) * disp - (n - 1)) / math.sqrt(2.0 * (n - 1))
        assert got[etype]["n_days"] == n
        assert math.isclose(got[etype]["dispersion_index"], disp, rel_tol=1e-6)
        assert math.isclose(got[etype]["z_stat"], z, rel_tol=1e-3, abs_tol=5e-4)


def test_elasticity_matches_numpy_ols(spark):
    got = {
        r["p_brand"]: r for r in _rows(price_elasticity_per_brand(spark, TEST_SF_DIR))
    }
    li = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet")
    pt = spark.read.parquet(f"{TEST_SF_DIR}/part.parquet")
    obs = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .selectExpr(
            "p_brand",
            "ln(l_quantity) AS y",
            "ln(l_extendedprice / l_quantity) AS x",
        )
        .collect()
    )
    by_brand: dict = {}
    for r in obs:
        by_brand.setdefault(r.p_brand, []).append((r.x, r.y))
    for brand, pts in by_brand.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope = np.polyfit(x, y, 1)[0]
        assert got[brand]["n_lines"] == len(pts)
        assert math.isclose(got[brand]["elasticity"], slope, rel_tol=1e-4, abs_tol=1e-5)
        assert 0.0 <= got[brand]["r_squared"] <= 1.0


def test_rd_effect_is_intercept_gap(spark):
    (row,) = _rows(purchase_rd_effect_at_50(spark, TEST_SF_DIR))
    assert row["n_left"] > 0 and row["n_right"] > 0
    assert math.isclose(
        row["rd_effect"],
        row["alpha_right"] - row["alpha_left"],
        abs_tol=2e-6,
    )
    # linear-probability intercepts stay in a sane band around [0, 1]
    assert -0.5 <= row["alpha_left"] <= 1.5
    assert -0.5 <= row["alpha_right"] <= 1.5


def test_ams_sketch_brackets_exact_f2(spark):
    (row,) = _rows(ams_f2_user_sketch(spark, TEST_SF_DIR))
    assert row["within_bound"] is True
    assert row["exact_f2"] > 0
    assert row["ams_estimate"] > 0
    assert row["rel_error"] == round(
        abs(row["ams_estimate"] - row["exact_f2"]) / row["exact_f2"], 6
    ) or math.isclose(
        row["rel_error"],
        abs(row["ams_estimate"] - row["exact_f2"]) / row["exact_f2"],
        abs_tol=1e-5,
    )


def test_harmonic_centrality_matches_python_bfs(spark):
    from bigdata_weather_system_spark.contract.graph_ops import (
        part_harmonic_centrality,
    )
    from bigdata_weather_system_spark.operators.graph import (
        cooccurrence_edges,
    )

    got = {r["source"]: r for r in _rows(part_harmonic_centrality(spark, TEST_SF_DIR))}
    li = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey").collect()
    adj: dict = {}
    for e in edges:
        adj.setdefault(e.src, set()).add(e.dst)
        adj.setdefault(e.dst, set()).add(e.src)
    seeds = sorted(adj)[:5]
    for s in seeds:
        dist = {s: 0}
        frontier = {s}
        for hop in (1, 2, 3):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        nxt.add(v)
            for v in nxt:
                dist[v] = hop
            frontier = nxt
        n1 = sum(1 for d in dist.values() if d == 1)
        n2 = sum(1 for d in dist.values() if d == 2)
        n3 = sum(1 for d in dist.values() if d == 3)
        assert got[s]["n_1hop"] == n1
        assert got[s]["n_2hop"] == n2
        assert got[s]["n_3hop"] == n3
        assert math.isclose(
            got[s]["harmonic_c3"], n1 + n2 / 2.0 + n3 / 3.0, abs_tol=1e-6
        )


def test_rp_projection_recall_beats_floor(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        embedding_rp_projection_recall,
    )

    rows = _rows(embedding_rp_projection_recall(spark, TEST_SF_DIR))
    assert len(rows) == 20
    mean_recall = sum(r["recall_at_10"] for r in rows) / len(rows)
    # a 64->16 sign projection must do clearly better than chance
    # (10/499 ~ 0.02); this floor fails loudly if the projection or the
    # ranking plumbing breaks
    assert mean_recall > 0.15
    for r in rows:
        assert 0 <= r["n_common"] <= 10


def test_trend_test_matches_numpy(spark):
    from bigdata_weather_system_spark.contract.diagnostics_ops import (
        purchase_rate_trend_test,
    )

    (row,) = _rows(purchase_rate_trend_test(spark, TEST_SF_DIR))
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("value IS NOT NULL")
        .selectExpr(
            "GREATEST(LEAST(CAST(floor(value / 10) AS INT), 9), 0) AS b",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r",
        )
        .collect()
    )
    import collections

    nb = collections.Counter()
    rb = collections.Counter()
    for x in ev:
        nb[x.b] += 1
        rb[x.b] += x.r
    n = sum(nb.values())
    rr = sum(rb.values())
    sx = sum(c * b for b, c in nb.items())
    sxx = sum(c * b * b for b, c in nb.items())
    srx = sum(c * b for b, c in rb.items())
    t = srx - rr * sx / n
    var = (rr / n) * (1 - rr / n) * (sxx - sx * sx / n)
    z = t / math.sqrt(var)
    assert row["n_total"] == n
    assert row["n_purchases"] == rr
    assert math.isclose(row["z_stat"], z, rel_tol=1e-3, abs_tol=5e-4)


def test_ivm_retraction_equals_direct_recompute(spark):
    """The maintained view must equal a from-scratch recompute built in
    Spark itself (independent of the DuckDB oracle)."""
    from bigdata_weather_system_spark.contract.cdc_ext import (
        cdc_apply_user_state,
        incremental_agg_retraction,
    )
    import pyspark.sql.functions as F

    maintained = {
        r["event_type"]: r
        for r in _rows(incremental_agg_retraction(spark, TEST_SF_DIR))
    }
    merged = cdc_apply_user_state(spark, TEST_SF_DIR)
    recomputed = {
        r["event_type"]: r
        for r in _rows(
            merged.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n_users"),
                F.round(
                    F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 4
                ).alias("sum_value"),
            )
        )
    }
    assert set(maintained) == set(recomputed)
    for t in maintained:
        assert maintained[t]["n_users"] == recomputed[t]["n_users"]
        assert math.isclose(
            maintained[t]["sum_value"],
            recomputed[t]["sum_value"],
            abs_tol=1e-3,
        )


def test_cube_advisor_lattice_invariants(spark):
    from bigdata_weather_system_spark.contract.warehouse_ops import (
        cube_materialization_advisor,
    )

    rows = _rows(cube_materialization_advisor(spark, TEST_SF_DIR))
    assert len(rows) == 8
    by_dims = {r["dims"]: r for r in rows}
    # apex and base groupings exist
    assert by_dims["---"]["n_groups"] == 1
    base = by_dims["twv"]
    assert base["storage_saving"] == 0 and base["benefit_score"] == 0
    # monotone: a grouping can never have more groups than a supergroup
    assert by_dims["t--"]["n_groups"] <= base["n_groups"]
    assert by_dims["-w-"]["n_groups"] == 7  # dayofweek domain
    # answerable counts follow 2^|dims|
    for r in rows:
        k = sum(1 for c in r["dims"] if c != "-")
        assert r["n_answerable"] == 2**k
    # greedy_rank is a permutation of 1..8 ordered by benefit
    ranks = sorted(r["greedy_rank"] for r in rows)
    assert ranks == list(range(1, 9))
    ordered = sorted(rows, key=lambda r: r["greedy_rank"])
    scores = [r["benefit_score"] for r in ordered]
    assert scores == sorted(scores, reverse=True)


def test_theta_a_not_b_tracks_exact_difference(spark):
    from bigdata_weather_system_spark.contract.sketch_ops import (
        theta_sketch_a_not_b,
    )

    (row,) = _rows(theta_sketch_a_not_b(spark, TEST_SF_DIR))
    assert row["n_anotb_exact"] >= 0
    assert row["n_anotb_est"] >= 0
    assert row["within_50pct"] is True
    # difference can never exceed the A-side cardinality
    assert row["n_anotb_exact"] <= row["n_click_exact"]
