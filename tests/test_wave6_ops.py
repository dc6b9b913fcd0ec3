"""Semantic tests for wave 6: theta-sketch estimator invariants vs an
independent Python KMV recompute, z-order pruning dominance properties,
and the Markov stationary distribution vs numpy power iteration."""

from __future__ import annotations

import hashlib

import numpy as np

from bigdata_weather_system_spark.contract import cleaning_ops, sketch_ops
from bigdata_weather_system_spark.contract.layout_ops import (
    zorder_pruning_benefit,
)
from tests.conftest import TEST_SF_DIR


def _rows(df):
    return [r.asDict() for r in df.collect()]


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_theta_sketch_matches_python_kmv(spark):
    got = _rows(
        sketch_ops.theta_sketch_user_overlap(spark, TEST_SF_DIR)
    )[0]
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .filter("event_type IN ('click','purchase')")
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    sets: dict = {"click": set(), "purchase": set()}
    for r in ev:
        sets[r.event_type].add(r.user_id)
    two60 = float(1 << 60)

    def kmv(users, k=64):
        hs = sorted({_h60(u) for u in users})
        if len(hs) >= k:
            theta = hs[k - 1] * 1.0 / two60
            return set(hs[:k]), theta, (k - 1) / theta
        return set(hs), 1.0, float(len(hs))

    sa, ta, ea = kmv(sets["click"])
    sb, tb, eb = kmv(sets["purchase"])
    assert got["n_click_exact"] == len(sets["click"])
    assert got["n_purchase_exact"] == len(sets["purchase"])
    assert abs(got["n_click_est"] - ea) < 1e-3
    assert abs(got["n_purchase_est"] - eb) < 1e-3
    t_ab = min(ta, tb)
    c = sum(1 for h in sa & sb if h * 1.0 / two60 < t_ab)
    assert abs(got["n_overlap_est"] - c / t_ab) < 1e-3
    exact_i = len(sets["click"] & sets["purchase"])
    assert got["n_overlap_exact"] == exact_i


def test_zorder_pruning_dominance(spark):
    rows = {r["layout"]: r for r in _rows(
        zorder_pruning_benefit(spark, TEST_SF_DIR)
    )}
    assert set(rows) == {"natural", "partkey_sorted", "zorder_part_supp"}
    nat, srt, z = (
        rows["natural"], rows["partkey_sorted"], rows["zorder_part_supp"]
    )
    # All layouts produce the same file count (same rows, same file size).
    assert nat["total_files"] == srt["total_files"] == z["total_files"]
    # The single-key sort is optimal on its own dimension...
    assert srt["partkey_files_touched"] <= z["partkey_files_touched"]
    # ...and no better than arrival order on the other.
    assert srt["suppkey_files_touched"] >= z["suppkey_files_touched"]
    # Z-order must beat arrival order on BOTH dimensions.
    assert z["partkey_files_touched"] < nat["partkey_files_touched"]
    assert z["suppkey_files_touched"] < nat["suppkey_files_touched"]
    for r in rows.values():
        assert 0 <= r["partkey_pruning_ratio"] <= 1
        assert 0 <= r["suppkey_pruning_ratio"] <= 1


def test_markov_stationary_matches_numpy(spark):
    got = {
        r["event_type"]: r["stationary_prob"]
        for r in _rows(
            cleaning_ops.markov_stationary_distribution(spark, TEST_SF_DIR)
        )
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type)
        )
    counts: dict = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    states = sorted({a for a, _ in counts})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (a, b), n in counts.items():
        if b in idx:
            P[idx[a], idx[b]] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(8):
        pi = pi @ P
    for s, i in idx.items():
        assert abs(got[s] - pi[i]) < 1e-5, s
    assert abs(sum(got.values()) - pi.sum()) < 1e-4


def test_markov_removal_attribution_matches_numpy(spark):
    from bigdata_weather_system_spark.contract.attribution_ops import (
        _CHANNELS,
        markov_removal_attribution,
    )

    got = {
        r["channel"]: r.asDict()
        for r in markov_removal_attribution(spark, TEST_SF_DIR).collect()
    }
    ev = (
        spark.read.parquet(f"{TEST_SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type)
        )
    states = sorted(["START", "CONV", "DROP"] + _CHANNELS)
    idx = {s: i for i, s in enumerate(states)}
    counts = np.zeros((len(states), len(states)))
    for seq in by_user.values():
        seq.sort()
        conv = next((t for t, _, e in seq if e == "purchase"), None)
        path = ["START"] + [
            e for t, _, e in seq if e in _CHANNELS and (conv is None or t < conv)
        ] + (["CONV"] if conv is not None else ["DROP"])
        for a, b in zip(path, path[1:]):
            counts[idx[a], idx[b]] += 1
    counts[idx["CONV"], idx["CONV"]] = 1
    counts[idx["DROP"], idx["DROP"]] = 1

    def absorption(c):
        m = counts.copy()
        if c is not None:
            # unmerged redirect: all mass into c goes to DROP
            m[:, idx["DROP"]] += m[:, idx[c]]
            m[:, idx[c]] = 0
            m[idx[c], :] = 0
        P = np.divide(
            m, m.sum(axis=1, keepdims=True),
            out=np.zeros_like(m), where=m.sum(axis=1, keepdims=True) > 0,
        )
        v = np.zeros(len(states))
        v[idx["START"]] = 1.0
        for _ in range(12):
            v = v @ P
        return v[idx["CONV"]]

    p_full = absorption(None)
    effects = {c: 1.0 - absorption(c) / p_full for c in _CHANNELS}
    tot = sum(effects[c] for c in sorted(_CHANNELS))
    for c in _CHANNELS:
        assert abs(got[c]["p_conv_full"] - p_full) < 1e-5, c
        assert abs(got[c]["removal_effect"] - effects[c]) < 1e-5, c
        assert abs(got[c]["attribution_share"] - effects[c] / tot) < 1e-4
    # removal of a channel can only hurt or not help conversion
    for c in _CHANNELS:
        assert got[c]["removal_effect"] >= -1e-9
