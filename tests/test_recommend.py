"""ALS matrix factorization: exact agreement with a numpy reference
implementation (same init, same solve order), determinism, and RMSE
improvement."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_weather_system_spark.operators.recommend import (
    _hash_factors,
    als_rmse,
    als_train,
)


def _reference_als(ratings, init_item_f, k, iters, reg):
    """Pure-numpy ALS with the exact conventions of the distributed
    operator: partner-id-sorted accumulation, ridge normal equations."""
    users = sorted({u for u, _, _ in ratings})
    items = sorted({i for _, i, _ in ratings})
    vf = {i: np.array(init_item_f[i], dtype=np.float64) for i in items}
    uf = {}
    by_user = {
        u: sorted((i, r) for uu, i, r in ratings if uu == u) for u in users
    }
    by_item = {
        i: sorted((u, r) for u, ii, r in ratings if ii == i) for i in items
    }
    for _ in range(iters):
        for u in users:
            A = np.vstack([vf[i] for i, _ in by_user[u]])
            r = np.array([r for _, r in by_user[u]])
            uf[u] = np.linalg.solve(A.T @ A + reg * np.eye(k), A.T @ r)
        for i in items:
            A = np.vstack([uf[u] for u, _ in by_item[i]])
            r = np.array([r for _, r in by_item[i]])
            vf[i] = np.linalg.solve(A.T @ A + reg * np.eye(k), A.T @ r)
    return uf, vf


def test_als_matches_numpy_reference_exactly(spark):
    rows = [
        (u, i, float(1 + (u * 3 + i * 7) % 5))
        for u in range(1, 7)
        for i in range(1, 6)
        if (u + i) % 2 == 0
    ]
    df = spark.createDataFrame(rows, "user_id long, item_id long, rating double")
    k, reg = 3, 0.1
    init = {
        r.item_id: list(r.factors)
        for r in _hash_factors(
            df.select("item_id").distinct(), "item_id", k, seed=7
        ).collect()
    }
    uf, vf = als_train(df, "user_id", "item_id", "rating", k=k, iterations=2, reg=reg)
    ref_u, ref_v = _reference_als(rows, init, k, 2, reg)
    got_u = {r.user_id: np.array(r.factors) for r in uf.collect()}
    got_v = {r.item_id: np.array(r.factors) for r in vf.collect()}
    assert set(got_u) == set(ref_u) and set(got_v) == set(ref_v)
    for u in ref_u:
        np.testing.assert_array_equal(got_u[u], ref_u[u])
    for i in ref_v:
        np.testing.assert_array_equal(got_v[i], ref_v[i])


def test_als_rmse_decreases_and_fits(spark):
    rows = [
        (u, i, float(((u % 3) + 1) * ((i % 2) + 1)))
        for u in range(1, 13)
        for i in range(1, 9)
        if (u * i) % 3 != 0
    ]
    df = spark.createDataFrame(rows, "user_id long, item_id long, rating double")
    u1, v1 = als_train(df, "user_id", "item_id", "rating", k=4, iterations=1)
    u2, v2 = als_train(df, "user_id", "item_id", "rating", k=4, iterations=2)
    r1 = als_rmse(df, u1, v1, "user_id", "item_id", "rating").head().rmse
    r2 = als_rmse(df, u2, v2, "user_id", "item_id", "rating").head().rmse
    # plain RMSE may jitter by the regularization share once converged —
    # the monotone quantity is the regularized objective; below 1e-3 both
    # rounds have effectively zero error and the comparison is noise
    assert r2 <= max(r1 * 1.05 + 1e-6, 1e-3)
    # the rank-4 factorization should essentially nail this rank-2 matrix
    assert r2 < 0.5
