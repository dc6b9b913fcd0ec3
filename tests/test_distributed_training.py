"""U6 distributed trainers: exact-merge identity vs single-node numpy.

The whole point of the sufficient-statistics design is that the
distributed estimate is the SAME ESTIMATOR as a single-node solve — not
an approximation whose quality depends on sharding. These tests pin that
identity tightly (1e-8 ridge, 1e-6 logistic after the same number of
IRLS iterations) on a multi-partition DataFrame, plus the contract's
recovery floors on the synthetic testdata target.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_weather_system_spark.operators.training import (
    logistic_train_distributed,
    predict_linear,
    ridge_train_distributed,
)


def _toy(spark, n=400, seed=7, parts=8):
    rng = np.random.RandomState(seed)
    x = rng.standard_normal((n, 3))
    y = x @ np.array([1.5, -2.0, 0.75]) + 0.3 + 0.2 * rng.standard_normal(n)
    rows = [
        (float(a), float(b), float(c), float(t))
        for (a, b, c), t in zip(x, y)
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y double")
    return df.repartition(parts), x, y


def _numpy_ridge(x, y, reg=0.0, add_intercept=True):
    if add_intercept:
        x = np.hstack([x, np.ones((x.shape[0], 1))])
    p = x.shape[1]
    lam = reg * np.eye(p)
    if add_intercept:
        lam[-1, -1] = 0.0
    return np.linalg.solve(x.T @ x + lam, x.T @ y)


def _numpy_irls(x, y, iterations=4, reg=1e-6, add_intercept=True):
    if add_intercept:
        x = np.hstack([x, np.ones((x.shape[0], 1))])
    p = x.shape[1]
    beta = np.zeros(p)
    lam = reg * np.eye(p)
    if add_intercept:
        lam[-1, -1] = 0.0
    for _ in range(iterations):
        eta = x @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = np.clip(mu * (1.0 - mu), 1e-10, None)
        z = eta + (y - mu) / w
        xw = x * w[:, None]
        beta = np.linalg.solve(xw.T @ x + lam, xw.T @ z)
    return beta


def test_ridge_exact_merge_matches_numpy(spark):
    df, x, y = _toy(spark)
    for reg in (0.0, 0.5):
        beta = ridge_train_distributed(df, ["f1", "f2", "f3"], "y", reg=reg)
        expect = _numpy_ridge(x, y, reg=reg)
        np.testing.assert_allclose(beta, expect, atol=1e-8)


def test_ridge_merge_is_sharding_invariant(spark):
    # The estimator must not depend on HOW the data is partitioned —
    # 1 shard and 16 shards agree to float-reassociation precision.
    df, x, y = _toy(spark)
    b1 = ridge_train_distributed(
        df.coalesce(1), ["f1", "f2", "f3"], "y", reg=0.0
    )
    b16 = ridge_train_distributed(
        df.repartition(16), ["f1", "f2", "f3"], "y", reg=0.0
    )
    np.testing.assert_allclose(b1, b16, atol=1e-9)


def test_logistic_irls_matches_numpy(spark):
    rng = np.random.RandomState(11)
    x = rng.standard_normal((500, 2))
    y = ((x @ np.array([2.0, -1.0]) + 0.25
          + 0.3 * rng.standard_normal(500)) > 0).astype(np.float64)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(x, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, y double")
    beta = logistic_train_distributed(
        df.repartition(8), ["f1", "f2"], "y", iterations=4
    )
    expect = _numpy_irls(x, y, iterations=4)
    np.testing.assert_allclose(beta, expect, atol=1e-6)
    # directions recovered
    assert beta[0] > 0 and beta[1] < 0


def test_predict_linear_is_in_plan_expression(spark):
    df, x, y = _toy(spark, n=50)
    beta = ridge_train_distributed(df, ["f1", "f2", "f3"], "y", reg=0.0)
    out = df.select(predict_linear(df, ["f1", "f2", "f3"], beta).alias("p"))
    # no Python stages: the prediction is a literal linear expression
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    got = np.sort(np.array([r["p"] for r in out.collect()]))
    xh = np.hstack([x[:50], np.ones((50, 1))])
    np.testing.assert_allclose(got, np.sort(xh @ beta), atol=1e-9)


def test_contract_queries_floors_hold_at_test_scale(spark):
    from bigdata_weather_system_spark.contract import QUERIES

    for name in ("distributed_linear_train", "distributed_logistic_train"):
        row = QUERIES[name](spark, "/root/testdata/sf0.001").collect()[0]
        flags = {k: v for k, v in row.asDict().items() if isinstance(v, bool)}
        assert all(flags.values()), (name, flags)


def test_online_linear_train_equals_batch_estimator(spark, tmp_path):
    """Streaming twin (U6 x T): after micro-batch N the banked-statistics
    model must EQUAL the batch ridge on every row seen so far — exact
    incremental learning by additivity, not a decay heuristic. Driven 3
    batches deep through a file-source stream (maxFilesPerTrigger=1)."""
    import json
    import os

    from bigdata_weather_system_spark.streaming.pipeline import (
        start_online_linear_train,
    )

    rng = np.random.RandomState(5)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    all_rows = []
    for b in range(3):
        x = rng.standard_normal((60, 2))
        y = x @ np.array([1.0, -0.5]) + 0.2 + 0.1 * rng.standard_normal(60)
        rows = [
            {"f1": float(a), "f2": float(c), "y": float(t)}
            for (a, c), t in zip(x, y)
        ]
        all_rows.extend(rows)
        with open(in_dir / f"b{b}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("f1 double, f2 double, y double")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )
    q = start_online_linear_train(
        stream,
        stats_path=str(tmp_path / "stats"),
        model_path=str(tmp_path / "model"),
        checkpoint_path=str(tmp_path / "ckpt"),
        feature_cols=["f1", "f2"],
        label_col="y",
        reg=0.25,
    )
    try:
        deadline = 120
        import time as _t

        t0 = _t.time()
        while _t.time() - t0 < deadline:
            if (
                os.path.exists(str(tmp_path / "model"))
                and spark.read.parquet(str(tmp_path / "model")).count() >= 3
            ):
                break
            q.processAllAvailable()
    finally:
        q.stop()
    models = {
        r["batch_id"]: r
        for r in spark.read.parquet(str(tmp_path / "model")).collect()
    }
    assert len(models) == 3
    # every refresh is an exact prefix estimator: n_rows are cumulative
    ns = sorted(r["n_rows"] for r in models.values())
    assert ns == [60, 120, 180]
    # the final model equals the batch estimator on the union
    df = spark.createDataFrame(all_rows)
    expect = ridge_train_distributed(df, ["f1", "f2"], "y", reg=0.25)
    final = max(models.values(), key=lambda r: r["n_rows"])
    np.testing.assert_allclose(
        np.array(final["coefficients"]), expect, atol=1e-8
    )
