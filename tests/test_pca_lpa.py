"""Closed-form pins for the new iterative/statistical operators:
label propagation on a hand-traceable graph, power-iteration PCA on a
rank-1 cloud, and a DSIR sanity direction."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.graph import label_propagation
from bigdata_weather_system_spark.operators.pca import power_iteration_top_component
from tests.conftest import TEST_SF_DIR


def test_label_propagation_two_triangles_with_bridge(spark):
    # triangles {1,2,3} and {4,5,6} joined by bridge 3-4: after 3
    # deterministic rounds each triangle converges to one label
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src bigint, dst bigint",
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, rounds=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_pca_recovers_rank_one_direction(spark):
    base = [1.0, 2.0, 3.0]
    rows = [([c * t for c in base],) for t in (1.0, 2.0, 3.0, 4.0, 5.0)]
    emb = spark.createDataFrame(rows, "embedding array<double>")
    got = {
        r["dim_idx"]: (r["loading"], r["eigenvalue"])
        for r in power_iteration_top_component(emb, "embedding", 3, iterations=8).collect()
    }
    norm = sum(c * c for c in base) ** 0.5
    expect = [c / norm for c in base]
    for i, e in enumerate(expect):
        assert abs(got[i][0] - e) < 1e-3
    # eigenvalue = var(t) * ||base||^2 ; population var of 1..5 = 2
    assert abs(got[0][1] - 2.0 * norm**2) < 1e-2
    # exactly one eigenvalue reported, identical on every row
    assert len({v for _, v in got.values()}) == 1


def test_dsir_prefers_target_language(spark):
    from bigdata_weather_system_spark.contract.llm_ops import doc_dsir_selection

    rows = doc_dsir_selection(spark, TEST_SF_DIR).collect()
    en = [r["avg_log_ratio"] for r in rows if r["lang"] == "en"]
    other = [r["avg_log_ratio"] for r in rows if r["lang"] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
    assert sum(1 for r in rows if r["selected"]) == min(100, len(rows))


def test_pca_zero_variance_dimension_gets_zero_loading(spark):
    # dim 2 is constant -> its covariance row/col is 0 -> loading 0
    rows = [([float(t), float(2 * t), 7.0],) for t in range(1, 6)]
    emb = spark.createDataFrame(rows, "embedding array<double>")
    got = {
        r["dim_idx"]: r["loading"]
        for r in __import__(
            "bigdata_weather_system_spark.operators.pca", fromlist=["x"]
        ).power_iteration_top_component(emb, "embedding", 3, iterations=8).collect()
    }
    assert got[2] == 0.0
    norm = (1 + 4) ** 0.5
    assert abs(got[0] - 1 / norm) < 1e-3 and abs(got[1] - 2 / norm) < 1e-3


def test_label_propagation_empty_edges(spark):
    from bigdata_weather_system_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert label_propagation(edges, rounds=3).count() == 0
