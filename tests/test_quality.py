"""Constraint-checker tests: metric math on a frame with known defects,
single-pass plan shape."""

from __future__ import annotations

from bigdata_weather_system_spark.operators.quality import (
    Constraint,
    check_constraints,
    completeness,
    in_range_fraction,
    in_set_fraction,
    row_count,
    uniqueness,
)


def _report(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (2, "b", None),     # dup id + null value
        (3, "zzz", 999.0),  # out-of-domain label, out-of-range value
    ]
    df = spark.createDataFrame(rows, "id long, label string, v double")
    checks = [
        Constraint("id_unique", uniqueness("id"), 1.0),
        Constraint("v_complete", completeness("v"), 0.9),
        Constraint("label_domain", in_set_fraction("label", ("a", "b")), 1.0),
        Constraint("v_range", in_range_fraction("v", 0, 100), 0.99),
        Constraint("n_rows", row_count(), 3.0),
    ]
    return df, checks, {
        r.constraint: r for r in check_constraints(df, checks).collect()
    }


def test_check_constraints_metrics_and_verdicts(spark):
    _, _, rep = _report(spark)
    assert rep["id_unique"].metric == 0.75 and not rep["id_unique"].passed
    assert rep["v_complete"].metric == 0.75 and not rep["v_complete"].passed
    assert rep["label_domain"].metric == 0.75
    assert not rep["label_domain"].passed
    # v_range averages over non-null values: 2 of 3 in [0, 100]
    assert round(rep["v_range"].metric, 6) == round(2 / 3, 6)
    assert rep["n_rows"].metric == 4.0 and rep["n_rows"].passed


def test_check_constraints_single_aggregation_pass(spark):
    df, checks, _ = _report(spark)
    plan = (
        check_constraints(df, checks)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # every metric folds into ONE Aggregate node over the data
    assert plan.count("Aggregate") == 1
