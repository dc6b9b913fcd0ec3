"""Survivorship merge, FK audit, and closed-form CUSUM semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.cleaning import survivorship_merge
from bigdata_weather_system_spark.operators.quality import fk_orphan_audit
from bigdata_weather_system_spark.operators.temporal import cusum_flags


def test_survivorship_rules(spark):
    df = spark.createDataFrame(
        [
            # key 1: newest row (seq 3) has NULL name → back-fill from seq 2
            (1, 1, "ann", 10.0),
            (1, 2, "anne", 20.0),
            (1, 3, None, 5.0),
            (2, 1, "bob", 7.0),
        ],
        "k int, seq int, name string, amt double",
    )
    df = df.withColumn("first_seq", F.col("seq")).withColumn(
        "total", F.col("amt")
    )
    out = {
        r["k"]: r.asDict()
        for r in survivorship_merge(
            df,
            ["k"],
            "seq",
            {
                "name": "latest_non_null",
                "amt": "latest_non_null",
                "first_seq": "earliest",
                "total": "sum",
            },
        ).collect()
    }
    assert out[1]["name"] == "anne"      # null on newest → previous survives
    assert out[1]["amt"] == 5.0           # non-null on newest → newest wins
    assert out[1]["first_seq"] == 1
    assert out[1]["total"] == pytest.approx(35.0)
    assert out[2]["name"] == "bob"


def test_survivorship_unknown_rule_raises(spark):
    df = spark.createDataFrame([(1, 1, "x")], "k int, seq int, v string")
    with pytest.raises(ValueError, match="unknown rule"):
        survivorship_merge(df, ["k"], "seq", {"v": "mode"})


def test_fk_orphan_audit_counts_orphans_not_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rows = fk_orphan_audit(
        [("child->parent", child, "fk", parent, "pk")]
    ).collect()
    assert rows[0]["relation"] == "child->parent"
    assert rows[0]["n_child_rows"] == 4   # total rows, NULL keys included
    assert rows[0]["n_orphans"] == 1      # only 99 — NULL key is not an orphan


def test_cusum_closed_form_matches_recurrence(spark):
    # hand-run the textbook recurrence on a fixed series and compare
    vals = [1.0, 1.0, 1.0, 1.0, 5.0, 5.0, 1.0, 1.0]
    n = len(vals)
    mu = sum(vals) / n
    var = sum((v - mu) ** 2 for v in vals) / (n - 1)
    sigma = var ** 0.5
    slack, thresh = 0.5, 1.0
    s, expected = 0.0, []
    for v in vals:
        s = max(0.0, s + (v - mu - slack * sigma))
        expected.append(s)
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)],
        "k int, t int, x double",
    )
    out = (
        cusum_flags(df, ["k"], "t", "x", slack_sigmas=slack,
                    threshold_sigmas=thresh)
        .orderBy("t")
        .collect()
    )
    for row, exp in zip(out, expected):
        assert row["cusum"] == pytest.approx(exp, abs=1e-6)
    # the spike region must flag under the 1-sigma threshold
    assert any(r["cusum_flag"] for r in out)
    # constant series never flags
    const = spark.createDataFrame(
        [(1, i, 3.0) for i in range(5)], "k int, t int, x double"
    )
    cout = cusum_flags(const, ["k"], "t", "x").collect()
    assert not any(r["cusum_flag"] for r in cout)
