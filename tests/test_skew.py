"""Salted aggregation/join must be result-identical to the plain forms."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from bigdata_weather_system_spark.operators.skew import (
    deterministic_salt,
    salted_aggregate,
    salted_join,
)


def test_salted_aggregate_matches_plain_groupby(spark):
    df = spark.createDataFrame(
        [Row(k="hot" if i % 10 else "cold", i=i, v=float(i)) for i in range(1000)]
    )
    plain = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 6).alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n_rows, round(r.sum_v, 6), r.min_v, r.max_v)
        for r in salted_aggregate(
            df,
            key_cols=["k"],
            salt_source_col="i",
            n_salts=8,
            sum_cols=["v"],
            min_cols=["v"],
            max_cols=["v"],
        )
        .collect()
    }
    assert salted == plain


def test_salt_is_deterministic_and_in_range(spark):
    df = spark.createDataFrame([Row(i=i) for i in range(500)])
    a = df.select(deterministic_salt("i", 16).alias("s")).collect()
    b = df.select(deterministic_salt("i", 16).alias("s")).collect()
    assert [r.s for r in a] == [r.s for r in b]
    assert all(0 <= r.s < 16 for r in a)
    assert len({r.s for r in a}) == 16  # all salt values actually used


def test_salted_join_matches_plain_join(spark):
    probe = spark.createDataFrame(
        [Row(k="hot" if i % 5 else f"k{i}", i=i) for i in range(400)]
    )
    build = spark.createDataFrame(
        [Row(k="hot", tag="H")] + [Row(k=f"k{i}", tag=f"T{i}") for i in range(0, 400, 5)]
    )
    plain = sorted(
        (r.k, r.i, r.tag) for r in probe.join(build, on="k", how="inner").collect()
    )
    salted = sorted(
        (r.k, r.i, r.tag)
        for r in salted_join(
            probe, build, on=["k"], salt_source_col="i", n_salts=8
        ).collect()
    )
    assert salted == plain


def test_salted_join_rejects_build_preserving_types(spark):
    import pytest

    from bigdata_weather_system_spark.operators.skew import (
        salted_aggregate,
        salted_join,
    )

    probe = spark.createDataFrame([("a", 1)], "k string, i long")
    build = spark.createDataFrame([("a",)], "k string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="not salt-safe"):
            salted_join(probe, build, on=["k"], salt_source_col="i", how=how)
    # left join stays legal and build-replication-free in its output
    out = salted_join(probe, build, on=["k"], salt_source_col="i", how="left")
    assert out.count() == 1
    with pytest.raises(ValueError, match="no aggregates"):
        salted_aggregate(probe, ["k"], "i", count=False)
