"""Distributed skyline: two-phase correctness against brute force."""

from __future__ import annotations

import random

from bigdata_weather_system_spark.operators.pareto import skyline


def test_skyline_matches_bruteforce_random(spark):
    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 20)), float(rng.randint(0, 20)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, a double, b double").repartition(8)
    got = {
        (r["id"], r["a"], r["b"])
        for r in skyline(df, max_cols=["a"], min_cols=["b"]).collect()
    }
    # brute force on (a max, b min): compare criteria tuples, keep ids
    def dominates(x, y):
        return x[1] >= y[1] and x[2] <= y[2] and (x[1] > y[1] or x[2] < y[2])

    want = {
        r for r in rows if not any(dominates(s, r) for s in rows if s is not r)
    }
    assert got == want


def test_skyline_keeps_exact_ties(spark):
    # two identical points neither dominates the other: both survive
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 5.0, 5.0), (3, 1.0, 9.0)],
        "id int, a double, b double",
    )
    got = {r["id"] for r in skyline(df, ["a"], ["b"]).collect()}
    assert got == {1, 2}
