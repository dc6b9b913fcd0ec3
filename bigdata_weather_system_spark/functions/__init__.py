"""Scalar column helpers (SURVEY §2.8 / §2.10 U3, U5).

Everything here is pure column math — the reference computes several of
these driver-side in Python (cyclic time features ``spark.py:48-71``, unit
conversions ``weather_utils.py:10-26``, NaN fill ``spark.py:1420-1441``);
in-plan column expressions are the idiomatic Spark placement.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

TWO_PI = 2.0 * math.pi


def seconds_of_day(ts: Column) -> Column:
    return (
        F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)
    ).cast("double")


def cyclic_time_features(ts: Column) -> dict[str, Column]:
    """sin/cos encodings of time-of-day (U3 parity, in-plan)."""
    frac = seconds_of_day(ts) / 86400.0
    return {
        "tod_sin": F.sin(F.lit(TWO_PI) * frac),
        "tod_cos": F.cos(F.lit(TWO_PI) * frac),
    }


def with_cyclic_time_features(df: DataFrame, ts_col: str = "event_timestamp") -> DataFrame:
    return df.withColumns(cyclic_time_features(F.col(ts_col)))


def celsius_to_fahrenheit(c: Column) -> Column:
    return c * 9.0 / 5.0 + 32.0


def celsius_to_kelvin(c: Column) -> Column:
    return c + 273.15


def forward_fill(
    df: DataFrame,
    cols: list[str],
    partition_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Forward-fill nulls within each key's time order (U5 parity —
    ``F.last(ignorenulls)`` over an unbounded-preceding frame; one window
    pass covers all columns)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns(
        {c: F.last(F.col(c), ignorenulls=True).over(w) for c in cols}
    )


def backward_fill(
    df: DataFrame,
    cols: list[str],
    partition_cols: list[str],
    order_col: str,
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return df.withColumns(
        {c: F.first(F.col(c), ignorenulls=True).over(w) for c in cols}
    )
