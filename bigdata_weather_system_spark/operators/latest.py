"""Latest-per-key / dedup operators (window-rank family).

Capability parity with the reference's W1/W2 patterns
(``/root/reference/prediction/preprocessing/spark.py:256-267, 485-498``;
``/root/reference/prediction/preprocessing/getSample.py:128-136``): rank rows
inside each key partition by recency and keep the top row(s).

Scale notes:
- ``row_number`` + ``rn <= n`` is recognized by Spark 3.5+ as a
  window-group-limit (``WindowGroupLimitExec``) — partial top-n runs
  map-side before the shuffle, so the full partition never materializes.
- One shuffle on the partition keys; if the input is already bucketed /
  pre-partitioned by those keys, Catalyst reuses the distribution.
- Skewed keys are handled by AQE; for pathological single-key skew use
  ``max_by`` aggregation instead (no per-row ranking state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def top_n_per_key(
    df: DataFrame,
    partition_cols: Sequence[str | Column],
    order_cols: Sequence[Column],
    n: int = 1,
) -> DataFrame:
    """Keep the first ``n`` rows per key under the given ordering."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str] = ("location",),
    ts_col: str = "event_timestamp",
    tiebreak_cols: Sequence[str] = ("kafka_timestamp",),
) -> DataFrame:
    """Latest observation per key: order by event time desc, then tie-breaks."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    return top_n_per_key(df, list(key_cols), order)


def dedup_latest(
    df: DataFrame,
    key_cols: Sequence[str] = ("location", "event_timestamp"),
    order_col: str = "kafka_timestamp",
) -> DataFrame:
    """Drop duplicate (key, event-time) rows keeping the newest arrival."""
    return top_n_per_key(df, list(key_cols), [F.col(order_col).desc()])
