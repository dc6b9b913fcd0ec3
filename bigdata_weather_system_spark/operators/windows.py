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
        frames → #partitions frames on the bench data, same output).

        The stack is CARRIED ACROSS Arrow batches instead of
        pd.concat-ing the whole partition into one frame: between
        batches only the UNRESOLVED rows (a non-increasing value run of
        the current key) are held, so a skewed key at 100 TB costs
        worst-case the run length, never the partition (guide §5).
        Each row is still pushed/popped at most once — O(rows)
        amortized. Resolved rows stream out per batch; row ORDER within
        the partition output differs from input order, which the
        relational result does not observe."""
        import numpy as np
        import pandas as pd

        s_ids: list = []   # unresolved rows: id
        s_vals: list = []  # unresolved rows: value (non-increasing run)
        s_pos: list = []   # unresolved rows: ordinal within key segment
        seg_key = None
        pos = 0            # next ordinal within the current key segment

        def frame(o):
            return pd.DataFrame(
                {
                    id_col: np.asarray(o[0], dtype=np.int64),
                    key_col: np.asarray(o[1], dtype=np.int64),
                    value_col: np.asarray(o[2], dtype=float),
                    "next_id": np.asarray(o[3], dtype=np.int64),
                    "steps_ahead": np.asarray(o[4], dtype=np.int64),
                }
            )

        for pdf in it:
            if not len(pdf):
                continue
            vals = pdf[value_col].to_numpy(dtype=float)
            ids = pdf[id_col].to_numpy()
            keys = pdf[key_col].to_numpy()
            o = ([], [], [], [], [])  # ids, keys, vals, next_id, steps
            for j in range(len(pdf)):
                kj = keys[j]
                if kj != seg_key:
                    # key boundary: lookahead never crosses keys — the
                    # remaining run has no next-greater
                    while s_ids:
                        o[0].append(s_ids.pop())
                        o[1].append(seg_key)
                        o[2].append(s_vals.pop())
                        o[3].append(-1)
                        o[4].append(-1)
                    s_pos.clear()
                    seg_key = kj
                    pos = 0
                vj = vals[j]
                while s_vals and s_vals[-1] < vj:
                    o[0].append(s_ids.pop())
                    o[1].append(kj)
                    o[2].append(s_vals.pop())
                    o[3].append(ids[j])
                    o[4].append(pos - s_pos.pop())
                s_ids.append(ids[j])
                s_vals.append(vj)
                s_pos.append(pos)
                pos += 1
            if o[0]:
                yield frame(o)
        if s_ids:
            # end of partition: the final run has no next-greater
            n_left = len(s_ids)
            yield frame(
                (
                    s_ids,
                    [seg_key] * n_left,
                    s_vals,
                    [-1] * n_left,
                    [-1] * n_left,
                )
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
