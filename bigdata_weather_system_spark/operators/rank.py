"""Scalable global ranking and sorted-neighborhood blocking.

A global ``row_number() OVER (ORDER BY ...)`` puts the whole relation in
ONE window partition — the classic scale cliff. The distributed fix is
the two-pass pattern every MPP engine uses:

1. range-partition by the sort key (Spark's range partitioner samples
   boundaries), rank WITHIN each partition (parallel windows keyed by
   partition id);
2. count rows per partition, prefix-sum those counts on the driver-sized
   partition list, and add each partition's offset back via a broadcast
   join.

Total order holds because range partitioning puts every row of partition
i before every row of partition i+1 under the sort key.

Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95) rides on
top: candidate record pairs are those within a fixed window of each
other in the global sort order — the OTHER classic ER blocking strategy
(hash blocks catch same-block typos; the sorted window catches
near-miss keys that hash apart). Pair generation bucketizes ranks so it
is a plain equi-join, never a cross join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based global row number under a TOTAL order (pass unique
    tiebreaks in ``order_cols``), without a single-partition window."""
    order_cols = list(order_cols)
    rp = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    # Pinned (eager localCheckpoint): both the per-partition counts and
    # the local-rank window below re-read this relation, and correctness
    # requires the two reads to see IDENTICAL partition ids — the range
    # exchange draws SAMPLED bounds, so an unpinned re-evaluation (AQE
    # declining exchange reuse) could shift a boundary between the two
    # reads and silently corrupt every downstream rank (the same hazard
    # round-4 ADVICE #3 flagged for the quantile histogram). Keys here
    # are arbitrary (strings, multi-column), so the deterministic
    # monotone-bucket rewrite used by lineitem_column_stats does not
    # apply — materialization is the remedy.
    with_pid = rp.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    # per-partition counts → cumulative offsets; the partition list is
    # driver-sized (one row per partition), the exclusive prefix sum is a
    # window over that tiny relation
    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    wlocal = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("_lrn", F.row_number().over(wlocal))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def sorted_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    key_cols: Sequence[Column],
    window: int = 4,
) -> DataFrame:
    """Candidate pairs (id_a < id_b by sort order) whose global
    sort-order ranks differ by < ``window``. Ranks bucketize to
    ``rank // window``, and a pair within the window spans at most two
    adjacent buckets — so generation is two equi-joins on (bucket) and
    (bucket+1) with a rank-difference filter, never a cross join."""
    ranked = global_rank(df, key_cols, out_col="_r").select(
        F.col(id_col).alias("_id"), "_r"
    )
    b = ranked.withColumn("_b", (F.col("_r") / window).cast("long"))
    left = b.select(
        F.col("_id").alias("id_a"), F.col("_r").alias("ra"), F.col("_b").alias("ba")
    )
    right = b.select(
        F.col("_id").alias("id_b"), F.col("_r").alias("rb"), F.col("_b").alias("bb")
    )
    same = left.join(right, F.col("ba") == F.col("bb"))
    nxt = left.join(right, F.col("ba") + 1 == F.col("bb"))
    return (
        same.unionByName(nxt)
        .filter(
            (F.col("rb") > F.col("ra"))
            & (F.col("rb") - F.col("ra") < window)
        )
        .select("id_a", "id_b", (F.col("rb") - F.col("ra")).alias("rank_gap"))
    )
