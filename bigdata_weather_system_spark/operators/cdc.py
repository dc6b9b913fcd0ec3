"""Batch change-data-capture application (MERGE-style upsert/delete).

The reference has no CDC surface; a 100 TB training-data pipeline does —
nightly snapshots are rebuilt from a base table plus a change feed
(upserts + tombstones), the same semantics warehouse engines spell
``MERGE INTO``. Spark has no MERGE on plain parquet, so the operator is
expressed as the canonical two-step plan:

1. collapse the change feed to the LATEST change per key (one shuffle on
   the key, WindowGroupLimit rank — never a global sort);
2. full-outer join base × latest-changes on the key; a change row wins
   over the base row, and a tombstone change deletes the key.

Both steps shuffle on the same key, so with AQE the exchange is reused;
at scale the base side can additionally be bucketed on the key to make
step 2 shuffle-free (see sources/bucketed.py).

The streaming twin (continuous upsert into a keyed store) lives in
streaming/pipeline.py's foreachBatch upsert sink.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
) -> DataFrame:
    """One row per key: the change with the highest ``seq_cols`` tuple
    (event time + tiebreaks). Rank-1 filter compiles to WindowGroupLimit,
    so each shuffle partition keeps only its winners."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str | None = None,
    delete_values: Sequence[str] = ("delete",),
) -> DataFrame:
    """Apply a change feed onto a base snapshot: upsert the latest change
    per key, delete keys whose latest change is a tombstone
    (``op_col`` ∈ ``delete_values``), keep untouched base rows.

    Payload columns are the non-key columns shared by both relations;
    the output schema is ``key_cols`` + shared payload (change values
    win). A tombstone only deletes when it is the key's LATEST change —
    a later upsert resurrects the key, matching MERGE semantics applied
    in sequence order.
    """
    keys = list(key_cols)
    payload = [
        c for c in base.columns if c in set(changes.columns) and c not in keys
    ]
    latest = latest_changes(changes, keys, seq_cols)
    chg = latest.select(
        *keys,
        F.lit(True).alias("_has_chg"),
        *[F.col(c).alias(f"_chg_{c}") for c in payload],
        *(
            [F.col(op_col).isin(*delete_values).alias("_del")]
            if op_col is not None
            else [F.lit(False).alias("_del")]
        ),
    )
    merged = base.join(chg, on=keys, how="full_outer")
    return (
        merged.filter(~F.coalesce(F.col("_del"), F.lit(False)))
        .select(
            *keys,
            *[
                F.when(F.col("_has_chg"), F.col(f"_chg_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in payload
            ],
        )
    )
