"""Pre-flight estimation operators: join cardinality without running the
join.

At 100 TB you estimate BEFORE you launch: a fact-fact join whose output
explodes 100× wants a different plan (pre-aggregation, semi-join
reduction, a coarser grain) than one that contracts. This module gives
the standard sampling answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def estimate_join_cardinality(
    left: DataFrame,
    right: DataFrame,
    key: str,
    fraction: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Unbiased equi-join size estimate via KEY-SYNCHRONIZED (universe)
    sampling: both sides keep exactly the rows whose JOIN-KEY hash falls
    in the same fraction-``fraction`` bucket range, so sampled keys
    survive on BOTH sides and the sampled join count scales by ``f`` —
    not ``f²`` like independent row sampling, which mostly destroys
    matching pairs (E[sample join] = f·Σ_k a_k·b_k because each key
    universe is kept with probability f; see Vengerov et al., "Join Size
    Estimation Subject to Filter Conditions", VLDB'15).

    Cost: two sampled scans + a join that touches ~``f`` of the keys.
    Returns one row: ``estimated_rows`` (the scaled estimate, a long).
    """
    if not (0 < fraction <= 1):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    buckets = 1_000_000
    cut = int(fraction * buckets)

    def keep(df: DataFrame) -> DataFrame:
        h = F.pmod(
            F.xxhash64(F.col(key).cast("string"), F.lit(seed)), F.lit(buckets)
        )
        return df.select(key).filter(h < cut)

    sampled = keep(left).join(keep(right), key).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return sampled.select(
        F.round(F.col("_n") / F.lit(cut / buckets))
        .cast("long")
        .alias("estimated_rows")
    )
