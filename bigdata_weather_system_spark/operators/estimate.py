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


def _cms_hash(item: "F.Column", i: int, width: int, seed: int, hash: str):
    """Row-i CMS hash. ``xxhash64`` (default) is the production path;
    ``md5`` slices row i's value from hex chars [1+8i, 8+8i] of ONE
    md5(seed ':' item) — bit-identical in DuckDB
    (``md5(seed || ':' || item)``), so a sketch built with it is
    fully oracle-reconstructable, and all depth rows share a single
    digest per item (Catalyst dedups the common md5 subexpression; the
    naive per-row ``md5(i:item)`` keying measured ~3× the xxhash64
    sketch, this form ~1 digest + cheap slices). The seed is mixed into
    the digest key so rotating seeds yields independent sketches on
    BOTH hash paths. 32 hex chars bound the
    sliced form at depth 4; deeper sketches re-key per row."""
    if hash == "md5":
        keyed = F.concat(F.lit(f"{seed}:"), item.cast("string"))
        if 8 * (i + 1) <= 32:
            hexpart = F.substring(F.md5(keyed), 1 + 8 * i, 8)
        else:  # depth > 4: fall back to per-row keying
            hexpart = F.substring(
                F.md5(F.concat(F.lit(f"{seed}:{i}:"), item.cast("string"))),
                1,
                15,
            )
        h = F.conv(hexpart, 16, 10).cast("long")
    else:
        h = F.xxhash64(item, F.lit(seed + i))
    return F.pmod(h, F.lit(width))


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 7,
    hash: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch of an item stream as a (row, bucket, cnt) relation
    — depth×width cells, each cell the count of items hashing there.

    The sketch is MERGEABLE by construction (cell-wise sum), which is the
    whole point at 100 TB: build per-partition/per-day sketches with one
    map-side-combining groupBy, union + re-sum to merge, and answer point
    frequency queries from ≤ depth·width rows instead of re-scanning the
    stream. Guarantees: estimates never undercount; overcount ≤ εN with
    probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
    """
    buckets = [
        _cms_hash(F.col(item_col), i, width, seed, hash)
        .cast("int")
        .alias("bucket")
        for i in range(depth)
    ]
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), buckets[i])
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    return rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_point_estimates(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 7,
    hash: str = "xxhash64",
) -> DataFrame:
    """Point-frequency estimates for ``queries[item_col]`` from a
    ``count_min_sketch`` relation: est(item) = min over rows of
    cell(row, h_row(item)). The query side is tiny and broadcasts; a
    missing cell means nothing hashed there (count 0)."""
    probes = queries.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_hash(F.col(item_col), i, width, seed, hash)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(item_col, "rb.row", "rb.bucket")
    joined = sketch.join(F.broadcast(probes), ["row", "bucket"], "right")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )


def misra_gries_heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 32,
) -> DataFrame:
    """Deterministic-guarantee heavy hitters via mergeable Misra–Gries
    summaries (Agarwal et al., "Mergeable Summaries", PODS'12): each
    partition streams its rows through a k-counter MG summary inside one
    Arrow `mapInPandas` pass (constant memory: ≤ k counters), and the
    partials merge by a plain item-sum over the ≤ partitions×k surviving
    rows — a relation bounded by PARALLELISM, never by data.

    Guarantees (order-independent, unlike the candidate SET itself,
    which may vary with row order): for every item,
    ``estimate ≤ true_count`` and ``true_count − estimate ≤ n/(k+1)``
    (per-partition undercounts ≤ n_p/(k+1) sum to ≤ n/(k+1)); hence any
    item with ``true_count > n/(k+1)`` has a positive estimate and IS in
    the summary — the no-false-negative property Count-Min cannot give
    without randomness. Returns (item, mg_estimate), the summed partial
    union (callers top-k it for reporting).
    """

    def mg_partition(it):
        import pandas as pd

        counters: dict = {}
        for pdf in it:
            for item in pdf[item_col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters.keys()), "cnt": list(counters.values())}
        )

    partials = df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        mg_partition, schema="item string, cnt long"
    )
    return partials.groupBy("item").agg(F.sum("cnt").alias("mg_estimate"))
