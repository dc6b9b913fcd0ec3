"""Distributed ALS matrix factorization (alternating least squares).

The canonical Spark workload, built on the engine's own primitives
(no pyspark.ml): factor the (user, item, rating) interaction matrix into
k-dimensional user/item embeddings by alternating ridge-regression
solves — each half-step is EMBARRASSINGLY parallel per entity once the
other side's factors are joined in, which is exactly why ALS (and not
SGD) is the distributed classic (Zhou et al. 2008, "Large-scale Parallel
Collaborative Filtering for the Netflix Prize").

Plan shape per half-step: join ratings with the other side's factor
table on the item/user key (broadcast when the entity count is small,
shuffle otherwise), group by the side being solved, and solve the k×k
normal equations (AᵀA + λI)x = Aᵀr per entity inside an Arrow batch —
thousands of tiny BLAS solves per task, no driver involvement. Factor
state lives in DataFrames between iterations (lineage cut per
iteration); the driver never holds factors.

Determinism: init factors are hash-derived uniforms, and every per-entity
solve sorts its rows by the partner id before accumulating, so float
sums are independent of shuffle arrival order — two runs (and the pytest
numpy reference) agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _hash_factors(
    df: DataFrame, id_col: str, k: int, seed: int, scale: float = 0.1
) -> DataFrame:
    """Deterministic init: factor[d] = scale · uniform from xxhash64(id, d)."""
    dims = [
        (
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + d)), F.lit(1_000_000))
            / 1_000_000.0
            * scale
        ).alias(f"_f{d}")
        for d in range(k)
    ]
    return df.select(F.col(id_col), F.array(*dims).alias("factors"))


def _solve_side(
    ratings: DataFrame,
    other_factors: DataFrame,
    solve_col: str,
    other_col: str,
    rating_col: str,
    k: int,
    reg: float,
) -> DataFrame:
    """One ALS half-step: ridge-solve factors for every ``solve_col``
    entity against the fixed ``other_factors``.

    Shape: join in the fixed side's factors, collect each entity's
    (partner, rating, factors) rows into ONE sorted array (a single
    map-side-combining shuffle), then run every k×k solve in a tight
    loop inside ``mapInPandas`` Arrow batches — one pandas frame per
    BATCH of entities, not per entity. (The first formulation used
    ``applyInPandas`` per entity: 15k pandas-frame constructions per
    half-step dominated the wall clock ~6×; the solves themselves are
    microseconds.) The array sort keys on the partner id, so float
    accumulation order is independent of shuffle arrival — runs are
    bit-deterministic and match the numpy reference exactly."""
    import pandas as pd

    # the factor side is entity-count-sized (k+1 narrow columns) —
    # broadcast it so the ratings table never shuffles for the join; at
    # billion-entity scale drop the hint and let AQE pick the shuffle
    # join (the groupBy below is then the only wide stage either way)
    j = ratings.join(
        F.broadcast(
            other_factors.withColumnRenamed(
                "factors", "_of"
            ).withColumnRenamed(other_factors.columns[0], other_col)
        ),
        other_col,
    ).select(solve_col, other_col, rating_col, "_of")
    grouped = j.groupBy(solve_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(other_col).alias("p"),
                    F.col(rating_col).alias("r"),
                    F.col("_of").alias("f"),
                )
            )
        ).alias("_rows")
    )
    # Ship the sorted per-entity rows to Python as two FLAT double
    # arrays (ratings + row-major factor matrix) instead of a
    # list<struct<p,r,array>> column: Arrow converts list<double> cells
    # straight to numpy float64 views, where the struct form surfaced
    # one dict per rating row in Python (the dominant cost of the
    # half-step — guide §4.1: control how efficiently columns cross).
    # The sort key (partner id) orders the flat arrays identically, so
    # A is the SAME matrix as before and the solve is bit-identical.
    flat = grouped.select(
        solve_col,
        F.transform("_rows", lambda s: s["r"]).alias("_rs"),
        F.flatten(F.transform("_rows", lambda s: s["f"])).alias("_fs"),
    )

    def solve_batches(it):
        eye = reg * np.eye(k)
        for pdf in it:
            out_f = []
            for rs, fs in zip(pdf["_rs"], pdf["_fs"]):
                r = np.asarray(rs, dtype=np.float64)
                A = np.asarray(fs, dtype=np.float64).reshape(-1, k)
                out_f.append(np.linalg.solve(A.T @ A + eye, A.T @ r))
            yield pd.DataFrame(
                {solve_col: pdf[solve_col], "factors": out_f}
            )

    id_type = ratings.schema[solve_col].dataType.simpleString()
    return flat.mapInPandas(
        solve_batches, schema=f"{solve_col} {id_type}, factors array<double>"
    )


def als_train(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = 4,
    iterations: int = 2,
    reg: float = 0.1,
    seed: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """Run ``iterations`` ALS rounds; returns (user_factors,
    item_factors) DataFrames with an ``array<double>`` factor column."""
    items = ratings.select(item_col).distinct()
    item_f = _hash_factors(items, item_col, k, seed)
    user_f = None
    for _ in range(iterations):
        user_f = _solve_side(
            ratings, item_f, user_col, item_col, rating_col, k, reg
        ).localCheckpoint(eager=True)
        item_f = _solve_side(
            ratings, user_f, item_col, user_col, rating_col, k, reg
        ).localCheckpoint(eager=True)
    return user_f, item_f


def als_rmse(
    ratings: DataFrame,
    user_factors: DataFrame,
    item_factors: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
) -> DataFrame:
    """1-row training RMSE of the factorization: prediction = u·v via a
    zip_with fold, squared errors aggregated exactly once."""
    uf = user_factors.withColumnRenamed("factors", "_uf")
    vf = item_factors.withColumnRenamed("factors", "_vf")
    j = ratings.join(uf, user_col).join(vf, item_col)
    pred = F.aggregate(
        F.zip_with("_uf", "_vf", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    err = F.col(rating_col) - pred
    return j.agg(
        F.count(F.lit(1)).alias("n_ratings"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
    )
