"""Skew mitigation: salted aggregation and salted broadcast-side joins.

AQE's skew-join splitting (default-on) handles moderate skew at shuffle
time; these operators are for the pathological cases a 100 TB corpus
actually has — a handful of keys holding 1-10% of all rows each (null-ish
ids, boilerplate documents, bot users):

- **salted_aggregate**: two-stage aggregation. Stage 1 groups on
  (key, salt) so a hot key's rows land on ``n_salts`` reducers instead of
  one; stage 2 merges the per-salt partials. Works for any algebraic
  aggregate (sum/count/min/max — avg as sum+count merged at stage 2).
- **salted_join**: explode the (small) build side ``n_salts``× with a salt
  column and salt the probe side randomly-but-deterministically, turning
  one hot reducer into ``n_salts`` even ones. Only needed when the build
  side is too big to broadcast outright but the probe side is skewed.

Salt = ``pmod(xxhash64(unique_col), n_salts)`` — deterministic (reruns and
retried tasks produce identical results), uniform, and free of the
nondeterminism ``F.rand()`` injects into retried stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def deterministic_salt(unique_col: str | Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    salt_source_col: str,
    n_salts: int = 16,
    sum_cols: Sequence[str] = (),
    count: bool = True,
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    Equivalent to ``df.groupBy(key_cols).agg(sum/count/min/max)`` but no
    single reducer ever sees more than ~1/n_salts of a hot key's rows.
    ``salt_source_col`` must be a high-cardinality column (a row id) so the
    salt spreads rows evenly within each key.
    """
    if not (sum_cols or min_cols or max_cols or count):
        raise ValueError(
            "salted_aggregate: no aggregates requested "
            "(sum_cols/min_cols/max_cols empty and count=False)"
        )
    keys = list(key_cols)
    salted = df.withColumn("_salt", deterministic_salt(salt_source_col, n_salts))
    stage1_aggs = [F.sum(c).alias(f"_s_{c}") for c in sum_cols]
    stage1_aggs += [F.min(c).alias(f"_mn_{c}") for c in min_cols]
    stage1_aggs += [F.max(c).alias(f"_mx_{c}") for c in max_cols]
    if count:
        stage1_aggs.append(F.count(F.lit(1)).alias("_cnt"))
    stage1 = salted.groupBy(*keys, "_salt").agg(*stage1_aggs)
    stage2_aggs = [F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols]
    stage2_aggs += [F.min(f"_mn_{c}").alias(f"min_{c}") for c in min_cols]
    stage2_aggs += [F.max(f"_mx_{c}").alias(f"max_{c}") for c in max_cols]
    if count:
        stage2_aggs.append(F.sum("_cnt").alias("n_rows"))
    return stage1.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt_source_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated.

    The build side is exploded ``n_salts``× (one copy per salt value) and
    the join runs on (keys..., salt) — a skewed probe key's rows spread
    over ``n_salts`` reducers. Build-side replication costs
    |build| × n_salts shuffled rows: keep n_salts modest and the build side
    the smaller input.

    Only probe-side-preserving join types are legal: replication breaks
    build-side preservation (every unmatched (key, salt) copy would
    surface as its own spurious null-extended row), so right/full outer
    joins are rejected rather than silently corrupted.
    """
    salt_safe = {
        "inner", "cross", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower() not in salt_safe:
        raise ValueError(
            f"salted_join: join type {how!r} is not salt-safe — build-side "
            "replication corrupts build-preserving joins (use inner/left/"
            "semi/anti, or salt the other side)"
        )
    on = list(on)
    salted_probe = probe.withColumn(
        "_salt", deterministic_salt(salt_source_col, n_salts)
    )
    replicated = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_probe.join(replicated, on=on + ["_salt"], how=how)
    return out.drop("_salt")
