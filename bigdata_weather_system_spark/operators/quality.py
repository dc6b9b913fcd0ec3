"""Data-quality constraint checking (Deequ-style) in a single pass.

A training-data pipeline gates every ingest on declarative constraints:
completeness (null fraction), uniqueness, domain membership, value
ranges, row-count floors. This module evaluates an arbitrary list of
constraints as ONE aggregation over the data — every metric is a
conditional aggregate, so the whole report costs one scan + one
reduce regardless of how many constraints are declared (Spark folds all
the aggregates into a single partial/final pair).

Results come back as a tidy report relation ``(constraint, metric,
threshold, passed)`` — pipeable into alerting or a quality history table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Constraint:
    """One named quality rule.

    ``metric`` maps the DataFrame's columns to ONE aggregate expression
    (a number); ``predicate`` maps that number to pass/fail. Keeping the
    metric separate from the verdict makes the report auditable — you see
    how close to the threshold the data ran, not just a boolean.
    """

    name: str
    metric: Callable[[], Column]
    threshold: float
    direction: str = ">="  # metric >= threshold passes (or "<=")

    def as_agg(self) -> Column:
        return self.metric().cast("double").alias(self.name)


def completeness(col: str) -> Callable[[], Column]:
    """Fraction of rows with a non-null value."""
    return lambda: F.count(col) / F.count(F.lit(1))


def uniqueness(col: str) -> Callable[[], Column]:
    """Fraction of rows whose value is globally unique = distinct/total."""
    return lambda: F.count_distinct(F.col(col)) / F.count(F.lit(1))


def in_set_fraction(col: str, allowed: tuple[str, ...]) -> Callable[[], Column]:
    return lambda: F.avg(F.col(col).isin(*allowed).cast("double"))


def in_range_fraction(col: str, lo: float, hi: float) -> Callable[[], Column]:
    return lambda: F.avg(
        ((F.col(col) >= lo) & (F.col(col) <= hi)).cast("double")
    )


def row_count() -> Callable[[], Column]:
    return lambda: F.count(F.lit(1))


def matches_fraction(col: str, pattern: str) -> Callable[[], Column]:
    """Fraction of non-null values fully matching a regex."""
    return lambda: F.avg(
        F.when(
            F.col(col).isNotNull(),
            F.regexp_like(F.col(col), F.lit(pattern)).cast("double"),
        )
    )


def check_constraints(
    df: DataFrame, constraints: list[Constraint]
) -> DataFrame:
    """Evaluate every constraint in ONE aggregation pass and unpivot the
    wide metric row into the tidy report. The unpivot is driver-free
    (``stack`` on a 1-row relation)."""
    wide = df.agg(*[c.as_agg() for c in constraints])
    n = len(constraints)
    stack_args = ", ".join(f"'{c.name}', `{c.name}`" for c in constraints)
    long = wide.select(
        F.expr(
            f"stack({n}, {stack_args}) as (constraint, metric)"
        )
    )
    meta = [
        (c.name, float(c.threshold), c.direction) for c in constraints
    ]
    meta_df = df.sparkSession.createDataFrame(
        meta, "constraint string, threshold double, direction string"
    )
    joined = long.join(F.broadcast(meta_df), "constraint")
    passed = F.when(
        F.col("direction") == ">=", F.col("metric") >= F.col("threshold")
    ).otherwise(F.col("metric") <= F.col("threshold"))
    return joined.select(
        "constraint",
        F.round("metric", 6).alias("metric"),
        "threshold",
        passed.alias("passed"),
    )


def fk_orphan_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity audit: for each
    ``(name, child, child_key, parent, parent_key)`` relation, one output
    row (relation, n_child_rows, n_orphans) where an orphan is a child
    row whose key has no parent (NULL keys are not orphans — SQL FK
    semantics).

    Each relation is a LeftAnti join of the child's key projection
    against the parent's key — column-pruned to the key on both sides, so
    the scan reads one column, and small parents broadcast. The per-
    relation single-row summaries are unioned into one DataFrame: the
    whole audit is a single job with every branch running in parallel,
    not a driver-side loop of ``count()`` actions.
    """
    parts = []
    for name, child, ckey, parent, pkey in relations:
        ck = child.select(F.col(ckey).alias("_k"))
        pk = parent.select(F.col(pkey).alias("_k"))
        orphans = (
            ck.filter(F.col("_k").isNotNull())
            .join(pk, "_k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        total = ck.agg(F.count(F.lit(1)).alias("n_child_rows"))
        parts.append(
            total.crossJoin(orphans).select(
                F.lit(name).alias("relation"), "n_child_rows", "n_orphans"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
