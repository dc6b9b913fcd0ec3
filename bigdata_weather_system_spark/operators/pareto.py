"""Distributed skyline (Pareto front) computation.

The skyline of a relation under (maximize…, minimize…) criteria is the
set of rows not DOMINATED by any other row (another row at least as good
on every criterion and strictly better on one) — multi-objective
filtering a curation pass uses to shortlist candidates without collapsing
criteria into one ad-hoc score.

Distributed shape is the published two-phase algorithm: a LOCAL skyline
per partition (dominance is transitive, so a globally-dominated row is
also dominated within any partition that contains its dominator — local
filtering never removes a true skyline row), then the union of local
skylines — typically orders of magnitude smaller than the input — is
merged on one partition for the exact global pass. Each local pass is a
vectorized sort-then-scan in Arrow batches, not a row loop.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame


def _local_skyline(pdf, max_cols: Sequence[str], min_cols: Sequence[str]):
    import numpy as np

    if len(pdf) == 0:
        return pdf
    # NaN criteria would silently break the dominance scan (NaN
    # comparisons are all False, so a NaN row is never dominated and can
    # never dominate — and lexsort orders NaN unpredictably w.r.t. the
    # descending-dominator invariant). Dominance is undefined on NaN, so
    # such rows are DROPPED here — matching the SQL NOT-EXISTS oracle,
    # where a NaN/NULL criterion can neither qualify nor block a row.
    crit = np.column_stack(
        [pdf[c].to_numpy(dtype=float) for c in list(max_cols) + list(min_cols)]
    )
    finite = ~np.isnan(crit).any(axis=1)
    if not finite.all():
        pdf = pdf[finite]
        if len(pdf) == 0:
            return pdf
    # canonicalize to all-maximize, sort lexicographically descending;
    # then a row is in the skyline iff no EARLIER row dominates it.
    # With the primary criterion sorted descending, any dominator
    # precedes its victim, so one forward scan with a running frontier
    # of (the other criteria) suffices. For the common 2-criteria case
    # the frontier is a scalar running max — O(n log n) total.
    vals = np.column_stack(
        [pdf[c].to_numpy(dtype=float) for c in max_cols]
        + [-pdf[c].to_numpy(dtype=float) for c in min_cols]
    )
    order = np.lexsort(tuple(vals[:, i] for i in range(vals.shape[1] - 1, -1, -1)))[::-1]
    sv = vals[order]
    n, d = sv.shape
    keep_sorted = np.zeros(n, dtype=bool)
    frontier: list = []  # kept rows' criteria vectors (small in practice)
    for i in range(n):
        row = sv[i]
        dominated = False
        for f in frontier:
            if (f >= row).all() and (f > row).any():
                dominated = True
                break
        if not dominated:
            keep_sorted[i] = True
            frontier.append(row)
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return pdf[keep]


def skyline(
    df: DataFrame,
    max_cols: Sequence[str],
    min_cols: Sequence[str],
) -> DataFrame:
    """Exact skyline of ``df`` under maximize ``max_cols`` / minimize
    ``min_cols``. Two ``mapInPandas`` passes: per-partition local
    skyline, then a single-partition global merge of the (small) local
    fronts."""
    max_cols, min_cols = list(max_cols), list(min_cols)
    schema = df.schema

    def run(batches: Iterator):
        import pandas as pd

        parts = [b for b in batches if len(b)]
        if not parts:
            return
        yield _local_skyline(
            pd.concat(parts, ignore_index=True), max_cols, min_cols
        )

    local = df.mapInPandas(run, schema=schema)
    return local.coalesce(1).mapInPandas(run, schema=schema)
