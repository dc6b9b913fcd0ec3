"""Physical-layout operators: Z-order clustered writes for multi-dimensional
data skipping.

A single-column sort gives parquet row-group min/max pruning on ONE
predicate dimension; filters on any other column read everything. Z-order
(Morton) clustering interleaves the bits of several columns so that files /
row groups cover compact hyper-rectangles — narrow predicates on ANY of the
clustered dimensions overlap only a small fraction of row groups. This is
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, expressed
here as plain column arithmetic + ``repartitionByRange`` on vanilla
parquet.

Scale notes: the z-value is a pure column expression (shift/mask terms,
whole-stage codegen); the only extra cost over a plain write is one
min/max agg (a scalar collect, same justification as a broadcast) and the
range shuffle that any clustered write needs. At 100 TB you'd z-write once
and amortize over every selective read.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _scaled(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Min-max scale ``col`` to an integer in [0, 2**bits - 1]."""
    span = mx - mn
    top = (1 << bits) - 1
    frac = F.when(span > 0, (col - mn) / span).otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * top).cast("long"), F.lit(top).cast("long")
    )


def zorder_key(scaled_cols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` bits from each already-scaled integer
    column: bit j of column i lands at position ``j * n + i``. Pure
    shift/mask arithmetic — codegen'd, no UDF."""
    n = len(scaled_cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(scaled_cols):
        for j in range(bits):
            z = z + F.shiftleft(
                F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n + i
            )
    return z


def with_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    out_col: str = "_z",
) -> DataFrame:
    """Append the Morton key over ``cols`` (numeric / timestamp; timestamps
    are cast to epoch doubles). Bounds come from one scalar min/max agg —
    collected once, inlined as literals so the z expression stays narrow."""
    numeric = [F.col(c).cast("double") for c in cols]
    bounds = df.agg(
        *[F.min(c).alias(f"mn{i}") for i, c in enumerate(numeric)],
        *[F.max(c).alias(f"mx{i}") for i, c in enumerate(numeric)],
    ).head()
    scaled = [
        _scaled(
            numeric[i],
            F.lit(float(bounds[f"mn{i}"])),
            F.lit(float(bounds[f"mx{i}"])),
            bits,
        )
        for i in range(len(cols))
    ]
    return df.withColumn(out_col, zorder_key(scaled, bits))


def write_zordered(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``:
    range-partition on the Morton key (each output file covers a compact
    z-range → a compact hyper-rectangle in the clustered dims), sort
    within partitions so row groups inside a file are tight too, and drop
    the helper column before writing."""
    z = with_zorder(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    n_files: int,
    sort_col: str | None = None,
) -> int:
    """Rewrite a parquet directory into ``n_files`` files (optionally
    re-clustered on ``sort_col``), replacing the directory atomically via
    rename — the small-files compaction every streaming/append pipeline
    eventually needs (thousands of KB-sized files turn scans into
    metadata storms and break row-group pruning).

    Returns the row count. Rename-swap is atomic on POSIX filesystems;
    on object stores run the same logic against a manifest/table format
    instead. The old directory is kept as ``<path>.pre-compact`` until
    the swap completes, then removed — a crash mid-compaction leaves
    either the old or the new directory intact, never a mix.
    """
    import shutil

    df = spark.read.parquet(path)
    n = df.count()
    if sort_col is not None:
        df = df.repartitionByRange(n_files, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        df = df.repartition(n_files)
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".pre-compact"
    df.write.mode("overwrite").parquet(tmp)
    import os

    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n
