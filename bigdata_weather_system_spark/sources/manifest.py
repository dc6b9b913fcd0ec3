"""File-level manifest index: min/max stats per data file, used to prune
whole files before Spark ever opens them.

This is the lakehouse-manifest pattern (Iceberg manifests / Delta file
stats) on plain parquet directories: a tiny side table of
``(file, n_rows, min_c, max_c, ...)`` built from parquet FOOTERS only —
no data pages are read — lets a point/range lookup plan a scan over just
the overlapping files. Combined with a clustered write
(``operators.layout.write_zordered`` or a range-partitioned write) this
turns O(table) point queries into O(matching files).

Scale notes: the build is metadata-only I/O distributed over executors
(``mapInPandas`` over the file list, pyarrow reads footers); the manifest
itself is ~one row per file (a 100 TB table at 1 GB/file is a 100k-row
manifest — broadcast-sized by construction). The pruned read collects the
matching FILE LIST to the driver — the same bounded planning step Spark's
own file-source listing performs — never data rows.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _footer_stats(cols: Sequence[str]):
    """mapInPandas kernel: one output row per input file path, reading only
    the parquet footer."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["file"]:
                md = pq.ParquetFile(path).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                row = {"file": path, "n_rows": md.num_rows}
                for c in cols:
                    mn = mx = None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[c]).statistics
                        if st is None:
                            mn = mx = None
                            break
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                    row[f"min_{c}"] = (
                        None if mn is None else float(mn)
                    )
                    row[f"max_{c}"] = (
                        None if mx is None else float(mx)
                    )
                out.append(row)
            yield pd.DataFrame(out)

    return gen


def build_manifest(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Min/max/count per data file for ``cols`` (numeric), from parquet
    footers only. The file list is parallelized so footer reads run on
    executors — the driver never opens a data file."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    schema = "file string, n_rows long, " + ", ".join(
        f"min_{c} double, max_{c} double" for c in cols
    )
    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    return fdf.mapInPandas(_footer_stats(list(cols)), schema=schema)


def write_manifest(
    spark: SparkSession, path: str, cols: Sequence[str], manifest_path: str
) -> None:
    """Materialize the manifest next to the table (single tiny file)."""
    build_manifest(spark, path, cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(manifest_path)


def pruned_read(
    spark: SparkSession,
    path: str,
    col: str,
    lo: float,
    hi: float,
    manifest: DataFrame | None = None,
    manifest_path: str | None = None,
) -> DataFrame:
    """Read only the files whose [min, max] for ``col`` overlaps
    [``lo``, ``hi``], with the exact predicate re-applied on top (file
    pruning is a superset filter, same contract as partition pruning).

    Files lacking stats for ``col`` (null min/max) are conservatively
    KEPT. Returns an empty DataFrame with the right schema when nothing
    overlaps."""
    if manifest is None:
        if manifest_path is None:
            manifest = build_manifest(spark, path, [col])
        else:
            manifest = spark.read.parquet(manifest_path)
    keep = manifest.filter(
        F.col(f"min_{col}").isNull()
        | ((F.col(f"min_{col}") <= hi) & (F.col(f"max_{col}") >= lo))
    )
    files = [r.file for r in keep.select("file").collect()]
    pred = (F.col(col) >= lo) & (F.col(col) <= hi)
    if not files:
        return spark.read.parquet(path).filter(pred).limit(0)
    return spark.read.parquet(*files).filter(pred)


def delete_rows_by_key(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: Sequence[float],
) -> dict:
    """Surgical delete (the right-to-be-forgotten workload): remove all
    rows whose ``key_col`` is in ``keys``, rewriting ONLY the files whose
    footer min/max range can contain one of the keys — every other file
    is untouched bytes. On a clustered table (``write_zordered`` /
    range-partitioned) the affected set is a handful of files out of
    thousands; without stats locality this degrades gracefully to a full
    rewrite, never to a wrong answer.

    Mechanics: the manifest (footer-only) selects candidate files; they
    are read as one DataFrame, filtered, and rewritten into a sibling
    directory; then the candidates are removed and the rewritten files
    moved in. POSIX-atomic per file; on an object store, do the same
    under a table format's commit protocol. Returns counts:
    ``{"files_total", "files_rewritten", "rows_deleted"}``.
    """
    import shutil
    import uuid

    man = build_manifest(spark, path, [key_col]).collect()
    kset = [float(k) for k in keys]
    affected = [
        r.file
        for r in man
        if r[f"min_{key_col}"] is None
        or any(r[f"min_{key_col}"] <= k <= r[f"max_{key_col}"] for k in kset)
    ]
    out = {
        "files_total": len(man),
        "files_rewritten": len(affected),
        "rows_deleted": 0,
    }
    if not affected:
        return out
    df = spark.read.parquet(*affected)
    before = df.count()
    kept = df.filter(~F.col(key_col).isin(kset))
    tmp = os.path.join(
        os.path.dirname(path.rstrip("/")),
        f".delete-rewrite-{uuid.uuid4().hex[:8]}",
    )
    kept.write.mode("overwrite").parquet(tmp)
    out["rows_deleted"] = before - kept.count()
    for f in affected:
        os.remove(f)
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        shutil.move(f, os.path.join(path, os.path.basename(f)))
    shutil.rmtree(tmp)
    return out
