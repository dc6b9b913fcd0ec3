"""Z-order clustered writes: verify real row-group skipping potential from
parquet footer min/max stats — the honest scale test (we measure what a
reader's pruning would do, not a proxy)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bigdata_weather_system_spark.operators.layout import (
    with_zorder,
    write_zordered,
    zorder_key,
)
from bigdata_weather_system_spark.sources.tables import load_table

from conftest import TEST_SF_DIR


def _overlap_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min,max] for ``col`` overlaps
    [lo, hi] — exactly what min/max-stat pruning keeps."""
    total = kept = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                kept += 1
    assert total > 0
    return kept / total


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(
        zorder_key([F.col("a"), F.col("b")], bits=3).alias("z")
    ).head().z
    # a bits at even positions, b bits at odd: a=101, b=011 →
    # bit0=a0=1, bit1=b0=1, bit2=a1=0, bit3=b1=1, bit4=a2=1, bit5=b2=0
    assert z == 0b011011


def test_with_zorder_constant_column_degrades_gracefully(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    rows = df.transform(
        lambda d: with_zorder(d, ["x", "y"], bits=4)
    ).collect()
    # constant y scales to 0 everywhere; distinct x still separates keys
    zs = {r._z for r in rows}
    assert len(zs) == 2


def test_zorder_write_skips_on_both_dims(spark, tmp_path):
    ev = load_table(spark, TEST_SF_DIR, "events").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("tsd"),
        "value",
    )
    zpath = str(tmp_path / "zorder")
    tpath = str(tmp_path / "timesorted")
    write_zordered(ev, ["user_id", "tsd"], zpath, n_files=8, bits=10)
    (
        ev.repartitionByRange(8, "tsd")
        .sortWithinPartitions("tsd")
        .write.mode("overwrite")
        .parquet(tpath)
    )

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("tsd"), F.max("tsd")
    ).head()
    umin, umax, tmin, tmax = stats
    u_lo, u_hi = umin, umin + (umax - umin) * 0.08  # narrow user slice
    t_lo, t_hi = tmin, tmin + (tmax - tmin) * 0.08  # narrow time slice

    # single-dim time sort: the user predicate prunes (almost) nothing
    assert _overlap_fraction(tpath, "user_id", u_lo, u_hi) >= 0.9
    # z-order: BOTH narrow predicates skip a real fraction of row groups
    zu = _overlap_fraction(zpath, "user_id", u_lo, u_hi)
    zt = _overlap_fraction(zpath, "tsd", t_lo, t_hi)
    assert zu <= 0.75, f"user-dim overlap {zu}"
    assert zt <= 0.75, f"time-dim overlap {zt}"

    # the clustered write must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == ev.count()


def test_compact_small_files_preserves_rows_and_clustering(spark, tmp_path):
    import glob
    import os as _os

    from bigdata_weather_system_spark.operators.layout import (
        compact_small_files,
    )

    ev = load_table(spark, TEST_SF_DIR, "events").select(
        "event_id", F.col("ts").cast("double").alias("tsd"), "value"
    )
    path = str(tmp_path / "shards")
    ev.repartition(16).write.parquet(path)
    assert len(glob.glob(_os.path.join(path, "*.parquet"))) == 16

    before = sorted(r.event_id for r in spark.read.parquet(path).collect())
    n = compact_small_files(spark, path, n_files=2, sort_col="tsd")
    files = glob.glob(_os.path.join(path, "*.parquet"))
    assert len(files) == 2
    after_df = spark.read.parquet(path)
    assert n == len(before)
    assert sorted(r.event_id for r in after_df.collect()) == before
    # re-clustered: a narrow tsd range must overlap few row groups again
    stats = after_df.agg(F.min("tsd"), F.max("tsd")).head()
    lo, hi = stats[0], stats[0] + (stats[1] - stats[0]) * 0.05
    assert _overlap_fraction(path, "tsd", lo, hi) <= 0.5
    assert not _os.path.exists(path + ".pre-compact")
    assert not _os.path.exists(path + ".compact-tmp")


def test_estimate_join_cardinality_unbiased_band(spark):
    """Universe sampling at several fractions: the scaled estimate tracks
    the exact join size (within a generous band at this tiny scale)."""
    from bigdata_weather_system_spark.operators.estimate import (
        estimate_join_cardinality,
    )

    ev = load_table(spark, TEST_SF_DIR, "events").select(
        F.col("user_id").alias("k")
    )
    exact = ev.alias("a").join(ev.alias("b"), "k").count()
    for frac in (0.25, 0.5):
        est = estimate_join_cardinality(ev, ev, "k", fraction=frac).head()
        assert est.estimated_rows > 0
        assert 0.3 * exact <= est.estimated_rows <= 2.5 * exact, (
            frac,
            est.estimated_rows,
            exact,
        )
