"""Contract queries: physical-layout planning — quantifying what a
clustered write buys the scanner.

`operators/layout.py` implements the Z-order writer; this module adds
the PLANNER's view: simulate file assignment under three write layouts
(arrival order, single-key sort, Z-order) and measure how many files a
min/max-pruned scan would touch under 1-D predicates on each clustered
dimension. This is the analysis a table-maintenance service runs before
deciding to recluster — the number it produces (files touched / total)
is exactly the scan-amplification factor at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .core import register, _t

_FILE_ROWS = 1000
_BITS = 8


def _zkey_terms(shift_fmt: str) -> str:
    """Bit-interleave expression for two pre-scaled 8-bit ints `a`, `b`.
    ``shift_fmt`` renders one right-shift: '{c} >> {i}' (DuckDB) or
    'shiftright({c}, {i})' (Spark SQL)."""
    terms = []
    for i in range(_BITS):
        a = shift_fmt.format(c="a", i=i)
        b = shift_fmt.format(c="b", i=i)
        terms.append(f"(({a}) & 1) * {2 ** (2 * i + 1)}")
        terms.append(f"(({b}) & 1) * {2 ** (2 * i)}")
    return " + ".join(terms)


_PRUNING_ORACLE = f"""
    WITH mm AS (
      SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
             min(l_suppkey) AS mns, max(l_suppkey) AS mxs,
             count(*) AS n_rows
      FROM lineitem
    ),
    scaled AS (
      SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
             ((l.l_partkey - m.mnp) * 256) // (m.mxp - m.mnp + 1) AS a,
             ((l.l_suppkey - m.mns) * 256) // (m.mxs - m.mns + 1) AS b,
             l.l_partkey <= m.mnp + (m.mxp - m.mnp) // 20 AS m1,
             l.l_suppkey <= m.mns + (m.mxs - m.mns) // 20 AS m2
      FROM lineitem l CROSS JOIN mm m
    ),
    filed AS (
      SELECT m1, m2,
             (row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
               // {_FILE_ROWS} AS f_natural,
             (row_number() OVER (ORDER BY l_partkey, l_orderkey,
                                 l_linenumber) - 1)
               // {_FILE_ROWS} AS f_sorted,
             (row_number() OVER (ORDER BY {_zkey_terms('{c} >> {i}')},
                                 l_orderkey, l_linenumber) - 1)
               // {_FILE_ROWS} AS f_zorder
      FROM scaled
    ),
    long AS (
      SELECT 'natural' AS layout, f_natural AS f, m1, m2 FROM filed
      UNION ALL
      SELECT 'partkey_sorted', f_sorted, m1, m2 FROM filed
      UNION ALL
      SELECT 'zorder_part_supp', f_zorder, m1, m2 FROM filed
    )
    SELECT layout,
           CAST(count(DISTINCT f) AS BIGINT)  AS total_files,
           CAST(count(DISTINCT CASE WHEN m1 THEN f END) AS BIGINT)
                                              AS partkey_files_touched,
           round(1.0 - count(DISTINCT CASE WHEN m1 THEN f END) * 1.0
                 / count(DISTINCT f), 6)      AS partkey_pruning_ratio,
           CAST(count(DISTINCT CASE WHEN m2 THEN f END) AS BIGINT)
                                              AS suppkey_files_touched,
           round(1.0 - count(DISTINCT CASE WHEN m2 THEN f END) * 1.0
                 / count(DISTINCT f), 6)      AS suppkey_pruning_ratio
    FROM long GROUP BY layout
    """


@register("zorder_pruning_benefit", oracle=_PRUNING_ORACLE)
def zorder_pruning_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-pruning planner: simulate {_FILE_ROWS}-row parquet files
    written in (a) arrival order, (b) l_partkey sort order, (c) Z-order
    on (l_partkey, l_suppkey) — then, for a ~5% range predicate on EACH
    dimension, count the files whose min/max footer stats would force the
    scanner to read them. The expected shape is the whole argument for
    multi-dimensional clustering: the single-key sort prunes its own
    dimension almost perfectly and the other not at all, while Z-order
    prunes BOTH at a square-root-ish rate. Simulation note: the three
    global row_number windows stand in for the writer's
    repartitionByRange — this is a diagnostic/planning query over a
    sample, not the write path itself (the write path is
    `operators/layout.py:write_zordered`, which scales out); the bit
    interleave is pure integer arithmetic identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_partkey").alias("mnp"),
        F.max("l_partkey").alias("mxp"),
        F.min("l_suppkey").alias("mns"),
        F.max("l_suppkey").alias("mxs"),
    )
    scaled = li.crossJoin(F.broadcast(mm)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.expr("((l_partkey - mnp) * 256) DIV (mxp - mnp + 1)").alias("a"),
        F.expr("((l_suppkey - mns) * 256) DIV (mxs - mns + 1)").alias("b"),
        F.expr("l_partkey <= mnp + (mxp - mnp) DIV 20").alias("m1"),
        F.expr("l_suppkey <= mns + (mxs - mns) DIV 20").alias("m2"),
    )
    zkey = F.expr(_zkey_terms("shiftright({c}, {i})"))
    w_nat = Window.orderBy("l_orderkey", "l_linenumber")
    w_srt = Window.orderBy("l_partkey", "l_orderkey", "l_linenumber")
    w_z = Window.orderBy(zkey, F.col("l_orderkey"), F.col("l_linenumber"))
    filed = scaled.select(
        "m1",
        "m2",
        ((F.row_number().over(w_nat) - 1) / _FILE_ROWS)
        .cast("long")
        .alias("f_natural"),
        ((F.row_number().over(w_srt) - 1) / _FILE_ROWS)
        .cast("long")
        .alias("f_sorted"),
        ((F.row_number().over(w_z) - 1) / _FILE_ROWS)
        .cast("long")
        .alias("f_zorder"),
    )
    long = filed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("natural").alias("layout"),
                    F.col("f_natural").alias("f"),
                ),
                F.struct(
                    F.lit("partkey_sorted").alias("layout"),
                    F.col("f_sorted").alias("f"),
                ),
                F.struct(
                    F.lit("zorder_part_supp").alias("layout"),
                    F.col("f_zorder").alias("f"),
                ),
            )
        ).alias("lf"),
        "m1",
        "m2",
    ).select(F.col("lf.layout").alias("layout"), F.col("lf.f").alias("f"), "m1", "m2")
    return long.groupBy("layout").agg(
        F.countDistinct("f").cast("long").alias("total_files"),
        F.countDistinct(F.when(F.col("m1"), F.col("f")))
        .cast("long")
        .alias("partkey_files_touched"),
        F.round(
            1.0
            - F.countDistinct(F.when(F.col("m1"), F.col("f"))) * 1.0
            / F.countDistinct("f"),
            6,
        ).alias("partkey_pruning_ratio"),
        F.countDistinct(F.when(F.col("m2"), F.col("f")))
        .cast("long")
        .alias("suppkey_files_touched"),
        F.round(
            1.0
            - F.countDistinct(F.when(F.col("m2"), F.col("f"))) * 1.0
            / F.countDistinct("f"),
            6,
        ).alias("suppkey_pruning_ratio"),
    )
