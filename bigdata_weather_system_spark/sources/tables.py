"""Parquet table loaders for the synthetic testdata (TESTDATA.md).

Deliberately thin: ``spark.read.parquet`` gives vectorized reads, predicate
pushdown and column pruning for free — the scan plan (``PushedFilters``,
``ReadSchema``) is shaped by the downstream query, not here. At 100 TB the
same call reads a date-partitioned table and Catalyst prunes partitions as
long as predicates stay sargable (see operators/profile.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Older generations of the synthetic events table stored ts as
        # TIMESTAMP(NANOS), which the vectorized parquet reader rejects.
        # Read nanos as long and convert to microsecond timestamps with
        # integer division (a double division would lose precision:
        # epoch-nanos ≈ 1.7e18 > 2^53). Current generations store plain
        # micros, so this shim no-ops — and the legacy conf is restored,
        # because leaking it session-wide would make OTHER tables' nanos
        # columns silently surface as bigint. When the shim DOES engage
        # (ts came back bigint) the conf must stay set: executions read
        # SQLConf per query, not at DataFrame creation, so restoring it
        # would fail the scan at collect time.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    else:
        df = spark.read.parquet(path)
    # Parquet isAdjustedToUTC=false columns surface as timestamp_ntz; the
    # DuckDB oracle reads the same files as plain TIMESTAMP. Normalize to
    # session-timezone timestamps (session tz is pinned UTC, so the cast is
    # value-preserving) so epoch math and oracle dtype parity hold.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register each table as a temp view so queries can be written in SQL."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
