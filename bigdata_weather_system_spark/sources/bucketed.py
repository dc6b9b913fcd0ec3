"""Bucketed-table helpers: co-located joins with zero shuffle.

At 100 TB, the dominant cost of a fact-to-fact equi-join is shuffling both
sides on the key. Bucketing pre-shuffles at write time: both tables are
hash-partitioned into the same number of buckets on the join key (and
sorted within buckets), so Catalyst plans a sort-merge join with NO
Exchange on either side — the one-time write cost is amortized over every
subsequent join/aggregation on that key.

The reference has no persistent tables at all (Kafka topic + memory sink);
this is the scale path for its fact data (SURVEY §4.3) and for any
repeatedly-joined pair (orders⋈lineitem, doc-id-keyed feature tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``n_buckets`` should match across tables that will be joined and be a
    multiple of target parallelism; bucket-sorting by the join key lets the
    sort-merge join skip its sort.
    """
    cols = list(bucket_cols)
    writer = df.write.format(format).mode(mode).bucketBy(n_buckets, *cols)
    writer = writer.sortBy(*(list(sort_cols) if sort_cols else cols))
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    With matching bucket specs Catalyst emits a shuffle-free sort-merge
    join (verify: no Exchange in the executed plan — pinned by
    tests/test_bucketed.py).
    """
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Write parquet hive-partitioned by the event date.

    The 100 TB layout for time-series facts (SURVEY §4.3): a sargable
    ``to_date(ts) = DATE '...'`` predicate then prunes whole directories at
    planning time — the scan never opens files outside the requested dates
    (pinned by tests/test_bucketed.py). The reference's
    ``date_format(ts,'yyyy-MM-dd') == '<str>'`` filters defeat exactly this
    pruning, which is why the engine's date predicates use ``to_date``.
    """
    from pyspark.sql import functions as F

    out = df.withColumn(partition_col, F.to_date(ts_col))
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def backfill_partitions(
    df: DataFrame,
    path: str,
    dates,
    ts_col: str = "ts",
    partition_col: str = "event_date",
) -> None:
    """IDEMPOTENT partition backfill: rewrite ONLY the named date
    partitions of a ``write_date_partitioned`` table, leaving every other
    partition's files untouched — the correction/late-data workflow a
    warehouse runs nightly. Uses dynamic partition overwrite
    (``partitionOverwriteMode=dynamic``), so `overwrite` replaces exactly
    the partitions present in the written frame; re-running the same
    backfill converges to the same bytes (idempotent by construction,
    which is what makes retrying a failed backfill safe). The input is
    filtered to the requested dates BEFORE the write so a buggy upstream
    cannot clobber partitions it wasn't asked to touch."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    out = df.withColumn(partition_col, F.to_date(ts_col)).filter(
        F.col(partition_col).isin([str(d) for d in dates])
    )
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        out.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
