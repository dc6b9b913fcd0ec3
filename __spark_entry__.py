"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bigdata_weather_system_spark``; this module is
glue only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata_weather_system_spark import contract

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Hourly event profile (SURVEY.md §7.4): filter → hour bucket → metric
    aggs + modal event type (deterministic tie-break) → broadcast-join →
    order. Touches scan, projection, filter, hash-agg, window-rank, join
    and sort in one plan.
    """
    return contract.QUERIES["hourly_profile"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
