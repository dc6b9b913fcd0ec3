"""SparkSession factory.

Mirrors the capabilities of the reference session builder
(``/root/reference/prediction/preprocessing/spark.py:147-161`` — UTC timezone,
explicit shuffle partitioning) but sized for modern defaults: AQE on, Arrow
on, shuffle partitions matched to available parallelism instead of the
reference's hardcoded 8.

At 100 TB the same code runs unchanged on a real cluster: only ``master`` and
the memory/shuffle knobs move to ``spark-submit`` conf. AQE handles runtime
partition coalescing and skew-join splitting, so a static
``spark.sql.shuffle.partitions`` here is a ceiling, not a tuning cliff.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        try:
            return max(1, int(cpus))
        except ValueError:
            pass
    return os.cpu_count() or 4


def runtime_filter_conf(
    creation_side_threshold: str = "10GB",
    application_side_threshold: str = "10GB",
) -> dict[str, str]:
    """Configs that let Catalyst inject runtime bloom-filter semi-join
    reduction: when a join's build side is selective (a filtered dim or
    fact slice), a bloom filter built from its join keys is pushed into
    the probe side's scan, cutting the shuffled volume BEFORE the join.

    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~1% that can match. Thresholds gate injection
    to joins where it pays (probe side large, build side bounded); tests
    set ``application_side_threshold='0'`` so the rewrite is observable at
    local scale.
    """
    return {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": (
            creation_side_threshold
        ),
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": application_side_threshold,
    }


def get_spark(
    app_name: str = "bigdata-weather-system-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are safe for both local[N] testing and cluster submission:
    configs that only apply at JVM start (driver memory) are no-ops when a
    session already exists.
    """
    par = shuffle_partitions or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bound what ONE Arrow batch may carry into a Python worker. The
        # default is 2 GiB; with the 10k-row default batch of multi-KB
        # binary blobs, every concurrent worker can hold ~1 GB on both
        # sides of the boundary — at local[32] that is a host-memory
        # spike (guide §4.2/§7.4 "Python worker exited unexpectedly").
        # 64 MiB keeps worker RSS bounded at no measurable bench cost;
        # override via env for cluster profiles.
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get(
                "SPARK_GRAFT_ARROW_MAX_BYTES", str(64 * 1024 * 1024)
            ),
        )
        # A crashed worker reports its Python traceback instead of a bare
        # "exited unexpectedly" (guide §7.4); negligible steady-state cost.
        .config("spark.python.worker.faulthandler.enabled", "true")
        # Python Data Source filter pushdown (sources/weather_sim.py) —
        # off by default in Spark 4.1; harmless when no Python source is used
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{default_parallelism()}]")
    mem = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "32g")
    builder = builder.config("spark.driver.memory", mem)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
