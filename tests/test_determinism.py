"""Partition-count invariance — the determinism the driver gate assumes.

The driver runs queries in ITS OWN session (different shuffle
partitioning, different parallelism). Any query whose result depends on
partition/combine order — an unordered first(), an unrounded float sum,
a collect_list without a frame ordering — would pass a same-session
mirror and still flake in the gate. Here every oracle-paired query runs
under two very different shuffle-partition settings and must produce
identical normalized rows (same normalization as test_oracle_parity).
"""

from __future__ import annotations

import pytest

from bigdata_weather_system_spark import contract

from conftest import TEST_SF_DIR
from test_oracle_parity import normalize

QUERY_NAMES = sorted(contract.ORACLES)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_result_invariant_to_shuffle_partitioning(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    fn = contract.QUERIES[name]
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        df_a = fn(spark, TEST_SF_DIR)
        rows_a = normalize([tuple(r) for r in df_a.collect()], df_a.columns)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        df_b = fn(spark, TEST_SF_DIR)
        rows_b = normalize([tuple(r) for r in df_b.collect()], df_b.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert rows_a == rows_b, (
        f"{name}: result depends on shuffle partitioning "
        f"({sum(1 for a, b in zip(rows_a, rows_b) if a != b)} rows differ)"
    )
