"""Physical-plan guards: the properties that keep queries fast at 100 TB.

These assertions pin the plan SHAPES — filter/column pushdown into the
parquet scan, broadcast joins for small dims, window-group-limit for
rank-filter patterns, partial aggregation — so a refactor that silently
degrades one of them fails CI, not the benchmark.
"""

from __future__ import annotations

import pytest

from bigdata_weather_system_spark import contract

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = contract.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_and_columns_pushed_to_scan(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns are read
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" not in scan and "l_partkey" not in scan


def test_q1_partial_aggregation(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_revenue_by_nation_broadcasts_all_dims(spark):
    plan = plan_of(spark, "revenue_by_nation")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # fact scan reads only the join key + measure
    fact_scan = next(
        l for l in plan.splitlines() if "FileScan parquet" in l and "o_custkey" in l
    )
    assert "o_orderdate" not in fact_scan


def test_latest_per_key_uses_window_group_limit(spark):
    plan = plan_of(spark, "latest_event_per_user")
    # Spark 3.5+: rank-filter pushdown runs a partial top-1 before the shuffle
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_profile_branches_share_distribution(spark):
    plan = plan_of(spark, "hourly_profile")
    # modal join must be broadcast (bucket cardinality << rows), never SMJ
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # contract variant skips the presentation sort → no range exchange
    assert "rangepartitioning" not in plan


def test_topk_plans_take_ordered(spark):
    plan = plan_of(spark, "topk_events_by_value")
    assert "TakeOrderedAndProject" in plan  # no global sort materialized


def test_average_day_prunes_with_sargable_predicate(spark):
    plan = plan_of(spark, "average_day")
    # to_date(ts) == lit stays a data filter; the scan must not read value
    # rows for other projections
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "event_type" not in scan and "props" not in scan
