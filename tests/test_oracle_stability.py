"""Oracle run-to-run stability — guards the OTHER side of the gate.

The driver compares one Spark run against one DuckDB run. DuckDB
aggregates float sums across threads in nondeterministic order, so an
oracle whose rounded value sits within an ulp of a rounding boundary
can flip between runs — a gate failure no amount of Spark-side
determinism prevents (observed: user_event_entropy's HHI crossing a
round-6 boundary, 0.204687 vs 0.204688). This sweep runs every oracle
twice in fresh connections and requires identical rows; an
order-sensitive oracle fails here before it flakes in the gate.

The fix for a failure is to restructure the METRIC, not the test:
derive rounded floats from exact integer sums where possible (one final
float op), or round far from observed values' boundaries.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from bigdata_weather_system_spark import contract
from bigdata_weather_system_spark.schemas import TESTDATA_TABLES

from conftest import TEST_SF_DIR


def _run(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        rows = con.execute(sql).fetchall()
    finally:
        con.close()
    return sorted(tuple(repr(v) for v in r) for r in rows)


@pytest.mark.parametrize("name", sorted(contract.ORACLES))
def test_oracle_result_is_run_stable(name):
    sql = contract.ORACLES[name]
    a = _run(sql, TEST_SF_DIR)
    b = _run(sql, TEST_SF_DIR)
    assert a == b, (
        f"{name}: oracle result differs between runs — a float aggregate "
        "is crossing a rounding boundary under threaded accumulation; "
        "restructure the metric (exact integer sums + one final division)"
    )
