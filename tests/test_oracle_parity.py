"""Local mirror of the driver's correctness gate.

For every registered query with an oracle, run the Spark query and the
DuckDB oracle SQL on the same parquet tables (sf0.001 for speed) and compare
row count, column names, and order-insensitive values — the same contract
the driver enforces at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from bigdata_weather_system_spark import contract
from bigdata_weather_system_spark.schemas import TESTDATA_TABLES

from conftest import TEST_SF_DIR

# Driver-window verification tier: this module is part of `-m smoke`
# (contract/parity/freshness/plan gates, target < 5 min) so a complete
# tests_ok artifact exists even when the full suite does not fit the
# driver's execution window.
pytestmark = pytest.mark.smoke



def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(rows, cols):
    """Sort columns by name, stringify values STRICTLY (raw repr, no float
    leniency) — the driver hashes raw values, so a mirror that rounds to 6
    significant digits would hide exactly the half-ulp/rounding-boundary
    divergences that flip the gate (observed: IEEE -0.0 vs 0.0, and
    engine round() disagreement on exact .xx5 doubles). Queries are
    responsible for emitting bit-identical values on both engines."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else repr(v))
            elif isinstance(v, (list, tuple)):
                vals.append(repr(list(v)))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


ORACLE_QUERIES = sorted(contract.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    sf_dir = TEST_SF_DIR
    sdf = contract.QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    res = con.execute(contract.ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = normalize(spark_rows, spark_cols)
    d_norm = normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[0]}"


def test_every_query_has_callable():
    for name, fn in contract.QUERIES.items():
        assert callable(fn), name
