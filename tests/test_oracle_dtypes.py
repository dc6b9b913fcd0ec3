"""Every oracle-paired query must agree with its oracle on column NAMES and
TYPES, not just stringified values — a typed schema/hash compare on the
driver side would otherwise fail on e.g. DuckDB HUGEINT (sum of ints) vs
Spark bigint. Pure plan analysis: no query is executed."""

from __future__ import annotations

import os

import duckdb

from bigdata_weather_system_spark import contract
from bigdata_weather_system_spark.schemas import TESTDATA_TABLES

from conftest import TEST_SF_DIR

import pytest

# Driver-window verification tier: this module is part of `-m smoke`
# (contract/parity/freshness/plan gates, target < 5 min) so a complete
# tests_ok artifact exists even when the full suite does not fit the
# driver's execution window.
pytestmark = pytest.mark.smoke


#: DuckDB type (base name) → expected Spark simpleString dtype.
DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "INTEGER": "int",
    "TIMESTAMP": "timestamp",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "FLOAT": "float",
}


def test_all_oracle_pairs_agree_on_schema(spark):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(TEST_SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    problems = []
    for name, sql in sorted(contract.ORACLES.items()):
        rel = con.sql(sql)  # lazy relation — types come from the plan
        duck = dict(zip(rel.columns, (str(t) for t in rel.types)))
        spark_dtypes = dict(contract.QUERIES[name](spark, TEST_SF_DIR).dtypes)
        if sorted(c.lower() for c in duck) != sorted(c.lower() for c in spark_dtypes):
            problems.append(f"{name}: columns {sorted(duck)} != {sorted(spark_dtypes)}")
            continue
        for col, dt in duck.items():
            base = dt.split("(")[0]
            expected = DUCK_TO_SPARK.get(base)
            if expected is None:
                problems.append(f"{name}.{col}: unmapped DuckDB type {dt}")
            elif spark_dtypes[col] != expected:
                problems.append(
                    f"{name}.{col}: duck={dt} → want spark {expected}, got {spark_dtypes[col]}"
                )
    assert not problems, "\n".join(problems)
