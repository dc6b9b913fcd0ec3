"""Driver-canon safety for rows-only queries.

The driver runs EVERY registered query — rows-only ones included — and
canonicalizes results through pandas (sort_values over all columns).
Round 1's only red row was a rows-only query whose nested
array<struct> output made that canonicalizer throw. This test runs each
rows-only query at sf0.001 and replicates the canonicalization, so an
un-sortable output shape fails here before it fails in the gate.
"""

from __future__ import annotations

import pandas as pd
import pytest

from bigdata_weather_system_spark import contract

from conftest import TEST_SF_DIR

ROWS_ONLY = sorted(set(contract.QUERIES) - set(contract.ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs_and_canonicalizes(spark, name):
    df = contract.QUERIES[name](spark, TEST_SF_DIR)
    rows = df.collect()
    # the driver's canon: pandas frame sorted by every column — lists are
    # unhashable/unorderable, so stringify the way its hash step does
    pdf = pd.DataFrame(
        [[repr(v) if isinstance(v, (list, dict, bytearray, bytes)) else v
          for v in row] for row in rows],
        columns=df.columns,
    )
    if len(pdf):
        pdf.sort_values(by=list(pdf.columns), inplace=True)
    assert len(rows) >= 0  # ran, collected, canonicalized
