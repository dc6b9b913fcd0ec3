"""Driver-canon safety for registered queries.

The driver runs EVERY registered query — rows-only ones included — and
canonicalizes results through pandas (``sort_values`` over all columns).
Round 1's only red row was a query whose nested array<struct> output made
that canonicalizer throw ``TypeError: unhashable type: 'list'`` — the
driver does NOT stringify complex cells before sorting. Two guards here:

1. A schema-level sweep over ALL registered queries: no output column may
   be array/map/struct/binary. This is plan-only (no execution) and
   catches the round-1 failure class at its root.
2. For rows-only queries (no oracle — the driver still collects and
   canonicalizes them), execute at sf0.001 and replicate the driver's
   canon EXACTLY: raw ``sort_values`` with no preprocessing, so any shape
   pandas cannot sort fails here before it fails in the gate.
"""

from __future__ import annotations

import pandas as pd
import pytest

from bigdata_weather_system_spark import contract

from conftest import TEST_SF_DIR

ROWS_ONLY = sorted(set(contract.QUERIES) - set(contract.ORACLES))

_COMPLEX_PREFIXES = ("array<", "map<", "struct<", "binary")


def test_no_query_returns_complex_columns(spark):
    offenders = {}
    for name, fn in sorted(contract.QUERIES.items()):
        df = fn(spark, TEST_SF_DIR)
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(_COMPLEX_PREFIXES)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries returning driver-canon-unsafe column types (the driver's "
        f"pandas sort_values dies on list/dict/bytes cells): {offenders}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs_and_canonicalizes(spark, name):
    df = contract.QUERIES[name](spark, TEST_SF_DIR)
    rows = df.collect()
    # the driver's canon, replicated verbatim: pandas frame sorted by every
    # column with NO preprocessing — if this throws here, it throws there
    pdf = pd.DataFrame([list(row) for row in rows], columns=df.columns)
    if len(pdf):
        pdf.sort_values(by=list(pdf.columns), inplace=True)
    assert len(rows) >= 0  # ran, collected, canonicalized
