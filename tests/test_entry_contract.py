"""Driver-contract surface smoke: `__spark_entry__` exposes entry(spark),
queries() and oracle_sql() with the registry sizes the driver expects.

The driver consumes the engine exclusively through this module, with a
session it builds itself — so the test intentionally goes through the
module-level functions rather than any engine helper.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

pytestmark = pytest.mark.smoke


def test_contract_surface_shapes():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert callable(next(iter(qs.values())))
    # every oracle names a registered query; never the reverse requirement
    assert set(oracles) <= set(qs)
    # registry never shrinks round-over-round (dropping a declared query
    # is an automatic regression)
    assert len(qs) >= 444
    assert len(oracles) >= 442


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
