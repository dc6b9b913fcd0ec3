"""Engine CLI: list/run/sql entry points."""

from __future__ import annotations

def test_engine_cli_list_run_and_sql(capsys):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import engine_cli

    assert engine_cli.main(["list", "--filter", "q1_"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary  [sql-oracle]" in out

    assert engine_cli.main([
        "run", "average_day", "--sf-dir", "/root/testdata/sf0.001",
        "--format", "csv",
    ]) == 0
    out = capsys.readouterr().out
    lines = out.splitlines()
    assert lines[0] == "day,average_value,n_events"
    assert len(lines) == 2  # single-row query + header

    assert engine_cli.main(["run", "nope"]) == 2


def test_round_close_rejects_non_canonical_sf_bench_payload(tmp_path):
    """A fresh sf0.01 iteration run of bench.py must never stand in for
    the canonical sf0.1 close measurement (its timings would poison the
    synthesized close-stamped BENCHHIST entry)."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "round_close_under_test", os.path.join(repo, "tools/round_close.py")
    )
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    p = tmp_path / "bench_full.json"
    p.write_text(json.dumps({"sf": 0.01, "queries": {"q1_pricing_summary": 1.0}}))
    assert rc._covers_live_bench(str(p)) is False
    # same payload at the canonical sf but missing live queries → also False
    p.write_text(json.dumps({"sf": 0.1, "queries": {"q1_pricing_summary": 1.0}}))
    assert rc._covers_live_bench(str(p)) is False
