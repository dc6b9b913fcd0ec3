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
