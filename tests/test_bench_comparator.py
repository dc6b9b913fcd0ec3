"""The bench regression comparator must baseline against a FULL prior-round
snapshot, never the driver artifact's truncated tail (round 4 shipped a
false "zero regressions" claim because BENCH_r4.json's tail kept ~15 of
303 queries — VERDICT r4, What's-wrong #1). No Spark needed: pure file
logic, exercised against a temp repo root."""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _load_bench(root):
    """Import bench.py with __file__ pointing at a temp repo root so its
    glob-based round discovery reads our fixtures."""
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    )
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(root, "bench.py")
    )
    with open(src) as f:
        code = f.read()
    with open(os.path.join(root, "bench.py"), "w") as f:
        f.write(code)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write(root, name, payload):
    with open(os.path.join(root, name), "w") as f:
        json.dump(payload, f)


def test_prefers_full_archive_over_driver_tail(tmp_path):
    root = str(tmp_path)
    # driver artifact: truncated tail carrying only 2 per-query lines
    tail = "\n".join(
        [
            json.dumps({"q": "a", "sec": 0.1}),
            json.dumps({"q": "b", "sec": 0.2}),
        ]
    )
    _write(root, "BENCH_r4.json", {"tail": tail})
    _write(root, "CORRECTNESS_r04.json", {})
    full_queries = {f"q{i}": 1.0 for i in range(300)}
    _write(
        root,
        "BENCHFULL_r4.json",
        {"sf": 0.1, "queries": full_queries},
    )
    bench = _load_bench(root)
    assert bench.current_round() == 5
    n, prev = bench.previous_round_queries(0.1)
    assert n == 4
    assert len(prev) == 300  # the archive, not the 2-line tail


def test_skips_same_round_and_mismatched_sf_archives(tmp_path):
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r04.json", {})
    # an earlier run of the LIVE round must not become its own baseline
    _write(root, "BENCHFULL_r5.json", {"sf": 0.1, "queries": {"x": 1.0}})
    # a prior-round archive at the wrong scale factor is not comparable
    _write(root, "BENCHFULL_r4.json", {"sf": 0.01, "queries": {"y": 1.0}})
    _write(
        root, "BENCHFULL_r3.json", {"sf": 0.1, "queries": {"z": 2.0}}
    )
    bench = _load_bench(root)
    n, prev = bench.previous_round_queries(0.1)
    assert (n, prev) == (3, {"z": 2.0})


def test_tail_fallback_only_when_no_archive(tmp_path):
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r04.json", {})
    tail = json.dumps({"q": "a", "sec": 0.5})
    _write(root, "BENCH_r4.json", {"tail": tail})
    bench = _load_bench(root)
    n, prev = bench.previous_round_queries(0.1)
    assert (n, prev) == (4, {"a": 0.5})


def test_tail_fallback_skips_live_round_artifact(tmp_path):
    """A bench run after the driver writes BENCH_r5.json but before
    CORRECTNESS_r05.json must not baseline round 5 against its own
    tail — same guard as the BENCHFULL path."""
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r04.json", {})  # live round = 5
    _write(root, "BENCH_r5.json", {"tail": json.dumps({"q": "x", "sec": 9.0})})
    _write(root, "BENCH_r4.json", {"tail": json.dumps({"q": "a", "sec": 0.5})})
    bench = _load_bench(root)
    n, prev = bench.previous_round_queries(0.1)
    assert (n, prev) == (4, {"a": 0.5})


def test_tail_fallback_skips_mismatched_sf(tmp_path):
    """An sf0.01 iteration run must not embed a prev_total harvested
    from an sf0.1 tail: the summary object inside the tail carries the
    scale factor and a mismatch skips the artifact."""
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r04.json", {})
    tail = "\n".join(
        [
            json.dumps({"q": "a", "sec": 0.5}),
            json.dumps({"metric": "m", "sf": 0.1, "queries": {"a": 0.5}}),
        ]
    )
    _write(root, "BENCH_r4.json", {"tail": tail})
    bench = _load_bench(root)
    assert bench.previous_round_queries(0.01) == (None, {})
    # at the matching scale the same artifact IS usable
    n, prev = bench.previous_round_queries(0.1)
    assert (n, prev) == (4, {"a": 0.5})
