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
    tail = "\n".join(
        [
            json.dumps({"q": "a", "sec": 0.5}),
            # summary object carries the run's sf — without it the strict
            # scale guard (round-5 ADVICE) rejects the artifact
            json.dumps({"queries": {"a": 0.5}, "sf": 0.1}),
        ]
    )
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
    tail5 = "\n".join(
        [
            json.dumps({"q": "x", "sec": 9.0}),
            json.dumps({"queries": {"x": 9.0}, "sf": 0.1}),
        ]
    )
    tail4 = "\n".join(
        [
            json.dumps({"q": "a", "sec": 0.5}),
            json.dumps({"queries": {"a": 0.5}, "sf": 0.1}),
        ]
    )
    _write(root, "BENCH_r5.json", {"tail": tail5})
    _write(root, "BENCH_r4.json", {"tail": tail4})
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


def test_benchhist_driver_sequenced_layout_baselines_prior_round(tmp_path):
    """Round-5 What's-wrong #4: the driver writes CORRECTNESS_r{N} and
    THEN runs bench, so its close-of-round-N run sees live N+1 and used
    to baseline against the builder's mid-round BENCHFULL_r{N} (same
    round's code). With the history, every run of a live group baselines
    against the group's FIRST entry — the prior round's close."""
    root = str(tmp_path)
    bench = _load_bench(root)
    # round-1 close: driver wrote CORRECTNESS_r1, bench ran at live=2
    _write(root, "CORRECTNESS_r01.json", {})
    close_r1 = {f"q{i}": 1.0 for i in range(300)}
    bench.benchhist_append(
        {"live": 2, "sf": 0.1, "queries": close_r1, "sentinel": {}}
    )
    # builder iterates mid-round-2 (twice); entries append at live=2
    for t in (0.5, 0.4):
        n, prev = bench.previous_round_queries(0.1)
        assert n == 1  # group live=2 → measures round 1's close
        assert prev == close_r1
        bench.benchhist_append(
            {
                "live": 2,
                "sf": 0.1,
                "queries": {k: t for k in close_r1},
                "sentinel": {},
            }
        )
    # driver closes round 2: CORRECTNESS_r2 lands BEFORE its bench run
    _write(root, "CORRECTNESS_r02.json", {})
    assert bench.current_round() == 3
    n, prev = bench.previous_round_queries(0.1)
    # still the FIRST live=2 entry (round-1 close), NOT the builder's
    # mid-round-2 snapshots and NOT any same-round artifact
    assert n == 1
    assert prev == close_r1


def test_benchhist_preferred_over_full_archive(tmp_path):
    root = str(tmp_path)
    bench = _load_bench(root)
    _write(root, "CORRECTNESS_r01.json", {})
    _write(
        root,
        "BENCHFULL_r1.json",
        {"sf": 0.1, "queries": {f"q{i}": 9.0 for i in range(300)}},
    )
    hist_q = {f"q{i}": 1.5 for i in range(300)}
    bench.benchhist_append(
        {"live": 2, "sf": 0.1, "queries": hist_q, "sentinel": {}}
    )
    n, prev = bench.previous_round_queries(0.1)
    assert prev == hist_q and n == 1


def test_benchhist_skips_mismatched_sf(tmp_path):
    root = str(tmp_path)
    bench = _load_bench(root)
    _write(root, "CORRECTNESS_r01.json", {})
    bench.benchhist_append(
        {"live": 2, "sf": 0.01, "queries": {"a": 1.0}, "sentinel": {}}
    )
    n, prev = bench.previous_round_queries(0.1)
    assert prev == {} and n is None


def test_tail_fallback_skips_artifact_with_unknown_sf(tmp_path):
    """Round-5 ADVICE: a tail truncated before its summary object leaves
    payload_sf unknown — when the caller requests a specific sf, such an
    artifact must be skipped, not accepted as a maybe-mismatched-scale
    baseline."""
    root = str(tmp_path)
    tail = "\n".join(
        json.dumps({"q": f"q{i}", "sec": 0.1}) for i in range(20)
    )
    _write(root, "BENCH_r1.json", {"tail": tail})  # no sf anywhere
    _write(root, "CORRECTNESS_r01.json", {})
    bench = _load_bench(root)
    n, prev = bench.previous_round_queries(0.1)
    assert prev == {} and n is None
    # with no sf requested the artifact is still harvestable
    n, prev = bench.previous_round_queries(None)
    assert len(prev) == 20 and n == 1


# ---------------------------------------------------------------------------
# Load-sentinel zone classification (round-6 blind spot: start-loaded /
# end-quiet sweeps inflated early queries — bm25_ndcg_eval flagged 2.42x,
# re-timed clean — while the both-probes rule reported the run clean).
# ---------------------------------------------------------------------------


def _zones(tmp_path, ss, se, fl, order):
    bench = _load_bench(str(tmp_path))
    return bench.load_suspect_zones(ss, se, fl, order)


def test_both_probes_loaded_flags_whole_run(tmp_path):
    order = [f"q{i}" for i in range(12)]
    flag, zone = _zones(
        tmp_path, {"a": 2.0}, {"a": 2.0}, {"a": 1.0}, order
    )
    assert flag is True
    assert zone == set(order)


def test_start_loaded_end_quiet_suppresses_first_quartile_only(tmp_path):
    order = [f"q{i}" for i in range(12)]
    flag, zone = _zones(
        tmp_path, {"a": 2.3}, {"a": 1.0}, {"a": 1.0}, order
    )
    assert flag is False
    assert zone == set(order[:3])


def test_end_loaded_start_quiet_suppresses_last_quartile_only(tmp_path):
    order = [f"q{i}" for i in range(12)]
    flag, zone = _zones(
        tmp_path, {"a": 1.0}, {"a": 2.3}, {"a": 1.0}, order
    )
    assert flag is False
    assert zone == set(order[-3:])


def test_quiet_run_suppresses_nothing(tmp_path):
    order = [f"q{i}" for i in range(12)]
    flag, zone = _zones(
        tmp_path, {"a": 1.0}, {"a": 1.2}, {"a": 1.0}, order
    )
    assert flag is False
    assert zone == set()


def test_no_floor_history_means_no_judgement(tmp_path):
    flag, zone = _zones(tmp_path, {"a": 1.0}, {"a": 1.0}, {}, ["q0"])
    assert flag is None
    assert zone == set()


def test_short_order_still_suppresses_at_least_one(tmp_path):
    flag, zone = _zones(
        tmp_path, {"a": 9.0}, {"a": 1.0}, {"a": 1.0}, ["q0", "q1"]
    )
    assert flag is False
    assert zone == {"q0"}


# ---------------------------------------------------------------------------
# Close-stamped BENCHHIST entries (ADVICE r6 #2: a fresh-bench skip at
# round close left no close entry, so the next round's first mid-round
# run became the group's first entry and the round baselined against
# its own early code).
# ---------------------------------------------------------------------------


def _write_hist(root, entries):
    with open(os.path.join(root, "BENCHHIST.jsonl"), "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")


def test_close_stamped_entry_preferred_over_first_of_group(tmp_path):
    root = str(tmp_path)
    _write_hist(
        root,
        [
            # builder's round-6 close (final HEAD of round 6)
            {"live": 6, "sf": 0.1, "close": True,
             "queries": {"a": 1.0, "b": 2.0}},
            # driver's close-of-6 run — earlier first-of-group-7 entry,
            # may predate late round-6 commits
            {"live": 7, "sf": 0.1, "queries": {"a": 9.0, "b": 9.0}},
        ],
    )
    bench = _load_bench(root)
    rnd, q = bench.benchhist_baseline(7, 0.1)
    assert rnd == 6
    assert q == {"a": 1.0, "b": 2.0}


def test_first_of_group_wins_when_it_covers_a_later_round(tmp_path):
    root = str(tmp_path)
    _write_hist(
        root,
        [
            {"live": 4, "sf": 0.1, "close": True, "queries": {"a": 1.0}},
            # group 7's first entry measures round 6 — newer than the
            # stale close of round 4
            {"live": 7, "sf": 0.1, "queries": {"a": 5.0}},
        ],
    )
    bench = _load_bench(root)
    rnd, q = bench.benchhist_baseline(7, 0.1)
    assert rnd == 6
    assert q == {"a": 5.0}


def test_same_round_close_never_baselines_itself(tmp_path):
    root = str(tmp_path)
    _write_hist(
        root,
        [
            {"live": 6, "sf": 0.1, "close": True, "queries": {"a": 1.0}},
            # a close stamped during the CURRENT round must not serve as
            # the current round's own baseline
            {"live": 7, "sf": 0.1, "close": True, "queries": {"a": 0.1}},
        ],
    )
    bench = _load_bench(root)
    rnd, q = bench.benchhist_baseline(7, 0.1)
    assert rnd == 6
    assert q == {"a": 1.0}


def test_unstamped_history_behaves_as_before(tmp_path):
    root = str(tmp_path)
    _write_hist(
        root,
        [
            {"live": 6, "sf": 0.1, "queries": {"a": 3.0}},
            {"live": 6, "sf": 0.1, "queries": {"a": 2.0}},
            {"live": 7, "sf": 0.1, "queries": {"a": 1.0}},
        ],
    )
    bench = _load_bench(root)
    rnd, q = bench.benchhist_baseline(7, 0.1)
    assert rnd == 6
    assert q == {"a": 1.0}


# ---------------------------------------------------------------------------
# Mid-run sentinel probes (round-7 blind spot: three unchanged-code flags
# at 36-43% of execution order escaped the fixed first-quartile zone under
# ~2.1x start sentinels).
# ---------------------------------------------------------------------------


def test_mid_probes_track_load_decay_into_second_quartile(tmp_path):
    """Driver-style start-loaded replay where the load persists through
    the 25% probe and clears by 50%: the SECOND quartile must be
    suppressed too (the round-7 escape), not just the first."""
    bench = _load_bench(str(tmp_path))
    order = [f"q{i}" for i in range(16)]
    flag, zone = bench.load_suspect_zones(
        {"a": 2.3},
        {"a": 1.0},
        {"a": 1.0},
        order,
        mid_probes=[{"a": 2.2}, {"a": 1.0}, {"a": 1.0}],
    )
    assert flag is False
    assert zone == set(order[:8])  # quartiles 1 AND 2, tracking decay


def test_mid_probes_quiet_interior_limits_zone_to_first_quartile(tmp_path):
    """Load that clears before the 25% probe suppresses only the first
    quartile — same outcome as the legacy rule, now measured."""
    bench = _load_bench(str(tmp_path))
    order = [f"q{i}" for i in range(16)]
    flag, zone = bench.load_suspect_zones(
        {"a": 2.3},
        {"a": 1.0},
        {"a": 1.0},
        order,
        mid_probes=[{"a": 1.0}, {"a": 1.0}, {"a": 1.0}],
    )
    assert flag is False
    assert zone == set(order[:4])


def test_mid_probes_all_loaded_flags_whole_run(tmp_path):
    bench = _load_bench(str(tmp_path))
    order = [f"q{i}" for i in range(8)]
    flag, zone = bench.load_suspect_zones(
        {"a": 2.0},
        {"a": 2.0},
        {"a": 1.0},
        order,
        mid_probes=[{"a": 2.0}, {"a": 2.0}, {"a": 2.0}],
    )
    assert flag is True and zone == set(order)


def test_mid_probes_interior_spike_taints_adjacent_segments(tmp_path):
    """A mid-sweep load spike (quiet start/end) must taint the two
    segments the loaded probe bounds — a shape the legacy two-probe rule
    could not see at all."""
    bench = _load_bench(str(tmp_path))
    order = [f"q{i}" for i in range(16)]
    flag, zone = bench.load_suspect_zones(
        {"a": 1.0},
        {"a": 1.0},
        {"a": 1.0},
        order,
        mid_probes=[{"a": 1.0}, {"a": 2.5}, {"a": 1.0}],
    )
    assert flag is False
    assert zone == set(order[4:12])  # segments around the 50% probe


# ---------------------------------------------------------------------------
# Unchanged-code flag splitting (round-7 What's-wrong #1: four flags on
# code untouched since the baseline shipped as clean regressions).
# ---------------------------------------------------------------------------


def test_unchanged_code_flags_move_to_retime_required(tmp_path):
    bench = _load_bench(str(tmp_path))
    flagged = {
        "untouched_q": {"prev": 1.0, "now": 2.0, "ratio": 2.0},
        "touched_q": {"prev": 1.0, "now": 2.0, "ratio": 2.0},
    }
    deps = {
        "untouched_q": {"pkg/a.py"},
        "touched_q": {"pkg/b.py"},
    }
    clean, retime = bench.split_unchanged_code_flags(
        flagged, deps.get, changed={"pkg/b.py"}
    )
    assert set(clean) == {"touched_q"}
    assert set(retime) == {"untouched_q"}
    assert "re-time required" in retime["untouched_q"]["note"]


def test_no_provenance_keeps_every_flag_clean(tmp_path):
    """changed=None (git/artifact provenance unavailable) must never
    silently suppress — all flags stay in the clean set."""
    bench = _load_bench(str(tmp_path))
    flagged = {"q": {"prev": 1.0, "now": 2.0, "ratio": 2.0}}
    clean, retime = bench.split_unchanged_code_flags(
        flagged, lambda n: {"pkg/a.py"}, changed=None
    )
    assert clean == flagged and retime == {}


def test_empty_depset_never_tags_untouched(tmp_path):
    """A query whose dependency set could not be resolved must stay a
    clean flag (unknown deps are not evidence of unchanged code)."""
    bench = _load_bench(str(tmp_path))
    flagged = {"q": {"prev": 1.0, "now": 2.0, "ratio": 2.0}}
    clean, retime = bench.split_unchanged_code_flags(
        flagged, lambda n: set(), changed={"pkg/a.py"}
    )
    assert clean == flagged and retime == {}


def test_query_dep_files_resolves_contract_and_operator_modules():
    """Against the real repo: an LSH contract query's dependency set
    must include both its contract module and the operator module the
    result flows through."""
    # load by explicit path: earlier _load_bench calls prepend tmp roots
    # to sys.path, so a bare `import bench` could find a tmp copy whose
    # _REPO points at an empty directory
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    )
    spec = importlib.util.spec_from_file_location("bench_real_repo", src)
    real_bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(real_bench)

    deps = real_bench.query_dep_files("minhash_lsh_near_dups")
    assert any(p.endswith("contract/llm_ops.py") for p in deps)
    assert any(p.endswith("operators/dedup.py") for p in deps)
