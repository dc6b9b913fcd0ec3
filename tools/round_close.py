"""One-command round-close artifact emitter (VERDICT r5, Next #5).

Round 5 ended without a committed ``PARITY_r5.json`` — the judge had to
run the full-registry parity itself. This script makes the round-close
artifact set self-enforcing: one command emits everything, and
``tests/test_doc_drift.py::test_newest_parity_artifact_matches_registry_size``
fails whenever the committed parity artifact is stale relative to the
live registry (e.g. queries were added without re-running it).

Artifacts, in dependency-free order:

1. ``SUBSET_PROPOSAL_r{N}.json``  — tools/propose_subset.py (no Spark)
2. ``PLAN_AUDIT.md``              — tools/plan_doctor.py (~5 min)
3. ``PARITY_r{N}.json``           — tools/run_parity.py (~8 min)
4. ``BENCHFULL_r*/BENCHHIST``     — bench.py at sf0.1 (~13 min),
                                    skipped when bench_full.json is
                                    younger than --bench-max-age-h

Usage:
    python tools/round_close.py [--round N] [--skip-bench] [--check]

``--check`` only validates that the current round's artifacts exist and
match the registry — exit 1 with a listing otherwise.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def live_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def _registry_size() -> int:
    from bigdata_weather_system_spark import contract

    return len(contract.QUERIES)


def check(round_no: int) -> list[str]:
    """Return a list of problems (empty == round-close artifacts OK)."""
    problems: list[str] = []
    parity = os.path.join(REPO, f"PARITY_r{round_no}.json")
    if not os.path.exists(parity):
        problems.append(f"missing {os.path.basename(parity)}")
    else:
        try:
            with open(parity) as f:
                n = json.load(f)["summary"]["n_queries"]
            live = _registry_size()
            if n != live:
                problems.append(
                    f"PARITY_r{round_no} covers {n} queries, registry "
                    f"has {live} — stale, re-run tools/run_parity.py"
                )
        except (OSError, ValueError, KeyError) as e:
            problems.append(f"unreadable {parity}: {e}")
    sub = os.path.join(REPO, f"SUBSET_PROPOSAL_r{round_no}.json")
    if not os.path.exists(sub):
        problems.append(f"missing {os.path.basename(sub)}")
    if not os.path.exists(os.path.join(REPO, "BENCHHIST.jsonl")):
        problems.append("missing BENCHHIST.jsonl (run bench.py at sf0.1)")
    if not os.path.exists(os.path.join(REPO, "PLAN_AUDIT.md")):
        problems.append("missing PLAN_AUDIT.md (run tools/plan_doctor.py)")
    problems += untriaged_close_regressions(round_no)
    return problems


def untriaged_close_regressions(round_no: int) -> list[str]:
    """Regression flags in the round's close artifact that SCALING.md
    never adjudicates (round-7 What's-wrong #1: the close was refreshed
    after the triage was written, and four of its six flags shipped
    untriaged). Every name in the committed ``BENCHFULL_r{N}.json``'s
    ``regressions`` must appear in SCALING.md — the exact drift-gate
    recipe PLAN_AUDIT got in round 7. ``regressions_retime_required``
    entries are exempt: they carry their own host-noise-suspect
    annotation in the artifact itself."""
    bfp = os.path.join(REPO, f"BENCHFULL_r{round_no}.json")
    if not os.path.exists(bfp):
        return []
    try:
        with open(bfp) as f:
            payload = json.load(f)
    except (OSError, ValueError) as e:
        return [f"unreadable {os.path.basename(bfp)}: {e}"]
    flags = list(payload.get("regressions") or {})
    if not flags:
        return []
    try:
        with open(os.path.join(REPO, "SCALING.md")) as f:
            scaling = f.read()
    except OSError:
        return [
            f"BENCHFULL_r{round_no} has {len(flags)} regression flags "
            "but SCALING.md is missing"
        ]
    return [
        f"BENCHFULL_r{round_no} regression '{name}' has no SCALING.md "
        "adjudication — triage it (real+intentional / host-noise with "
        "isolated re-time / upgrade path) before closing the round"
        for name in flags
        if name not in scaling
    ]


def _covers_live_bench(bench_full_path: str) -> bool:
    """A bench_full.json may only stand in for the close run if it
    covers the LIVE bench list — a payload from before this round's
    queries were added measures the wrong code and would synthesize a
    close entry with stale coverage under the current HEAD."""
    try:
        import bench

        with open(bench_full_path) as f:
            payload = json.load(f)
        if payload.get("sf") != 0.1:
            # an ad-hoc sf0.01 iteration run must never stand in for the
            # canonical sf0.1 close measurement
            print(
                f"== bench_full.json is sf={payload.get('sf')}, not the "
                "canonical 0.1 — running the close bench instead"
            )
            return False
        have = set(payload.get("queries") or {})
        want = {q for q in bench.BENCH_QUERIES}
        missing = want - have
        if missing:
            print(
                f"== bench_full.json misses {len(missing)} live bench "
                f"queries (e.g. {sorted(missing)[:3]}) — running the "
                "close bench instead of reusing it"
            )
        return not missing
    except (OSError, ValueError):
        return False


def synthesize_close_entry(bench_full_path: str) -> None:
    """Append a close-stamped BENCHHIST entry derived from an existing
    (fresh) bench_full.json instead of re-running the sweep. Carries
    provenance: the reused file's mtime and the current HEAD, plus
    ``"reused": true`` so a reader knows the timings predate any commits
    between the sweep and the close."""
    import bench

    with open(bench_full_path) as f:
        payload = json.load(f)
    queries = payload.get("queries") or {}
    if not queries:
        print(
            f"!! {bench_full_path} carries no per-query payload — "
            "cannot synthesize a close entry; run bench.py",
            file=sys.stderr,
        )
        sys.exit(1)
    head = None
    try:
        head = (
            subprocess.run(
                ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or None
        )
    except Exception:
        pass
    sent = payload.get("sentinel") or {}
    bench.benchhist_append(
        {
            "live": bench.current_round(),
            "ts": round(time.time(), 1),
            "head": head,
            "sf": payload.get("sf"),
            "total": payload.get("value"),
            "sentinel": {
                s: round(min(v1, v2), 4)
                for s, v1 in (sent.get("start") or {}).items()
                if (v2 := (sent.get("end") or {}).get(s)) is not None
            },
            "load_suspect": sent.get("load_suspect"),
            "queries": queries,
            "close": True,
            "reused": True,
            "source_mtime": round(os.path.getmtime(bench_full_path), 1),
        }
    )


def _run(cmd: list[str]) -> None:
    print(f"== {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO)
    print(f"== done in {time.time() - t0:.0f}s (rc={r.returncode})")
    if r.returncode != 0:
        sys.exit(r.returncode)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=live_round())
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--bench-max-age-h", type=float, default=6.0)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if args.check:
        problems = check(args.round)
        for p in problems:
            print(f"STALE: {p}")
        if not problems:
            print(f"round-{args.round} close artifacts all present/fresh")
        return 1 if problems else 0

    py = sys.executable
    _run([py, "tools/propose_subset.py", "--round", str(args.round)])
    _run([py, "tools/plan_doctor.py"])
    _run([py, "tools/run_parity.py", "--round", str(args.round)])
    bf = os.path.join(REPO, "bench_full.json")
    fresh = (
        os.path.exists(bf)
        and time.time() - os.path.getmtime(bf)
        < args.bench_max_age_h * 3600
        and _covers_live_bench(bf)
    )
    if args.skip_bench or fresh:
        # A skipped bench must STILL leave a close-stamped BENCHHIST
        # entry, or the next round's first mid-round run becomes the
        # group's first entry and benchhist_baseline silently baselines
        # that round against its own early code (ADVICE r6 #2). Reuse
        # the fresh payload: same queries/timings, stamped close with
        # provenance.
        print(
            "== bench skipped (fresh bench_full.json or --skip-bench); "
            "synthesizing close-stamped BENCHHIST entry from it"
        )
        synthesize_close_entry(bf)
    else:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
            SPARK_GRAFT_BENCH_ROLE="close",
        )
        print("== bench.py at sf0.1 (close-stamped)", flush=True)
        r = subprocess.run([py, "bench.py"], cwd=REPO, env=env)
        if r.returncode != 0:
            return r.returncode
    problems = check(args.round)
    for p in problems:
        print(f"STALE: {p}")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
