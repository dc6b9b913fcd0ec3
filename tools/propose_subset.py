"""Emit SUBSET_PROPOSAL_r{N}.json: a 50-query rotating driver-check
sample, stratified by contract family and seeded by round number.

The driver has re-checked the same frozen 50-query subset since round 1,
so 355 of 405 registered queries have never received a driver-verified
correctness row (they are builder-verified via PARITY_r{N}.json, which
runs the driver's own check shape over the full registry). This artifact
is the harness-owner proposal: draw each round's 50 from every family,
proportionally to family size (≥1 per family), with a deterministic
per-round seed so successive rounds rotate through the registry instead
of resampling the same rows.

Usage: python tools/propose_subset.py --round N
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_weather_system_spark import contract  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBSET_SIZE = 50


def families() -> dict[str, list[str]]:
    fams: dict[str, list[str]] = defaultdict(list)
    for name, fn in contract.QUERIES.items():
        fams[inspect.getmodule(fn).__name__.rsplit(".", 1)[-1]].append(name)
    return {k: sorted(v) for k, v in sorted(fams.items())}


def pick(round_no: int) -> dict:
    fams = families()
    total = sum(len(v) for v in fams.values())
    # proportional allocation with ≥1 per family, largest-remainder fill
    quota = {f: max(1, len(v) * SUBSET_SIZE // total) for f, v in fams.items()}
    while sum(quota.values()) < SUBSET_SIZE:
        f = max(
            fams,
            key=lambda f: (len(fams[f]) * SUBSET_SIZE / total - quota[f], f),
        )
        quota[f] += 1
    while sum(quota.values()) > SUBSET_SIZE:
        f = max(
            (f for f in fams if quota[f] > 1),
            key=lambda f: (quota[f] - len(fams[f]) * SUBSET_SIZE / total, f),
        )
        quota[f] -= 1

    chosen: list[str] = []
    for f, names in fams.items():
        # deterministic per-round rotation: rank by md5(round || name);
        # different rounds produce disjoint-leaning samples, same round
        # reproduces exactly
        ranked = sorted(
            names,
            key=lambda n: hashlib.md5(
                f"r{round_no}:{n}".encode()
            ).hexdigest(),
        )
        chosen.extend(ranked[: quota[f]])
    return {
        "round": round_no,
        "subset_size": SUBSET_SIZE,
        "registry_size": total,
        "queries": sorted(chosen),
        "family_coverage": {
            f: {"in_subset": quota[f], "in_registry": len(fams[f])}
            for f in fams
        },
        "note": (
            "harness-owner proposal: rotate the driver's 50-query "
            "correctness sample each round (stratified by family, "
            "md5(round||name) rotation) so every registered query "
            "eventually receives a driver-verified row"
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()
    out = pick(args.round)
    path = os.path.join(REPO, f"SUBSET_PROPOSAL_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
