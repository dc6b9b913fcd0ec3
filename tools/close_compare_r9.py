"""Round-9 close comparison: per-query min of the two close sweeps vs
the per-query min of the two round-start baselines (same methodology on
both sides — best defense this host's episodic stalls allow).

Usage: python tools/close_compare_r9.py /tmp/close1_full.json bench_full.json
"""

from __future__ import annotations

import json
import math
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    base = json.load(open(os.path.join(_REPO, "BASELINE_MIN_r9.json")))
    closes = [json.load(open(p))["queries"] for p in sys.argv[1:]]
    close = {
        k: min(c[k] for c in closes if k in c)
        for k in closes[0]
    }
    common = [k for k in close if base.get(k, 0) > 0]
    ratios = {k: close[k] / base[k] for k in common}
    geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(common))
    med = sorted(ratios.values())[len(common) // 2]
    out = {
        "n_common": len(common),
        "base_total": round(sum(base[k] for k in common), 1),
        "close_total": round(sum(close[k] for k in common), 1),
        "geomean_close_over_base": round(geo, 4),
        "median_close_over_base": round(med, 4),
        "improved_>20pct": sum(1 for r in ratios.values() if r < 0.8),
        "regressed_>25pct_and_>0.5s": sorted(
            (k, round(base[k], 2), round(close[k], 2), round(r, 2))
            for k, r in ratios.items()
            if r > 1.25 and close[k] - base[k] > 0.5
        ),
        "top_wins": sorted(
            ((round(r, 2), k, round(base[k], 2), round(close[k], 2))
             for k, r in ratios.items() if base[k] > 0.8),
        )[:20],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
