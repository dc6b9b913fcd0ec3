"""Plan doctor: sweep EVERY registered query's physical plan for the
anti-patterns that kill 100 TB runs, and write PLAN_AUDIT.md.

Checked per query (executed-plan string, AQE initial plan — no job is run
for purely-lazy queries; iterative operators that legitimately execute
during construction are noted):

- **row_python_udf** — ``BatchEvalPython`` (row-at-a-time Python): the
  slow path; the engine's contract is Arrow-only Python (``ArrowEvalPython``
  / ``MapInPandas`` / ``FlatMapGroupsInPandas`` are fine and reported
  separately).
- **cartesian** — ``CartesianProduct``: an unbounded all-pairs join that
  made it past the broadcast-nested-loop path.
- **global_sort** — a range-partitioning Exchange that is NOT a
  ``TakeOrderedAndProject``: full sorts of unbounded relations are only
  acceptable as deliberate presentation sorts.
- informational counts: Exchanges, SortMergeJoins, broadcasts, Arrow
  stages — the at-a-glance cost silhouette of each plan.

Hard gates (the audit FAILS, exit 1): any row_python_udf, any cartesian
outside the documented allowlist.

Usage: python tools/plan_doctor.py   (writes PLAN_AUDIT.md at repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_weather_system_spark import contract  # noqa: E402
from bigdata_weather_system_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Queries whose plans legitimately contain an otherwise-flagged shape,
#: with the documented reason (labeled exact baselines, 1-row scalar
#: grids). Kept short on purpose — every entry is a conscious decision.
ALLOW = {
    "row_python_udf": {
        # the ONE deliberate Python UDTF: it exists to pin Spark's
        # table-function extension point (functions/python_udfs.py
        # documents it as off-the-hot-path; explode+split does the same
        # job faster and is what every other query uses)
        "doc_sentences_udtf": "deliberate UDTF surface pin, documented",
    },
    "cartesian": {
        # exact all-pairs cosine baselines: the labeled verify twins of
        # the bucketed scale paths (SemDeDup cells / sign-bit LSH)
        "embedding_near_dup_exact": "labeled exact O(n²) verify baseline",
        "semantic_dedup_accuracy_contract": "contains the exact baseline",
        "dedup_accuracy_contract": "contains the exact baseline",
    },
    "global_sort": {
        # presentation-ordered exports where the full sorted result IS
        # the deliverable (not a top-k)
        "doc_global_text_rank": "two-pass global ranking is the operator",
        # sorted-neighborhood blocking: the global sort by blocking key
        # IS the algorithm (candidates = sliding window over sorted order)
        "snm_candidate_pairs": "sorted-neighborhood method sorts by design",
        # distributed exact quantiles: the range EXCHANGE (not a sort)
        # partitions each value histogram so the frequency prefix-sum
        # runs one bounded window task per range partition — this
        # replaced the single-task percentile() whose final buffer was
        # O(NDV); largest task state is now ~NDV/32
        "lineitem_column_stats": (
            "range-partitioned histogram prefix-sum, the replacement "
            "FOR the old single-task percentile buffer"
        ),
    },
}


def audit(name: str, plan: str) -> dict:
    flags = []
    if "BatchEvalPython" in plan and name not in ALLOW["row_python_udf"]:
        flags.append("row_python_udf")
    if "CartesianProduct" in plan and name not in ALLOW["cartesian"]:
        flags.append("cartesian")
    if (
        "rangepartitioning" in plan
        and "TakeOrderedAndProject" not in plan
        and name not in ALLOW["global_sort"]
    ):
        flags.append("global_sort")
    return {
        "flags": flags,
        "exchanges": len(re.findall(r"Exchange (hash|range|Single)", plan)),
        "smj": plan.count("SortMergeJoin"),
        "broadcast": plan.count("BroadcastExchange"),
        "arrow_python": sum(
            plan.count(s)
            for s in (
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
            )
        ),
    }


def main() -> int:
    spark = get_spark(app_name="plan-doctor")
    rows = []
    n_flagged = 0
    for name in sorted(contract.QUERIES):
        try:
            df = contract.QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            rows.append((name, {"flags": [f"ERROR:{type(e).__name__}"]}))
            n_flagged += 1
            continue
        a = audit(name, plan)
        rows.append((name, a))
        if a["flags"]:
            n_flagged += 1
        print(name, a["flags"] if a["flags"] else "ok", flush=True)

    try:
        import subprocess

        _head = (
            subprocess.run(
                ["git", "-C", REPO, "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        _head = "unknown"
    lines = [
        "# PLAN AUDIT — anti-pattern sweep over every registered query",
        "",
        f"Generated by `tools/plan_doctor.py` at {SF_DIR} over "
        f"{len(rows)} queries at commit {_head}. "
        "Hard gates: zero row-at-a-time Python "
        "stages (`BatchEvalPython`), zero undocumented cartesian joins, "
        "zero undocumented full global sorts. Allowlisted shapes and "
        "their reasons live in the tool.",
        "",
        f"**Result: {n_flagged} flagged / {len(rows)} queries.**",
        "",
        "| query | flags | exchanges | SMJ | broadcasts | arrow stages |",
        "|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        lines.append(
            "| {} | {} | {} | {} | {} | {} |".format(
                name,
                ", ".join(a.get("flags", [])) or "—",
                a.get("exchanges", "?"),
                a.get("smj", "?"),
                a.get("broadcast", "?"),
                a.get("arrow_python", "?"),
            )
        )
    allow_lines = ["", "## Allowlist", ""]
    for kind, entries in ALLOW.items():
        for q, why in entries.items():
            allow_lines.append(f"- `{q}` ({kind}): {why}")
    with open(os.path.join(REPO, "PLAN_AUDIT.md"), "w") as f:
        f.write("\n".join(lines + allow_lines) + "\n")
    print(f"flagged {n_flagged}/{len(rows)}")
    spark.stop()
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
