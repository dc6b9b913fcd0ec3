"""Ad-hoc: strict parity check for a named subset of contract queries.

Usage: python tools/parity_subset.py q1 q2 ... [--sf-dir DIR]
Same normalization as tools/run_parity.py (driver-equivalent canon).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_weather_system_spark import contract  # noqa: E402
from bigdata_weather_system_spark.schemas import TESTDATA_TABLES  # noqa: E402
from bigdata_weather_system_spark.session import get_spark  # noqa: E402
from tools.run_parity import normalize  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark(app_name="bdws-parity-subset")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    failed = 0
    for name in args.names:
        try:
            sdf = contract.QUERIES[name](spark, args.sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"q": name, "spark_err": str(e)[:500]}))
            failed += 1
            continue
        oracle = contract.ORACLES.get(name)
        if oracle is None:
            print(json.dumps({"q": name, "rows_only": len(srows)}))
            continue
        try:
            res = con.execute(oracle)
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"q": name, "oracle_err": str(e)[:500]}))
            failed += 1
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        sn = normalize(srows, scols)
        dn = normalize(drows, dcols)
        ok = ok_schema and sn == dn
        out = {
            "q": name,
            "rows": (len(srows), len(drows)),
            "schema_match": ok_schema,
            "hash_match": ok,
        }
        if not ok:
            failed += 1
            diffs = [
                (a, b) for a, b in zip(sn, dn) if a != b
            ][:3]
            out["first_diffs"] = repr(diffs)[:600]
            if len(sn) != len(dn):
                out["spark_only"] = repr(
                    [r for r in sn if r not in set(dn)][:2]
                )[:400]
                out["oracle_only"] = repr(
                    [r for r in dn if r not in set(sn)][:2]
                )[:400]
            if not ok_schema:
                out["scols"] = scols
                out["dcols"] = dcols
        print(json.dumps(out))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
