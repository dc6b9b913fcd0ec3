"""Ad-hoc parity runner: mirror the driver's correctness gate for a subset
of contract queries (or all) without the full pytest session.

Usage: python tools/parity_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_weather_system_spark import contract  # noqa: E402
from bigdata_weather_system_spark.schemas import TESTDATA_TABLES  # noqa: E402
from bigdata_weather_system_spark.session import get_spark  # noqa: E402


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else repr(v))
            elif isinstance(v, (list, tuple)):
                vals.append(repr(list(v)))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        names = sorted(contract.ORACLES)
    spark = get_spark(app_name="parity-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    failures = 0
    for name in names:
        try:
            sdf = contract.QUERIES[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            spark.catalog.clearCache()  # no cross-query cache buildup
            res = con.execute(contract.ORACLES[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols {sorted(scols)} vs {sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            failures += 1
            continue
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        bad = [(a, b) for a, b in zip(sn, dn) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
            failures += 1
        else:
            print(f"ok   {name} ({len(srows)} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
