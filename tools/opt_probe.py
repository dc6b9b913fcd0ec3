"""Optimization probe: isolated timing + plan capture per query.

Usage:
    python tools/opt_probe.py [--tag before|after] [--sf-dir DIR] name [name...]

For each query: warms the tables once, then times the bench action
(``toPandas()``, identical to bench.py) best-of-3 and the noop-sink action
(guide §1.4) best-of-3, and writes ``plans/r<N>/<name>_<tag>.txt`` (--round, default 9) with the
``explain('formatted')`` output. Prints one JSON line per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_weather_system_spark import contract  # noqa: E402
from bigdata_weather_system_spark.schemas import TESTDATA_TABLES  # noqa: E402
from bigdata_weather_system_spark.session import get_spark  # noqa: E402
from bigdata_weather_system_spark.sources.tables import load_table  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="plan file suffix (before/after); no plan written if omitted")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--round", type=int, default=9)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="opt-probe")
    for t in TESTDATA_TABLES:
        load_table(spark, args.sf_dir, t).count()
    # warm the Arrow python worker pool like bench.py does
    from pyspark.sql import functions as F  # noqa: E402
    from pyspark.sql.types import LongType  # noqa: E402

    @F.pandas_udf(LongType())
    def _noop(s):
        return s

    spark.range(1000).select(_noop("id")).collect()

    plan_dir = os.path.join(_REPO, "plans", f"r{args.round:02d}")
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.names:
        fn = contract.QUERIES.get(name)
        if fn is None:
            print(json.dumps({"q": name, "error": "unknown query"}), flush=True)
            continue
        spark.sparkContext.setJobDescription(f"opt-probe:{name}")
        bench_times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).toPandas()
            bench_times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        noop_times = []
        if not args.no_noop:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                (
                    fn(spark, args.sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                noop_times.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        if args.tag:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        rec = {
            "q": name,
            "bench_best": round(min(bench_times), 4),
            "bench_all": [round(x, 4) for x in bench_times],
        }
        if noop_times:
            rec["noop_best"] = round(min(noop_times), 4)
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
