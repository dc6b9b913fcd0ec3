"""Engine CLI: list and run any registered contract query from a shell.

Usage:
  python tools/engine_cli.py list [--filter SUBSTR]
  python tools/engine_cli.py run QUERY [--sf-dir DIR] [--limit N]
                                       [--format table|json|csv]
  python tools/engine_cli.py explain QUERY [--sf-dir DIR]
  python tools/engine_cli.py sql "SELECT ..." [--sf-dir DIR] [--limit N]

`sql` registers the testdata tables as temp views (region, nation,
customer, supplier, part, orders, lineitem, events, documents,
embeddings) and runs arbitrary Spark SQL against them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _spark():
    from bigdata_weather_system_spark.session import get_spark

    return get_spark(app_name="engine-cli")


def cmd_list(args) -> int:
    from bigdata_weather_system_spark import contract

    for name in sorted(contract.QUERIES):
        if args.filter and args.filter not in name:
            continue
        kind = "sql-oracle" if name in contract.ORACLES else "rows-only"
        print(f"{name}  [{kind}]")
    return 0


def _emit(df, fmt: str, limit: int | None) -> None:
    if limit:
        df = df.limit(limit)
    if fmt == "json":
        for row in df.toJSON().collect():
            print(row)
    elif fmt == "csv":
        rows = df.collect()
        print(",".join(df.columns))
        for r in rows:
            print(",".join("" if v is None else str(v) for v in r))
    else:
        df.show(limit or 20, truncate=False)


def cmd_run(args) -> int:
    from bigdata_weather_system_spark import contract

    if args.query not in contract.QUERIES:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2
    df = contract.QUERIES[args.query](_spark(), args.sf_dir)
    _emit(df, args.format, args.limit)
    return 0


def cmd_explain(args) -> int:
    from bigdata_weather_system_spark import contract

    if args.query not in contract.QUERIES:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2
    df = contract.QUERIES[args.query](_spark(), args.sf_dir)
    df.explain("formatted")
    return 0


def cmd_sql(args) -> int:
    from bigdata_weather_system_spark.sources.tables import register_views

    spark = _spark()
    register_views(spark, args.sf_dir)
    _emit(spark.sql(args.statement), args.format, args.limit)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="engine_cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("list")
    pl.add_argument("--filter", default=None)
    pl.set_defaults(fn=cmd_list)

    for name, fn in (("run", cmd_run), ("explain", cmd_explain)):
        pr = sub.add_parser(name)
        pr.add_argument("query")
        pr.add_argument("--sf-dir", default=DEFAULT_SF)
        pr.add_argument("--limit", type=int, default=None)
        pr.add_argument(
            "--format", choices=("table", "json", "csv"), default="table"
        )
        pr.set_defaults(fn=fn)

    ps = sub.add_parser("sql")
    ps.add_argument("statement")
    ps.add_argument("--sf-dir", default=DEFAULT_SF)
    ps.add_argument("--limit", type=int, default=None)
    ps.add_argument(
        "--format", choices=("table", "json", "csv"), default="table"
    )
    ps.set_defaults(fn=cmd_sql)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
