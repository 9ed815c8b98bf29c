"""Command-line runner: the engine's user-facing entry point.

    python -m redis_dataflow_realtime_analytics_spark list
    python -m redis_dataflow_realtime_analytics_spark run <query> \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--format table|json|csv]
    python -m redis_dataflow_realtime_analytics_spark explain <query> [--sf-dir ...]

``list`` prints every catalogued query (oracled ones marked); ``run``
executes one and prints rows; ``explain`` prints the formatted physical
plan (the artifact SCALE.md's claims are checked against).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from .session import get_spark

    return get_spark(app_name="rdra-cli")


def main(argv: list[str] | None = None) -> int:
    from . import registry

    ap = argparse.ArgumentParser(prog="redis_dataflow_realtime_analytics_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalogued queries")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("query", choices=sorted(registry.QUERIES))
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
            p.add_argument(
                "--format", choices=("table", "json", "csv"), default="table"
            )

    args = ap.parse_args(argv)

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            mark = "sql-oracle" if name in registry.ORACLE else "rows-only"
            print(f"{name:45s} {mark}")
        return 0

    spark = _spark()
    df = registry.QUERIES[args.query](spark, args.sf_dir)

    if args.cmd == "explain":
        from .plans.inspect import plan_string

        print(plan_string(df))
        return 0

    rows = df.limit(args.limit).collect()
    cols = df.columns
    if args.format == "table":
        df.limit(args.limit).show(args.limit, truncate=40)
    elif args.format == "json":
        for r in rows:
            print(json.dumps({c: str(r[c]) for c in cols}))
    else:
        print(",".join(cols))
        for r in rows:
            print(",".join(str(r[c]) for c in cols))
    return 0


if __name__ == "__main__":
    sys.exit(main())
