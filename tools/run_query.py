#!/usr/bin/env python3
"""Run any registered query and print its result — the user-facing
front door for ad-hoc use (the oracle-comparing siblings are
tools/selfcheck.py and tools/quickcheck.py):

    python tools/run_query.py <query-name> [sf_dir] [--limit N]
    python tools/run_query.py --list [substring]

``sf_dir`` defaults to $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    limit = 50
    explain = "--explain" in args
    if explain:
        args.remove("--explain")
    if "--limit" in args:
        i = args.index("--limit")
        limit = int(args[i + 1])
        del args[i : i + 2]

    from eecs_485___mapreduce_spark.registry import all_queries

    qs = all_queries()
    if not args or args[0] == "--list":
        needle = args[1].lower() if len(args) > 1 else ""
        for name, q in sorted(qs.items()):
            if needle in name:
                kind = "oracle" if q.oracle else "rows-only"
                print(f"{name:42s} [{kind}] {','.join(q.tags)}")
        return 0

    name = args[0]
    if name not in qs:
        close = [n for n in qs if name in n]
        print(f"unknown query {name!r}" + (f"; close: {close[:8]}" if close else ""))
        return 2
    sf_dir = (
        args[1]
        if len(args) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )

    from eecs_485___mapreduce_spark.functions import release_scope
    from eecs_485___mapreduce_spark.session import get_spark

    spark = get_spark(app_name=f"run-{name}")
    df = qs[name].fn(spark, sf_dir)
    if explain:
        from eecs_485___mapreduce_spark.plans import physical_plan

        print(physical_plan(df))
    df.show(limit, truncate=40)
    print(f"({name} at {sf_dir}; showing up to {limit} rows)")
    release_scope(sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
