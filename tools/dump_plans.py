#!/usr/bin/env python3
"""Dump `.explain("formatted")` output for named queries to files —
the before/after plan-evidence helper for optimization rounds.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]
       (writes <out_dir>/<query>_<suffix>.txt for each query)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from eecs_485___mapreduce_spark.registry import all_queries
    from eecs_485___mapreduce_spark.session import get_spark

    spark = get_spark(app_name="eecs485-dump-plans")
    reg = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{path}: {len(plan.splitlines())} lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())
