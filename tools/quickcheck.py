#!/usr/bin/env python3
"""Ad-hoc single-query oracle check at sf0.001 (same normalize as the
pytest harness): ``python tools/quickcheck.py name1 name2 ...``"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    import duckdb

    from eecs_485___mapreduce_spark.registry import all_queries
    from eecs_485___mapreduce_spark.session import get_spark
    from tests.conftest import normalize

    names = sys.argv[1:]
    qs = all_queries()
    spark = get_spark(app_name="quickcheck")
    duck = duckdb.connect()
    duck.execute("SET max_temp_directory_size='16GB'")  # an oracle
    # plan cliff must error, never fill the disk under the engine
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    fails = 0
    for name in names:
        q = qs[name]
        sdf = q.fn(spark, SF)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_cols = sdf.columns
        if q.oracle is None:
            print(f"ok   {name}: rows-only, {len(s_rows)} rows")
            continue
        res = duck.execute(q.oracle)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols {s_cols} vs {o_cols}")
            fails += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: {len(s_rows)} vs {len(o_rows)} rows")
            fails += 1
            continue
        ns, no = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
        if ns != no:
            print(f"FAIL {name}: values differ")
            for i, (x, y) in enumerate(zip(ns, no)):
                if x != y:
                    print("  spark :", x)
                    print("  oracle:", y)
                    if i > 3:
                        break
            fails += 1
        else:
            print(f"ok   {name}: MATCH {len(s_rows)} rows")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
