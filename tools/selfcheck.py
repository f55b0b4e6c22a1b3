"""Local mimic of the driver's correctness gate: run every registry
query on Spark and its DuckDB oracle side-by-side, compare row count,
schema shape, and an order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows, then render values canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    out = [tuple(render(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from eecs_485___mapreduce_spark.registry import all_queries
    from eecs_485___mapreduce_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    con.execute("SET max_temp_directory_size='16GB'")  # an oracle
    # plan cliff must error, never fill the disk under the engine
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    failures = 0
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:500]}
            failures += 1
            print(f"FAIL {name}: SPARK_ERROR {str(e)[:300]}")
            continue
        if q.oracle is None:
            results[name] = {"status": "ROWS_ONLY", "rows": len(s_rows),
                             "sec": round(time.time() - t0, 2)}
            print(f"ok   {name}: rows-only, {len(s_rows)} rows")
            continue
        try:
            o = con.execute(q.oracle)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:500]}
            failures += 1
            print(f"FAIL {name}: ORACLE_ERROR {str(e)[:300]}")
            continue
        status = "MATCH"
        detail = ""
        if sorted(s_cols) != sorted(o_cols):
            status, detail = "COLS_MISMATCH", f"spark={sorted(s_cols)} oracle={sorted(o_cols)}"
        elif len(s_rows) != len(o_rows):
            status, detail = "ROWCOUNT_MISMATCH", f"spark={len(s_rows)} oracle={len(o_rows)}"
        else:
            ns, no = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
            if ns != no:
                status = "VALUE_MISMATCH"
                diffs = [(a, b) for a, b in zip(ns, no) if a != b][:3]
                detail = f"first diffs: {diffs}"
        results[name] = {"status": status, "rows": len(s_rows),
                         "sec": round(time.time() - t0, 2), "detail": detail[:400]}
        if status != "MATCH":
            failures += 1
            print(f"FAIL {name}: {status} {detail[:300]}")
        else:
            print(f"ok   {name}: MATCH {len(s_rows)} rows ({results[name]['sec']}s)")

    print(json.dumps({"failures": failures, "n": len(results)}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
