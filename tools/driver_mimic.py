"""Drive the public driver contract end-to-end, exactly as the round
driver does: import __spark_entry__, smoke entry(spark), then run every
queries() entry at sf0.01 against its oracle_sql() via DuckDB
(row count + schema + order-insensitive value hash).

Usage: python tools/driver_mimic.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def r(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return sorted(tuple(r(row[i]) for i in order) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from eecs_485___mapreduce_spark.session import get_spark

    spark = get_spark()

    t0 = time.time()
    flagship = e.entry(spark)
    rows = flagship.collect()
    print(f"entry(): {len(rows)} rows, schema={flagship.schema.simpleString()} "
          f"({time.time()-t0:.1f}s)")
    assert len(rows) >= 0

    con = duckdb.connect()
    con.execute("SET max_temp_directory_size='16GB'")  # an oracle
    # plan cliff must error, never fill the disk under the engine
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            fails += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only {len(s_rows)} rows ({dt:.1f}s)")
            continue
        o = con.execute(oracles[name])
        o_cols = [d[0] for d in o.description]
        o_rows = o.fetchall()
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols {sorted(s_cols)} vs {sorted(o_cols)}")
            fails += 1
        elif norm(s_rows, s_cols) != norm(o_rows, o_cols):
            ns, no = norm(s_rows, s_cols), norm(o_rows, o_cols)
            diff = [(a, b) for a, b in zip(ns, no) if a != b][:2]
            print(f"FAIL {name}: values differ rows={len(s_rows)}/{len(o_rows)} {diff}")
            fails += 1
        else:
            print(f"ok   {name}: MATCH {len(s_rows)} rows ({dt:.1f}s)")
    from eecs_485___mapreduce_spark.functions import release_scope

    released = release_scope()
    print(f"RESULT: {len(qs)} queries, {fails} failures, "
          f"{len(qs) - len(oracles)} rows-only; released {released} cached scopes")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
