"""One-off full-registry partition-invariance sweep: run EVERY
registered query under the default layout, then under a
low-parallelism layout (shuffle=3, AQE off) and a high-fan-out layout
(shuffle=97, 64 KB scan splits), and report any query whose
normalized rows differ. The permanent curated version of this check
is tests/test_partition_invariance.py; this tool is the exhaustive
sweep for round evidence.

Usage: python tools/invariance_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

LOW = {
    "spark.sql.shuffle.partitions": "3",
    "spark.sql.adaptive.enabled": "false",
}
HIGH = {
    "spark.sql.shuffle.partitions": "97",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.adaptive.enabled": "true",
}


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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from eecs_485___mapreduce_spark.functions import release_scope
    from eecs_485___mapreduce_spark.registry import all_queries
    from eecs_485___mapreduce_spark.session import get_spark

    spark = get_spark(app_name="invariance-sweep")
    qs = all_queries()
    names = [n for n in qs if not only or n in only]

    def run(name, conf):
        saved = {k: spark.conf.get(k) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        release_scope(sf_dir)
        try:
            df = qs[name].fn(spark, sf_dir)
            return norm(df.collect(), df.columns)
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
            release_scope(sf_dir)

    bad, errs = [], []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            base = run(name, {})
            low = run(name, LOW)
            high = run(name, HIGH)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            errs.append(name)
            print(f"ERR  {name}: {type(exc).__name__}: {exc}", flush=True)
            continue
        ok_low, ok_high = low == base, high == base
        status = "ok " if ok_low and ok_high else "DIFF"
        if not (ok_low and ok_high):
            bad.append((name, ok_low, ok_high))
        print(
            f"{status} [{i}/{len(names)}] {name}: rows={len(base)} "
            f"low={'=' if ok_low else 'X'} high={'=' if ok_high else 'X'} "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )
    print(f"RESULT: {len(names)} swept, {len(bad)} layout-dependent, "
          f"{len(errs)} errors")
    for name, ok_low, ok_high in bad:
        print(f"  DIFF {name} low_ok={ok_low} high_ok={ok_high}")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
