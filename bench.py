#!/usr/bin/env python3
"""Benchmark harness: run the headline (bench-tagged) queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes through a noop sink (full plan, no driver
collect) after a session warm-up, so timings measure the engine, not
JVM startup or result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from eecs_485___mapreduce_spark.registry import all_queries
    from eecs_485___mapreduce_spark.session import get_spark

    spark = get_spark(app_name="eecs485-bench")
    # Warm up the JVM, codegen, and per-table file listing outside the
    # timed region so timings measure the engine, not first-touch I/O.
    from eecs_485___mapreduce_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    # median of 5 runs per query: the first run pays one-off
    # codegen/JIT compile, so the median lands on a steady-state
    # sample; the per-query spread (max-min across the runs) is
    # reported so a round-over-round delta smaller than the spread
    # reads as noise, not regression. 5 (up from 3) because this host
    # shows multi-second ambient load bursts from outside the process
    # — with 3 samples one burst drags the median, with 5 it must hit
    # three of five.
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    mins: dict[str, float] = {}
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    for name, q in all_queries().items():
        if not q.bench:
            continue
        samples = []
        for _ in range(n_runs):
            t0 = time.time()
            q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)
        spreads[name] = round(samples[-1] - samples[0], 3)
        mins[name] = round(samples[0], 3)

    from eecs_485___mapreduce_spark.functions import release_scope

    release_scope()
    total = round(sum(timings.values()), 3)
    # Host-speed calibration: a fixed pure-Python loop, immune to
    # anything in the engine. Round-over-round bench deltas should be
    # read RELATIVE to this number — the host shows ±25% ambient drift
    # between runs with identical code (observed round 4: totals of
    # 14.4/14.8/18.4 s back-to-back), so a uniform shift across all
    # queries tracks the calibration, while a real regression moves
    # one query against it. queries_min (best of n) is the
    # noise-floor estimator for the same reason.
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i * i
    cpu_calibration_s = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": n_runs,
                "spread": spreads,
                "max_spread": round(max(spreads.values(), default=0.0), 3),
                "queries_min": mins,
                "total_min": round(sum(mins.values()), 3),
                "cpu_calibration_s": cpu_calibration_s,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
