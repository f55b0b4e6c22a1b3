"""Task re-execution: the reference's fault-tolerance contract
(manager reassigns tasks of dead workers — reference
mapreduce/manager/__main__.py:136-140, asserted by its
tests/test_manager_05.py:263-280) maps to Spark's task retry. SURVEY
section 2.A rows 20-21 delegate the mechanism to Spark; this test
DEMONSTRATES it rather than just citing it: a task that crashes on its
first attempt is re-executed and the job completes with exactly-once
results.

Runs in a subprocess because retry count is fixed at session start
(``local[N, maxFailures]``) and the shared test session runs with the
default maxFailures=1.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
from pyspark import TaskContext
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2,2]")  # 2 threads, 2 attempts/task
    .appName("fault-tolerance-proof")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
sc = spark.sparkContext
sc.setLogLevel("ERROR")

def fail_first_attempt(it):
    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    return it

rdd = sc.parallelize(range(1000), 4).mapPartitions(fail_first_attempt)
total = rdd.sum()
count = rdd.count()
assert total == 499500, total   # re-run produced the rows exactly once
assert count == 1000, count
print("FT-OK", flush=True)
spark.stop()
"""


def test_task_reexecution_after_injected_failure():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FT-OK" in proc.stdout
