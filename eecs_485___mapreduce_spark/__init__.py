"""PySpark-native analytics engine with the capabilities of the
teagejohnson/EECS-485---MapReduce reference framework.

The reference (read-only at /root/reference) is a multi-process
MapReduce framework: Manager/Worker processes scheduling user-supplied
streaming executables over line-oriented text, with md5-hash
partitioning, per-partition external sort, and k-way merge
(see SURVEY.md). Spark *is* that machinery, so this package rebuilds
the reference's observable capabilities Spark-first:

- ``sources``    : text-directory / parquet / csv / json scans
- ``operators``  : wordcount, grep, exec-compat pipe map/reduce, dedup
                   (exact, MinHash-LSH, SimHash, n-gram Jaccard),
                   similarity search, text analysis
- ``functions``  : reusable column expressions (decimal-exact
                   aggregates, tokenizers, hash families, cosine)
- ``queries``    : the declared query surface (SURVEY.md section 2) —
                   every query has a DuckDB oracle where SQL-expressible
- ``streaming``  : Structured Streaming over event streams
- ``multimodal`` : binary-column (image/audio) plumbing with stubbed
                   decoders
- ``plans``      : plan-inspection helpers (pushdown / broadcast
                   assertions) used by tests and the perf harness

Everything is DataFrame/Catalyst-native; Python touches data only via
Arrow-batched pandas UDFs, and ``rdd.pipe`` exists solely for the
exec-compat layer that mirrors the reference's streaming-executable
contract (mapreduce/worker/__main__.py:130-148 in the reference).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
