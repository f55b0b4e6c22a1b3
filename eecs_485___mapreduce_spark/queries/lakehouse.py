"""Driver-checkable queries over the txnlog ACID table layer.

txnlog.py (lakehouse-style log-structured tables: atomic commits,
snapshot isolation, time travel, CoW DML, CDF) shipped in round 3 as a
LIBRARY surface pinned only by tests. These queries run a fixed
create → DELETE → UPDATE → MERGE (→ OPTIMIZE → VACUUM) chain over the
``orders`` table in a scratch directory and expose the resulting
SNAPSHOT, CHANGE FEED, and TIME TRAVEL as ordinary driver queries —
each with a plain-SQL oracle that reconstructs the same final state
from ``orders`` algebraically. That makes the ACID semantics
themselves (not just the plumbing) part of the DuckDB-checked
correctness gate.

The chain is deterministic: predicates are key-arithmetic over the
immutable input table, so the final state is a pure function of
``orders`` regardless of file layout, partitioning, or commit
directory UUIDs.

Scale: the DML chain is the same affected-file-bounded CoW documented
in txnlog.py — at 100 TB each commit rewrites only files containing
matched rows; these queries aggregate the snapshot/feed with ordinary
partial+final aggs. The scratch build is cached per (sf_dir, variant)
within the process, so repeated driver/bench invocations pay it once.

Reference parity: none — the reference framework (a job-queue
MapReduce over a shared FS) has no table/DML layer at all; this is
north-star surface (SURVEY.md section 2.B sinks/storage family).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import txnlog
from ..functions import dec
from ..registry import register
from ..sources import load_table

# One scratch table per (sf_dir, variant) per process; content is
# deterministic, so reuse across calls is safe and saves the rebuild.
_TABLES: dict[tuple[str, str], str] = {}

# The fixed DML chain (versions 0..3):
_DELETE_PRED = "o_orderstatus = 'F' AND o_orderkey % 10 = 3"
_UPDATE_PRED = "o_orderpriority = '1-URGENT'"
_UPDATE_SET = {"o_orderpriority": "'0-ESCALATED'"}
_MERGE_MOD = "o_orderkey % 1000 = 1"

# DuckDB CTEs reconstructing each intermediate state algebraically.
# MERGE semantics: source rows REPLACE same-key rows and keys not
# present (including previously deleted ones) are INSERTED — so the
# final state is afterupd minus merge keys, plus the source relation.
_STATE_CTES = f"""
    afterdel AS (
      SELECT * FROM orders WHERE NOT ({_DELETE_PRED})
    ),
    afterupd AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate,
             CASE WHEN {_UPDATE_PRED} THEN '0-ESCALATED'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM afterdel
    ),
    mergesrc AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice * 2 AS o_totalprice, o_orderdate,
             o_orderpriority
      FROM orders WHERE {_MERGE_MOD}
    ),
    final AS (
      SELECT * FROM afterupd WHERE NOT ({_MERGE_MOD})
      UNION ALL
      SELECT * FROM mergesrc
    )
"""


def _dml_table(spark: SparkSession, sf_dir: str, variant: str) -> str:
    """Build (once per process) the scratch txnlog table after the
    fixed DML chain. variant='cdf' stops after MERGE so the whole
    change feed and every version stay readable; variant='compacted'
    additionally OPTIMIZEs and VACUUMs down to the latest snapshot —
    the production end-state a reader actually scans.

    I/O discipline (optimization round 9): the compacted variant is a
    SHALLOW CLONE of the cdf table (metadata-only v0 referencing the
    same immutable live files — txn_clone) followed by OPTIMIZE +
    VACUUM, instead of a second full create→DELETE→UPDATE→MERGE chain:
    identical end state by construction (clone references the exact
    live set; compaction is a logical no-op), and the fixture build
    stops paying the DML chain's dozen write jobs twice. Vacuuming the
    clone walks only the clone's OWN data root, so the source table's
    files are untouched (the txn_clone contract)."""
    key = (sf_dir, variant)
    if key in _TABLES:
        return _TABLES[key]
    if variant == "compacted":
        src = _dml_table(spark, sf_dir, "cdf")
        root = tempfile.mkdtemp(prefix="txnlog-q-compacted-")
        tbl = os.path.join(root, "orders_tbl")
        txnlog.txn_clone(src, tbl)  # v0: same live files, zero data copied
        txnlog.txn_compact(spark, tbl, num_files=2)  # v1, logical no-op
        # zero grace: single-writer scratch build, no one in flight.
        # Reclaims nothing but the clone's own data root — the cdf
        # table's files are outside it and stay live for its readers.
        txnlog.txn_vacuum(tbl, retain_versions=1, min_age_s=0.0)
        _TABLES[key] = tbl
        return tbl
    root = tempfile.mkdtemp(prefix=f"txnlog-q-{variant}-")
    tbl = os.path.join(root, "orders_tbl")
    orders = load_table(spark, sf_dir, "orders")
    # num_files=2 (was 4): still multi-file (the CoW affected-file
    # scoping stays exercised — these predicates hit every file under
    # hash distribution anyway), half the write/rewrite tasks per
    # commit. File counts never reach any query output.
    txnlog.txn_create(orders, tbl, num_files=2)  # v0
    txnlog.txn_delete_where(spark, tbl, _DELETE_PRED, num_files=2)  # v1
    txnlog.txn_update_where(spark, tbl, _UPDATE_PRED, _UPDATE_SET,
                            num_files=2)  # v2
    source = orders.where(_MERGE_MOD).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2  # *2 is IEEE-exact
    )
    txnlog.txn_merge(spark, tbl, source, ["o_orderkey"], num_files=2)  # v3
    _TABLES[key] = tbl
    return tbl


@register(
    "txnlog_dml_snapshot",
    tags=("lakehouse", "dml", "agg"),
    oracle=f"""
    WITH {_STATE_CTES}
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM final GROUP BY 1, 2
    """,
)
def txnlog_dml_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID DML end-state: snapshot of the orders table after the
    DELETE → UPDATE → MERGE → OPTIMIZE → VACUUM chain, aggregated per
    (status, priority). The oracle reconstructs the same state
    relationally from the immutable input — so CoW rewrite scoping,
    MERGE upsert semantics, compaction's logical-no-op guarantee, and
    vacuum's keep-set correctness are all value-checked in one row set.
    """
    tbl = _dml_table(spark, sf_dir, "compacted")
    snap = txnlog.read_snapshot(spark, tbl)
    return snap.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


@register(
    "txnlog_cdf_type_counts",
    tags=("lakehouse", "cdf", "agg"),
    oracle=f"""
    WITH {_STATE_CTES},
    expected AS (
      SELECT CAST(0 AS BIGINT) AS commit_version,
             'insert' AS change_type,
             (SELECT COUNT(*) FROM orders) AS n
      UNION ALL
      SELECT 1, 'delete',
             (SELECT COUNT(*) FROM orders WHERE {_DELETE_PRED})
      UNION ALL
      SELECT 2, 'update_preimage',
             (SELECT COUNT(*) FROM afterdel WHERE {_UPDATE_PRED})
      UNION ALL
      SELECT 2, 'update_postimage',
             (SELECT COUNT(*) FROM afterdel WHERE {_UPDATE_PRED})
      UNION ALL
      SELECT 3, 'update_preimage',
             (SELECT COUNT(*) FROM afterupd WHERE {_MERGE_MOD})
      UNION ALL
      SELECT 3, 'update_postimage',
             (SELECT COUNT(*) FROM afterupd WHERE {_MERGE_MOD})
      UNION ALL
      SELECT 3, 'insert',
             (SELECT COUNT(*) FROM orders WHERE {_MERGE_MOD})
             - (SELECT COUNT(*) FROM afterupd WHERE {_MERGE_MOD})
    )
    SELECT commit_version, change_type, CAST(n AS BIGINT) AS n
    FROM expected WHERE n > 0
    """,
)
def txnlog_cdf_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed audit: row counts per (commit version, change
    type) across the whole DML history. The oracle derives every
    expected count from first principles — deletes = predicate matches,
    updates = pre+post pairs, merge = postimages for matched keys plus
    inserts for keys absent at merge time — so the feed's tagging
    semantics (not just its row totals) are value-checked.
    """
    tbl = _dml_table(spark, sf_dir, "cdf")
    feed = txnlog.txn_changes(spark, tbl, 0)
    return feed.groupBy(
        F.col("_commit_version").cast("long").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "txnlog_time_travel_counts",
    tags=("lakehouse", "time-travel"),
    oracle=f"""
    WITH {_STATE_CTES}
    SELECT CAST(0 AS BIGINT) AS version,
           (SELECT COUNT(*) FROM orders) AS n_rows
    UNION ALL SELECT 1, (SELECT COUNT(*) FROM afterdel)
    UNION ALL SELECT 2, (SELECT COUNT(*) FROM afterupd)
    UNION ALL SELECT 3, (SELECT COUNT(*) FROM final)
    """,
)
def txnlog_time_travel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: row count of EVERY retained version of the table,
    each read as an isolated snapshot (version = log replay bound).
    UPDATE preserves cardinality (v2 = v1) and MERGE nets out to
    inserts-minus-nothing here — the oracle states both algebraically.
    """
    tbl = _dml_table(spark, sf_dir, "cdf")
    parts = [
        txnlog.read_snapshot(spark, tbl, version=v)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("version", F.lit(v).cast("long"))
        for v in range(4)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("version", "n_rows")
