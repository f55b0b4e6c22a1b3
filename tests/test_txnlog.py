"""Transaction-log table layout: the ACID-on-parquet contract.

What must hold (the public Delta/Iceberg protocol, scaled to tests):
atomic versioned commits, snapshot isolation (an old version's read
set is immutable), time travel, copy-on-write deletes bounded by
affected files, logically-no-op compaction, losers of the version
race get TxnConflict, orphan files from crashed writers are invisible
and vacuumable, and retained time travel survives vacuum.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from eecs_485___mapreduce_spark import txnlog
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


@pytest.fixture()
def table(spark, tmp_path):
    """v0: orders with o_orderkey < 750; v1: append the rest
    (orderkeys are dense 0..1499 at sf0.001, so both halves are
    non-empty)."""
    d = str(tmp_path / "orders_tbl")
    orders = load_table(spark, SF_SMALL, "orders")
    txnlog.txn_create(orders.where("o_orderkey < 750"), d, num_files=3)
    txnlog.txn_append(orders.where("o_orderkey >= 750"), d, num_files=3)
    return d, orders


def test_create_append_time_travel(spark, table):
    d, orders = table
    total = orders.count()
    v0 = orders.where("o_orderkey < 750").count()
    assert txnlog.read_snapshot(spark, d).count() == total
    assert txnlog.read_snapshot(spark, d, version=0).count() == v0
    assert [c["op"] for c in txnlog.txn_history(d)] == ["create", "append"]
    # log-only planning stats agree with the data
    assert txnlog.snapshot_stats(d) == {"files": 6, "rows": total}
    assert txnlog.snapshot_stats(d, version=0)["rows"] == v0


def test_delete_where_is_copy_on_write_of_affected_files_only(spark, table):
    d, orders = table
    before = set(txnlog._live_files(d))
    commit = txnlog.txn_delete_where(spark, d, "o_orderkey % 100 = 7", num_files=2)
    # only files that actually contained matches were rewritten
    assert set(commit["remove"]) <= before
    assert commit["remove"], "predicate matches rows, so some file is affected"
    carried = before - set(commit["remove"])
    assert carried <= set(txnlog._live_files(d))  # untouched files carried by ref
    # rows: exactly the matching rows disappeared, nothing else
    want = orders.where("NOT (o_orderkey % 100 = 7)").count()
    snap = txnlog.read_snapshot(spark, d)
    assert snap.count() == want
    assert snap.where("o_orderkey % 100 = 7").count() == 0
    # time travel still sees the pre-delete table
    assert txnlog.read_snapshot(spark, d, version=1).count() == orders.count()


def test_delete_with_no_matches_commits_empty_change(spark, table):
    d, _ = table
    before = txnlog._live_files(d)
    commit = txnlog.txn_delete_where(spark, d, "o_orderkey < 0")
    assert commit["add"] == [] and commit["remove"] == []
    assert txnlog._live_files(d) == before


def test_compact_is_logical_noop_and_shrinks_files(spark, table):
    d, orders = table
    stats_before = txnlog.snapshot_stats(d)
    checksum_before = txnlog.read_snapshot(spark, d).agg(
        F.sum("o_orderkey").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    txnlog.txn_compact(spark, d, num_files=1)
    stats_after = txnlog.snapshot_stats(d)
    assert stats_after["rows"] == stats_before["rows"]
    assert stats_after["files"] == 1 < stats_before["files"]
    after = txnlog.read_snapshot(spark, d).agg(
        F.sum("o_orderkey").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert (after.s, after.n) == (checksum_before.s, checksum_before.n)
    # pre-compaction versions still read the OLD files (snapshot isolation)
    assert txnlog.read_snapshot(spark, d, version=1).count() == orders.count()


def test_merge_upserts_and_rewrites_only_affected_files(spark, table):
    d, orders = table
    before = set(txnlog._live_files(d))
    # source: 20 updated rows (priority overwritten) + 5 brand-new keys
    updates = (
        orders.where("o_orderkey < 20")
        .withColumn("o_orderpriority", F.lit("0-MERGED"))
    )
    inserts = orders.where("o_orderkey < 5").withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000
    )
    commit = txnlog.txn_merge(
        spark, d, updates.unionByName(inserts), ["o_orderkey"], num_files=2
    )
    assert commit["op"] == "merge"
    assert commit["remove"], "matched keys live somewhere, files are affected"
    assert set(commit["remove"]) <= before
    carried = before - set(commit["remove"])
    assert carried <= set(txnlog._live_files(d))  # untouched files by ref
    snap = txnlog.read_snapshot(spark, d)
    assert snap.count() == orders.count() + 5  # updates replace, inserts add
    assert snap.where("o_orderpriority = '0-MERGED'").count() == 20
    assert snap.where("o_orderkey >= 1000000").count() == 5
    assert snap.select("o_orderkey").distinct().count() == snap.count()
    # time travel still sees the pre-merge values
    pre = txnlog.read_snapshot(spark, d, version=1)
    assert pre.where("o_orderpriority = '0-MERGED'").count() == 0


def test_update_where_rewrites_only_affected_files(spark, table):
    d, orders = table
    before = set(txnlog._live_files(d))
    commit = txnlog.txn_update_where(
        spark,
        d,
        "o_orderkey % 100 = 3",
        {"o_orderpriority": "'9-UPDATED'", "o_totalprice": "o_totalprice * 2"},
        num_files=2,
    )
    assert commit["op"] == "update" and commit["remove"]
    assert set(commit["remove"]) <= before
    assert (before - set(commit["remove"])) <= set(txnlog._live_files(d))
    snap = txnlog.read_snapshot(spark, d)
    n_hit = orders.where("o_orderkey % 100 = 3").count()
    assert snap.count() == orders.count()  # UPDATE never changes row count
    assert snap.where("o_orderpriority = '9-UPDATED'").count() == n_hit
    # SET expressions evaluate against the pre-update row
    want = orders.where("o_orderkey % 100 = 3").agg(
        F.sum(F.col("o_totalprice") * 2).alias("s")
    ).collect()[0].s
    got = snap.where("o_orderkey % 100 = 3").agg(
        F.sum("o_totalprice").alias("s")
    ).collect()[0].s
    assert abs(got - want) < 1e-6
    # non-matching rows and time travel untouched
    assert txnlog.read_snapshot(spark, d, version=1).where(
        "o_orderpriority = '9-UPDATED'"
    ).count() == 0


def test_append_with_new_column_evolves_schema(spark, table):
    d, orders = table
    evolved = orders.limit(10).withColumn(
        "o_orderkey", F.col("o_orderkey") + 3_000_000
    ).withColumn("quality_score", F.lit(0.5))
    txnlog.txn_append(evolved, d, num_files=1)
    snap = txnlog.read_snapshot(spark, d)
    assert "quality_score" in snap.columns
    assert snap.count() == orders.count() + 10
    # pre-evolution rows read the new column as NULL
    assert snap.where("quality_score IS NULL").count() == orders.count()
    assert snap.where("quality_score = 0.5").count() == 10


def test_merge_with_all_new_keys_is_pure_insert(spark, table):
    d, orders = table
    before = txnlog._live_files(d)
    inserts = orders.limit(7).withColumn(
        "o_orderkey", F.col("o_orderkey") + 2_000_000
    )
    commit = txnlog.txn_merge(spark, d, inserts, ["o_orderkey"])
    assert commit["remove"] == []  # nothing rewritten
    assert set(before) <= set(txnlog._live_files(d))
    assert txnlog.read_snapshot(spark, d).count() == orders.count() + 7


def test_clustered_compact_gives_disjoint_file_ranges(spark, table):
    d, orders = table
    txnlog.txn_compact(spark, d, num_files=4, cluster_by=["o_orderkey"])
    stats = txnlog.snapshot_stats(d)
    assert stats["rows"] == orders.count()
    assert 1 < stats["files"] <= 4
    # each rewritten file owns a disjoint o_orderkey range (the
    # property min/max zone maps prune on)
    ranges = []
    for f in txnlog._live_files(d):
        row = spark.read.parquet(f).agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        ).collect()[0]
        ranges.append((row.lo, row.hi))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo


def test_change_feed_replays_every_commit(spark, table):
    """The CDF contract: for every commit v,
    snapshot(v) == snapshot(v-1) - (delete ∪ update_preimage)
                               + (insert ∪ update_postimage),
    row-for-row (exceptAll both directions empty). Exercises all five
    ops: create/append (synthesized inserts), delete, update, merge,
    and compaction (empty feed)."""
    d, orders = table  # v0 create, v1 append
    txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 1")  # v2
    txnlog.txn_update_where(  # v3
        spark, d, "o_orderkey % 10 = 2", {"o_orderpriority": "'X-CDF'"}
    )
    src = orders.where("o_orderkey IN (4, 14)").unionByName(
        orders.limit(3).withColumn(
            "o_orderkey", F.col("o_orderkey") + 5_000_000
        )
    )
    txnlog.txn_merge(spark, d, src, ["o_orderkey"])  # v4
    txnlog.txn_compact(spark, d)  # v5
    cols = txnlog.read_snapshot(spark, d).columns
    for v in range(1, 6):
        prev = txnlog.read_snapshot(spark, d, version=v - 1).select(*cols)
        cur = txnlog.read_snapshot(spark, d, version=v).select(*cols)
        feed = txnlog.txn_changes(spark, d, v, v)
        assert set(feed.select("_commit_version").distinct().toPandas()[
            "_commit_version"
        ]) <= {v}
        minus = feed.where(
            "_change_type IN ('delete', 'update_preimage')"
        ).select(*cols)
        plus = feed.where(
            "_change_type IN ('insert', 'update_postimage')"
        ).select(*cols)
        replayed = prev.exceptAll(minus).unionAll(plus)
        assert replayed.exceptAll(cur).count() == 0, f"v{v}: extra rows"
        assert cur.exceptAll(replayed).count() == 0, f"v{v}: missing rows"


def test_change_feed_types_per_op(spark, table):
    d, orders = table
    txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 1")  # v2
    src = orders.where("o_orderkey IN (4, 14)").unionByName(
        orders.limit(2).withColumn(
            "o_orderkey", F.col("o_orderkey") + 5_000_000
        )
    )
    txnlog.txn_merge(spark, d, src, ["o_orderkey"])  # v3
    n_del = orders.where("o_orderkey % 10 = 1").count()
    by_type = {
        (r._commit_version, r._change_type): r.n
        for r in txnlog.txn_changes(spark, d, 0)
        .groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_type[(0, "insert")] == orders.where("o_orderkey < 750").count()
    assert by_type[(2, "delete")] == n_del
    assert by_type[(3, "update_preimage")] == 2
    assert by_type[(3, "update_postimage")] == 2
    assert by_type[(3, "insert")] == 2


def test_change_feed_maintains_dedup_key_index_incrementally(spark, tmp_path):
    """The production loop the CDF exists for: a derived dedup key
    index (md5(canonical text) → live count) follows a documents
    txn-table through append / delete / update by consuming ONLY the
    change feed — and must equal a full snapshot recompute at every
    step."""
    from eecs_485___mapreduce_spark.functions import canonical_text

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.md5(canonical_text("text")).alias("k")
    )
    d = str(tmp_path / "docs_tbl")
    txnlog.txn_create(docs.where("doc_id < 300"), d, num_files=2)

    def recompute():
        return (
            txnlog.read_snapshot(spark, d)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    index = recompute()  # bootstrap at v0
    txnlog.txn_append(docs.where("doc_id >= 300 AND doc_id < 400"), d)  # v1
    txnlog.txn_delete_where(spark, d, "doc_id % 7 = 0")  # v2
    txnlog.txn_update_where(  # v3: rewrites keys of the touched docs
        spark, d, "doc_id % 11 = 3", {"k": "md5(k)"}
    )
    feed = txnlog.txn_changes(spark, d, 1, 3)
    index = txnlog.apply_changes_to_count_view(index, feed, ["k"])
    truth = recompute()
    assert index.exceptAll(truth).count() == 0
    assert truth.exceptAll(index).count() == 0
    assert index.count() > 0


def test_txnfeed_streaming_source_exactly_once_across_restarts(spark, table, tmp_path):
    """readStream over the commit log (offsets = versions): one drain
    emits every change of every commit exactly once; commits landing
    after the drain are picked up by a restart from the same
    checkpoint WITHOUT re-emitting; the consumed feed patches an empty
    state into the current snapshot (the CDF replay rule, now through
    a real checkpointed stream)."""
    from eecs_485___mapreduce_spark.sources import TxnFeedDataSource

    spark.dataSource.register(TxnFeedDataSource)
    d, orders = table  # v0 create, v1 append
    sink = str(tmp_path / "feed_sink")
    ckpt = str(tmp_path / "feed_ckpt")

    def drain():
        q = (
            spark.readStream.format("txnfeed")
            .option("path", d)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = spark.read.parquet(sink)
    assert got.where("_change_type = 'insert'").count() == orders.count()
    assert set(
        r._commit_version
        for r in got.select("_commit_version").distinct().collect()
    ) == {0, 1}

    txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 1")  # v2
    txnlog.txn_update_where(  # v3
        spark, d, "o_orderkey % 10 = 2", {"o_orderpriority": "'X-FEED'"}
    )
    drain()  # restart: only v2..v3 are new
    feed = spark.read.parquet(sink)
    n_del = orders.where("o_orderkey % 10 = 1").count()
    n_upd = orders.where("o_orderkey % 10 = 2").count()
    assert feed.where("_change_type = 'delete'").count() == n_del
    assert feed.where("_change_type = 'update_preimage'").count() == n_upd
    assert feed.where("_change_type = 'update_postimage'").count() == n_upd
    assert feed.where("_change_type = 'insert'").count() == orders.count()
    # replaying the WHOLE consumed feed from empty state reproduces
    # the current snapshot row-for-row
    cols = txnlog.read_snapshot(spark, d).columns
    plus = feed.where(
        "_change_type IN ('insert', 'update_postimage')"
    ).select(*cols)
    minus = feed.where(
        "_change_type IN ('delete', 'update_preimage')"
    ).select(*cols)
    replayed = plus.exceptAll(minus)
    cur = txnlog.read_snapshot(spark, d).select(*cols)
    assert replayed.exceptAll(cur).count() == 0
    assert cur.exceptAll(replayed).count() == 0


def test_txnfeed_null_fills_evolved_columns(spark, table, tmp_path):
    """After schema evolution, a fresh feed subscription reads the
    UNION schema: pre-evolution commits null-fill the new column."""
    from eecs_485___mapreduce_spark.sources import TxnFeedDataSource

    spark.dataSource.register(TxnFeedDataSource)
    d, orders = table
    evolved = orders.limit(4).withColumn(
        "o_orderkey", F.col("o_orderkey") + 9_000_000
    ).withColumn("quality_score", F.lit(0.25))
    txnlog.txn_append(evolved, d, num_files=1)  # v2 evolves the schema
    sink = str(tmp_path / "evo_sink")
    q = (
        spark.readStream.format("txnfeed")
        .option("path", d)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "evo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(sink)
    assert "quality_score" in feed.columns
    assert feed.where("quality_score IS NULL").count() == orders.count()
    assert feed.where("quality_score = 0.25").count() == 4


def test_dml_on_emptied_table_is_safe(spark, table):
    """Delete everything, then every op must still behave: delete/
    update/compact become no-op commits, merge becomes a pure insert,
    append revives the table."""
    d, orders = table
    txnlog.txn_delete_where(spark, d, "TRUE")  # v2 empties the table
    with pytest.raises(Exception):
        txnlog.read_snapshot(spark, d)
    assert txnlog.snapshot_stats(d) == {"files": 0, "rows": 0}
    for commit in (
        txnlog.txn_delete_where(spark, d, "o_orderkey > 0"),
        txnlog.txn_update_where(spark, d, "TRUE", {"o_totalprice": "0.0"}),
        txnlog.txn_compact(spark, d),
    ):
        assert commit["add"] == [] and commit["remove"] == []
    merged = txnlog.txn_merge(spark, d, orders.limit(5), ["o_orderkey"])
    assert merged["remove"] == []
    assert txnlog.read_snapshot(spark, d).count() == 5
    # and the change feed stayed consistent through the whole history
    feed = txnlog.txn_changes(spark, d, 0)
    ins = feed.where("_change_type IN ('insert','update_postimage')").count()
    dels = feed.where("_change_type IN ('delete','update_preimage')").count()
    assert ins - dels == 5


def test_version_race_loser_gets_conflict(spark, table):
    d, orders = table
    # this writer read the table at v1 and intends to commit v2 —
    # but a competing writer wins version 2 first
    txnlog._commit(d, {"version": 2, "op": "append", "add": [], "remove": []})
    with pytest.raises(txnlog.TxnConflict):
        txnlog.txn_append(orders.limit(5), d, expect_version=2)
    # and create on an existing table refuses outright
    with pytest.raises(txnlog.TxnConflict):
        txnlog.txn_create(orders.limit(5), d)


def test_stream_sink_is_exactly_once_under_batch_replay(spark, table):
    """foreachBatch is at-least-once; the txnlog sink's batch_id
    commit dedup must make it exactly-once. Simulate the engine's
    replay contract directly: deliver batch 0, REPLAY batch 0, then
    batch 1 — the table must hold each batch's rows exactly once."""
    d, orders = table
    d2 = os.path.join(os.path.dirname(d), "stream_tbl")
    sink = txnlog.txn_stream_sink(d2, num_files=1)
    b0 = orders.limit(10)
    b1 = orders.where("o_orderkey >= 10 AND o_orderkey < 25")
    sink(b0, 0)
    sink(b0, 0)  # replay after simulated failure
    sink(b1, 1)
    snap = txnlog.read_snapshot(spark, d2)
    assert snap.count() == 25
    assert [c.get("batch_id") for c in txnlog.txn_history(d2)] == [0, 1]


def test_stream_sink_end_to_end_with_restart(spark, tmp_path):
    """Real Structured Streaming drive: file source → foreachBatch
    txnlog sink, availableNow drains with a shared checkpoint. Every
    input row lands exactly once and each micro-batch is one atomic
    commit (so readers never see a torn batch)."""
    src = tmp_path / "src"
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def drain():
        q = (
            spark.readStream.schema("k long, v string")
            .parquet(str(src))
            .writeStream.foreachBatch(txnlog.txn_stream_sink(tbl, num_files=1))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.mode(
        "append"
    ).parquet(str(src))
    drain()
    spark.createDataFrame([(3, "c")], "k long, v string").write.mode(
        "append"
    ).parquet(str(src))
    drain()  # restart from checkpoint: only the new file
    out = sorted(
        (r.k, r.v) for r in txnlog.read_snapshot(spark, tbl).collect()
    )
    assert out == [(1, "a"), (2, "b"), (3, "c")]
    assert all(
        c.get("batch_id") is not None for c in txnlog.txn_history(tbl)
    )


def test_orphan_files_from_crashed_writer_are_invisible(spark, table):
    d, orders = table
    total = txnlog.read_snapshot(spark, d).count()
    # a "crashed" writer: data directory written, commit never published
    orphan_dir = os.path.join(d, txnlog.DATA_DIR, "v00000099-append-deadbeef")
    orders.limit(10).write.parquet(orphan_dir)
    assert txnlog.read_snapshot(spark, d).count() == total  # unchanged
    # vacuum reclaims the orphan parquet files
    n_orphans = len(glob.glob(os.path.join(orphan_dir, "*.parquet")))
    assert n_orphans > 0
    report = txnlog.txn_vacuum(d, retain_versions=10, min_age_s=0.0)
    assert report["deleted"] >= n_orphans
    assert glob.glob(os.path.join(orphan_dir, "*.parquet")) == []
    assert txnlog.read_snapshot(spark, d).count() == total  # still unchanged


def test_vacuum_retains_exactly_the_requested_time_travel(spark, table):
    d, orders = table
    txnlog.txn_compact(spark, d, num_files=1)  # v2 rewrites everything
    # retain v1..v2: v1's file set (all pre-compaction files) survives
    txnlog.txn_vacuum(d, retain_versions=2, min_age_s=0.0)
    assert txnlog.read_snapshot(spark, d).count() == orders.count()
    assert txnlog.read_snapshot(spark, d, version=1).count() == orders.count()
    # retain only the latest: pre-compaction files are reclaimed, so
    # the current snapshot survives but v1 time travel is gone
    report = txnlog.txn_vacuum(d, retain_versions=1, min_age_s=0.0)
    assert report["deleted"] > 0
    assert txnlog.read_snapshot(spark, d).count() == orders.count()
    with pytest.raises(Exception):
        txnlog.read_snapshot(spark, d, version=1).count()


def test_zorder_compact_bounds_both_columns_per_file(spark, table):
    """OPTIMIZE ZORDER as a commit: after a 2-D clustered compaction,
    each live file's (o_orderkey, o_custkey) min-max box must span
    well under the full domain on BOTH columns (the Z property — a
    1-D sort would leave the second column unbounded), the table is
    logically unchanged, and time travel still works."""
    d, orders = table
    before = txnlog.read_snapshot(spark, d).agg(
        F.sum("o_orderkey").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    txnlog.txn_compact(
        spark, d, num_files=8, cluster_by=["o_orderkey", "o_custkey"],
        zorder=True,
    )
    after = txnlog.read_snapshot(spark, d).agg(
        F.sum("o_orderkey").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert (after.s, after.n) == (before.s, before.n)
    live = txnlog._live_files(d)
    assert len(live) == 8
    dom_a = orders.agg(
        (F.max("o_orderkey") - F.min("o_orderkey")).alias("w")
    ).collect()[0].w
    dom_b = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("w")
    ).collect()[0].w
    spans_a, spans_b = [], []
    for f in live:
        r = spark.read.parquet(f).agg(
            (F.max("o_orderkey") - F.min("o_orderkey")).alias("wa"),
            (F.max("o_custkey") - F.min("o_custkey")).alias("wb"),
        ).collect()[0]
        spans_a.append(r.wa)
        spans_b.append(r.wb)
    # balance: the AVERAGE per-file span is well under the domain on
    # BOTH axes (a 1-D sort gives ~domain on the second axis)
    assert sum(spans_a) / len(spans_a) < 0.6 * dom_a
    assert sum(spans_b) / len(spans_b) < 0.6 * dom_b
    assert txnlog.read_snapshot(spark, d, version=1).count() == orders.count()


def test_delete_where_keeps_null_predicate_rows(spark, table):
    """SQL DELETE three-valued logic: a row whose predicate evaluates
    to NULL is KEPT (it is not 'matched'), both in the table and in the
    change feed. Regression for the where(~p) survivor filter, which
    silently dropped NULL-predicate rows of affected files."""
    d, orders = table
    # One file mixing TRUE-predicate and NULL-predicate rows: flag is 1
    # for even keys and NULL otherwise (WHEN without OTHERWISE).
    extra = (
        orders.limit(20)
        .withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000)
        .withColumn(
            "flag", F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).cast("int")
        )
    )
    n_true = extra.where("flag = 1").count()
    n_null = extra.where("flag IS NULL").count()
    assert n_true > 0 and n_null > 0, "fixture must mix TRUE and NULL rows"
    txnlog.txn_append(extra, d, num_files=1)
    commit = txnlog.txn_delete_where(spark, d, "flag = 1")
    snap = txnlog.read_snapshot(spark, d)
    # only the TRUE rows were deleted; NULL-predicate rows of the SAME
    # affected file survive, as do all pre-evolution (flag-less) rows
    assert snap.count() == orders.count() + n_null
    assert snap.where("o_orderkey >= 5000000 AND flag IS NULL").count() == n_null
    assert snap.where("flag = 1").count() == 0
    # the change feed carries exactly the TRUE rows as deletes
    feed = txnlog.txn_changes(spark, d, commit["version"], commit["version"])
    assert feed.where("_change_type = 'delete'").count() == n_true
    assert feed.count() == n_true


def test_vacuum_with_relative_table_dir_keeps_live_files(
    spark, table, monkeypatch
):
    """The log stores absolute paths (input_file_name); vacuum must
    normalize the walked paths too, or a RELATIVE table_dir makes every
    live file look unreferenced and destroys the table."""
    d, orders = table
    total = orders.count()
    monkeypatch.chdir(os.path.dirname(d))
    # min_age_s=0 keeps this test honest: with the grace window the
    # fresh files would survive even if realpath normalization broke
    report = txnlog.txn_vacuum(os.path.basename(d), retain_versions=1, min_age_s=0.0)
    assert report["deleted"] == 0, "every file is live in the latest snapshot"
    assert txnlog.read_snapshot(spark, d).count() == total


def test_dml_across_schema_evolution_keeps_evolved_columns(spark, table):
    """A DML op whose affected set spans pre- and post-evolution files
    must rewrite with the UNION schema (mergeSchema), not a
    single-file-inferred schema that drops the evolved column."""
    d, orders = table
    evolved = (
        orders.limit(10)
        .withColumn("o_orderkey", F.col("o_orderkey") + 7_000_000)
        .withColumn("quality_score", F.lit(0.5))
    )
    txnlog.txn_append(evolved, d, num_files=1)  # v2 evolves the schema
    # predicate matches rows in BOTH pre- and post-evolution files
    commit = txnlog.txn_update_where(
        spark,
        d,
        "o_orderkey % 100 = 3 OR o_orderkey >= 7000000",
        {"o_orderpriority": "'9-EVOLVED'"},
    )
    assert len(commit["remove"]) >= 2, "affected set must span both eras"
    snap = txnlog.read_snapshot(spark, d)
    assert "quality_score" in snap.columns
    assert snap.where("quality_score = 0.5").count() == 10
    assert snap.count() == orders.count() + 10
    n_hit = snap.where("o_orderpriority = '9-EVOLVED'").count()
    assert n_hit == orders.where("o_orderkey % 100 = 3").count() + 10


def test_vacuum_reclaims_changes_dirs_outside_retention(spark, table):
    """The change feed's _changes directories follow the same retention
    window as data files: commits older than the retained versions lose
    their feed (documented CDF/retention coupling), retained ones keep
    it readable."""
    d, _ = table
    c2 = txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 1")  # v2
    c3 = txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 2")  # v3
    assert os.path.isdir(c2["changes"]) and os.path.isdir(c3["changes"])
    report = txnlog.txn_vacuum(d, retain_versions=1, min_age_s=0.0)  # cutoff = v3
    assert report["changes_deleted"] > 0
    assert not os.path.isdir(c2["changes"])
    assert os.path.isdir(c3["changes"])
    assert txnlog.txn_changes(spark, d, 3, 3).count() > 0


def test_txnfeed_casts_narrow_files_to_declared_schema(spark, tmp_path):
    """Type-width evolution: the feed's declared schema comes from the
    FIRST live file owning each column; a later file with a narrower
    physical type (int32 vs int64) must be cast to the declared type,
    not fail the Arrow batch/schema check at runtime."""
    from eecs_485___mapreduce_spark.sources import TxnFeedDataSource

    spark.dataSource.register(TxnFeedDataSource)
    d = str(tmp_path / "widen_tbl")
    wide = spark.range(5).select(
        F.col("id").alias("k"), F.col("id").cast("long").alias("x")
    )
    txnlog.txn_create(wide, d, num_files=1)
    narrow = spark.range(5, 10).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("x")
    )
    txnlog.txn_append(narrow, d, num_files=1)  # int32 file under int64 schema
    sink = str(tmp_path / "widen_sink")
    q = (
        spark.readStream.format("txnfeed")
        .option("path", d)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "widen_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    feed = spark.read.parquet(sink)
    assert feed.count() == 10
    assert feed.schema["x"].dataType.simpleString() == "bigint"
    assert feed.agg(F.sum("x").alias("s")).collect()[0].s == sum(range(10))


def test_shallow_clone_shares_files_then_diverges(spark, table, tmp_path):
    """SHALLOW CLONE: zero data copied (the clone's v0 references the
    source's live files), independent evolution afterwards, and
    vacuuming the clone can never reclaim source files (it only walks
    its own data root)."""
    d, orders = table
    c = str(tmp_path / "clone_tbl")
    rec = txnlog.txn_clone(d, c)
    assert rec["op"] == "clone" and rec["version"] == 0
    assert set(txnlog._live_files(c)) == set(txnlog._live_files(d))
    assert txnlog.read_snapshot(spark, c).count() == orders.count()
    txnlog.txn_delete_where(spark, c, "o_orderkey % 2 = 0")  # clone diverges
    assert txnlog.read_snapshot(spark, d).count() == orders.count()
    txnlog.txn_vacuum(c, retain_versions=1, min_age_s=0.0)
    assert txnlog.read_snapshot(spark, d).count() == orders.count()
    # pinned-version clone reads that version's snapshot
    c0 = str(tmp_path / "clone_v0")
    txnlog.txn_clone(d, c0, version=0)
    want_v0 = orders.where("o_orderkey < 750").count()
    assert txnlog.read_snapshot(spark, c0).count() == want_v0
    with pytest.raises(txnlog.TxnConflict):
        txnlog.txn_clone(d, c0)  # target exists


def test_restore_rolls_back_as_new_commit(spark, table):
    """RESTORE: live state rolls back to the target version as a NEW
    commit — history (including the restored-over states) stays
    readable, the restore itself is undoable, and restoring past the
    vacuum retention fails loudly instead of producing a snapshot of
    missing files."""
    d, orders = table
    txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 1")  # v2
    n_after_del = txnlog.read_snapshot(spark, d).count()
    rec = txnlog.txn_restore(d, 1)  # v3: pre-delete state again
    assert rec["op"] == "restore" and rec["version"] == 3
    assert txnlog.read_snapshot(spark, d).count() == orders.count()
    assert txnlog.read_snapshot(spark, d, version=2).count() == n_after_del
    txnlog.txn_restore(d, 2)  # v4: undo the restore
    assert txnlog.read_snapshot(spark, d).count() == n_after_del
    txnlog.txn_compact(spark, d, num_files=1)  # v5
    txnlog.txn_vacuum(d, retain_versions=1, min_age_s=0.0)
    with pytest.raises(FileNotFoundError):
        txnlog.txn_restore(d, 1)


def test_cdf_replay_invariant_across_restore_and_clone(spark, table, tmp_path):
    """The change feed must carry RESTORE as its net file delta and a
    CLONE's v0 as inserts, preserving the replay invariant
    snapshot(v) == snapshot(v-1) patched by feed(v) — an incremental
    consumer that misses a rollback silently diverges forever."""
    d, orders = table
    cols = txnlog.read_snapshot(spark, d).columns
    txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 1")  # v2
    txnlog.txn_restore(d, 1)  # v3: rollback

    def patched(v):
        base = txnlog.read_snapshot(spark, d, version=v - 1).select(*cols)
        feed = txnlog.txn_changes(spark, d, v, v)
        plus = feed.where("_change_type IN ('insert','update_postimage')").select(*cols)
        minus = feed.where("_change_type IN ('delete','update_preimage')").select(*cols)
        return base.unionByName(plus).exceptAll(minus)

    for v in (2, 3):
        got = patched(v)
        want = txnlog.read_snapshot(spark, d, version=v).select(*cols)
        assert got.exceptAll(want).count() == 0, f"v{v}"
        assert want.exceptAll(got).count() == 0, f"v{v}"
    # clone v0 appears in the clone's own feed as inserts
    c = str(tmp_path / "cdf_clone")
    txnlog.txn_clone(d, c)
    feed0 = txnlog.txn_changes(spark, c, 0, 0)
    assert feed0.where("_change_type = 'insert'").count() == orders.count()
    # and the streaming source sees the restore delta identically
    from eecs_485___mapreduce_spark.sources import TxnFeedDataSource

    spark.dataSource.register(TxnFeedDataSource)
    sink = str(tmp_path / "restore_feed_sink")
    q = (
        spark.readStream.format("txnfeed")
        .option("path", d)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "restore_feed_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got3 = spark.read.parquet(sink).where("_commit_version = 3")
    want3 = txnlog.txn_changes(spark, d, 3, 3)
    for ct in ("insert", "delete"):
        assert (
            got3.where(f"_change_type = '{ct}'").count()
            == want3.where(f"_change_type = '{ct}'").count()
        ), ct


def test_torn_commit_temp_never_wedges_the_log(spark, table, monkeypatch):
    """A writer killed between temp-write and link must leave the
    table fully usable: the log still replays, the claimed-looking
    version is still winnable by the next writer, and vacuum reclaims
    the inert temp. (The previous O_EXCL+write publish left a torn
    version file that broke every subsequent txn_history parse AND
    permanently claimed the slot.)"""
    d, orders = table
    total = txnlog.read_snapshot(spark, d).count()

    # Simulate the kill: crash inside the temp write, before the link.
    def boom(fd):
        raise RuntimeError("writer killed mid-publish")

    monkeypatch.setattr(txnlog.os, "fsync", boom)
    with pytest.raises(RuntimeError):
        txnlog.txn_append(orders.limit(5), d)
    monkeypatch.undo()

    log_dir = os.path.join(d, txnlog.TXNLOG_DIR)
    torn = glob.glob(os.path.join(log_dir, "*.json.tmp-*"))
    assert torn, "the crash left its temp behind"
    # the log replays, reads work, and version 2 is still available
    assert [c["version"] for c in txnlog.txn_history(d)] == [0, 1]
    assert txnlog.read_snapshot(spark, d).count() == total
    commit = txnlog.txn_append(orders.limit(5), d)
    assert commit["version"] == 2
    assert txnlog.read_snapshot(spark, d).count() == total + 5
    # vacuum reclaims the inert temp (zero grace: the writer is dead)
    txnlog.txn_vacuum(d, retain_versions=10, min_age_s=0.0)
    assert glob.glob(os.path.join(log_dir, "*.json.tmp-*")) == []


def test_published_commit_files_are_always_complete_json(spark, table):
    """Every file the ``*.json`` glob can see must parse — the publish
    protocol guarantees torn payloads are structurally impossible in
    the reader's namespace (they live under ``*.json.tmp-*``)."""
    import json as _json

    d, orders = table
    txnlog.txn_delete_where(spark, d, "o_orderkey % 10 = 3", num_files=1)
    txnlog.txn_compact(spark, d, num_files=1)
    log_dir = os.path.join(d, txnlog.TXNLOG_DIR)
    files = sorted(glob.glob(os.path.join(log_dir, "*.json")))
    assert len(files) == 4
    for p in files:
        with open(p) as fh:
            record = _json.load(fh)  # parse must never raise
        assert {"version", "op"} <= set(record)


def test_vacuum_temp_race_surfaces_as_retryable_conflict(spark, table, monkeypatch):
    """If a concurrent vacuum reclaims the temp in the instant before
    the link, the writer gets TxnConflict (retry), not an anonymous
    FileNotFoundError."""
    d, orders = table

    real_link = txnlog.os.link

    def link_after_vacuum(src, dst):
        os.unlink(src)  # the concurrent vacuum wins the instant
        return real_link(src, dst)

    monkeypatch.setattr(txnlog.os, "link", link_after_vacuum)
    with pytest.raises(txnlog.TxnConflict, match="vacuum"):
        txnlog.txn_append(orders.limit(5), d)
    monkeypatch.undo()
    # the table is untouched and the next attempt wins normally
    assert [c["version"] for c in txnlog.txn_history(d)] == [0, 1]
    assert txnlog.txn_append(orders.limit(5), d)["version"] == 2


def test_externally_damaged_log_fails_loudly_never_partially(spark, table):
    """Log damage OUR writer cannot produce (external deletion, byte
    corruption, renamed files) must stop reads with TxnCorrupt naming
    the file — a replay past a missing version would silently drop
    that commit's rows from every snapshot."""
    d, orders = table
    log_dir = os.path.join(d, txnlog.TXNLOG_DIR)
    v1 = os.path.join(log_dir, "00000001.json")

    # (a) gap: delete a middle version (append v2 first so v1 is middle)
    txnlog.txn_append(orders.limit(5), d)
    saved = open(v1).read()
    os.remove(v1)
    with pytest.raises(txnlog.TxnCorrupt, match="gap"):
        txnlog.read_snapshot(spark, d).count()
    open(v1, "w").write(saved)
    assert len(txnlog.txn_history(d)) == 3  # restored, reads work

    # (b) torn bytes: truncate a commit file mid-payload
    open(v1, "w").write(saved[: len(saved) // 2])
    with pytest.raises(txnlog.TxnCorrupt, match="unparseable"):
        txnlog.txn_history(d)
    open(v1, "w").write(saved)

    # (c) renamed: a record living under the wrong version name
    import json as _json

    rec = _json.loads(saved)
    rec["version"] = 7
    open(v1, "w").write(_json.dumps(rec, sort_keys=True))
    with pytest.raises(txnlog.TxnCorrupt, match="its name claims"):
        txnlog.txn_history(d)
    open(v1, "w").write(saved)
    assert txnlog.read_snapshot(spark, d).count() == orders.count() + 5


def test_merge_duplicate_matched_source_keys_error_delta_parity(spark, tmp_path):
    """A MATCHED key fed by two source rows is an ambiguous update and
    must raise (Delta's duplicate-match rule) BEFORE any commit lands;
    duplicate UNMATCHED keys are legal multi-row inserts."""
    d = str(tmp_path / "tbl")
    txnlog.txn_create(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long"),
        d,
        num_files=1,
    )
    dup_matched = spark.createDataFrame(
        [(1, 11), (1, 12)], "id long, val long"
    )
    with pytest.raises(ValueError, match="MATCHED key"):
        txnlog.txn_merge(spark, d, dup_matched, ["id"])
    # nothing committed: table unchanged, history unchanged
    assert [c["version"] for c in txnlog.txn_history(d)] == [0]
    assert sorted(
        tuple(r) for r in txnlog.read_snapshot(spark, d).collect()
    ) == [(1, 10), (2, 20)]

    dup_unmatched = spark.createDataFrame(
        [(9, 91), (9, 92)], "id long, val long"
    )
    txnlog.txn_merge(spark, d, dup_unmatched, ["id"])
    assert sorted(
        tuple(r) for r in txnlog.read_snapshot(spark, d).collect()
    ) == [(1, 10), (2, 20), (9, 91), (9, 92)]


def test_merge_with_extra_source_columns_evolves_schema(spark, tmp_path):
    """A source carrying a NEW column evolves the table through MERGE
    (the Delta autoMerge shape): survivors and pre-evolution rows
    null-fill, the change feed's preimages null-fill the same way, and
    a narrower source errors with the contract message instead of an
    opaque union failure."""
    d = str(tmp_path / "tbl")
    txnlog.txn_create(
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id long, val long"),
        d,
        num_files=1,
    )
    wide = spark.createDataFrame(
        [(2, 21, "x"), (9, 90, "y")], "id long, val long, tag string"
    )
    txnlog.txn_merge(spark, d, wide, ["id"], num_files=1)
    got = sorted(
        tuple(r)
        for r in txnlog.read_snapshot(spark, d)
        .select("id", "val", "tag")
        .collect()
    )
    assert got == [(1, 10, None), (2, 21, "x"), (3, 30, None), (9, 90, "y")]
    feed = txnlog.txn_changes(spark, d, 1).select("id", "tag", "_change_type")
    assert {tuple(r) for r in feed.collect()} == {
        (2, None, "update_preimage"),
        (2, "x", "update_postimage"),
        (9, "y", "insert"),
    }

    with pytest.raises(ValueError, match="lacks table columns"):
        txnlog.txn_merge(
            spark, d, spark.createDataFrame([(1,)], "id long"), ["id"]
        )


def test_merge_narrow_source_errors_on_every_path(spark, tmp_path):
    """Round-5 ADVICE regression: the narrow-source guard was
    data-dependent (only ran when affected_files was non-empty), so a
    narrow source whose keys all MISS — or one merged into an emptied
    table — silently committed files missing table columns. It also
    compared against the AFFECTED files' columns, so a source missing
    a column that exists only in unaffected files passed. All three
    paths must now raise before anything commits."""
    # Path 1: all keys miss (would have been the pure-insert commit)
    d = str(tmp_path / "allmiss")
    txnlog.txn_create(
        spark.createDataFrame([(1, 10, "a")], "id long, val long, tag string"),
        d,
        num_files=1,
    )
    with pytest.raises(ValueError, match="lacks table columns"):
        txnlog.txn_merge(
            spark, d, spark.createDataFrame([(9, 90)], "id long, val long"), ["id"]
        )
    assert [c["version"] for c in txnlog.txn_history(d)] == [0]

    # Path 2: emptied table (the `not live` early return) — the schema
    # outlives the rows, so a narrow source must still be rejected
    d2 = str(tmp_path / "emptied")
    txnlog.txn_create(
        spark.createDataFrame([(1, 10, "a")], "id long, val long, tag string"),
        d2,
        num_files=1,
    )
    txnlog.txn_delete_where(spark, d2, "true")
    assert txnlog.txn_history(d2)[-1]["version"] == 1  # emptied, not gone
    with pytest.raises(ValueError, match="lacks table columns"):
        txnlog.txn_merge(
            spark, d2, spark.createDataFrame([(9, 90)], "id long, val long"), ["id"]
        )

    # Path 3: source missing a column that exists ONLY in unaffected
    # files — the old affected-columns check could not see `tag`
    d3 = str(tmp_path / "unaffected")
    txnlog.txn_create(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long"),
        d3,
        num_files=1,
    )
    txnlog.txn_append(  # evolving append: `tag` lives only in this file
        spark.createDataFrame([(50, 500, "x")], "id long, val long, tag string"),
        d3,
        num_files=1,
    )
    with pytest.raises(ValueError, match="lacks table columns"):
        txnlog.txn_merge(  # key 1 affects only the narrow v0 file
            spark, d3, spark.createDataFrame([(1, 11)], "id long, val long"), ["id"]
        )
    # the well-formed equivalent commits fine
    txnlog.txn_merge(
        spark,
        d3,
        spark.createDataFrame([(1, 11, None)], "id long, val long, tag string"),
        ["id"],
        num_files=1,
    )
    got = sorted(
        tuple(r)
        for r in txnlog.read_snapshot(spark, d3).select("id", "val", "tag").collect()
    )
    assert got == [(1, 11, None), (2, 20, None), (50, 500, "x")]


def test_txnfeed_schema_unions_all_surviving_files(spark, tmp_path):
    """Round-5 ADVICE regression: with the table emptied, the stream
    reader derived its schema from the newest version with ANY
    surviving files — if that version's survivors are pre-evolution
    (narrow) while the evolved column lives only in a file REMOVED by
    a later commit but still on disk, the derived schema silently
    dropped the evolved column. The schema must union footers across
    ALL surviving historical files."""
    from eecs_485___mapreduce_spark.sources.txnfeed import _snapshot_schema

    d = str(tmp_path / "tbl")
    # v0: narrow file F0
    txnlog.txn_create(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long"),
        d,
        num_files=1,
    )
    # v1: evolving append F1 carries `tag`
    txnlog.txn_append(
        spark.createDataFrame(
            [(10, 100, "x"), (11, 110, "y")], "id long, val long, tag string"
        ),
        d,
        num_files=1,
    )
    # v2: delete one F1 row -> F1 removed, survivors rewritten as F2
    txnlog.txn_delete_where(spark, d, "id = 10")
    # v3: empty the table
    txnlog.txn_delete_where(spark, d, "true")
    assert txnlog.txn_history(d)[-1]["version"] == 3  # emptied, not gone

    # Simulate a vacuum that reclaimed v2's rewrite (the newest wide
    # survivor set) while older files — including the REMOVED wide F1
    # — are still on disk.
    hist = txnlog.txn_history(d)
    v2_adds = [e["file"] for e in hist[2]["add"]]
    assert v2_adds, "v2 delete must have rewritten survivors"
    for f in v2_adds:
        os.remove(f)

    names = [f.name for f in _snapshot_schema(d).fields]
    assert "tag" in names, names  # was silently dropped before the fix
    assert {"id", "val", "_change_type", "_commit_version"} <= set(names)


def test_txnfeed_vacuumed_changes_fail_loudly(spark, tmp_path):
    """A lagging stream whose unread commit's _changes dir was
    vacuumed must FAIL, not silently drop those changes: the planner
    previously globbed the missing dir to an empty list, so the
    stream skipped the commit while the batch feed (txn_changes)
    errored on the same read — a silent stream/batch divergence and
    exactly the quiet data loss Delta's CDF errors on."""
    from eecs_485___mapreduce_spark.sources import TxnFeedDataSource

    d = str(tmp_path / "tbl")
    txnlog.txn_create(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long"),
        d,
        num_files=1,
    )
    txnlog.txn_update_where(spark, d, "id = 1", {"val": "val + 1"}, num_files=1)
    txnlog.txn_append(
        spark.createDataFrame([(3, 30)], "id long, val long"), d, num_files=1
    )
    # retain only the latest version: v1's _changes dir is reclaimed
    stats = txnlog.txn_vacuum(d, retain_versions=1, min_age_s=0.0)
    assert stats["changes_deleted"] > 0

    spark.dataSource.register(TxnFeedDataSource)
    q = (
        spark.readStream.format("txnfeed")
        .option("path", d)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="vacuumed"):
        q.awaitTermination()


def test_txnfeed_starting_version_skips_vacuumed_commits(spark, tmp_path):
    """The remediation the vacuumed-_changes error advertises must
    actually exist (round-6 ADVICE): a FRESH consumer starting with
    .option('startingVersion', N) past the reclaimed commits streams
    successfully and sees exactly the commits >= N."""
    from eecs_485___mapreduce_spark.sources import TxnFeedDataSource

    d = str(tmp_path / "tbl")
    txnlog.txn_create(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, val long"),
        d,
        num_files=1,
    )
    # v1: update whose _changes dir the vacuum below reclaims
    txnlog.txn_update_where(spark, d, "id = 1", {"val": "val + 1"}, num_files=1)
    # v2: append a lagging-consumer-visible commit
    txnlog.txn_append(
        spark.createDataFrame([(3, 30)], "id long, val long"), d, num_files=1
    )
    stats = txnlog.txn_vacuum(d, retain_versions=1, min_age_s=0.0)
    assert stats["changes_deleted"] > 0

    spark.dataSource.register(TxnFeedDataSource)
    sink = str(tmp_path / "sink2")
    q = (
        spark.readStream.format("txnfeed")
        .option("path", d)
        .option("startingVersion", 2)  # first un-vacuumed commit
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # must NOT raise
    rows = sorted(
        (r.id, r.val, r._change_type, r._commit_version)
        for r in spark.read.parquet(sink).collect()
    )
    assert rows == [(3, 30, "insert", 2)]
