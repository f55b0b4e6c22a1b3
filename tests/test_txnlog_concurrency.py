"""Real concurrent-writer stress for the transaction log.

test_txnlog.py proves the conflict and crash paths with INJECTED
races (pre-claimed version files, unlinked temps); this test runs
actual racing writer threads through the public retry contract and
asserts the ACID outcome:

- every append lands exactly once (no lost or double-applied batch),
- versions are contiguous with one winner each,
- losers' orphan data directories are invisible to snapshot reads and
  reclaimable by vacuum,
- the change feed replays to the same final state.

Threads share the one local[N] SparkSession (supported: sessions are
thread-safe for job submission), so the interleaving under test is the
commit-protocol race itself — many writers computing the same next
version and exactly one os.link winning.
"""

from __future__ import annotations

import os
import threading

from eecs_485___mapreduce_spark import txnlog

N_WRITERS = 4
APPENDS_PER_WRITER = 3


def test_concurrent_appends_all_land_exactly_once(spark, tmp_path):
    table = str(tmp_path / "tbl")
    txnlog.txn_create(
        spark.createDataFrame([(0, 0)], "id long, val long"), table, num_files=1
    )

    errors: list[BaseException] = []

    def writer(t: int) -> None:
        try:
            for i in range(APPENDS_PER_WRITER):
                batch = [(1000 * t + 10 * i + k, t) for k in range(3)]
                df = spark.createDataFrame(batch, "id long, val long")
                while True:
                    try:
                        txnlog.txn_append(df, table, num_files=1)
                        break
                    except txnlog.TxnConflict:
                        continue  # lost the version race; recompute + retry
        except BaseException as exc:  # noqa: BLE001 - surface to main thread
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(N_WRITERS)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []

    # exactly-once: the snapshot is the union of every batch, no more
    want = sorted(
        [(0, 0)]
        + [
            (1000 * t + 10 * i + k, t)
            for t in range(N_WRITERS)
            for i in range(APPENDS_PER_WRITER)
            for k in range(3)
        ]
    )
    got = sorted(
        tuple(r) for r in txnlog.read_snapshot(spark, table).collect()
    )
    assert got == want

    # one winner per version, contiguous history
    history = txnlog.txn_history(table)
    versions = [h["version"] for h in history]
    assert versions == list(range(N_WRITERS * APPENDS_PER_WRITER + 1))

    # the change feed replays to the same final row count
    changes = txnlog.txn_changes(spark, table, 0)
    n_inserts = changes.where(changes._change_type == "insert").count()
    assert n_inserts == len(want)

    # losers' orphan data files are invisible to reads and reclaimed
    # by vacuum, which must meanwhile keep every live file (vacuum
    # compares at the parquet-file level; a data dir may survive as a
    # husk holding only its _SUCCESS marker)
    import glob

    data_root = os.path.join(table, txnlog.DATA_DIR)
    live = {os.path.realpath(f) for f in txnlog._live_files(table)}
    on_disk = {
        os.path.realpath(f)
        for f in glob.glob(os.path.join(data_root, "*", "*.parquet"))
    }
    assert live <= on_disk
    # zero grace is safe here: every writer thread has joined
    txnlog.txn_vacuum(table, retain_versions=1, min_age_s=0.0)
    after = {
        os.path.realpath(f)
        for f in glob.glob(os.path.join(data_root, "*", "*.parquet"))
    }
    assert after == live  # every orphan gone, every live file kept
    got_after = sorted(
        tuple(r) for r in txnlog.read_snapshot(spark, table).collect()
    )
    assert got_after == want


def test_snapshot_isolation_under_append_storm(spark, tmp_path):
    """Readers racing the writers must never observe a torn commit:
    every polled snapshot is the union of COMPLETE batches (each
    3-row append appears wholly or not at all), and observed row sets
    grow monotonically version over version."""
    table = str(tmp_path / "tbl")
    txnlog.txn_create(
        spark.createDataFrame([(-1, -1)], "id long, val long"), table, num_files=1
    )

    stop = threading.Event()
    errors: list[BaseException] = []
    seen: list[frozenset] = []

    def writer(t: int) -> None:
        try:
            for i in range(APPENDS_PER_WRITER):
                batch = [(1000 * t + 10 * i + k, t) for k in range(3)]
                df = spark.createDataFrame(batch, "id long, val long")
                while True:
                    try:
                        txnlog.txn_append(df, table, num_files=1)
                        break
                    except txnlog.TxnConflict:
                        continue
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def reader() -> None:
        try:
            while not stop.is_set():
                rows = frozenset(
                    tuple(r)
                    for r in txnlog.read_snapshot(spark, table).collect()
                )
                seen.append(rows)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    writers = [
        threading.Thread(target=writer, args=(t,)) for t in range(N_WRITERS)
    ]
    rd = threading.Thread(target=reader)
    rd.start()
    for th in writers:
        th.start()
    for th in writers:
        th.join()
    stop.set()
    rd.join()
    assert errors == []
    assert len(seen) >= 2  # the reader really raced the storm

    for rows in seen:
        assert (-1, -1) in rows
        by_batch: dict[tuple[int, int], set] = {}
        for id_, val in rows - {(-1, -1)}:
            by_batch.setdefault((id_ // 1000, (id_ % 1000) // 10), set()).add(
                id_ % 10
            )
        for members in by_batch.values():
            assert members == {0, 1, 2}  # never a torn batch

    # atomic visibility implies monotone growth in poll order
    for a, b in zip(seen, seen[1:]):
        assert a <= b


def test_vacuum_grace_window_protects_in_flight_writer(spark, tmp_path):
    """A writer's data directory exists BEFORE its commit lands, and is
    indistinguishable from a crashed writer's orphan. A vacuum running
    in that window must defer it (min_age_s), or the imminent commit
    would reference deleted files and the version would be unreadable
    forever. Zero-grace vacuum is the explicitly-opted-out maintenance
    mode."""
    import glob as _glob

    table = str(tmp_path / "tbl")
    base = spark.createDataFrame([(0, 0)], "id long, val long")
    txnlog.txn_create(base, table, num_files=1)

    # simulate the in-flight writer: data written, commit not yet linked
    version = txnlog._next_version(table)
    df = spark.createDataFrame([(1, 1), (2, 1)], "id long, val long")
    add = txnlog._write_commit_data(df, table, version, "append", 1)

    # a concurrent default-grace vacuum runs in the gap: defers, deletes nothing
    report = txnlog.txn_vacuum(table, retain_versions=1)
    assert report["deleted"] == 0
    assert report["deferred"] >= 1
    for entry in add:
        assert os.path.exists(entry["file"])

    # the commit lands; the version must read completely
    txnlog._commit(
        table, {"version": version, "op": "append", "add": add, "remove": []}
    )
    got = sorted(tuple(r) for r in txnlog.read_snapshot(spark, table).collect())
    assert got == [(0, 0), (1, 1), (2, 1)]

    # contrast: zero grace in the same gap WOULD have taken the files —
    # proving the guard (not luck) is what saved the commit above
    version2 = txnlog._next_version(table)
    add2 = txnlog._write_commit_data(df, table, version2, "append", 1)
    report = txnlog.txn_vacuum(table, retain_versions=1, min_age_s=0.0)
    assert report["deleted"] >= 1
    assert not any(os.path.exists(e["file"]) for e in add2)
    n_parquet = len(
        _glob.glob(os.path.join(table, txnlog.DATA_DIR, "*", "*.parquet"))
    )
    assert n_parquet == len(txnlog._live_files(table))
