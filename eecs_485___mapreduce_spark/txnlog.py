"""Transaction-log table layout: lakehouse-style ACID-on-parquet.

The 100 TB operational gap that plain parquet directories leave open:
no atomic multi-file commits (readers see half-written data), no
snapshot isolation (a reader mid-scan races a writer's overwrite), no
time travel, and no safe copy-on-write deletes. Modern table formats
(Delta Lake, Apache Iceberg — both public designs) close it with ONE
idea: the table IS an append-only log of commits, each commit an
atomic metadata file naming the data files it adds and removes; data
files themselves are immutable.

This module is that idea on the engine's own manifested-parquet
substrate (sinks.py):

- ``table_dir/_txnlog/00000000.json`` … — one JSON commit per version,
  published by write-temp + fsync + atomic hard-link: the link is the
  filesystem's atomic put-if-absent and the whole concurrency-control
  protocol (optimistic: two writers racing to the same version —
  exactly one wins, the loser gets ``TxnConflict`` and retries on the
  new snapshot), and the temp stage means a writer killed mid-write
  leaves an inert ``*.tmp-*`` file rather than a torn version file
  that would wedge the log. This is Delta's documented protocol
  (log + atomic rename); on an object store the same role is played
  by a conditional PUT.
- data files live under ``table_dir/data/v{N}-{op}/`` — immutable,
  uniquely owned by their commit, so a crashed writer leaves only an
  ORPHAN directory no commit references: invisible to every reader,
  reclaimed by ``txn_vacuum``.
- readers replay the log (file-count-bounded metadata, no data I/O)
  to a live file set, then scan ONLY those files. ``version=`` gives
  time travel; concurrent commits never disturb an in-flight scan
  because its files are immutable.
- ``txn_delete_where`` is copy-on-write bounded by AFFECTED files:
  a metadata-cheap pass finds which live files contain matching rows
  (grouped by ``input_file_name``), only those are rewritten; the
  untouched majority of a 100 TB table is carried forward by
  reference in the log.
- ``txn_compact`` is OPTIMIZE as a commit: rewrite the live set into
  target-sized files, add new + remove old in one atomic version —
  logically a no-op, so readers at any version see identical rows.

Per-commit row/file counts are computed Spark-side and carried in the
commit record (the same write-JSON-then-read-metadata pattern as
``sinks.write_manifested_parquet`` — no driver materialization; the
log is bounded by file count, never row count).

Reference parity: the reference's sink contract is
atomic-via-tmpdir-rename for ONE job's output
(mapreduce/manager/__main__.py output directory handling); this is
the same atomicity promise extended to multi-commit table lifetime.
SURVEY.md section 2.B sinks/storage family.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TXNLOG_DIR = "_txnlog"
DATA_DIR = "data"
CHANGES_DIR = "_changes"


class TxnConflict(RuntimeError):
    """Another writer committed this version first — reread the
    snapshot and retry (optimistic concurrency)."""


class TxnCorrupt(RuntimeError):
    """The commit log is damaged in a way OUR writer cannot produce
    (external deletion, partial copy, disk corruption): a version file
    that does not parse, whose record disagrees with its filename, or
    a GAP in the version sequence. Replaying past a gap would silently
    drop that commit's adds/removes from every snapshot — the one
    failure mode worse than failing — so reads stop loudly and name
    the damaged file."""


# ------------------------------------------------------------- log I/O


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, TXNLOG_DIR)


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:08d}.json")


def txn_history(table_dir: str) -> list[dict]:
    """All commit records in version order — bounded metadata.

    Validates the log on every read (Delta's contiguity rule): commit
    files must parse, carry the version their filename claims, and
    form a dense 0..N sequence. Any violation raises
    :class:`TxnCorrupt` naming the file — never a silent partial
    replay."""
    commits: list[dict] = []
    for p in sorted(glob.glob(os.path.join(_log_dir(table_dir), "*.json"))):
        with open(p) as fh:
            try:
                rec = json.load(fh)
            except ValueError as exc:
                raise TxnCorrupt(f"unparseable commit file {p}: {exc}") from exc
        claimed = os.path.basename(p)[: -len(".json")]
        if not claimed.isdigit() or rec.get("version") != int(claimed):
            raise TxnCorrupt(
                f"commit file {p} carries version {rec.get('version')!r}, "
                f"not the {claimed!r} its name claims"
            )
        if rec["version"] != len(commits):
            raise TxnCorrupt(
                f"commit log gap in {table_dir}: expected version "
                f"{len(commits)}, found {rec['version']} ({p}) — a missing "
                f"commit would silently vanish from every snapshot"
            )
        commits.append(rec)
    return commits


def _live_files(table_dir: str, version: int | None = None) -> list[str]:
    """Replay the log up to ``version`` (inclusive; latest if None):
    the live set is adds minus removes, in commit order."""
    live: list[str] = []
    for commit in txn_history(table_dir):
        if version is not None and commit["version"] > version:
            break
        removed = set(commit.get("remove", []))
        live = [f for f in live if f not in removed]
        live.extend(e["file"] for e in commit.get("add", []))
    return live


def _surviving_files(table_dir: str) -> list[str]:
    """Every historical data file that still exists on disk, in commit
    order, deduplicated — the emptied-table schema-recovery walk.
    Vacuum can keep an arbitrary SUBSET of history, and evolution only
    ever ADDS columns, so the all-survivors set carries the full
    current schema even when the newest version's files were vacuumed
    and only pre-evolution files survive. Shared by ``_table_columns``
    (names) and ``sources.txnfeed._snapshot_schema`` (typed fields) so
    the two consumers cannot drift (round-6 ADVICE)."""
    seen: set[str] = set()
    files: list[str] = []
    for commit in txn_history(table_dir):
        for e in commit.get("add", []):
            f = e["file"]
            if f not in seen and os.path.exists(f):
                seen.add(f)
                files.append(f)
    return files


def _table_columns(table_dir: str, live: list[str] | None = None) -> list[str]:
    """Union column set of the table's CURRENT schema, from parquet
    footers only (bounded by file count — no data scan). Live files
    when any exist; for an emptied table, the union over every
    surviving historical file: the schema outlives the rows (Delta
    keeps it in table metadata; here it lives in the footers), vacuum
    can keep an arbitrary SUBSET of history, and evolution only ever
    ADDS columns — so the all-survivors union IS the current schema.
    Empty list only when vacuum has removed every historical file.

    Scale note: the per-file footer loop here runs driver-side; use it
    only for the bounded emptied-table fallback — live-set callers
    (txn_merge) get the same union from Spark's distributed
    mergeSchema read they already pay for."""
    import pyarrow.parquet as pq

    files = list(_live_files(table_dir) if live is None else live)
    if not files:
        files = _surviving_files(table_dir)
    cols: list[str] = []
    for path in files:
        for name in pq.read_schema(path).names:
            if name not in cols:
                cols.append(name)
    return cols


def _commit(table_dir: str, record: dict) -> dict:
    """Atomically publish one commit: the payload is written and
    fsynced to a writer-private temp name FIRST, then hard-linked to
    the version file. ``os.link`` is the put-if-absent that makes
    exactly one writer win, and — unlike writing into an O_EXCL fd —
    a writer killed mid-write leaves only an inert temp file, never a
    torn ``NNNNNNNN.json`` that would claim the version slot and break
    every subsequent log replay. The temp suffix keeps it outside the
    ``*.json`` glob readers use."""
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    path = _commit_path(table_dir, record["version"])
    payload = json.dumps(record, sort_keys=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:12]}"
    with open(tmp, "w") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError as exc:
        raise TxnConflict(
            f"version {record['version']} already committed in {table_dir}"
        ) from exc
    except FileNotFoundError as exc:
        # A concurrent txn_vacuum reclaimed the temp before the link
        # landed; same remedy as losing the version race — retry.
        raise TxnConflict(
            f"commit temp for version {record['version']} reclaimed "
            f"by a concurrent vacuum in {table_dir}; retry"
        ) from exc
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(tmp)
    return record


def _next_version(table_dir: str) -> int:
    history = txn_history(table_dir)
    return history[-1]["version"] + 1 if history else 0


# -------------------------------------------------------- file metadata


def _strip_uri(name: str) -> str:
    """``input_file_name()`` yields ``file:///path``; the log stores
    plain ``/path`` so entries compare equal to ``os.walk`` paths in
    ``txn_vacuum`` (a mismatch there would delete live files)."""
    if name.startswith("file:"):
        name = "/" + name[len("file:") :].lstrip("/")
    return name


def _read_meta(per_file: DataFrame, meta_dir: str) -> list[dict]:
    """Write a file-count-bounded ``(file, rows)`` relation as JSON and
    read it back — the manifested-parquet pattern: Spark computes the
    metadata, the driver reads one row per FILE, never per data row."""
    per_file.coalesce(1).write.mode("overwrite").json(meta_dir)
    entries = []
    for part in glob.glob(os.path.join(meta_dir, "part-*")):
        with open(part) as fh:
            for line in fh:
                if line.strip():
                    row = json.loads(line)
                    entries.append(
                        {"file": _strip_uri(row["file"]), "rows": row["rows"]}
                    )
    shutil.rmtree(meta_dir, ignore_errors=True)
    return sorted(entries, key=lambda e: e["file"])


def _file_stats(df_on_disk: DataFrame, meta_dir: str) -> list[dict]:
    """Per-data-file row counts, computed by Spark grouped on
    ``input_file_name`` — no driver collect."""
    return _read_meta(
        df_on_disk.groupBy(F.input_file_name().alias("file")).agg(
            F.count(F.lit(1)).alias("rows")
        ),
        meta_dir,
    )


def _write_commit_data(
    df: DataFrame, table_dir: str, version: int, op: str, num_files: int | None
) -> list[dict]:
    """Write ``df`` as this commit's immutable data directory and
    return its per-file add entries. The directory name carries a
    unique writer token (the Delta/Iceberg UUID-filename rule), so two
    writers racing the SAME version never touch each other's files —
    the loser's directory is an orphan no commit references,
    invisible until vacuumed."""
    out = os.path.join(
        table_dir, DATA_DIR, f"v{version:08d}-{op}-{uuid.uuid4().hex[:12]}"
    )
    if num_files is not None:
        df = df.repartition(num_files)
    df.write.mode("overwrite").parquet(out)
    back = df.sparkSession.read.parquet(out)
    return _file_stats(back, os.path.join(out, "_meta"))


def _write_changes(
    tagged: DataFrame, table_dir: str, version: int
) -> str:
    """Materialize a commit's row-level change feed (rows tagged with
    ``_change_type``) as an immutable directory. Cost ∝ rows the
    commit actually touched — the affected-row stream the operation
    already computed — exactly the Delta change-data-feed trade:
    append/create commits write NOTHING here (their add-files ARE the
    inserts; the reader synthesizes them)."""
    out = os.path.join(
        table_dir, CHANGES_DIR, f"v{version:08d}-{uuid.uuid4().hex[:12]}"
    )
    tagged.write.mode("overwrite").parquet(out)
    return out


# ------------------------------------------------------------- commits


def txn_create(df: DataFrame, table_dir: str, num_files: int = 4) -> dict:
    """Version 0: create the table."""
    version = _next_version(table_dir)
    if version != 0:
        raise TxnConflict(f"table {table_dir} already exists at v{version - 1}")
    add = _write_commit_data(df, table_dir, version, "create", num_files)
    return _commit(
        table_dir, {"version": version, "op": "create", "add": add, "remove": []}
    )


def txn_append(
    df: DataFrame,
    table_dir: str,
    num_files: int = 4,
    expect_version: int | None = None,
    extra: dict | None = None,
) -> dict:
    """Blind append: new files only, removes nothing — never conflicts
    logically with other appends (a loser on the version race just
    re-commits the same files at the next version). ``expect_version``
    pins the version this writer believes it is committing (the
    version it computed when it read its snapshot); if another writer
    got there first the commit raises ``TxnConflict`` instead of
    silently landing later in history."""
    version = _next_version(table_dir) if expect_version is None else expect_version
    add = _write_commit_data(df, table_dir, version, "append", num_files)
    record = {"version": version, "op": "append", "add": add, "remove": []}
    if extra:
        record.update(extra)
    return _commit(table_dir, record)


def txn_delete_where(
    spark: SparkSession, table_dir: str, predicate: str, num_files: int = 4
) -> dict:
    """Copy-on-write DELETE: rewrite ONLY the live files that contain
    at least one matching row (found by a grouped
    ``input_file_name`` pass — metadata-bounded result); every other
    file is carried forward by reference. The rewrite keeps the
    non-matching rows of affected files; the commit removes the old
    affected files and adds their rewrites atomically."""
    version = _next_version(table_dir)
    live = _live_files(table_dir)
    if not live:  # emptied table: nothing to delete, no-op commit
        return _commit(
            table_dir,
            {"version": version, "op": "delete", "add": [], "remove": [],
             "predicate": predicate},
        )
    # mergeSchema everywhere DML reads data files: the affected set may
    # span pre- and post-evolution files; a single-file-inferred schema
    # would silently drop evolved columns from the rewrite.
    snap = spark.read.option("mergeSchema", "true").parquet(*live)
    affected = _file_stats(
        snap.where(F.expr(predicate)),
        os.path.join(
            table_dir, DATA_DIR, f"v{version:08d}-delete-scan-{uuid.uuid4().hex[:12]}"
        ),
    )
    affected_files = [e["file"] for e in affected]
    if not affected_files:
        return _commit(
            table_dir,
            {"version": version, "op": "delete", "add": [], "remove": [],
             "predicate": predicate},
        )
    affected_df = spark.read.option("mergeSchema", "true").parquet(*affected_files)
    # SQL DELETE removes rows where the predicate is TRUE; under
    # three-valued logic a NULL predicate must KEEP the row, so the
    # survivor filter is NOT(coalesce(p, FALSE)) — a bare NOT(p) would
    # silently drop NULL-predicate rows from both table and feed.
    hit = F.coalesce(F.expr(predicate), F.lit(False))
    survivors = affected_df.where(~hit)
    add = _write_commit_data(survivors, table_dir, version, "delete", num_files)
    changes = _write_changes(
        affected_df.where(hit).withColumn("_change_type", F.lit("delete")),
        table_dir,
        version,
    )
    return _commit(
        table_dir,
        {
            "version": version,
            "op": "delete",
            "add": add,
            "remove": affected_files,
            "predicate": predicate,
            "changes": changes,
        },
    )


def txn_update_where(
    spark: SparkSession,
    table_dir: str,
    predicate: str,
    set_exprs: dict[str, str],
    num_files: int = 4,
) -> dict:
    """Copy-on-write UPDATE: rewrite ONLY the live files containing at
    least one row matching ``predicate``; in the rewrite, matching
    rows get each ``set_exprs`` column replaced by its SQL expression
    (evaluated against the pre-update row, standard UPDATE semantics),
    non-matching rows pass through, and every unaffected file is
    carried forward by reference — same affected-file bound as
    ``txn_delete_where``."""
    version = _next_version(table_dir)
    live = _live_files(table_dir)
    if not live:  # emptied table: nothing to update, no-op commit
        return _commit(
            table_dir,
            {"version": version, "op": "update", "add": [], "remove": [],
             "predicate": predicate},
        )
    snap = spark.read.option("mergeSchema", "true").parquet(*live)
    affected = _file_stats(
        snap.where(F.expr(predicate)),
        os.path.join(
            table_dir, DATA_DIR, f"v{version:08d}-update-scan-{uuid.uuid4().hex[:12]}"
        ),
    )
    affected_files = [e["file"] for e in affected]
    if not affected_files:
        return _commit(
            table_dir,
            {"version": version, "op": "update", "add": [], "remove": [],
             "predicate": predicate},
        )
    hit = F.expr(predicate)
    affected_df = spark.read.option("mergeSchema", "true").parquet(*affected_files)
    rewritten = affected_df.select(
        *[
            (
                F.when(hit, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
                if c in set_exprs
                else F.col(c)
            )
            for c in affected_df.columns
        ]
    )
    add = _write_commit_data(rewritten, table_dir, version, "update", num_files)
    # postimage = the MATCHED preimage rows transformed (a re-filter of
    # the output would be wrong when SET rewrites a predicate column)
    matched = affected_df.where(hit)
    postimage = matched.select(
        *[
            F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(c)
            for c in affected_df.columns
        ]
    )
    changes = _write_changes(
        matched.withColumn("_change_type", F.lit("update_preimage")).unionByName(
            postimage.withColumn("_change_type", F.lit("update_postimage"))
        ),
        table_dir,
        version,
    )
    return _commit(
        table_dir,
        {
            "version": version,
            "op": "update",
            "add": add,
            "remove": affected_files,
            "predicate": predicate,
            "changes": changes,
        },
    )


def txn_merge(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key_cols: list[str],
    num_files: int = 4,
) -> dict:
    """Copy-on-write MERGE (upsert): rows in ``source`` REPLACE live
    rows with the same key, and keys not present are INSERTED — the
    Delta ``MERGE … WHEN MATCHED UPDATE ALL WHEN NOT MATCHED INSERT
    ALL`` shape. Duplicate source rows on a MATCHED key raise
    ``ValueError`` before anything commits (Delta's ambiguous-update
    rule, enforced below); duplicate UNMATCHED keys are legal
    multi-row inserts.

    Scale contract: affected files are found by a key SEMI-join
    grouped on ``input_file_name`` (output bounded by file count, AQE
    picks broadcast when the source key set is small); ONLY those
    files are rewritten (their non-matching rows + all of ``source``);
    the untouched majority of a 100 TB table is carried forward by
    reference in the log. A merge whose keys are all new degrades to
    a pure insert commit that rewrites nothing."""
    version = _next_version(table_dir)
    live = _live_files(table_dir)
    # Schema discipline (the Delta autoMerge shape): EXTRA source
    # columns evolve the table — survivors and older files null-fill,
    # exactly like append-based evolution. A source MISSING table
    # columns errors loudly on EVERY path (matched, all-keys-new, and
    # emptied-table — a narrow all-miss source must not silently
    # commit files lacking table columns): replace-by-key semantics
    # cannot know whether the caller meant NULL or carry-forward, and
    # Delta's INSERT */UPDATE SET * reject the same shape. The check
    # runs against the full current table schema, not just the
    # affected files': Spark's DISTRIBUTED mergeSchema footer pass
    # over the live set (the same read the affected-file scan reuses
    # below — never a driver-side per-file footer loop, which would
    # serialize 100k footer reads at scale); the pyarrow fallback in
    # _table_columns only ever walks an emptied table's bounded
    # historical survivors.
    snap = (
        spark.read.option("mergeSchema", "true").parquet(*live) if live else None
    )
    table_cols = snap.columns if live else _table_columns(table_dir, live)
    narrow = [c for c in table_cols if c not in source.columns]
    if narrow:
        raise ValueError(
            f"txn_merge: source lacks table columns {narrow}; "
            "select them explicitly (NULL literals are legal) — "
            "column-subset SET semantics are not supported"
        )
    keys = source.select(*key_cols).distinct()
    if not live:  # emptied table: every key is new, pure insert
        add = _write_commit_data(source, table_dir, version, "merge", num_files)
        changes = _write_changes(
            source.withColumn("_change_type", F.lit("insert")),
            table_dir, version,
        )
        return _commit(
            table_dir,
            {"version": version, "op": "merge", "add": add, "remove": [],
             "key_cols": list(key_cols), "changes": changes},
        )
    # Tag the file name BELOW the join (Spark's PreReadCheck rejects
    # input_file_name above a multi-source join), then the key
    # SEMI-join + file-distinct yields the affected set.
    tagged = snap.select(F.input_file_name().alias("file"), *key_cols)
    affected = _read_meta(
        tagged.join(keys, key_cols, "semi")
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("rows")),
        os.path.join(
            table_dir, DATA_DIR, f"v{version:08d}-merge-scan-{uuid.uuid4().hex[:12]}"
        ),
    )
    affected_files = [e["file"] for e in affected]
    if affected_files:
        affected_df = spark.read.option("mergeSchema", "true").parquet(
            *affected_files
        )
        survivors = affected_df.join(keys, key_cols, "anti")
        new_data = survivors.unionByName(source, allowMissingColumns=True)
        preimage = affected_df.join(keys, key_cols, "semi")
        matched_keys = preimage.select(*key_cols).distinct()
        # Delta parity: a MATCHED key fed by more than one source row is
        # an ambiguous update and must error (silently landing both rows
        # — and double-tagging them update_postimage in the feed — is
        # the quiet corruption Delta's duplicate-match check exists
        # for). Duplicate UNMATCHED keys stay legal: they are plain
        # multi-row inserts. Cost: one aggregation over the matched
        # slice of the SOURCE — the small side by design.
        ambiguous = (
            source.join(matched_keys, list(key_cols), "semi")
            .groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if ambiguous:
            raise ValueError(
                "txn_merge: multiple source rows share a MATCHED key "
                f"(key_cols={list(key_cols)}); deduplicate the source "
                "or aggregate it per key before merging"
            )
        tag = F.when(
            F.col("__matched").isNotNull(), F.lit("update_postimage")
        ).otherwise(F.lit("insert"))
        post_or_insert = (
            source.join(
                matched_keys.withColumn("__matched", F.lit(1)),
                key_cols,
                "left",
            )
            .withColumn("_change_type", tag)
            .drop("__matched")
        )
        tagged = preimage.withColumn(
            "_change_type", F.lit("update_preimage")
        ).unionByName(post_or_insert, allowMissingColumns=True)
        # (preimages of an evolving merge null-fill the new columns in
        # the feed, matching how every reader sees the pre-evolution
        # rows themselves)
    else:
        new_data = source
        tagged = source.withColumn("_change_type", F.lit("insert"))
    add = _write_commit_data(new_data, table_dir, version, "merge", num_files)
    changes = _write_changes(tagged, table_dir, version)
    return _commit(
        table_dir,
        {
            "version": version,
            "op": "merge",
            "add": add,
            "remove": affected_files,
            "key_cols": list(key_cols),
            "changes": changes,
        },
    )


def txn_compact(
    spark: SparkSession,
    table_dir: str,
    num_files: int = 1,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
) -> dict:
    """OPTIMIZE as a commit: rewrite the whole live set into
    ``num_files`` right-sized files and swap them in atomically.
    Logically a no-op — every version (including this one) reads the
    same rows — so it can run any time without coordinating with
    readers; concurrent appends conflict on the version race and
    simply retry.

    ``cluster_by`` range-partitions and sorts the rewrite on those
    columns: each output file then owns a disjoint key range, so
    zone-map/min-max pruning (sinks.read_manifest_pruned, parquet
    row-group stats) can skip whole files on range probes instead of
    opening everything. With ``zorder=True`` and exactly two numeric
    cluster columns, the rewrite Morton-interleaves them instead
    (Delta OPTIMIZE ZORDER): every file gets a bounded min-max box on
    BOTH columns, so predicates on either prune."""
    version = _next_version(table_dir)
    live = _live_files(table_dir)
    if not live:  # emptied table: logically already compact
        return _commit(
            table_dir,
            {"version": version, "op": "compact", "add": [], "remove": []},
        )
    snap = spark.read.option("mergeSchema", "true").parquet(*live)
    if cluster_by and len(cluster_by) == 2 and zorder:
        # OPTIMIZE ZORDER: Morton-interleave the two min-max-normalized
        # columns so BOTH get per-file bounds (sinks.write_zorder_parquet
        # machinery, committed atomically like any other rewrite).
        from .functions import zorder_key, zorder_norm

        a, b = cluster_by
        bounds = snap.agg(
            F.min(a).alias("amin"),
            F.max(a).alias("amax"),
            F.min(b).alias("bmin"),
            F.max(b).alias("bmax"),
        )
        snap = (
            snap.crossJoin(F.broadcast(bounds))
            .withColumn(
                "_z",
                zorder_key(
                    zorder_norm(F.col(a), F.col("amin"), F.col("amax")),
                    zorder_norm(F.col(b), F.col("bmin"), F.col("bmax")),
                ),
            )
            .repartitionByRange(num_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z", "amin", "amax", "bmin", "bmax")
        )
        add = _write_commit_data(snap, table_dir, version, "compact", None)
    elif cluster_by:
        snap = snap.repartitionByRange(num_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
        add = _write_commit_data(snap, table_dir, version, "compact", None)
    else:
        add = _write_commit_data(snap, table_dir, version, "compact", num_files)
    return _commit(
        table_dir,
        {"version": version, "op": "compact", "add": add, "remove": live},
    )


def txn_stream_sink(table_dir: str, num_files: int = 4):
    """Exactly-once Structured Streaming sink into a txnlog table:
    ``df.writeStream.foreachBatch(txn_stream_sink(dir))``. The
    standard Spark recipe for non-idempotent sinks — dedup on the
    (queryable) ``batchId`` the engine replays after failure — made
    atomic by the commit log: a batch lands either as one whole commit
    carrying its ``batch_id`` or not at all, so a replayed batch is
    recognized by log scan (metadata-bounded) and skipped, and a
    version race with a concurrent writer retries the SAME batch at
    the next version (still exactly once — the batch_id check reruns
    after every conflict)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        while True:
            committed = {c.get("batch_id") for c in txn_history(table_dir)}
            if batch_id in committed:
                return  # replayed micro-batch: already durably committed
            try:
                txn_append(
                    batch_df,
                    table_dir,
                    num_files=num_files,
                    expect_version=_next_version(table_dir),
                    extra={"batch_id": batch_id},
                )
                return
            except TxnConflict:
                continue  # someone else won the version; re-check and retry

    return write_batch


# ------------------------------------------------------------- readers


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot-isolated read: replay the log (metadata only) to the
    live file set at ``version`` (latest if None) and scan exactly
    those immutable files. Later commits cannot disturb this scan."""
    live = _live_files(table_dir, version)
    if not live:
        raise FileNotFoundError(f"no committed data in {table_dir} at v{version}")
    # mergeSchema: commits may evolve the schema (append with new
    # columns); the union schema is reconstructed from the live files'
    # footers — metadata-bounded — and absent columns read as NULL.
    return spark.read.option("mergeSchema", "true").parquet(*live)


def txn_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change data feed: every row-level change in commits
    ``from_version..to_version`` (inclusive; latest if None), tagged
    ``_change_type`` ∈ {insert, delete, update_preimage,
    update_postimage} + ``_commit_version`` — what an incremental
    consumer (e.g. the incremental-dedup index, a downstream IVM view)
    reads instead of diffing full snapshots. Reads are bounded by the
    rows those commits touched: create/append inserts come straight
    from the commits' own add-files (nothing was written twice);
    delete/update/merge read their materialized ``_changes``
    directories; compaction is logically empty and contributes
    nothing."""
    parts = []
    for commit in txn_history(table_dir):
        v = commit["version"]
        if v < from_version or (to_version is not None and v > to_version):
            continue
        if commit["op"] in ("create", "append", "clone"):
            files = [e["file"] for e in commit["add"]]
            if files:
                parts.append(
                    spark.read.option("mergeSchema", "true")
                    .parquet(*files)
                    .withColumn("_change_type", F.lit("insert"))
                    .withColumn("_commit_version", F.lit(v))
                )
        elif commit["op"] == "restore":
            # A restore's net change is exactly its file delta: rows of
            # re-added files come back (insert), rows of removed files
            # go away (delete) — both still on disk until vacuumed, the
            # same retention coupling as the _changes directories.
            files = [e["file"] for e in commit["add"]]
            if files:
                parts.append(
                    spark.read.option("mergeSchema", "true")
                    .parquet(*files)
                    .withColumn("_change_type", F.lit("insert"))
                    .withColumn("_commit_version", F.lit(v))
                )
            removed = commit.get("remove", [])
            if removed:
                parts.append(
                    spark.read.option("mergeSchema", "true")
                    .parquet(*removed)
                    .withColumn("_change_type", F.lit("delete"))
                    .withColumn("_commit_version", F.lit(v))
                )
        elif commit.get("changes"):
            parts.append(
                spark.read.option("mergeSchema", "true")
                .parquet(commit["changes"])
                .withColumn("_commit_version", F.lit(v))
            )
    if not parts:
        # e.g. a compaction-only range: logically nothing changed
        return (
            read_snapshot(spark, table_dir)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(0))
            .where(F.lit(False))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def apply_changes_to_count_view(
    view: DataFrame, feed: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Incrementally maintain a ``GROUP BY key → cnt`` view from a
    change feed (the count-based IVM rule): inserts and
    update_postimages weigh +1, deletes and update_preimages −1; the
    delta collapses to one row per touched key (map-side partial agg)
    before merging with the view, and keys whose count reaches 0 drop
    out. This is how a 100 TB derived index (e.g. the incremental
    dedup key index) follows its base table for the cost of the DELTA,
    never a snapshot recompute."""
    w = (
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("cnt")
    )
    delta = feed.select(*key_cols, w).groupBy(*key_cols).agg(
        F.sum("cnt").alias("cnt")
    )
    return (
        view.unionByName(delta)
        .groupBy(*key_cols)
        .agg(F.sum("cnt").alias("cnt"))
        .where(F.col("cnt") > 0)
    )


def snapshot_stats(table_dir: str, version: int | None = None) -> dict:
    """(files, rows) of a snapshot from the log alone — no data I/O.
    The planning-phase numbers a 100 TB scan needs before it opens
    anything."""
    live = set(_live_files(table_dir, version))
    # keyed by file, not summed per add entry: a RESTORE re-adds a
    # previously-removed file, so the same file can carry add entries
    # in two commits — it must count once.
    rows_by_file: dict[str, int] = {}
    for commit in txn_history(table_dir):
        for entry in commit.get("add", []):
            if entry["file"] in live:
                rows_by_file[entry["file"]] = entry["rows"]
    return {"files": len(live), "rows": sum(rows_by_file.values())}


def txn_vacuum(
    table_dir: str, retain_versions: int = 1, min_age_s: float = 600.0
) -> dict:
    """Reclaim data files referenced by NO retained version: keeps
    every file live in any of the last ``retain_versions`` snapshots
    (time travel works back exactly that far), deletes the rest —
    including orphan directories from crashed writers — and reclaims
    the ``_changes`` directories of commits OLDER than the retained
    window (``txn_changes``/``txnfeed`` reads starting before the
    window fail afterwards, the same retention coupling as Delta's
    CDF). Returns ``{deleted, kept, deferred, changes_deleted}``
    file counts.

    ``min_age_s``: an unreferenced file younger than this is DEFERRED,
    not deleted. An IN-FLIGHT writer's data directory is
    indistinguishable from a crashed writer's orphan until its commit
    lands — the data write happens BEFORE the log link — so a vacuum
    racing a live writer would otherwise delete files the imminent
    commit references, corrupting that version forever (reads fail on
    missing files; the log itself stays consistent, which makes it
    worse — nothing looks wrong until the scan). Delta guards the same
    race with its retention-duration check; pass ``min_age_s=0.0``
    only when no writer can be in flight (single-writer maintenance
    windows, tests). The same guard covers fresh commit temps.
    ``_changes`` dirs need no guard: they belong to already-committed
    versions, never to an in-flight writer.

    Log entries store absolute paths (``input_file_name`` is absolute);
    both sides of every membership test are ``os.path.realpath``-
    normalized so a relative ``table_dir`` cannot make live files look
    unreferenced (which would destroy the table)."""
    history = txn_history(table_dir)
    if not history:
        return {"deleted": 0, "kept": 0, "deferred": 0, "changes_deleted": 0}
    latest = history[-1]["version"]
    cutoff = max(0, latest - retain_versions + 1)
    keep: set[str] = set()
    for v in range(cutoff, latest + 1):
        keep.update(os.path.realpath(f) for f in _live_files(table_dir, v))
    now = time.time()
    deleted = 0
    deferred = 0
    data_root = os.path.join(os.path.realpath(table_dir), DATA_DIR)
    for dirpath, _dirnames, filenames in os.walk(data_root, topdown=False):
        for fname in filenames:
            full = os.path.realpath(os.path.join(dirpath, fname))
            if full not in keep and fname.endswith(".parquet"):
                with contextlib.suppress(FileNotFoundError):
                    if now - os.path.getmtime(full) < min_age_s:
                        deferred += 1  # possibly an in-flight writer's
                        continue
                    os.remove(full)
                    deleted += 1
        if not os.listdir(dirpath):
            os.rmdir(dirpath)
    changes_deleted = 0
    for commit in history:
        changes = commit.get("changes")
        if commit["version"] < cutoff and changes and os.path.isdir(changes):
            changes_deleted += len(
                glob.glob(os.path.join(changes, "*.parquet"))
            )
            shutil.rmtree(changes, ignore_errors=True)
    # A writer killed between temp-write and link leaves an inert
    # ``NNNNNNNN.json.tmp-*``; it references nothing, so vacuum is the
    # natural reclaim point. A LIVE writer's temp is exposed for at
    # most the instant before its link — losing the race there
    # surfaces as a retryable TxnConflict — and the min_age_s guard
    # makes even that collision impossible outside a zero-grace vacuum.
    for stale in glob.glob(os.path.join(_log_dir(table_dir), "*.json.tmp-*")):
        with contextlib.suppress(FileNotFoundError):
            if now - os.path.getmtime(stale) < min_age_s:
                deferred += 1
                continue
            os.unlink(stale)
    return {
        "deleted": deleted,
        "kept": len(keep),
        "deferred": deferred,
        "changes_deleted": changes_deleted,
    }


def txn_clone(src_dir: str, dst_dir: str, version: int | None = None) -> dict:
    """SHALLOW CLONE (the public Delta feature): create ``dst_dir`` as
    a new table whose v0 references the SOURCE's live data files at
    ``version`` (latest if None) — zero data copied, metadata-bounded
    cost. The clone then evolves independently: its DML rewrites land
    under its own data/ directory, and because ``txn_vacuum`` only
    walks a table's OWN data root, vacuuming the clone can never
    reclaim source files (and vice versa) — the documented caveat is
    the other direction: vacuuming the SOURCE can delete files a clone
    still references, so retention windows must cover live clones,
    exactly as in Delta."""
    if txn_history(dst_dir):
        raise TxnConflict(f"clone target {dst_dir} already exists")
    history = txn_history(src_dir)
    if not history:
        raise FileNotFoundError(f"no committed data in {src_dir}")
    live = set(_live_files(src_dir, version))
    rows_by_file: dict[str, int] = {}
    for commit in history:
        for entry in commit.get("add", []):
            if entry["file"] in live:
                rows_by_file[entry["file"]] = entry["rows"]
    add = [
        {"file": f, "rows": rows_by_file[f]} for f in sorted(rows_by_file)
    ]
    return _commit(
        dst_dir,
        {
            "version": 0,
            "op": "clone",
            "add": add,
            "remove": [],
            "source": os.path.realpath(src_dir),
            "source_version": version
            if version is not None
            else history[-1]["version"],
        },
    )


def txn_restore(table_dir: str, version: int) -> dict:
    """RESTORE (the public Delta feature): roll the table's LIVE state
    back to ``version`` as a NEW commit — removes the current live set,
    re-adds the target version's files — so history is preserved (the
    restore itself is undoable) and no data is copied or deleted; the
    restored files must still exist, i.e. vacuum retention must cover
    the target version."""
    history = txn_history(table_dir)
    if not history:
        raise FileNotFoundError(f"no committed data in {table_dir}")
    if not any(c["version"] == version for c in history):
        raise ValueError(f"version {version} not in {table_dir} history")
    target = _live_files(table_dir, version)
    missing = [f for f in target if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"restore target v{version} references vacuumed files: "
            f"{missing[:3]}{'...' if len(missing) > 3 else ''}"
        )
    current = _live_files(table_dir)
    rows_by_file: dict[str, int] = {}
    for commit in history:
        for entry in commit.get("add", []):
            rows_by_file[entry["file"]] = entry["rows"]
    new_version = history[-1]["version"] + 1
    # Only add files NOT currently live: a target file that survived to
    # the present stays live by carry-forward, and re-adding it would
    # DUPLICATE it in the log replay (caught by the model-based sweep:
    # restore-to-current doubled every row).
    current_set = set(current)
    target_set = set(target)
    return _commit(
        table_dir,
        {
            "version": new_version,
            "op": "restore",
            "add": [
                {"file": f, "rows": rows_by_file[f]}
                for f in sorted(target_set - current_set)
            ],
            "remove": [f for f in current if f not in target_set],
            "restored_version": version,
        },
    )
