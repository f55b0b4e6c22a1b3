"""Change-data-feed STREAMING DataSource over a txnlog table: a
Spark 4 Python ``DataSourceStreamReader`` whose offsets ARE commit
versions.

``txnlog`` tables (txnlog.py) already expose a batch change feed
(``txn_changes``); THIS source makes the same feed a first-class
``readStream`` — the Delta-CDF-as-source shape — so incremental
consumers (derived-index IVM, downstream enrichment) subscribe to
commits instead of polling versions by hand:

    spark.dataSource.register(TxnFeedDataSource)
    feed = (spark.readStream.format("txnfeed")
                 .option("path", table_dir).load())

Offset model: the committed offset is ``{"version": n}`` — the count
of commits fully emitted. A fresh consumer starts at
``.option("startingVersion", N)`` (default 0 = whole history) — the
Delta-CDF shape, and the documented remediation when older commits'
``_changes`` dirs were vacuumed. ``latestOffset`` re-reads the commit log
(file-count-bounded metadata); ``partitions(start, end)`` maps every
DATA FILE of the new commits to one input partition (create/append
inserts come straight from the commit's own add-files; delete/update/
merge read their materialized ``_changes`` files; compaction is
logically empty and contributes nothing) — so intra-batch parallelism
equals file count and replaying a batch re-reads the same immutable
files (offsets pin the slice, which is what makes downstream
exactly-once sinks work). ``commit`` is a no-op: progress durability
lives in the checkpoint, like the built-in file source.

Rows carry the table's CURRENT snapshot schema plus ``_change_type``
and ``_commit_version``; older files missing newly evolved columns
null-fill them (the mergeSchema read rule). Reads yield Arrow
RecordBatches, so no per-row Python. Operational caveat (same as any
CDF consumer): ``txn_vacuum``'s retention window must cover consumer
lag — vacuuming a version still unread by the stream deletes files
its offsets reference.

Reference parity: none — this is the continuous-ingest surface the
reference never had; SURVEY.md section 2.B sources/streaming family.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..txnlog import txn_history

CHANGE_COLS = ("_change_type", "_commit_version")


class ChangeFilePartition(InputPartition):
    """One immutable data/changes file of one commit."""

    def __init__(self, path: str, change_type: str | None, version: int):
        self.path = path
        # None => the file already carries its own _change_type column
        self.change_type = change_type
        self.version = version


def _commit_files(commit: dict) -> list[tuple[str, str | None]]:
    """(path, synthesized change_type or None) for one commit."""
    import glob
    import os

    if commit["op"] in ("create", "append", "clone"):
        return [(e["file"], "insert") for e in commit.get("add", [])]
    if commit["op"] == "restore":
        # net file delta: re-added files emit their rows as inserts,
        # removed files as deletes (txn_changes has the same rule)
        return [(e["file"], "insert") for e in commit.get("add", [])] + [
            (f, "delete") for f in commit.get("remove", [])
        ]
    changes = commit.get("changes")
    if not changes:
        return []
    if not os.path.isdir(changes):
        # The _changes dir was vacuumed (txn_vacuum reclaims change
        # dirs older than its retention cutoff). Silently emitting
        # nothing would DROP this commit's changes from a lagging
        # consumer — the batch feed (txn_changes) fails loudly on the
        # same read, and Delta's CDF errors the same way. Fail the
        # stream; the consumer must re-seed or start from a newer
        # version.
        raise FileNotFoundError(
            f"txnfeed: _changes for version {commit['version']} was "
            f"vacuumed ({changes}); the vacuum retention window must "
            "cover consumer lag — restart from a newer startingVersion "
            "after re-seeding the consumer"
        )
    return [
        (p, None)
        for p in sorted(glob.glob(os.path.join(changes, "*.parquet")))
    ]


class TxnFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txnfeed requires .option('path', <table_dir>)")
        self.schema = schema
        self.start_version = int(options.get("startingVersion", 0))

    def initialOffset(self) -> dict:
        # Option startingVersion=N begins mid-log (Delta's
        # startingVersion shape) — the remediation the vacuumed-
        # _changes error advertises: a fresh consumer skips the
        # reclaimed commits instead of being wedged at version 0.
        # Default is the whole history.
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        history = txn_history(self.path)
        return {"version": history[-1]["version"] + 1 if history else 0}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[ChangeFilePartition]:
        parts: list[ChangeFilePartition] = []
        for commit in txn_history(self.path):
            v = commit["version"]
            if int(start["version"]) <= v < int(end["version"]):
                parts.extend(
                    ChangeFilePartition(p, ct, v)
                    for p, ct in _commit_files(commit)
                )
        # Spark requires a non-empty partition list; a compaction-only
        # range emits one empty partition.
        return parts or [ChangeFilePartition("", "insert", int(start["version"]))]

    def read(self, partition: ChangeFilePartition) -> Iterator:
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        def to_declared(col, spark_type):
            # Schema evolution can leave older files with a narrower
            # physical type (e.g. int32 file vs int64 union schema);
            # cast to the DECLARED source schema like the batch
            # mergeSchema read widens, instead of failing at runtime
            # with a batch/schema type mismatch.
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            want = _arrow_type(spark_type)
            return pc.cast(col, want) if col.type != want else col

        table = pq.read_table(partition.path)
        n = table.num_rows
        arrays = []
        for field in self.schema.fields:
            if field.name == "_change_type":
                if partition.change_type is None:
                    arrays.append(
                        to_declared(table.column("_change_type"), field.dataType)
                    )
                else:
                    arrays.append(
                        pa.array([partition.change_type] * n, pa.string())
                    )
            elif field.name == "_commit_version":
                arrays.append(pa.array([partition.version] * n, pa.int64()))
            elif field.name in table.column_names:
                arrays.append(to_declared(table.column(field.name), field.dataType))
            else:
                # schema evolution: older files null-fill new columns
                arrays.append(pa.nulls(n, _arrow_type(field.dataType)))
        yield pa.RecordBatch.from_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in arrays],
            names=[f.name for f in self.schema.fields],
        )

    def commit(self, end: dict) -> None:
        return  # durability is the checkpoint's job


def _arrow_type(spark_type):
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(spark_type)


def _snapshot_schema(table_dir: str) -> StructType:
    """CURRENT snapshot schema (mergeSchema union over live files'
    footers — metadata only) + the two change columns."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_type

    from ..txnlog import _live_files, _surviving_files

    live = _live_files(table_dir)
    if not live:
        # A DML op can empty the table while its change feed stays
        # perfectly readable (the batch txn_changes does); derive the
        # schema from ALL surviving historical files via the SAME
        # history walk txnlog._table_columns uses (shared helper —
        # round-6 ADVICE: two hand-maintained copies could drift).
        # The all-survivors union is the full schema because columns
        # are never dropped; picking only the newest version with
        # survivors could land on a pre-evolution NARROW file set.
        live = _surviving_files(table_dir)
    if not live:
        raise FileNotFoundError(f"no committed data in {table_dir}")
    fields: dict[str, StructField] = {}
    for path in live:
        for f in pq.read_schema(path):
            if f.name not in fields:
                fields[f.name] = StructField(
                    f.name, from_arrow_type(f.type, prefer_timestamp_ntz=False)
                )
    return StructType(
        list(fields.values())
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
        ]
    )


class TxnFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txnfeed"

    def schema(self) -> StructType:
        return _snapshot_schema(self.options["path"])

    def streamReader(self, schema: StructType) -> TxnFeedStreamReader:
        return TxnFeedStreamReader(self.options, schema)
