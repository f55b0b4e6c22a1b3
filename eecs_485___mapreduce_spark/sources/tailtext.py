"""Tailing text-directory STREAMING DataSource: a Spark 4 Python
``DataSourceStreamReader`` with real offset management.

The batch ``rrtext`` source (sources/rrtext.py) reproduces the
reference's input-split layout; THIS source is its streaming
counterpart — the continuous-ingest shape the reference never had:
files land in a directory (immutable once written, names
monotonically sortable — the standard log-shipping contract), and the
stream emits each file's lines EXACTLY once across micro-batches,
restarts, and replays.

Offset model: the committed offset is ``{"index": n}`` — the count of
files (in sorted-name order) fully emitted. ``latestOffset`` re-lists
the directory; ``partitions(start, end)`` maps each newly arrived
file to one input partition, so intra-batch parallelism equals new
file count; replaying a batch re-reads the same file slice (the
offsets pin the slice, which is what makes downstream exactly-once
sinks work). ``commit`` is a no-op — progress durability lives in the
checkpoint, exactly like the built-in file source.

Scale notes: listing is driver-side (one sorted directory listing per
micro-batch — same as Spark's FileStreamSource); reads stream
line-by-line with O(line) memory; a production variant would shard
the listing by prefix. This is the COMPATIBILITY/API-surface path —
parquet streams should keep using ``spark.readStream.parquet``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType


class FileSlicePartition(InputPartition):
    """One newly arrived file of the micro-batch."""

    def __init__(self, path: str):
        self.path = path


class TailTextStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tailtext requires .option('path', <directory>)")

    def _listing(self) -> list[str]:
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if os.path.isfile(os.path.join(self.path, f))
        )

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._listing())}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[FileSlicePartition]:
        files = self._listing()[int(start["index"]) : int(end["index"])]
        return [FileSlicePartition(p) for p in files]

    def read(self, partition: FileSlicePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                yield (line.rstrip("\n"), partition.path)

    def commit(self, end: dict) -> None:
        # Durability is the checkpoint's job (same as FileStreamSource);
        # nothing to acknowledge source-side.
        return


class TailTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tailtext"

    def schema(self) -> StructType:
        return StructType(
            [StructField("value", StringType()), StructField("file", StringType())]
        )

    def streamReader(self, schema: StructType) -> TailTextStreamReader:
        return TailTextStreamReader(self.options)
