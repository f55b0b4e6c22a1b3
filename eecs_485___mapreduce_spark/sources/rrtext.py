"""Round-robin text-directory DataSource: the reference's EXACT input
split layout as a Spark 4 Python DataSource.

The reference's manager lists ``input_directory`` sorted by name and
assigns file *i* to map task ``i % num_mappers``
(reference mapreduce/manager/__main__.py:93-107; the exact per-task
file lists are asserted by its tests/test_manager_02.py:172-196).
``sources.text`` reproduces the task COUNT via repartition — the
strictly-better-at-scale default — but not the file->task grouping.
This DataSource closes that last gap: each Spark input partition IS
one reference map task, holding exactly the files ``i % M == task``,
so operators that care about task-local file grouping (exec-pipe
stages whose mapper behavior depends on which files share a task)
see the reference's layout byte-for-byte.

Usage::

    spark.dataSource.register(RoundRobinTextDataSource)
    df = (spark.read.format("rrtext")
          .option("path", directory).option("num_mappers", "4").load())
    # df: value string, file string, task int — partition p == task p

Scale notes: the reader is line-streaming (never loads a whole file),
one partition per map task exactly like the reference. This is a
COMPATIBILITY source — the Python reader path costs a serialization
hop, so the default corpus path stays ``spark.read.text``
(sources/text.py); use this when the reference's task layout itself is
the contract. Partition planning happens driver-side from a single
sorted listing, identical to the reference's planner.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)


class MapTaskPartition(InputPartition):
    """One reference map task: its id and its round-robin file list."""

    def __init__(self, task: int, files: list[str]):
        self.task = task
        self.files = files


class RoundRobinTextReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rrtext requires .option('path', <directory>)")
        self.num_mappers = int(options.get("num_mappers", "4"))

    def partitions(self) -> Sequence[MapTaskPartition]:
        # Sorted listing then file i -> task i % M: the reference's
        # planner verbatim (mapreduce/manager/__main__.py:93-107).
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if os.path.isfile(os.path.join(self.path, f))
        )
        tasks: list[list[str]] = [[] for _ in range(self.num_mappers)]
        for i, f in enumerate(files):
            tasks[i % self.num_mappers].append(f)
        # Every task becomes a partition, even an empty one — task
        # count is part of the layout contract.
        return [MapTaskPartition(t, fs) for t, fs in enumerate(tasks)]

    def read(self, partition: MapTaskPartition) -> Iterator[tuple]:
        for path in partition.files:
            with open(path, encoding="utf-8", errors="replace") as fh:
                for line in fh:
                    yield (line.rstrip("\n"), path, partition.task)


class RoundRobinTextDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rrtext"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("value", StringType()),
                StructField("file", StringType()),
                StructField("task", IntegerType()),
            ]
        )

    def reader(self, schema: StructType) -> RoundRobinTextReader:
        return RoundRobinTextReader(self.options)
