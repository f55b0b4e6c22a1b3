r"""Exec-compat streaming-executable layer: the reference's defining
feature, rebuilt on ``rdd.pipe``.

The reference runs arbitrary executables as operators with the Hadoop
Streaming contract (reference mapreduce/worker/__main__.py):

- map (:130-148): each input file streams through the executable;
  stdout lines are ``key\tvalue`` records, key = text before the FIRST
  tab of the RAW newline-terminated line (:141) — so a tabless
  record's key includes its trailing ``\n`` — routed to partition
  ``md5(key) % R`` (:142-144);
- each map-output partition file is byte-sorted whole-line (:150-152);
- reduce (:173-194): a k-way merge of the sorted runs (so the reducer
  sees keys sorted, equal keys adjacent) streams through the reducer
  executable.

Spark equivalences: ``rdd.pipe`` = the executable boundary (one
process per partition instead of per file — same contract, fewer
forks); ``repartitionAndSortWithinPartitions`` = hash partition +
external sort + merge in one shuffle. ``md5_partition`` reproduces the
reference's exact partition function for layout parity
(Murmur3/`repartition` is the default everywhere else — md5 parity
only matters to byte-identical file layout, which value semantics
never depend on).

These operators are opaque barriers to Catalyst (no pushdown through a
subprocess) — documented limitation, exactly as in the reference.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Row, SparkSession


def md5_partition(key: str, num_partitions: int) -> int:
    """The reference's partition function (mapreduce/worker/__main__.py:142-144)."""
    return int(hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % num_partitions


def reference_partition_key(line: str) -> str:
    r"""The byte string the reference actually hashes for a map-output
    record (mapreduce/worker/__main__.py:141): ``line.split('\t')[0]``
    computed on the RAW newline-terminated stdout line. For a tabbed
    record that is the text before the first tab (the '\n' sits in the
    value part); for a TABLESS record the split returns the whole line
    *including* its trailing newline, so the reference hashes
    ``md5(key + '\n')`` — a tabless ``key`` record and a tabbed
    ``key\tv`` record can land in DIFFERENT reduce partitions, and do.
    ``line`` here is the newline-stripped record as our pipeline
    carries it; this helper re-adds the byte the reference saw."""
    head, sep, _ = line.partition("\t")
    return head if sep else head + "\n"


def reference_partition_key_col(value):
    r"""``reference_partition_key`` as a JVM-side Column over the
    newline-stripped record column ``value``."""
    from pyspark.sql import functions as F

    return F.when(
        F.contains(value, F.lit("\t")),
        F.split_part(value, F.lit("\t"), F.lit(1)),
    ).otherwise(F.concat(value, F.lit("\n")))


def md5_partition_col(key, num_partitions: int):
    """``md5_partition`` as a JVM-side Column: the full 128-bit digest
    mod R, in exact integer arithmetic via two 64-bit hex halves —
    (hi*2^64 + lo) % R == ((hi%R) * (2^64%R) + lo%R) % R. Property-
    pinned equal to the Python formula on arbitrary unicode keys
    (tests/test_pipe_model.py)."""
    from pyspark.sql import functions as F

    hi = F.conv(F.substring(F.md5(key), 1, 16), 16, 10).cast("decimal(38,0)")
    lo = F.conv(F.substring(F.md5(key), 17, 16), 16, 10).cast("decimal(38,0)")
    two64_mod = (1 << 64) % num_partitions
    return F.pmod(
        F.pmod(hi, F.lit(num_partitions)) * F.lit(two64_mod)
        + F.pmod(lo, F.lit(num_partitions)),
        F.lit(num_partitions),
    ).cast("int")


def _first_tab_split(line: str) -> tuple[str, str | None]:
    """key = text before the first tab (reference worker :141). A line
    with NO tab is the whole key with a NULL value — the distinction
    matters because the reference never reparses map output: the raw
    line itself is what gets sorted and handed to the reducer, so
    ``key`` (no tab) and ``key\\t`` (tab, empty value) are different
    records and must survive the key/value round-trip as such.
    (Caught by tests/test_pipe_model.py: rebuilding every record as
    ``key\\tvalue`` appended a tab to tabless records, which both
    changed the reducer's input bytes and flipped the whole-line sort
    order against keys containing bytes below 0x09.)"""
    head, sep, tail = line.partition("\t")
    return head, tail if sep else None


def pipe_map(
    df: DataFrame,
    command: str,
    num_mappers: int | None = None,
) -> DataFrame:
    """Stream rows through a mapper executable; parse stdout as
    ``key\tvalue`` records.

    ``df`` is serialized one line per row: single-column rows pass
    through verbatim; multi-column rows join on tabs. ``num_mappers``
    emulates the reference's M knob via repartition.
    """
    spark = df.sparkSession
    if num_mappers:
        df = df.repartition(num_mappers)
    lines = df.rdd.map(
        lambda row: row[0] if len(row) == 1 else "\t".join("" if c is None else str(c) for c in row)
    )
    out = (
        lines.pipe(command, checkCode=True)
        .map(_first_tab_split)
        .map(lambda kv: Row(key=kv[0], value=kv[1]))
    )
    return spark.createDataFrame(out, schema="key string, value string")


def pipe_reduce(
    df: DataFrame,
    command: str,
    num_reducers: int = 1,
) -> DataFrame:
    """Shuffle ``DataFrame[key, value]`` into ``num_reducers`` md5-hash
    partitions, byte-sort each partition whole-line, and stream every
    partition through the reducer executable — the reference's reduce
    contract (sorted keys, equal keys adjacent, values sorted within
    key), including empty-string keys.

    The sort is Spark's external shuffle sort (spills like the
    reference's GNU ``sort``), not an in-memory ``sorted()``.
    """
    spark = df.sparkSession
    kv = df.rdd.map(lambda row: ("" if row[0] is None else str(row[0]),
                                 None if row[1] is None else str(row[1])))
    # NULL value = the map output line had no tab: the raw line is the
    # bare key, and that exact byte string is what the reference sorts
    # and pipes (worker :150-152) — appending "\t" would alter both.
    lines = kv.map(lambda r: (r[0] if r[1] is None else r[0] + "\t" + r[1], None))
    arranged = lines.repartitionAndSortWithinPartitions(
        numPartitions=num_reducers,
        # Reference routing computes the key from the raw newline-
        # terminated line, so tabless records hash md5(line + '\n')
        # (see reference_partition_key) — pinned by the
        # tests/test_pipe_model.py simulator sweep.
        partitionFunc=lambda line: md5_partition(
            reference_partition_key(line), num_reducers
        ),
    )
    out = arranged.map(lambda pair: pair[0]).pipe(command, checkCode=True)
    return spark.createDataFrame(out.map(lambda v: Row(value=v)), schema="value string")


def run_streaming_job(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    mapper: str,
    reducer: str,
    num_mappers: int = 2,
    num_reducers: int = 1,
) -> None:
    """One reference job end-to-end: text dir -> mapper exec -> md5
    shuffle + sort -> reducer exec -> part-files (overwrite), mirroring
    submit-job semantics (reference mapreduce/submit.py:80-88 and the
    output-dir overwrite at manager/__main__.py:87-90)."""
    from ..sources import read_text_dir

    text = read_text_dir(spark, input_dir, num_partitions=num_mappers)
    mapped = pipe_map(text, mapper)
    reduced = pipe_reduce(mapped, reducer, num_reducers=num_reducers)
    reduced.write.mode("overwrite").text(output_dir)
