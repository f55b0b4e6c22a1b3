"""Sinks: partitioned file output.

The reference's sink is ``part-{t:05d}`` text files, one per reduce
partition, with the output directory overwritten per job (reference
mapreduce/worker/__main__.py:180-198, manager/__main__.py:87-90).
Spark's file sinks already emit one ``part-*`` file per partition and
``mode("overwrite")`` replaces the directory — these wrappers add the
reference's R knob (deterministic output file count) and the columnar
variants a real pipeline needs.

Scale notes: ``num_files`` uses ``repartition`` (a shuffle) only when
the count must be exact; prefer leaving it None and letting AQE
coalesce — at 100 TB, forcing small R serializes the write. For
parquet, ``partition_by`` gives directory-level partition pruning to
every downstream scan; pair with sensible file sizes
(``maxRecordsPerFile``) so a 1000-executor read isn't stuck on four
giant files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_file_count(df: DataFrame, num_files: int | None) -> DataFrame:
    if num_files is None:
        return df
    # repartition (not coalesce): coalesce(1) would collapse upstream
    # parallelism into the single writing task; repartition keeps the
    # compute wide and only narrows the write.
    return df.repartition(num_files)


def write_text(df: DataFrame, output_dir: str, num_files: int | None = None) -> None:
    """Reference-style text sink: one string column -> part files,
    overwrite semantics. ``num_files`` is the reference's R."""
    _with_file_count(df, num_files).write.mode("overwrite").text(output_dir)


def write_parquet(
    df: DataFrame,
    output_dir: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = _with_file_count(df, num_files).write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(output_dir)


def write_csv(
    df: DataFrame, output_dir: str, header: bool = True, num_files: int | None = None
) -> None:
    _with_file_count(df, num_files).write.mode("overwrite").option(
        "header", str(header).lower()
    ).csv(output_dir)


def write_json(df: DataFrame, output_dir: str, num_files: int | None = None) -> None:
    _with_file_count(df, num_files).write.mode("overwrite").json(output_dir)


def write_orc(
    df: DataFrame,
    output_dir: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """ORC sink (overwrite) — same knobs as the parquet writer; ORC
    adds stripe-level bloom filters via ``option("orc.bloom.filter.columns", ...)``
    for point-lookup-heavy downstream scans."""
    writer = _with_file_count(df, num_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(output_dir)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed, optionally sort-ordered parquet table (saveAsTable —
    bucketing metadata lives in the catalog, files under the session
    warehouse dir).

    This is THE co-located join tool at 100 TB: two tables bucketed by
    the same key into the same bucket count join with **zero
    exchanges** — the scan itself is the partitioning. Pre-bucket the
    fact tables on their join keys once at ingest and every downstream
    join/aggregation on those keys skips its shuffle forever
    (tests/test_bucketing.py asserts the exchange-free plan).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_packed_shards(packed: DataFrame, docs: DataFrame, output_dir: str) -> None:
    """Materialize sequence-packing assignments as training shards:
    join the (doc_id, shard, pack_id, pack_offset) assignment back to
    the document text, group each (shard, pack_id) into ONE row whose
    ``docs`` array is ordered by pack_offset, and write parquet
    partitioned by shard.

    Scale: the join and the group both key on doc->(shard, pack) —
    two shuffles total; ``sort_array`` orders within a pack (packs are
    capacity-bounded, so per-group memory is bounded by construction);
    ``partitionBy("shard")`` gives the trainer directory-pruned reads
    and preserves the packer's shard layout end to end.
    """
    from pyspark.sql import functions as F

    rows = packed.join(docs.select("doc_id", "text"), "doc_id").select(
        "shard",
        "pack_id",
        F.struct(
            F.col("pack_offset").alias("off"),
            F.col("doc_id").alias("doc_id"),
            F.col("text").alias("text"),
        ).alias("entry"),
    )
    shards = (
        rows.groupBy("shard", "pack_id")
        .agg(F.sort_array(F.collect_list("entry")).alias("docs"))
        .select(
            "shard",
            "pack_id",
            F.transform("docs", lambda e: e["doc_id"]).alias("doc_ids"),
            F.transform("docs", lambda e: e["text"]).alias("texts"),
        )
    )
    shards.write.mode("overwrite").partitionBy("shard").parquet(output_dir)


def write_sorted_parquet(
    df: DataFrame,
    output_dir: str,
    cluster_by: list[str],
    num_files: int | None = None,
) -> None:
    """Sort-clustered parquet: range-partition on ``cluster_by`` and
    sort within each partition before writing, so every row group's
    min/max statistics on those columns are TIGHT and disjoint.

    This is the data-layout half of predicate pushdown: the scan-side
    filter (PushedFilters) can only skip a row group whose stats
    exclude the predicate, and stats on randomly-laid-out data span
    the whole domain (nothing skips). Clustering at write time buys
    every future selective scan a near-index: at 100 TB, a point/range
    read on the cluster key touches the few row groups whose ranges
    intersect instead of the whole table. The write costs one range
    exchange + local sort — the classic write-once/read-many trade.
    (tests/test_sources_sinks.py verifies disjoint per-file ranges via
    parquet footer metadata.)
    """
    out = df.repartitionByRange(*cluster_by) if num_files is None else (
        df.repartitionByRange(num_files, *cluster_by)
    )
    out.sortWithinPartitions(*cluster_by).write.mode("overwrite").parquet(
        output_dir
    )


def write_shuffle_layout(
    mapped: DataFrame, num_reducers: int, output_dir: str
) -> None:
    """Materialize map output in the reference's EXACT shuffle-file
    layout: one byte-sorted file ``maptask{task:05d}-part{r:05d}`` per
    (map task, reduce partition), where ``r = md5(key) % R`` on the
    text before the first tab.

    Contract being reproduced (reference mapreduce/worker/__main__.py):
    routing :141-148 (md5 of the first-tab key), per-file whole-line
    byte sort :150-152, canonical names moved into the shared job dir
    :154-155 (naming pinned by its tests/test_worker_08.py:175-257).

    ``mapped`` must carry ``value`` (the ``key\\tvalue`` line) and
    ``task`` (the map-task id — e.g. from the ``rrtext`` source, whose
    partitions ARE reference map tasks).

    Scale: one shuffle on (task, r) with a per-partition sort —
    Spark's sort-based shuffle machinery doing exactly what the
    reference's external-sort + rename pipeline did, then a
    metadata-only driver rename pass (file count = M x R, never data
    through the driver). This is a layout-compat sink; value semantics
    never depend on it (SURVEY section 4.3).
    """
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from .operators.pipe import md5_partition_col, reference_partition_key_col

    # Exact reference routing: int(md5_hex, 16) % R over the FULL
    # 128-bit digest, JVM-side (property-pinned vs the Python formula
    # in tests/test_pipe_model.py). The key is derived from the raw
    # newline-terminated line as the reference does, so a tabless
    # record hashes md5(line + '\n').
    key = reference_partition_key_col(F.col("value"))
    r_col = md5_partition_col(key, num_reducers)

    staged = output_dir + ".staging"
    (
        mapped.select("task", r_col.alias("r"), "value")
        .repartition("task", "r")
        # (task, r) lead the sort so the partitioned writer's required
        # ordering is already satisfied (it would otherwise insert its
        # own partition-column sort and scramble line order); within
        # each (task, r) run this is the whole-line byte sort.
        .sortWithinPartitions("task", "r", "value")
        .write.mode("overwrite")
        .partitionBy("task", "r")
        .text(staged)
    )
    if os.path.exists(output_dir):
        shutil.rmtree(output_dir)
    os.makedirs(output_dir)
    for task_dir in sorted(glob.glob(os.path.join(staged, "task=*"))):
        task = int(task_dir.rsplit("=", 1)[1])
        for r_dir in sorted(glob.glob(os.path.join(task_dir, "r=*"))):
            r = int(r_dir.rsplit("=", 1)[1])
            parts = sorted(glob.glob(os.path.join(r_dir, "part-*")))
            dest = os.path.join(
                output_dir, f"maptask{task:05d}-part{r:05d}"
            )
            with open(dest, "wb") as out:
                for p in parts:
                    with open(p, "rb") as fh:
                        shutil.copyfileobj(fh, out)
    shutil.rmtree(staged)


def write_zorder_parquet(
    df: DataFrame,
    output_dir: str,
    col_a: str,
    col_b: str,
    num_files: int | None = None,
) -> None:
    """Z-order-clustered parquet: min-max normalize two numeric
    columns to the 16-bit grid, Morton-interleave them
    (``functions.zorder_key``), then range-partition + locally sort on
    the z-value before writing.

    Where :func:`write_sorted_parquet` gives ONE tight column (and
    leaves the other spanning the whole domain in every file), the
    Z-layout bounds BOTH columns per file — an axis-aligned predicate
    on either (or both) columns prunes row groups via parquet min/max
    stats. This is the standard lakehouse two-column clustering trade:
    one extra scalar-agg pass (min/max, broadcast back) + one range
    exchange at write time, bought back by every future selective
    scan. (Per-file double-column bounding boxes are asserted in
    tests/test_sources_sinks.py.)
    """
    from .functions import zorder_key, zorder_norm

    bounds = df.agg(
        F.min(col_a).alias("amin"),
        F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"),
        F.max(col_b).alias("bmax"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_z",
        zorder_key(
            zorder_norm(F.col(col_a), F.col("amin"), F.col("amax")),
            zorder_norm(F.col(col_b), F.col("bmin"), F.col("bmax")),
        ),
    ).drop("amin", "amax", "bmin", "bmax")
    out = (
        keyed.repartitionByRange("_z")
        if num_files is None
        else keyed.repartitionByRange(num_files, "_z")
    )
    out.sortWithinPartitions("_z").drop("_z").write.mode("overwrite").parquet(
        output_dir
    )


def _parquet_layout(spark, directory: str) -> tuple[int, int]:
    """(file_count, total_bytes) of a parquet directory, via the Hadoop
    FileSystem API — the same listing the scan planner uses, so it
    works on any Hadoop-supported filesystem (local, HDFS, object
    stores), not just the local disk."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(directory)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    n_files = 0
    n_bytes = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden staging files
        n_files += 1
        n_bytes += f.getLen()
    return n_files, n_bytes


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """OPTIMIZE-style small-file compaction: rewrite a parquet
    directory into ceil(total_bytes / target_bytes) evenly-sized
    files. The operational fix for the classic 100 TB failure mode
    where streaming micro-batches / over-partitioned writers leave
    millions of KB-sized files and every scan drowns in open() calls
    and footer reads.

    Mechanics: one FileSystem listing prices the source layout (no
    data read), then ONE shuffle (round-robin ``repartition`` — even
    output sizes regardless of input skew) rewrites the data. Readers
    keep working against ``src_dir`` until the rewrite completes, then
    swap — the write is all-or-nothing per directory, so a crashed
    compaction leaves the source untouched.

    Returns a stats dict so callers (and tests) can assert the
    compaction actually compacted:
    ``{src_files, src_bytes, dst_files, dst_bytes, rows}``.
    """
    src_files, src_bytes = _parquet_layout(spark, src_dir)
    n_out = max(1, -(-src_bytes // max(1, target_bytes)))
    df = spark.read.parquet(src_dir)
    df.repartition(n_out).write.mode("overwrite").parquet(dst_dir)
    dst_files, dst_bytes = _parquet_layout(spark, dst_dir)
    return {
        "src_files": src_files,
        "src_bytes": src_bytes,
        "dst_files": dst_files,
        "dst_bytes": dst_bytes,
        "rows": spark.read.parquet(dst_dir).count(),
    }


# --------------------------------------------- manifested table layout

MANIFEST_DIR = "_manifest"


def _read_manifest(table_dir: str) -> dict:
    """Parse the Spark-written JSON-lines manifest with plain Python —
    a bounded metadata read (one row per data file), not a data path."""
    import glob
    import json
    import os

    entries = {}
    for part in glob.glob(os.path.join(table_dir, MANIFEST_DIR, "part-*")):
        with open(part) as fh:
            for line in fh:
                if line.strip():
                    row = json.loads(line)
                    entries[row.pop("file")] = row
    return entries


def write_manifested_parquet(
    df: DataFrame,
    output_dir: str,
    zone_cols: list[str],
    num_files: int = 16,
) -> dict:
    """Table-format-lite writer: range-cluster ``df`` on ``zone_cols``
    into ``num_files`` parquet files, then persist a JSON MANIFEST of
    per-file zone maps (min/max of each zone column + row count) —
    the metadata layer an Iceberg/Delta manifest supplies, emulated on
    plain parquet. ``read_manifest_pruned`` turns a range predicate
    into a pruned file list WITHOUT opening any data file, which is
    what makes point/range queries on a 100 TB table open dozens of
    files instead of millions.

    Mechanics: ONE range shuffle clusters the data (that clustering is
    what makes zone maps selective — see zonemap_skipping_audit for
    the measured arrival-vs-sorted contrast), one write pass, then ONE
    metadata aggregation computes the zone maps grouped by actual
    output file (``input_file_name()``) and writes them as a
    Spark-native JSON relation under ``_manifest/`` (underscore-
    prefixed, so parquet directory listings ignore it) — no driver
    materialization anywhere; the manifest relation is bounded by
    FILE count, never row count.

    Returns the parsed manifest dict
    {file_path: {col: [min, max], "rows": n}} for callers/tests.
    """
    import os

    clustered = df.repartitionByRange(num_files, *[F.col(c) for c in zone_cols])
    clustered.write.mode("overwrite").parquet(output_dir)

    back = df.sparkSession.read.parquet(output_dir)
    # Bounds are stored in the column's NATIVE type (dates/timestamps
    # as ISO strings via the JSON writer) — casting numerics to string
    # would make "9" > "50" and turn zone-map pruning false-NEGATIVE,
    # i.e. lose rows. Callers pass lo/hi in the same native type.
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in zone_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    (
        back.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .coalesce(1)
        .write.mode("overwrite")
        .json(os.path.join(output_dir, MANIFEST_DIR))
    )
    return _read_manifest(output_dir)


def read_manifest_pruned(
    spark,
    table_dir: str,
    zone_col: str,
    lo,
    hi,
) -> tuple[DataFrame, dict]:
    """Manifest-driven file skipping: read only the files whose
    [min, max] zone map for ``zone_col`` intersects [lo, hi]. Returns
    (DataFrame over the surviving files ONLY, prune stats). The
    predicate itself must still be applied by the caller (zone maps
    admit false positives, never false negatives — the same contract
    as parquet row-group stats). ``lo``/``hi`` must be given in the
    zone column's manifest type: numbers for numeric columns, ISO
    strings for date/timestamp columns (how the JSON writer renders
    them). Files whose zone bounds are missing (all-NULL column) are
    conservatively scanned.

    The prune decision touches ONLY the manifest (file-count-bounded
    metadata); at cluster scale this is the listing/planning phase of
    every modern table format.
    """
    manifest = _read_manifest(table_dir)

    def intersects(meta: dict) -> bool:
        mn, mx = meta.get(f"min_{zone_col}"), meta.get(f"max_{zone_col}")
        if mn is None or mx is None:
            # All-NULL zone column in this file (the JSON writer omits
            # null bounds): the zone map is unknown, so the file MUST
            # be scanned — pruning may only ever be false-positive.
            return True
        return not (mx < lo or mn > hi)

    keep = [f for f, meta in manifest.items() if intersects(meta)]
    stats = {
        "total_files": len(manifest),
        "files_read": len(keep),
        "rows_in_read_files": sum(manifest[f]["rows"] for f in keep),
    }
    if not keep:
        empty = spark.read.parquet(table_dir).limit(0)
        return empty, stats
    return spark.read.parquet(*keep), stats
