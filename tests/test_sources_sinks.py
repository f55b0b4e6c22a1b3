"""Format roundtrips: every sink's output is readable by the matching
source with values intact, and the text sink honors the reference's
part-file contract (R files, overwrite)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.sinks import (
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_text,
)
from eecs_485___mapreduce_spark.sources import load_table
from eecs_485___mapreduce_spark.sources.formats import read_csv, read_json, read_orc

from .conftest import SF_SMALL


def _sample(spark):
    return (
        load_table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_csv_roundtrip(spark, tmp_path):
    src = _sample(spark)
    out = str(tmp_path / "csv")
    write_csv(src, out)
    back = read_csv(
        spark,
        out,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    assert _as_set(back) == _as_set(src)


def test_json_roundtrip(spark, tmp_path):
    src = _sample(spark)
    out = str(tmp_path / "json")
    write_json(src, out)
    back = read_json(
        spark,
        out,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double",
    )
    assert _as_set(back) == _as_set(src)


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    src = _sample(spark)
    out = str(tmp_path / "pq")
    write_parquet(src, out, partition_by=["o_orderstatus"])
    # partition directories exist -> downstream scans prune by status
    assert glob.glob(f"{out}/o_orderstatus=*")
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    want = src.filter(F.col("o_orderstatus") == "F")
    assert _as_set(back.select(*src.columns)) == _as_set(want)


def test_text_sink_part_count_and_overwrite(spark, tmp_path):
    out = str(tmp_path / "txt")
    lines = spark.createDataFrame(
        [(f"line-{i}",) for i in range(100)], "value string"
    )
    write_text(lines, out, num_files=3)
    parts = sorted(glob.glob(f"{out}/part-*"))
    assert len(parts) == 3  # the reference's R knob
    # overwrite: a second job replaces, never appends
    write_text(lines.limit(10), out, num_files=1)
    parts = sorted(glob.glob(f"{out}/part-*"))
    assert len(parts) == 1
    assert sum(1 for _ in open(parts[0])) == 10


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    src = _sample(spark)
    out = str(tmp_path / "orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert _as_set(back) == _as_set(src)
    # predicate pushdown reaches the ORC scan
    plan = (
        read_orc(spark, out)
        .filter(F.col("o_orderkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_dynamic_partition_pruning_on_dim_filter(spark, tmp_path):
    """At 100 TB the fact table is date/key-partitioned and joins must
    prune partitions from a FILTERED DIM at runtime (DPP) — a filter
    that only names dim columns still has to cut the fact scan."""
    from eecs_485___mapreduce_spark.sinks import write_parquet

    fact = _sample(spark)  # orders sample
    out = str(tmp_path / "fact_by_status")
    write_parquet(fact, out, partition_by=["o_orderstatus"])
    fact_p = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status string, status_name string",
    )
    joined = fact_p.join(
        dim, fact_p.o_orderstatus == dim.status
    ).filter(F.col("status_name") == "finished")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert (
        "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull" in plan
    ), plan
    # and the result is correct
    got = {r.o_orderkey for r in joined.collect()}
    want = {r.o_orderkey for r in fact.filter(F.col("o_orderstatus") == "F").collect()}
    assert got == want


def test_sql_front_door_over_registered_views(spark):
    """The SQL entry point: registered temp views make the whole
    warehouse queryable with plain spark.sql text — checked against
    DuckDB on an ad-hoc query that exists nowhere in the registry."""
    import duckdb

    from eecs_485___mapreduce_spark.sources import register_views

    from .conftest import SF_SMALL, normalize

    register_views(spark, SF_SMALL, "orders", "customer")
    sql = """
        SELECT c_mktsegment AS seg,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders JOIN customer ON c_custkey = o_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY c_mktsegment
    """
    got = spark.sql(sql)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    oracle = con.execute(sql).fetchall()
    assert normalize([tuple(r) for r in got.collect()], got.columns) == normalize(
        oracle, [d[0] for d in con.execute(sql).description]
    )


def test_sorted_parquet_files_have_disjoint_cluster_ranges(spark, tmp_path):
    """write_sorted_parquet's layout claim, verified from the parquet
    footers: after range-partition + sort-within-partition on user_id,
    every row group's [min, max] on user_id must be non-overlapping in
    file+row-group order — the tight disjoint statistics that let a
    selective scan skip everything outside the predicate's range.
    An unsorted write of the same data has near-total overlap."""
    import pyarrow.parquet as pq

    from eecs_485___mapreduce_spark.sinks import write_sorted_parquet
    from eecs_485___mapreduce_spark.sources import load_table

    events = load_table(spark, SF_SMALL, "events")
    out = str(tmp_path / "clustered")
    write_sorted_parquet(events, out, ["user_id"], num_files=4)

    ranges = []
    files = sorted(p for p in __import__("os").listdir(out) if p.endswith(".parquet"))
    assert len(files) == 4
    for fname in files:
        md = pq.ParquetFile(f"{out}/{fname}").metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.schema.column(i).name == "user_id"
        )
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    # files sorted by name match range-partition order; within each
    # file row groups follow the local sort => global disjoint chain
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 and lo2 <= hi2
        assert hi1 <= lo2, f"overlapping row-group ranges: {ranges}"

    # round-trip integrity: clustering reorders, never drops
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    sel = back.filter(back.user_id == 7).count()
    assert sel == events.filter(events.user_id == 7).count()


def test_rrtext_datasource_reproduces_reference_task_layout(spark, text_corpus):
    """SURVEY 2.A row 2 (exact input split layout): the rrtext Python
    DataSource's partition p must hold exactly the files the
    reference's planner assigns to map task p (sorted listing, file i
    -> task i % M — reference mapreduce/manager/__main__.py:93-107,
    layout asserted by its tests/test_manager_02.py:172-196), and the
    content read through it must equal the plain text reader's."""
    import os

    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.sources import RoundRobinTextDataSource

    spark.dataSource.register(RoundRobinTextDataSource)
    m = 2
    df = (
        spark.read.format("rrtext")
        .option("path", text_corpus)
        .option("num_mappers", str(m))
        .load()
    )
    # partition id == task id, and the file sets are the round-robin
    got = {
        (r.task, r.pid, r.file)
        for r in df.select(
            "task", F.spark_partition_id().alias("pid"), "file"
        ).distinct().collect()
    }
    files = sorted(
        os.path.join(text_corpus, f) for f in os.listdir(text_corpus)
    )
    want = {(i % m, i % m, f) for i, f in enumerate(files)}
    assert got == want

    # content parity with the stock text reader (order-insensitive)
    plain = sorted(
        r.value for r in spark.read.text([f for f in files]).collect()
    )
    via_ds = sorted(r.value for r in df.select("value").collect())
    assert via_ds == plain


def test_write_shuffle_layout_reproduces_reference_naming_and_routing(
    spark, tmp_path
):
    """SURVEY 2.A rows 4-6 byte-level layout: maptaskM-partR file per
    (task, md5(key) % R) with whole-line byte sort inside each file —
    the reference worker's shuffle materialization (reference
    mapreduce/worker/__main__.py:141-155, naming pinned by its
    tests/test_worker_08.py:175-257), including the full-128-bit md5
    modulus and empty-string keys."""
    import hashlib
    import os

    from eecs_485___mapreduce_spark.operators.pipe import md5_partition
    from eecs_485___mapreduce_spark.sinks import write_shuffle_layout

    lines = [
        ("hello\t1", 0), ("world\t1", 0), ("\t9", 0),  # empty key flows
        ("hello\t1", 1), ("spark\t1", 1), ("zebra\t1", 1),
        ("apple\t1", 0), ("notab-line", 1),
    ]
    mapped = spark.createDataFrame(lines, "value string, task int")
    out = str(tmp_path / "shuffle")
    r = 3
    write_shuffle_layout(mapped, r, out)

    names = sorted(os.listdir(out))
    # every emitted file follows the canonical naming
    assert all(
        n.startswith("maptask") and "-part" in n and len(n) == len("maptask00000-part00000")
        for n in names
    ), names

    # routing + sort parity with the reference formula
    want: dict[str, list[str]] = {}
    for value, task in lines:
        # reference worker :141 splits the raw newline-terminated line,
        # so the tabless record's key carries its '\n'
        key = (value + "\n").split("\t")[0]
        part = md5_partition(key, r)  # int(md5_hex, 16) % R
        want.setdefault(f"maptask{task:05d}-part{part:05d}", []).append(value)
    for name, vals in want.items():
        assert name in names, (name, names)
        got = open(os.path.join(out, name)).read().splitlines()
        assert got == sorted(vals), name
    # no stray files beyond the populated (task, r) cells
    assert set(names) == set(want)


def test_zorder_layout_bounds_both_columns(spark, tmp_path):
    """write_zorder_parquet must give per-file locality on BOTH cluster
    columns: with the 1-D sort layout the secondary column spans
    ~the whole domain in every file; the Z-layout's mean per-file
    bounding-box area must be a small fraction of that."""
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.sinks import (
        write_sorted_parquet,
        write_zorder_parquet,
    )
    from eecs_485___mapreduce_spark.sources import load_table

    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("day"),
    )
    zdir = str(tmp_path / "z")
    sdir = str(tmp_path / "s")
    write_zorder_parquet(orders, zdir, "o_custkey", "day", num_files=64)
    write_sorted_parquet(orders, sdir, ["o_custkey"], num_files=64)

    def mean_widths(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        rows = (
            df.groupBy("f")
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("aw"),
                (F.max("day") - F.min("day")).alias("bw"),
            )
            .collect()
        )
        assert len(rows) >= 16
        return (
            sum(r.aw for r in rows) / len(rows),
            sum(r.bw for r in rows) / len(rows),
        )

    z_aw, z_bw = mean_widths(zdir)
    s_aw, s_bw = mean_widths(sdir)
    # Total box area per file is ~the same for any layout; the Z-curve
    # property is BALANCE — with 64 files each dimension is bounded at
    # ~1/8 of its domain, where the 1-D sort leaves the secondary
    # column (day) spanning nearly the whole domain in every file.
    dom_b = (
        orders.agg((F.max("day") - F.min("day")).alias("w")).collect()[0].w
    )
    assert z_bw < 0.5 * s_bw, (z_bw, s_bw)
    assert z_bw < 0.35 * dom_b, (z_bw, dom_b)


def test_tailtext_streaming_source_exactly_once_across_restarts(spark, tmp_path):
    """The custom Python streaming source must honor its offset
    contract: an availableNow drain emits every line of every file
    exactly once; files added later are picked up by a restart from
    the same checkpoint WITHOUT re-emitting already-committed files."""
    from eecs_485___mapreduce_spark.sources import TailTextDataSource

    spark.dataSource.register(TailTextDataSource)
    src = tmp_path / "logs"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("tailtext")
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src / "a.txt").write_text("alpha\nbeta\n")
    (src / "b.txt").write_text("gamma\n")
    drain()
    got1 = sorted(r.value for r in spark.read.parquet(sink).collect())
    assert got1 == ["alpha", "beta", "gamma"]

    (src / "c.txt").write_text("delta\nepsilon\n")
    drain()  # restart: only c.txt is new
    rows = spark.read.parquet(sink).collect()
    assert sorted(r.value for r in rows) == [
        "alpha", "beta", "delta", "epsilon", "gamma",
    ]
    # provenance column survives the stream
    assert {os.path.basename(r.file) for r in rows} == {"a.txt", "b.txt", "c.txt"}


def test_compact_parquet_binpacks_small_files(spark, tmp_path):
    from eecs_485___mapreduce_spark.sinks import _parquet_layout, compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, SF_SMALL, "orders")
    # simulate the streaming-writer pathology: 64 tiny files
    orders.repartition(64).write.parquet(src)
    src_files, src_bytes = _parquet_layout(spark, src)
    assert src_files == 64

    # bin-pack to ~4 target-sized files
    stats = compact_parquet(spark, src, dst, target_bytes=-(-src_bytes // 4))
    assert stats["src_files"] == 64
    assert stats["dst_files"] <= 8  # ceil(bytes/target)=4 data files (+0 hidden)
    assert stats["dst_files"] < src_files / 4
    assert stats["rows"] == orders.count()

    # content survives byte-for-byte (same rows, both directions)
    before = spark.read.parquet(src)
    after = spark.read.parquet(dst)
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0

    # degenerate target: everything fits one file
    one = str(tmp_path / "one")
    stats1 = compact_parquet(spark, src, one, target_bytes=src_bytes * 10)
    assert stats1["dst_files"] == 1


def test_parquet_codec_matrix_roundtrip(spark, tmp_path):
    """Every compression codec a mixed-vintage lake will contain must
    write and read back value-identical (readers see codec per row
    group, so a table can mix them freely)."""
    df = _sample(spark)
    want = sorted(tuple(r) for r in df.collect())
    for codec in ("snappy", "gzip", "zstd", "lz4", "none"):
        p = str(tmp_path / f"codec_{codec}")
        df.write.option("compression", codec).parquet(p)
        got = sorted(tuple(r) for r in spark.read.parquet(p).collect())
        assert got == want, codec
    # a directory MIXING codecs still reads as one table
    mixed = str(tmp_path / "mixed")
    df.write.option("compression", "zstd").parquet(mixed)
    df.write.mode("append").option("compression", "gzip").parquet(mixed)
    assert spark.read.parquet(mixed).count() == 2 * df.count()


def test_manifested_parquet_prunes_files_and_preserves_results(spark, tmp_path):
    """Iceberg-lite manifest layer: the writer's per-file zone maps
    must let a range probe (1) open only intersecting files, (2) never
    lose a matching row (zone maps are false-positive-only), and (3)
    return exactly the full-scan answer once the caller applies the
    predicate. An out-of-domain probe must prune EVERYTHING without
    touching a data file."""
    from eecs_485___mapreduce_spark.sinks import (
        read_manifest_pruned,
        write_manifested_parquet,
    )

    table = str(tmp_path / "orders_manifested")
    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "o_orderdate_s", F.col("o_orderdate").cast("string")
    )
    manifest = write_manifested_parquet(
        orders, table, zone_cols=["o_orderdate_s"], num_files=16
    )
    assert len(manifest) == 16
    assert sum(m["rows"] for m in manifest.values()) == orders.count()

    lo, hi = "1995-03-01", "1995-03-31"
    pruned, stats = read_manifest_pruned(spark, table, "o_orderdate_s", lo, hi)
    assert stats["total_files"] == 16
    # date-clustered layout -> the one-month probe touches few files
    assert 0 < stats["files_read"] <= 3, stats

    got = sorted(
        r.o_orderkey
        for r in pruned.where(F.col("o_orderdate_s").between(lo, hi)).collect()
    )
    want = sorted(
        r.o_orderkey
        for r in orders.where(F.col("o_orderdate_s").between(lo, hi)).collect()
    )
    assert got == want and want  # identical AND nonempty
    assert stats["rows_in_read_files"] >= len(want)

    # out-of-domain probe: manifest alone decides — zero files read
    empty, estats = read_manifest_pruned(
        spark, table, "o_orderdate_s", "2099-01-01", "2099-12-31"
    )
    assert estats["files_read"] == 0
    assert empty.count() == 0


def test_manifested_parquet_numeric_zone_cols_and_null_bounds(spark, tmp_path):
    """Numeric zone columns must prune NUMERICALLY (lexicographic
    string bounds would make \"9\" > \"50\" and silently LOSE rows —
    false-negative pruning), and a file whose zone column is entirely
    NULL (its manifest row omits the bounds) must be conservatively
    scanned, never dropped."""
    from pyspark.sql import functions as SF

    from eecs_485___mapreduce_spark.sinks import (
        read_manifest_pruned,
        write_manifested_parquet,
    )

    table = str(tmp_path / "numeric_manifested")
    # keys 0..1599 plus 400 NULL-key rows — range partitioning sorts
    # NULLS FIRST, so with 2000 rows over 8 files (~250/file) the
    # first file is ENTIRELY NULL and its manifest row has no bounds
    df = spark.range(2000).select(
        SF.when(SF.col("id") < 1600, SF.col("id")).alias("k"),
        (SF.col("id") * 2).alias("payload"),
    )
    manifest = write_manifested_parquet(df, table, zone_cols=["k"], num_files=8)
    assert any("min_k" not in m for m in manifest.values()), (
        "fixture must produce an all-NULL-bounds file"
    )

    pruned, stats = read_manifest_pruned(spark, table, "k", 5, 50)
    assert stats["files_read"] < stats["total_files"]
    got = sorted(
        r.k for r in pruned.where(SF.col("k").between(5, 50)).collect()
    )
    assert got == list(range(5, 51))  # every numeric match survived

    # probe overlapping ONLY the NULL-bounds file's range: the pruner
    # must keep that file (unknown zone map) rather than lose it
    _, nstats = read_manifest_pruned(spark, table, "k", 10_000, 20_000)
    assert nstats["files_read"] >= 1  # the all-NULL file stays in
