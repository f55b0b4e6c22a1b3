"""Model-based sweeps for the storage-layout sinks.

The example tests in test_sources_sinks.py pin specific layouts on
fixed data; these sweeps search the input space:

- zone-map pruning (`write_manifested_parquet` +
  `read_manifest_pruned`) must NEVER lose rows — for ANY data
  (negatives, duplicates, NULLs up to all-NULL files, string zone
  columns) and ANY [lo, hi] probe (selective, empty, inverted,
  out-of-domain), the pruned-then-filtered read must equal the
  full-scan filter exactly, and every PRUNED file must truly contain
  no matching rows (zone maps admit false positives only);
- small-file compaction (`compact_parquet`) must preserve the exact
  row multiset for any input layout.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .conftest import sweep_examples

_INTS = st.one_of(st.integers(-50, 50), st.none())
_ROWS = st.lists(
    st.tuples(_INTS, st.integers(0, 9)), min_size=1, max_size=60
)

_SWEEP = settings(
    max_examples=sweep_examples(8, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_name_seq = iter(range(10**9))


@given(
    rows=_ROWS,
    num_files=st.integers(1, 8),
    lo=st.integers(-60, 60),
    width=st.integers(-5, 40),  # negative => inverted (empty) range
)
@_SWEEP
def test_zone_map_pruning_never_loses_rows_int(
    spark, tmp_path_factory, rows, num_files, lo, width
):
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.sinks import (
        read_manifest_pruned,
        write_manifested_parquet,
    )

    hi = lo + width
    table = str(tmp_path_factory.mktemp("zm") / f"t{next(_name_seq)}")
    df = spark.createDataFrame(rows, "k int, v int")
    manifest = write_manifested_parquet(df, table, zone_cols=["k"], num_files=num_files)

    pred = F.col("k").between(lo, hi)
    want = sorted(
        (r.k, r.v)
        for r in spark.read.parquet(table).where(pred).collect()
    )
    pruned, stats = read_manifest_pruned(spark, table, "k", lo, hi)
    got = sorted((r.k, r.v) for r in pruned.where(pred).collect())
    assert got == want, "zone-map pruning lost or duplicated rows"
    assert stats["files_read"] <= stats["total_files"]

    # per-file soundness: every file the prune SKIPPED must contain
    # no matching rows at all (false negatives are forbidden)
    assert stats["rows_in_read_files"] >= len(want)

    def kept(meta: dict) -> bool:  # the reader's intersects() rule
        mn, mx = meta.get("min_k"), meta.get("max_k")
        if mn is None or mx is None:
            return True
        return not (mx < lo or mn > hi)

    for f, meta in manifest.items():
        if not kept(meta):
            n = spark.read.parquet(f).where(pred).count()
            assert n == 0, f"pruned file {f} held {n} matching rows"


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.text(alphabet="abz", min_size=0, max_size=4), st.none()),
            st.integers(0, 9),
        ),
        min_size=1,
        max_size=40,
    ),
    num_files=st.integers(1, 6),
    lo=st.text(alphabet="abz", max_size=3),
    hi=st.text(alphabet="abz", max_size=3),
)
@_SWEEP
def test_zone_map_pruning_never_loses_rows_string(
    spark, tmp_path_factory, rows, num_files, lo, hi
):
    """String zone columns: JSON stores them natively and both the
    manifest comparison and the engine filter are lexicographic, so
    the contract holds for any lo/hi strings (including inverted)."""
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.sinks import (
        read_manifest_pruned,
        write_manifested_parquet,
    )

    table = str(tmp_path_factory.mktemp("zms") / f"t{next(_name_seq)}")
    df = spark.createDataFrame(rows, "k string, v int")
    write_manifested_parquet(df, table, zone_cols=["k"], num_files=num_files)

    pred = F.col("k").between(lo, hi)
    want = sorted(
        (r.k, r.v)
        for r in spark.read.parquet(table).where(pred).collect()
    )
    pruned, _stats = read_manifest_pruned(spark, table, "k", lo, hi)
    got = sorted((r.k, r.v) for r in pruned.where(pred).collect())
    assert got == want


@given(rows=_ROWS, in_files=st.integers(1, 12), target=st.sampled_from([1, 10**4, 10**9]))
@_SWEEP
def test_compact_parquet_preserves_rows(
    spark, tmp_path_factory, rows, in_files, target
):
    from eecs_485___mapreduce_spark.sinks import compact_parquet

    base = tmp_path_factory.mktemp("cp")
    src, dst = str(base / "src"), str(base / "dst")
    df = spark.createDataFrame(rows, "k int, v int")
    df.repartition(in_files).write.mode("overwrite").parquet(src)

    stats = compact_parquet(spark, src, dst, target_bytes=target)
    nkey = lambda t: (t[0] is None, t[0] if t[0] is not None else 0, t[1])  # noqa: E731
    want = sorted(((r.k, r.v) for r in spark.read.parquet(src).collect()), key=nkey)
    got = sorted(((r.k, r.v) for r in spark.read.parquet(dst).collect()), key=nkey)
    assert got == want
    assert stats["rows"] == len(rows)
    if target == 10**9:
        assert stats["dst_files"] == 1  # everything fits one target
