"""Model-based sweep for the rrtext round-robin split planner.

The example test (test_sources_sinks.py) pins the reference layout on
the fixed corpus at M=2; this sweep searches the config space — random
file counts and contents (including EMPTY files and M > file count,
which leaves whole tasks empty) — against a pure-Python replay of the
reference planner (sorted listing, file i -> task i % M; reference
mapreduce/manager/__main__.py:93-107).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FILES = st.lists(
    st.lists(st.text(alphabet="xy ", max_size=6), max_size=4),  # lines
    min_size=0,
    max_size=7,
)

_name_seq = iter(range(10**9))


@given(files=_FILES, m=st.integers(1, 5))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rrtext_layout_matches_reference_planner_model(
    spark, tmp_path_factory, files, m
):
    from eecs_485___mapreduce_spark.sources import RoundRobinTextDataSource

    spark.dataSource.register(RoundRobinTextDataSource)
    d = tmp_path_factory.mktemp("rr") / f"in{next(_name_seq)}"
    d.mkdir()
    paths = []
    for i, lines in enumerate(files):
        p = d / f"{i:04d}.txt"
        p.write_text("".join(line + "\n" for line in lines))
        paths.append(str(p))

    df = (
        spark.read.format("rrtext")
        .option("path", str(d))
        .option("num_mappers", str(m))
        .load()
    )
    got = sorted(
        (r.task, r.file, r.value) for r in df.collect()
    )

    # pure-Python reference planner: sorted listing, file i -> task i%M,
    # per-task files read in listing order
    want = []
    for i, p in enumerate(sorted(paths)):
        task = i % m
        with open(p) as fh:
            for line in fh:
                want.append((task, p, line.rstrip("\n")))
    assert got == sorted(want)

    # empty tasks still exist: the partition count IS the layout
    assert df.rdd.getNumPartitions() == m
