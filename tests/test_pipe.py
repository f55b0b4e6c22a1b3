"""Exec-compat layer: arbitrary streaming executables as map/reduce
operators with the reference's contract — tab-keyed records, md5
partitioning, sorted adjacent-key reduce input, part-file text sinks,
empty-string keys legal."""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

from eecs_485___mapreduce_spark.engine import MapReduceEngine, StreamingJob
from eecs_485___mapreduce_spark.operators import md5_partition, pipe_map, pipe_reduce
from eecs_485___mapreduce_spark.sources import read_text_dir

from .test_text_operators import expected_counts

FIXTURES = Path(__file__).parent / "fixtures"
WC_MAP = str(FIXTURES / "wc_map.py")
WC_REDUCE = str(FIXTURES / "wc_reduce.py")
GREP_MAP = str(FIXTURES / "grep_map.py")
GREP_REDUCE = str(FIXTURES / "grep_reduce.py")


def test_md5_partition_formula():
    for key, r in [("hello", 4), ("", 4), ("tab\tkey", 7), ("ümlaut", 3)]:
        expected = int(hashlib.md5(key.encode("utf-8")).hexdigest(), 16) % r
        assert md5_partition(key, r) == expected


def test_pipe_map_emits_kv(spark, text_corpus):
    text = read_text_dir(spark, text_corpus)
    mapped = pipe_map(text, WC_MAP)
    assert mapped.columns == ["key", "value"]
    rows = mapped.collect()
    n_tokens = sum(expected_counts(text_corpus).values())
    assert len(rows) == n_tokens
    assert all(r.value == "1" for r in rows)


def test_pipe_wordcount_end_to_end(spark, text_corpus):
    text = read_text_dir(spark, text_corpus, num_partitions=2)
    reduced = pipe_reduce(pipe_map(text, WC_MAP), WC_REDUCE, num_reducers=2)
    got = {}
    for r in reduced.collect():
        word, _, cnt = r.value.partition("\t")
        got[word] = int(cnt)
    assert got == dict(expected_counts(text_corpus))


def test_pipe_reduce_sorted_adjacent_contract(spark):
    """The reducer must see keys sorted and equal keys adjacent with
    values sorted within key (reference worker sort+merge semantics)."""
    df = spark.createDataFrame(
        [("b", "2"), ("a", "x"), ("b", "1"), ("a", "y"), ("", "e")],
        schema="key string, value string",
    )
    out = pipe_reduce(df, "cat", num_reducers=1)
    lines = [r.value for r in out.collect()]
    assert lines == sorted(lines)
    assert lines == ["\te", "a\tx", "a\ty", "b\t1", "b\t2"]


def test_pipe_reduce_md5_partitioning(spark, text_corpus, tmp_path):
    """Each output partition holds exactly the keys whose md5 hash maps
    to it (reference layout parity)."""
    text = read_text_dir(spark, text_corpus)
    reduced = pipe_reduce(pipe_map(text, WC_MAP), WC_REDUCE, num_reducers=3)
    parts = reduced.rdd.glom().collect()
    assert len(parts) == 3
    for idx, part in enumerate(parts):
        for row in part:
            word = row.value.partition("\t")[0]
            assert md5_partition(word, 3) == idx


def test_engine_job_queue_fifo(spark, text_corpus, tmp_path):
    """submit/run facade: incrementing job ids, FIFO execution, grep and
    wordcount jobs end-to-end into part-file text sinks (overwrite)."""
    eng = MapReduceEngine(spark)
    out_wc = str(tmp_path / "out_wc")
    out_grep = str(tmp_path / "out_grep")
    id0 = eng.submit_job(StreamingJob(text_corpus, out_wc, WC_MAP, WC_REDUCE, 2, 2))
    id1 = eng.submit_job(StreamingJob(text_corpus, out_grep, GREP_MAP, GREP_REDUCE, 2, 1))
    assert (id0, id1) == (0, 1)
    assert eng.run_pending() == [0, 1]

    wc_lines = []
    for f in sorted(os.listdir(out_wc)):
        if f.startswith("part-"):
            wc_lines += (Path(out_wc) / f).read_text().splitlines()
    got = dict(line.split("\t") for line in wc_lines)
    assert {k: int(v) for k, v in got.items()} == dict(expected_counts(text_corpus))

    grep_lines = []
    for f in sorted(os.listdir(out_grep)):
        if f.startswith("part-"):
            grep_lines += (Path(out_grep) / f).read_text().splitlines()
    assert sorted(grep_lines) == sorted(
        ["Product catalog line", "product PRODUCT Product"]
    )


def test_pipe_map_failing_executable_raises(spark, text_corpus, tmp_path):
    """A mapper that exits nonzero must fail the job loudly
    (checkCode=True) — the analog of the reference manager marking a
    task failed instead of silently dropping its output."""
    import pytest

    bad = tmp_path / "bad_map.sh"
    bad.write_text("#!/bin/bash\nexit 3\n")
    bad.chmod(0o755)
    text = read_text_dir(spark, text_corpus)
    with pytest.raises(Exception, match="3|Pipe|subprocess"):
        pipe_map(text, str(bad)).collect()
