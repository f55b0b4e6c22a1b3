"""Golden parity against the reference's OWN artifacts: its mapper and
reducer executables run unmodified through the pipe layer over its own
input corpus, and the output is diffed against its checked-in golden
files — the strongest possible claim to SURVEY §2.A rows 3/9/11-14.

Reference contract being reproduced:
- word count: tests/test_integration_01.py:34-40 compares part-00000
  to correct/word_count_correct.txt ORDER-INSENSITIVELY (sorted lines);
  the executables are exec/wc_map.sh + exec/wc_reduce.sh (including the
  empty-key "\t9" quirk from wc_map.sh's tr/awk pipeline).
- grep: tests/test_integration_00.py:34-38 compares part-00000 to
  correct/grep_correct.txt with filecmp — ORDER-SENSITIVE, which holds
  because the single reducer sees whole-line byte-sorted input and
  grep_reduce.py preserves order.

The reference tree is read-only and executable in place; nothing is
copied.
"""

from __future__ import annotations

from pathlib import Path

from eecs_485___mapreduce_spark.operators import pipe_map, pipe_reduce
from eecs_485___mapreduce_spark.sources import read_text_dir

REF = Path("/root/reference/tests/testdata")
REF_INPUT = str(REF / "input")


def _run(spark, mapper: str, reducer: str):
    text = read_text_dir(spark, REF_INPUT, num_partitions=2)
    return pipe_reduce(
        pipe_map(text, mapper), reducer, num_reducers=1
    )


def test_wordcount_golden_parity(spark):
    reduced = _run(
        spark, str(REF / "exec/wc_map.sh"), str(REF / "exec/wc_reduce.sh")
    )
    actual = sorted(r.value for r in reduced.collect())
    correct = sorted(
        (REF / "correct/word_count_correct.txt").read_text().splitlines()
    )
    assert actual == correct


def test_grep_golden_parity_order_sensitive(spark):
    reduced = _run(
        spark, str(REF / "exec/grep_map.py"), str(REF / "exec/grep_reduce.py")
    )
    # Single reducer partition: collect() preserves its in-partition
    # order, so this asserts the same byte-order filecmp the reference
    # test does.
    actual = [r.value for r in reduced.collect()]
    correct = (REF / "correct/grep_correct.txt").read_text().splitlines()
    assert actual == correct


def test_grep_golden_parity_part_file(spark, tmp_path):
    """End-to-end through the text sink: the single part file's bytes
    equal the reference golden (modulo Spark's part-file naming)."""
    out = tmp_path / "grep_out"
    _run(
        spark, str(REF / "exec/grep_map.py"), str(REF / "exec/grep_reduce.py")
    ).write.mode("overwrite").text(str(out))
    parts = sorted(out.glob("part-*"))
    assert len(parts) == 1
    assert parts[0].read_text() == (REF / "correct/grep_correct.txt").read_text()


def test_python_wordcount_executables(spark):
    """The reference's SECOND word-count implementation (exec/wc_map.py
    + exec/wc_reduce.py — case-preserving whitespace split, space-
    separated reducer output) through the pipe layer, checked against
    counts computed independently from the same input files with the
    executables' own tokenization rules."""
    reduced = _run(
        spark, str(REF / "exec/wc_map.py"), str(REF / "exec/wc_reduce.py")
    )
    got = {}
    for r in reduced.collect():
        word, _, cnt = r.value.rpartition(" ")
        got[word] = int(cnt)

    expected: dict[str, int] = {}
    for f in sorted(Path(REF_INPUT).iterdir()):
        for line in f.read_text().splitlines():
            for tok in line.split():
                expected[tok] = expected.get(tok, 0) + 1
    assert got == expected
