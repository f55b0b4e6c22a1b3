"""Model-based random-corpus parity sweep for the exec-pipe layer.

The golden tests (tests/test_reference_golden.py) pin the two shipped
programs on the fixed corpus; this sweep closes the gap between "works
on the goldens" and "implements the contract": hypothesis-generated
corpora — unicode, embedded tabs, empty lines, duplicate lines,
empty-string keys — run through the REAL ``pipe_map``/``pipe_reduce``
pipeline (real subprocess executables, real Spark shuffle) and must
match a pure-Python simulator of the reference's documented semantics
(reference mapreduce/worker/__main__.py):

- map: every input line streams through the mapper executable; stdout
  lines are ``key\tvalue`` records, key = text before the FIRST tab of
  the RAW newline-terminated line (:141) — a tabless record's key
  includes its trailing ``\n``;
- partition: ``md5(key) % R`` (:142-144);
- sort: each partition byte-sorted whole-line (:150-152) — for valid
  UTF-8, byte order == code-point order, so plain ``sorted()`` is the
  oracle;
- reduce: each sorted partition streams through the reducer executable
  (sorted keys, equal keys adjacent, values sorted within key).

Both sides run the SAME executables, so the parity being checked is
the plumbing (partitioning, sort contract, subprocess framing, line
codec), not the user program. Mappers here are per-line stateless —
the only class for which "one exec per partition" (Spark) and "one
exec per file" (reference) are equivalent by construction.
"""

from __future__ import annotations

import stat
import subprocess
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eecs_485___mapreduce_spark.operators.pipe import (
    md5_partition,
    pipe_map,
    pipe_reduce,
)

# Line alphabet: ASCII incl. tab + space, plus non-ASCII code points
# (2-byte and 3-byte UTF-8) to exercise the byte-order == code-point
# claim. \r and \n are excluded: Spark's text source treats both as
# line delimiters, so they cannot appear INSIDE a line by construction.
_CHARS = st.sampled_from(
    list("abAB01 \t!~") + ["\u00e9", "\u00df", "\u4e16", "\u0001"]
)
_LINE = st.text(alphabet=_CHARS, min_size=0, max_size=12)
_CORPUS = st.lists(_LINE, min_size=1, max_size=30)


MAPPERS = {
    # classic wordcount map: whitespace-split tokens, one `tok\t1` each
    "wc": "import sys\nfor line in sys.stdin:\n"
    "    for tok in line.rstrip('\\n').split():\n"
    "        print(tok + '\\t1')\n",
    # identity map: the raw line IS the record (key = text before the
    # first tab, possibly ''), exercising empty keys and tab values
    "identity": "import sys\nfor line in sys.stdin:\n"
    "    sys.stdout.write(line)\n",
}

REDUCERS = {
    # adjacency-sum: correct ONLY if equal keys arrive adjacent
    "sum": "import sys\nk, n = None, 0\nfor line in sys.stdin:\n"
    "    key = line.rstrip('\\n').split('\\t', 1)[0]\n"
    "    if key == k:\n        n += 1\n"
    "    else:\n"
    "        if k is not None: print(k + '\\t' + str(n))\n"
    "        k, n = key, 1\n"
    "if k is not None: print(k + '\\t' + str(n))\n",
    # group profile: count + first/last value per key — sensitive to
    # the WHOLE-LINE sort (values sorted within key), not just key
    # adjacency, so a sort-by-key-only implementation fails it
    "profile": "import sys\nk, vals = None, []\n"
    "def flush():\n"
    "    if k is not None:\n"
    "        print(k + '\\t' + str(len(vals)) + '\\t' + vals[0] + '\\t' + vals[-1])\n"
    "for line in sys.stdin:\n"
    "    rec = line.rstrip('\\n')\n"
    "    key, _, val = rec.partition('\\t')\n"
    "    if key != k:\n        flush()\n        k, vals = key, []\n"
    "    vals.append(val)\nflush()\n",
}


@pytest.fixture(scope="module")
def executables(tmp_path_factory) -> dict[str, str]:
    d = tmp_path_factory.mktemp("pipe_model_bins")
    out: dict[str, str] = {}
    for name, body in {**MAPPERS, **REDUCERS}.items():
        p = d / f"{name}.py"
        p.write_text("#!/usr/bin/env python3\n" + body)
        p.chmod(p.stat().st_mode | stat.S_IXUSR)
        out[name] = f"python3 {p}"
    return out


def _run_exec(command: str, lines: list[str]) -> list[str]:
    """The oracle's executable boundary: same framing as rdd.pipe —
    each element + '\n' on stdin, stdout split on '\n', trailing empty
    dropped."""
    proc = subprocess.run(
        command.split(),
        input="".join(line + "\n" for line in lines),
        capture_output=True,
        text=True,
        check=True,
    )
    return proc.stdout.split("\n")[:-1] if proc.stdout else []

def simulate_reference(
    corpus: list[str], mapper: str, reducer: str, num_reducers: int
) -> list[list[str]]:
    """Pure-Python replay of the reference pipeline; returns the output
    lines of each reduce partition, in partition order."""
    mapped = _run_exec(mapper, corpus)
    parts: list[list[str]] = [[] for _ in range(num_reducers)]
    for rec in mapped:
        # Reference worker :141 splits the RAW newline-terminated
        # stdout line, so a tabless record's key keeps its '\n' —
        # simulate on rec + '\n', exactly the bytes the reference saw.
        key = (rec + "\n").split("\t")[0]
        parts[md5_partition(key, num_reducers)].append(rec)
    out: list[list[str]] = []
    for part in parts:
        # byte-sort whole-line; UTF-8 byte order == code-point order,
        # asserted explicitly so the claim is tested, not assumed
        by_bytes = sorted(part, key=lambda s: s.encode("utf-8"))
        assert by_bytes == sorted(part)
        out.append(_run_exec(reducer, by_bytes))
    return out


@pytest.mark.parametrize(
    ("mapper", "reducer"), [("wc", "sum"), ("identity", "profile")]
)
@given(corpus=_CORPUS, num_reducers=st.integers(1, 4), data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pipe_job_matches_reference_simulation(
    spark, executables, mapper, reducer, corpus, num_reducers, data
):
    num_mappers = data.draw(st.integers(1, 3), label="num_mappers")
    df = spark.createDataFrame([(line,) for line in corpus], "line string")
    mapped = pipe_map(df, executables[mapper], num_mappers=num_mappers)
    reduced = pipe_reduce(mapped, executables[reducer], num_reducers=num_reducers)
    # collect() concatenates partitions in index order and rdd.pipe
    # preserves the executable's stdout order within each partition,
    # so the flat list is comparable per-partition, not just as a set
    got = [r.value for r in reduced.collect()]
    want_parts = simulate_reference(
        corpus, executables[mapper], executables[reducer], num_reducers
    )
    want = [line for part in want_parts for line in part]
    assert got == want


def test_tabless_record_routes_like_reference(spark, executables):
    r"""Deterministic pin of the tabless divergence: the reference
    hashes md5('word\n') for a tabless record but md5('word') for a
    tabbed one, so the two record classes for the SAME key can land in
    different reduce partitions. Find a key where the partitions
    differ, run the real pipeline, and check partition placement
    matches the reference simulation (round-5 ADVICE item)."""
    from eecs_485___mapreduce_spark.operators.pipe import (
        reference_partition_key,
    )

    r = 4
    word = next(
        w
        for w in ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
        if md5_partition(w + "\n", r) != md5_partition(w, r)
    )
    assert reference_partition_key(word) == word + "\n"
    assert reference_partition_key(word + "\tv") == word

    corpus = [word, word + "\tv"]
    df = spark.createDataFrame([(line,) for line in corpus], "line string")
    mapped = pipe_map(df, executables["identity"], num_mappers=1)
    reduced = pipe_reduce(mapped, executables["identity"], num_reducers=r)
    got_parts = (
        reduced.rdd.mapPartitionsWithIndex(
            lambda i, it: [(i, row.value) for row in it]
        ).collect()
    )
    placement = {line: idx for idx, line in got_parts}
    assert placement[word] == md5_partition(word + "\n", r)
    assert placement[word + "\tv"] == md5_partition(word, r)
    assert placement[word] != placement[word + "\tv"]


def test_profile_reducer_detects_key_only_sort(executables):
    """Self-check that the sweep has teeth: a key-sorted-but-not-
    whole-line-sorted partition makes the profile reducer emit a
    different first/last value, so a wrong sort cannot pass silently."""
    part = ["k\tb", "k\ta"]  # key-adjacent but NOT whole-line sorted
    wrong = _run_exec(executables["profile"], part)
    right = _run_exec(executables["profile"], sorted(part))
    assert wrong != right


@given(
    keys=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=20,
        ),
        min_size=1,
        max_size=50,
    ),
    r=st.sampled_from([1, 2, 3, 5, 7, 16, 97, 1000]),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_md5_partition_col_matches_python_formula(spark, keys, r):
    """The JVM-side two-64-bit-half decimal routing used by the
    shuffle-layout sink must equal the reference's Python formula on
    arbitrary unicode keys and partition counts."""
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.operators.pipe import md5_partition_col

    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {
        r_.key: r_.p
        for r_ in df.select(
            "key", md5_partition_col(F.col("key"), r).alias("p")
        ).collect()
    }
    assert got == {k: md5_partition(k, r) for k in set(keys)}
