"""BPE merge-induction semantics, pinned on hand-computed fixtures.

The oracle comparison (tests/test_queries_oracle.py + driver) certifies
cross-engine equality on the real corpus; these tests pin the ALGORITHM
itself — greedy left-to-right overlap handling, the argmax tie-break,
and the train->apply composition — on inputs small enough to verify by
hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.queries.tokenizer import (
    _best_pair,
    _encode,
    _merge_step,
)


def _state(spark, rows):
    df = spark.createDataFrame(rows, "word string, freq long")
    return df.select("word", "freq", _encode(F.col("word")).alias("s"))


def test_greedy_overlap_run_merges_left_to_right(spark):
    """BPE's defining edge case: applying rule (a, a) to 'aaaa' must
    yield [aa, aa] and to 'aaa' must yield [aa, a] — leftmost
    non-overlapping, continuing AFTER each replacement."""
    cur = _state(spark, [("aaaa", 1), ("aaa", 1)])
    best = _best_pair(cur)
    assert best.collect()[0].pr == "a a"  # 3 + 2 = 5 occurrences
    out = {r.word: r.s for r in _merge_step(cur, best).collect()}
    assert out["aaaa"] == "(aa)(aa)"
    assert out["aaa"] == "(aa)(a)"


def test_argmax_tie_breaks_lexicographically(spark):
    """'ab' and 'ba' pairs tie at freq 2 -> 'a b' wins (pair ASC)."""
    cur = _state(spark, [("ab", 2), ("ba", 2)])
    r = _best_pair(cur).collect()[0]
    assert (r.pr, r.cnt) == ("a b", 2)


def test_merge_is_frequency_weighted(spark):
    """One word with freq 10 outweighs three distinct words of freq 1."""
    cur = _state(spark, [("xy", 10), ("ab", 1), ("ac", 1), ("ad", 1)])
    assert _best_pair(cur).collect()[0].pr == "x y"


def test_two_iterations_compose_into_longer_subword(spark):
    """After merging (l, o) then (lo, w), 'low' tokenizes as [low] —
    learned merges feed later iterations."""
    cur = _state(spark, [("low", 5), ("lower", 2)])
    b1 = _best_pair(cur)
    cur1 = _merge_step(cur, b1)
    assert b1.collect()[0].pr == "l o"
    b2 = _best_pair(cur1)
    cur2 = _merge_step(cur1, b2)
    assert b2.collect()[0].pr == "lo w"
    out = {r.word: r.s for r in cur2.collect()}
    assert out["low"] == "(low)"
    assert out["lower"] == "(low)(e)(r)"


def test_merged_pair_count_matches_occurrences(spark):
    """The reported pair_count is the exact freq-weighted occurrence
    count of the winning pair at selection time."""
    cur = _state(spark, [("aa", 3), ("baa", 4)])
    r = _best_pair(cur).collect()[0]
    assert (r.pr, r.cnt) == ("a a", 7)
