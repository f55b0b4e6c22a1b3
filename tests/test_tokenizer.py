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


# ---------------------- property: Spark BPE == pure-Python reference


def _ref_bpe(words: dict[str, int], k: int):
    """Reference BPE (Sennrich et al. 2016, greedy leftmost
    non-overlapping merge, count DESC / pair ASC tie-break) in plain
    Python — the independent model the distributed operator must match."""
    toks = {w: list(w) for w in words}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, f in words.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] = counts.get((t[i], t[i + 1]), 0) + f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((a, b, cnt))
        for w, t in toks.items():
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            toks[w] = out
    return merges, toks


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = st.dictionaries(
    keys=st.text(alphabet="abcd", min_size=2, max_size=8),
    values=st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=_WORDS)
def test_bpe_matches_python_reference(spark, words):
    """Three distributed merge iterations must reproduce the reference
    implementation exactly: same rules in the same order with the same
    counts, and the same final tokenization of every word."""
    k = 3
    want_merges, want_toks = _ref_bpe(words, k)
    cur = _state(spark, list(words.items()))
    got_merges = []
    for _ in range(k):
        best = _best_pair(cur)
        row = best.collect()
        if not row:
            break
        (pr, cnt) = row[0].pr, row[0].cnt
        a, b = pr.split(" ")
        got_merges.append((a, b, cnt))
        cur = _merge_step(cur, best)
    assert got_merges == want_merges
    got_toks = {
        r.word: r.s for r in cur.select("word", "s").collect()
    }
    for w, t in want_toks.items():
        assert got_toks[w] == "".join(f"({x})" for x in t), (w, t, got_toks[w])
