"""Word count and grep over a raw text directory: content parity with
hand-computed goldens on our own corpus, including the reference's
tokenizer quirks (lowercase, [ \\t] split, empty tokens legal)."""

from __future__ import annotations

from collections import Counter

from eecs_485___mapreduce_spark.operators import grep_text_dir, wordcount_text_dir


def expected_counts(corpus_dir: str, lowercase=True, keep_empty=False) -> Counter:
    import os
    import re

    c: Counter = Counter()
    for fn in sorted(os.listdir(corpus_dir)):
        with open(os.path.join(corpus_dir, fn)) as f:
            for line in f.read().splitlines():
                if lowercase:
                    line = line.lower()
                toks = re.split("[ \t]", line)
                if not keep_empty:
                    toks = [t for t in toks if t]
                c.update(toks)
    return c


def test_wordcount_matches_golden(spark, text_corpus):
    got = dict(wordcount_text_dir(spark, text_corpus).collect())
    assert got == dict(expected_counts(text_corpus))
    assert got["hello"] == 3
    assert got["spark"] == 4


def test_wordcount_keep_empty_quirk(spark, text_corpus):
    """The reference's sh tokenizer emits empty tokens for double
    separators and empty lines; keep_empty reproduces that."""
    got = dict(wordcount_text_dir(spark, text_corpus, keep_empty=True).collect())
    exp = dict(expected_counts(text_corpus, keep_empty=True))
    assert got == exp
    assert "" in got  # the quirk is present


def test_wordcount_no_lowercase(spark, text_corpus):
    got = dict(wordcount_text_dir(spark, text_corpus, lowercase=False).collect())
    assert got == dict(expected_counts(text_corpus, lowercase=False))
    assert got.get("SPARK") == 1


def test_grep_case_insensitive_sorted(spark, text_corpus):
    """Grep parity: case-insensitive substring, output globally sorted
    (the reference integration test compares order-sensitively)."""
    lines = [r.value for r in grep_text_dir(spark, text_corpus, "product").collect()]
    assert lines == sorted(lines)
    assert lines == sorted(
        ["Product catalog line", "product PRODUCT Product"]
    )


def test_grep_no_match(spark, text_corpus):
    assert grep_text_dir(spark, text_corpus, "zzzznothing").count() == 0


def test_canonical_text_equals_token_join_on_nasty_inputs(spark):
    """The single-pass canonical_text fast path must equal the
    split+filter+join definition on every whitespace shape: tabs,
    newlines, CRs, runs, leading/trailing, empty, whitespace-only."""
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.functions import canonical_text, tokens

    nasty = [
        "plain words here",
        "  leading spaces",
        "trailing spaces   ",
        "\tleading tab",
        "internal\t\ttabs and\nnewlines\r\nboth kinds",
        "many     spaces",
        "",
        "   \t \n ",
        "MiXeD CaSe\tToKeNs",
        "one",
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "text string")
    rows = df.select(
        canonical_text("text").alias("fast"),
        F.array_join(tokens("text"), " ").alias("slow"),
    ).collect()
    for r in rows:
        assert r.fast == r.slow, (r.fast, r.slow)
