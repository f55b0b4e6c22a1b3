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


def test_chunk_windows_boundary_semantics(spark):
    """Chunking invariants on synthetic docs at every boundary shape:
    coverage (chunks tile the token stream at stride 24), overlap
    (consecutive chunks share 8 tokens), final-chunk truncation, and
    the empty/whitespace-doc degenerate case (one empty chunk, null
    boundary tokens)."""
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.queries.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk_windows,
    )

    lengths = [0, 1, 23, 24, 25, 32, 33, 56, 57, 100]
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)), "en", "src", n)
        for i, n in enumerate(lengths)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    out = {
        (r.doc_id, r.chunk_id): r
        for r in text_chunk_windows(spark, d).collect()
    }
    for doc_id, n in enumerate(lengths):
        if n == 0:
            r = out[(doc_id, 0)]
            assert r.n_tokens == 0 and r.first_tok is None and r.last_tok is None
            assert (doc_id, 1) not in out
            continue
        n_chunks = len(range(1, n + 1, CHUNK_STRIDE))
        assert {cid for (did, cid) in out if did == doc_id} == set(range(n_chunks))
        for cid in range(n_chunks):
            r = out[(doc_id, cid)]
            start = cid * CHUNK_STRIDE  # 0-based token offset
            want_len = min(CHUNK_TOKENS, n - start)
            assert r.n_tokens == want_len, (doc_id, cid)
            assert r.first_tok == f"t{doc_id}x{start}"
            assert r.last_tok == f"t{doc_id}x{start + want_len - 1}"


def test_unicode_hygiene_nonzero_fixture_matches_duckdb(spark):
    """The corpus is pure ASCII, so the production census's defect
    counters are zero there — this fixture forces NONZERO counts in
    every class and pins Spark (Java regex) == DuckDB (RE2) on the
    exact same patterns, so engine divergence cannot hide behind a
    clean corpus (same discipline as the PII nonzero fixture)."""
    import duckdb

    from eecs_485___mapreduce_spark.queries.text import _hygiene_census

    rows = [
        ("s1", "plain ascii text"),
        ("s1", "café au lait"),                 # non-ascii, 2-byte
        ("s1", "bad byte � here"),              # replacement char
        ("s2", "tab\tok but bell\x07 inside"),       # control char
        ("s2", "zero​width joined‍"),      # zero-width
        ("s2", "emoji \U0001f600 and CJK 中文"),  # 3/4-byte
        ("s2", "\x1b[31mansi colored\x1b[0m"),       # ESC control
    ]
    sdf = _hygiene_census(
        spark.createDataFrame(rows, "source string, text string")
    )
    got = {r["source"]: r.asDict() for r in sdf.collect()}
    assert got["s1"]["n_nonascii_docs"] == 2
    assert got["s1"]["n_replacement_docs"] == 1
    assert got["s2"]["n_ctrl_docs"] == 2
    assert got["s2"]["n_zerowidth_docs"] == 1
    assert got["s2"]["utf8_overhead_bytes"] > 0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(source VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    from eecs_485___mapreduce_spark.registry import all_queries

    oracle = all_queries()["text_unicode_hygiene"].oracle
    o_cols = None
    res = con.execute(oracle)
    o_cols = [d[0] for d in res.description]
    want = {r[o_cols.index("source")]: dict(zip(o_cols, r)) for r in res.fetchall()}
    for src, s_row in got.items():
        for k, v in s_row.items():
            assert want[src][k] == v, (src, k, v, want[src][k])


def test_compression_census_matches_exact_recompute(spark):
    """The rows-only compression census recomputed exactly from the
    raw corpus with the same pinned zlib level — byte sums, ratios,
    and per-doc extremes all integer-equal (this is the full
    correctness pin standing in for the inexpressible SQL oracle)."""
    import zlib

    import duckdb

    from eecs_485___mapreduce_spark.queries.text import (
        COMPRESS_LEVEL,
        text_compression_census,
    )

    from .conftest import SF_SMALL

    rows = duckdb.connect().execute(
        f"SELECT source, text FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    agg: dict[str, list] = {}
    for s, t in rows:
        b = (t or "").encode("utf-8")
        c = len(zlib.compress(b, COMPRESS_LEVEL))
        a = agg.setdefault(s, [0, 0, 0, []])
        a[0] += 1
        a[1] += len(b)
        a[2] += c
        a[3].append(c * 1000 // max(len(b), 1))
    want = {
        s: (
            v[0],
            v[1],
            v[2],
            v[2] * 1000 // max(v[1], 1),
            min(v[3]),
            max(v[3]),
        )
        for s, v in agg.items()
    }
    got = {
        r.source: (
            r.n_docs,
            r.raw_bytes,
            r.comp_bytes,
            r.ratio_milli,
            r.min_doc_ratio_milli,
            r.max_doc_ratio_milli,
        )
        for r in text_compression_census(spark, SF_SMALL).collect()
    }
    assert got == want


def test_ncd_verify_values_exact_and_exact_dups_flagged(spark):
    """Every reported NCD recomputes exactly from the raw texts at
    the pinned zlib level (and is within threshold); completeness:
    every identical-text pair of substantial length is a guaranteed
    band-join candidate with tiny NCD, so it MUST be flagged."""
    import zlib

    import duckdb

    from eecs_485___mapreduce_spark.queries.dedup import (
        NCD_LEVEL,
        NCD_THRESHOLD_MILLI,
        dedup_ncd_verify,
    )

    from .conftest import SF_SMALL

    texts = dict(
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_SMALL}/documents.parquet')"
        )
        .fetchall()
    )

    def ncd_milli(a, b):
        ba, bb = (a or "").encode(), (b or "").encode()
        ca = len(zlib.compress(ba, NCD_LEVEL))
        cb = len(zlib.compress(bb, NCD_LEVEL))
        cab = len(zlib.compress(ba + bb, NCD_LEVEL))
        return (cab - min(ca, cb)) * 1000 // max(max(ca, cb), 1)

    out = {
        (r.doc_a, r.doc_b): r.ncd_milli
        for r in dedup_ncd_verify(spark, SF_SMALL).collect()
    }
    assert out, "no pairs flagged on the near-dup-planted corpus"
    for (a, b), v in out.items():
        assert v == ncd_milli(texts[a], texts[b])
        assert v <= NCD_THRESHOLD_MILLI

def test_ncd_verify_flags_planted_dup_and_skips_unrelated(spark, tmp_path):
    """Completeness/soundness on a controlled corpus: an identical
    pair and a lightly-edited pair (guaranteed band candidates,
    near-zero NCD) are flagged; an unrelated long document never
    pairs with them."""
    import os

    from eecs_485___mapreduce_spark.queries.dedup import dedup_ncd_verify

    base = (
        "the quick brown fox jumps over the lazy dog and then "
        "wanders through the quiet orchard counting apples "
    ) * 8
    edited = base.replace("apples", "pears", 1)
    other = (
        "completely different subject matter entirely about "
        "maritime navigation beacons and tidal charts of the north "
    ) * 8
    rows = [
        (1, base, "en", "srcA", len(base)),
        (2, base, "en", "srcA", len(base)),
        (3, edited, "en", "srcB", len(edited)),
        (4, other, "en", "srcB", len(other)),
    ]
    d = str(tmp_path / "corpus")
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        .coalesce(1)
        .write.parquet(os.path.join(d, "documents.parquet"))
    )
    got = {
        (r.doc_a, r.doc_b): r.ncd_milli
        for r in dedup_ncd_verify(spark, d).collect()
    }
    assert (1, 2) in got and got[(1, 2)] < 100  # identical pair
    assert (1, 3) in got and (2, 3) in got  # one-word edit
    assert not any(4 in p for p in got), got  # unrelated never flagged


def test_threshold_sweep_invariants(spark):
    """Provable sweep invariants: every row partitions the same corpus
    (cells sum to n_docs; tp+fn is the constant positive count), raising
    the cutoff can only shrink the predicted-positive set (tp and fp
    non-increasing, so recall non-increasing), and F1 is the exact
    harmonic form of the reported cells."""
    from eecs_485___mapreduce_spark.queries.text import (
        threshold_sweep_stopword_en,
    )

    from .conftest import SF_SMALL

    rows = threshold_sweep_stopword_en(spark, SF_SMALL).collect()
    assert len(rows) == 10
    n_docs = rows[0].tp + rows[0].fp + rows[0].fn + rows[0].tn
    n_en = rows[0].tp + rows[0].fn
    prev_tp, prev_fp = rows[0].tp, rows[0].fp
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == n_docs
        assert r.tp + r.fn == n_en
        assert r.tp <= prev_tp and r.fp <= prev_fp
        prev_tp, prev_fp = r.tp, r.fp
        if 2 * r.tp + r.fp + r.fn:
            assert r.f1_milli == round(
                2000.0 * r.tp / (2 * r.tp + r.fp + r.fn)
            )


def test_wordcount_and_grep_match_python_model_random_corpora(
    spark, tmp_path_factory
):
    """Random-corpus sweep for the two reference programs' DataFrame
    forms (the goldens pin only the fixed corpus): wordcount must
    equal a pure-Python replay of the wc_map.sh pipeline (lowercase,
    split on every single [ \\t] separator — consecutive separators
    yield empty tokens, kept under keep_empty), and grep must equal
    Python's case-insensitive substring semantics (the reference
    mapper IS Python), including the global output sort."""
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from eecs_485___mapreduce_spark.operators.grep import grep_text_dir
    from eecs_485___mapreduce_spark.operators.wordcount import (
        wordcount_text_dir,
    )

    seq = iter(range(10**9))

    @given(
        files=st.lists(
            st.lists(
                st.text(alphabet="aAbB xyZ\t.", max_size=12), max_size=4
            ),
            min_size=1,
            max_size=3,
        ),
        query=st.text(alphabet="abxyz", min_size=1, max_size=3),
        keep_empty=st.booleans(),
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(files, query, keep_empty):
        d = tmp_path_factory.mktemp("wcg") / f"in{next(seq)}"
        d.mkdir()
        all_lines = []
        for i, lines in enumerate(files):
            (d / f"{i:03d}.txt").write_text(
                "".join(line + "\n" for line in lines)
            )
            all_lines += lines

        got_wc = {
            (r.word, r.cnt)
            for r in wordcount_text_dir(
                spark, str(d), keep_empty=keep_empty
            ).collect()
        }
        want_wc: dict[str, int] = {}
        for line in all_lines:
            for tok in re.split("[ \t]", line.lower()):
                if tok or keep_empty:
                    want_wc[tok] = want_wc.get(tok, 0) + 1
        assert got_wc == set(want_wc.items())

        got_grep = [
            r.value for r in grep_text_dir(spark, str(d), query=query).collect()
        ]
        want_grep = sorted(
            line for line in all_lines if query.lower() in line.lower()
        )
        assert got_grep == want_grep

    check()
