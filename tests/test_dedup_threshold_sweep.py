"""Generative engine-vs-oracle sweep for the DEDUP family at its
EXACT-THRESHOLD boundaries: random document corpora with PLANTED
prefix-share pairs whose shingle Jaccard lands exactly ON each
registered threshold — MinHash verify 0.5, n-gram pair 0.2,
prefix-filter 0.6, containment 0.8 — and one shingle either side,
run through the registered Spark queries AND their DuckDB oracles
side by side.

This is the session-boundary sweep's discipline
(tests/test_session_boundary_sweep.py, the harness that caught
defects #8 and #11) applied to the dedup seams the r7 verdict called
out: a float-vs-ratio comparison divergence, a ROUND-half rule
mismatch, or a list_distinct/array_distinct ordering assumption would
hide at exactly these ratios the way the inclusive-merge rule hid at
exactly the session gap.

Construction: a planted pair shares a token PREFIX and diverges into
pair-unique suffixes. With all tokens distinct, a doc of t tokens has
t-2 distinct 3-shingles, the pair's shingle intersection is exactly
(prefix_len - 2), and no seam shingle collides — so intersection s
and union U are exact integers we choose: jaccard = s / U hits any
rational target. Background docs drawn from a tiny hot vocabulary
(duplicate shingles, sub-3-token fallback docs, token-less docs)
keep the inverted-index joins honest around the planted pairs.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eecs_485___mapreduce_spark.queries.dedup import INCREMENTAL_SPLIT
from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import normalize, sweep_examples

# Every registered threshold, as an exact rational (intersection
# multiplier, union multiplier): jaccard = (k*s) / (k*U) for scale s.
#   dedup_minhash_lsh / dedup_incremental_minhash / recall audit: 0.5
#   dedup_ngram_jaccard / dedup_clusters / survivorship:          0.2
#   dedup_prefix_filter_jaccard (JACC_MILLI=600):                 0.6
_JACCARD_TARGETS = [
    (1, 2),  # 0.5  -> s, U = s, 2s
    (1, 5),  # 0.2  -> s, 5s
    (3, 5),  # 0.6  -> 3s, 5s
]

# dedup_containment_pairs (CONT_MILLI=800): containment = s / |A|.
_CONTAINMENT_TARGET = (4, 5)  # 0.8

# Queries that read ONLY the documents table, split by cost: the
# pair-level set is cheap; the cluster set runs the iterative CC
# operator (and its recursive-CTE oracle) per example.
PAIR_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_prefix_filter_jaccard",
    "dedup_containment_pairs",
]
CLUSTER_QUERIES = [
    "dedup_clusters",
    "dedup_survivorship",
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "dedup_lsh_recall_audit",
]

_HOT_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


class _TokenMint:
    """Globally unique lowercase tokens, so planted intersections are
    EXACTLY the shared prefix (no accidental shingle collisions)."""

    def __init__(self) -> None:
        self.n = 0

    def take(self, k: int) -> list[str]:
        out = [f"tok{self.n + i:04d}" for i in range(k)]
        self.n += k
        return out


@st.composite
def boundary_corpus(draw):
    mint = _TokenMint()
    docs: list[tuple[str, str, str]] = []  # (text, lang, source)

    # --- planted threshold pairs -------------------------------------
    for num, den in _JACCARD_TARGETS:
        s = num * draw(st.integers(1, 3))  # intersection size (scaled)
        union = s * den // num
        # split the union between the two docs: a + b - s = U ± jiggle
        a = draw(st.integers(s, union))  # |A| shingles
        jiggle = draw(st.sampled_from([-1, 0, 0, 1]))  # 0 = exact, biased
        b = union + jiggle - a + s  # |B| shingles
        if b < s or b < 1 or a < 1:
            continue
        prefix = mint.take(s + 2)
        ta = prefix + mint.take(a - s)
        tb = prefix + mint.take(b - s)
        src = draw(st.sampled_from(["web", "wiki", "news"]))
        docs.append((" ".join(ta), "en", src))
        docs.append((" ".join(tb), "en", src))

    # containment boundary: C(A in B) = s/|A| at exactly 0.8 ± one
    # common shingle; B a strict superset so n_common = s.
    cnum, cden = _CONTAINMENT_TARGET
    s = cnum * draw(st.integers(1, 2))
    a = s * cden // cnum
    jiggle = draw(st.sampled_from([0, 0, 1]))
    a += jiggle  # +1 shingle in A drops containment just below 0.8
    prefix = mint.take(s + 2)
    ta = prefix + mint.take(a - s)
    tb = prefix + mint.take(draw(st.integers(1, 3)))
    docs.append((" ".join(ta), "en", "web"))
    docs.append((" ".join(tb), "en", "web"))

    # exact duplicates under canonicalization: case + whitespace runs
    if draw(st.booleans()):
        base = " ".join(mint.take(draw(st.integers(1, 5))))
        docs.append((base, "en", "web"))
        docs.append((base.upper().replace(" ", "  \t"), "en", "wiki"))

    # --- background noise: hot vocab, fallback and token-less docs ---
    for _ in range(draw(st.integers(2, 5))):
        k = draw(st.integers(0, 6))
        toks = [draw(st.sampled_from(_HOT_VOCAB)) for _ in range(k)]
        text = draw(st.sampled_from([" ", ""])).join([""] + toks) or draw(
            st.sampled_from(["", "   ", "\t\n"])
        )
        docs.append((" ".join(toks) if toks else text, "xx", "crawl"))

    # doc_ids: sometimes straddle the incremental history/batch split
    # so the boundary-jaccard pairs exercise the history join too.
    base = draw(
        st.sampled_from([1, INCREMENTAL_SPLIT - 3, INCREMENTAL_SPLIT - 1])
    )
    return [
        {
            "doc_id": base + i,
            "text": text,
            "lang": lang,
            "source": src,
            "n_chars": len(text),
        }
        for i, (text, lang, src) in enumerate(docs)
    ]


def _write_documents(tmpdir: str, rows) -> str:
    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }
    )
    d = os.path.join(tmpdir, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))
    return tmpdir


def _assert_queries_match(spark, sf_dir: str, names) -> None:
    from eecs_485___mapreduce_spark.functions import release_scope

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    try:
        for name in names:
            q = all_queries()[name]
            sdf = q.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(q.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            assert sorted(sdf.columns) == sorted(o_cols), name
            assert len(s_rows) == len(o_rows), (
                f"{name}: {len(s_rows)} vs {len(o_rows)} rows"
            )
            assert normalize(s_rows, sdf.columns) == normalize(
                o_rows, o_cols
            ), f"{name}: values differ on a threshold-boundary corpus"
    finally:
        release_scope(sf_dir)


def test_planted_pairs_discriminate_each_threshold(
    spark, tmp_path_factory
):
    """Power check for the sweep's corpus construction: a hand-built
    corpus with pairs at EXACTLY each threshold and one shingle below
    must land exactly-on pairs INSIDE each query's output and
    just-below pairs OUTSIDE it. If a generator refactor ever breaks
    the prefix-share arithmetic, this fails before the sweep silently
    loses its boundary coverage."""
    mint = _TokenMint()

    def pair(s: int, a: int, b: int) -> tuple[str, str]:
        prefix = mint.take(s + 2)
        return (
            " ".join(prefix + mint.take(a - s)),
            " ".join(prefix + mint.take(b - s)),
        )

    # (doc ids 0..7) jaccard = s/(a+b-s)
    texts = [
        *pair(2, 2, 4),   # 0,1: jaccard 2/4  = 0.5 exactly
        *pair(2, 2, 5),   # 2,3: jaccard 2/5  = 0.4 just below 0.5
        *pair(3, 3, 5),   # 4,5: jaccard 3/5  = 0.6 exactly (prefix filter)
        *pair(3, 3, 6),   # 6,7: jaccard 3/6  = 0.5 below 0.6
        *pair(4, 5, 4),   # 8,9: containment 4/5 = 0.8 exactly (A=8 in B=9)
        *pair(4, 6, 4),   # 10,11: containment 4/6 < 0.8
    ]
    rows = [
        {"doc_id": i, "text": t, "lang": "en", "source": "web",
         "n_chars": len(t)}
        for i, t in enumerate(texts)
    ]
    sf_dir = _write_documents(str(tmp_path_factory.mktemp("dedupfix")), rows)
    from eecs_485___mapreduce_spark.functions import release_scope

    try:
        qs = all_queries()
        ngram = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in qs["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
        }
        assert ngram[(0, 1)] == 0.5
        assert ngram[(2, 3)] == 0.4  # 0.2 <= 0.4, present with exact value
        prefix_hits = {
            (r.d1, r.d2)
            for r in qs["dedup_prefix_filter_jaccard"].fn(spark, sf_dir).collect()
        }
        assert (4, 5) in prefix_hits  # exactly 0.6 is IN (>= threshold)
        assert (6, 7) not in prefix_hits  # 0.5 is OUT
        cont_hits = {
            (r.d1, r.d2)
            for r in qs["dedup_containment_pairs"].fn(spark, sf_dir).collect()
        }
        assert (8, 9) in cont_hits  # containment exactly 0.8 is IN
        assert (10, 11) not in cont_hits  # 4/6 is OUT
        lsh = {
            (r.doc_a, r.doc_b)
            for r in qs["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
        }
        # the 0.4 pair must NOT pass the 0.5 verify even if banded
        assert (2, 3) not in lsh
    finally:
        release_scope(sf_dir)


@given(rows=boundary_corpus())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_pair_family_matches_oracle_on_threshold_corpora(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_documents(str(tmp_path_factory.mktemp("dedupbnd")), rows)
    _assert_queries_match(spark, sf_dir, PAIR_QUERIES)


@given(rows=boundary_corpus())
@settings(
    max_examples=sweep_examples(6, 2),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_cluster_family_matches_oracle_on_threshold_corpora(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_documents(str(tmp_path_factory.mktemp("dedupcc")), rows)
    _assert_queries_match(spark, sf_dir, CLUSTER_QUERIES)


def test_jaccard_boundary_fixture_discriminates_both_thresholds(spark):
    """The driver-gate fixture twin (dedup_jaccard_boundary_fixture)
    must pin the comparison rule, not merely match its oracle: every
    'at' pair lands EXACTLY on the threshold double (so a strict `>`
    regression in either engine flips n_kept from n_pairs to 0), and
    the one-shingle-either-side variants bracket it strictly."""
    from eecs_485___mapreduce_spark.queries.dedup import (
        MINHASH_JACCARD_THRESHOLD,
        NGRAM_JACCARD_THRESHOLD,
        dedup_jaccard_boundary_fixture,
    )
    from .conftest import SF_SMALL

    rows = {
        (r.threshold, r.variant): r
        for r in dedup_jaccard_boundary_fixture(spark, SF_SMALL).collect()
    }
    assert len(rows) == 6
    for thr in (MINHASH_JACCARD_THRESHOLD, NGRAM_JACCARD_THRESHOLD):
        at = rows[(thr, "at")]
        below = rows[(thr, "below")]
        above = rows[(thr, "above")]
        assert at.n_pairs > 0
        # planted EXACTLY at the threshold: bit-equal double, kept by >=
        assert at.min_jaccard == at.max_jaccard == thr
        assert at.n_kept == at.n_pairs
        # one pad shingle either side brackets the boundary strictly
        assert below.max_jaccard < thr and below.n_kept == 0
        assert above.min_jaccard > thr and above.n_kept == above.n_pairs
