"""Generative engine-vs-oracle sweep for RANK/TOP-K queries at the
k-th-boundary TIE seam: random corpora with heavy planted ties —
equal values, same-timestamp rows, byte-identical duplicate documents
— run through every windowed-rank query over that table AND its
DuckDB oracle side by side.

A ``row_number()`` whose ORDER BY is not a TOTAL order is
nondeterministic under ties: Spark and DuckDB are each free to break
the tie differently, so the engines agree on the shipped corpora
(few exact ties) and diverge the day a tie lands at the k-th row.
This sweep plants that day. It is the third instance of the
session-boundary sweep discipline (tests/test_session_boundary_sweep
.py caught defects #8/#11 at time seams; tests/test_dedup_threshold_
sweep.py covers ratio seams); rank seams are this file.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import normalize, sweep_examples
from .test_dedup_threshold_sweep import _write_documents

# Windowed-rank queries that read ONLY events. Each must hold under
# same-value AND same-timestamp ties, i.e. its window order must be
# total (tie-broken down to event_id).
EVENTS_RANK_QUERIES = [
    "topk_per_group",
    "window_events",
    "dedup_latest_event",
    "islands_user_activity_streaks",
    "event_trigram_paths",
    "ewma_user_value_recent",
]

# Second events batch: sequential/replay operators where the REPLAY
# ORDER itself is the contract — a ts tie that reorders the replay is
# the exact failure mode. ucb1 additionally exercises the props-JSON
# seam (valid / invalid / NULL drawn by the generator).
EVENTS_RANK_QUERIES_2 = [
    "ucb1_variant_replay",
    "hurst_rs_hourly",
    "session_overlap_topk",
]

# Windowed-rank queries that read ONLY documents. Ties come from
# byte-identical duplicate docs (equal scores on every measure) and a
# tiny vocabulary (equal term/bigram counts at the k-th cut).
DOCS_RANK_QUERIES = [
    "text_top_bigrams",
    "text_tfidf_top_terms",
    "ir_bm25_topk",
    "sample_fixed_per_source",
    "sample_weighted_topk",
    "budget_apportion_sources",
]

# Second documents batch: selection/ordering operators whose output
# is a permutation or assignment — identical docs with identical
# scores force every tie-break to be exercised end-to-end.
DOCS_RANK_QUERIES_2 = [
    "stratified_kfold_assignment",
    "curriculum_interleave_order",
    "negative_pair_mining",
    "padding_waste_batching",
    "zipf_coverage_by_source",
    "bigram_lm_doc_perplexity",
]

_BASE_SEC = 1_700_000_000


@st.composite
def tied_events(draw):
    """Events with deliberately colliding (value, ts) pairs: values
    from {1.0, 2.0, 3.0}, timestamps from a handful of shared seconds
    per user, so the k-th rank boundary is almost always a tie."""
    rows = []
    eid = 0
    shared_secs = [
        _BASE_SEC + draw(st.integers(0, 3)) * 60 for _ in range(4)
    ]
    for uid in range(1, draw(st.integers(2, 3)) + 1):
        for _ in range(draw(st.integers(4, 10))):
            rows.append(
                {
                    "event_id": eid,
                    "sec": draw(st.sampled_from(shared_secs)),
                    "user_id": uid,
                    "event_type": draw(
                        st.sampled_from(
                            ["click", "view", "purchase", "purchase"]
                        )
                    ),
                    "value": float(draw(st.sampled_from([1, 2, 2, 3]))),
                    "props": draw(
                        st.sampled_from(
                            [None, '{"k": 0}', '{"k": 1}', '{"k": 5}',
                             "not json", "{}"]
                        )
                    ),
                }
            )
            eid += 1
    return rows


@st.composite
def tied_documents(draw):
    """Documents with byte-identical duplicates and a 4-word
    vocabulary: every per-term / per-doc score collides constantly."""
    vocab = ["red", "blue", "green", "gold"]
    docs = []
    for _ in range(draw(st.integers(3, 6))):
        k = draw(st.integers(1, 6))
        docs.append(
            (
                " ".join(draw(st.sampled_from(vocab)) for _ in range(k)),
                draw(st.sampled_from(["en", "xx"])),
                draw(st.sampled_from(["web", "wiki"])),
            )
        )
    # exact duplicates (same text, same source -> equal every score)
    for i in range(draw(st.integers(1, 3))):
        docs.append(docs[i % len(docs)])
    return [
        {
            "doc_id": i + 1,
            "text": t,
            "lang": lang,
            "source": src,
            "n_chars": len(t),
        }
        for i, (t, lang, src) in enumerate(docs)
    ]


def _write_events(tmpdir: str, rows) -> str:
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array(
                [r["sec"] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array(
                [r["event_type"] for r in rows], pa.string()
            ),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array(
                [r.get("props") for r in rows], pa.string()
            ),
        }
    )
    d = os.path.join(tmpdir, "events.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))
    return tmpdir


def _assert_match(spark, sf_dir: str, view_sql: dict[str, str], names):
    from eecs_485___mapreduce_spark.functions import release_scope

    con = duckdb.connect()
    for view, sql in view_sql.items():
        con.execute(f"CREATE VIEW {view} AS {sql}")
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
            ), f"{name}: values differ on a tie-heavy corpus"
    finally:
        release_scope(sf_dir)


@given(rows=tied_events())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_events_rank_family_matches_oracle_on_tied_corpora(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_events(str(tmp_path_factory.mktemp("tiesev")), rows)
    _assert_match(
        spark,
        sf_dir,
        {
            "events": "SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
        },
        EVENTS_RANK_QUERIES,
    )


@given(rows=tied_events())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_events_replay_family_matches_oracle_on_tied_corpora(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_events(str(tmp_path_factory.mktemp("tiesev2")), rows)
    _assert_match(
        spark,
        sf_dir,
        {
            "events": "SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
        },
        EVENTS_RANK_QUERIES_2,
    )


@given(rows=tied_documents())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_docs_rank_family_matches_oracle_on_tied_corpora(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_documents(str(tmp_path_factory.mktemp("tiesdoc")), rows)
    _assert_match(
        spark,
        sf_dir,
        {
            "documents": "SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        },
        DOCS_RANK_QUERIES,
    )


@given(rows=tied_documents())
@settings(
    max_examples=sweep_examples(10, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_docs_selection_family_matches_oracle_on_tied_corpora(
    spark, tmp_path_factory, rows
):
    sf_dir = _write_documents(str(tmp_path_factory.mktemp("tiesdoc2")), rows)
    _assert_match(
        spark,
        sf_dir,
        {
            "documents": "SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
        },
        DOCS_RANK_QUERIES_2,
    )
