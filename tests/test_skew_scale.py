"""EXECUTED hot-key evidence for the engine's 100 TB skew claims —
the r7 verdict's task #4: the hot-user safety of the two-level
sessionizer, the salted join, and the LSH band path were docstring-
and plan-pinned but never actually RUN against a skewed corpus. This
file runs them: a synthetic corpus where ONE user owns ~30% of a
240k-row event blow-up (the reference's straggler concern —
mapreduce/manager/__main__.py task reassignment — at Spark scale),
and a documents corpus where 30% of docs are near-copies of one
template (one dominant LSH band bucket).

Each test asserts BOTH:
- correctness: engine result == DuckDB oracle on the HOT corpus
  (skew handling must be semantically invisible), and
- a runtime envelope: hot-corpus wall time <= 3x uniform-corpus wall
  time + 2 s noise floor (local[32]; a raw per-user event-scale
  window would put 30% of all rows in ONE window partition and blow
  the envelope as the corpus grows — and fails the plan gate below
  immediately).

Plan gates make the regression structural, not just statistical:
the sessionizer's event-scale exchange must be on (user_id, day),
and the salted join must key on the salt column — reintroducing a
raw (user)-partitioned session or an unsalted hot join fails the
gate even on a fast machine.
"""

from __future__ import annotations

import os
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import normalize

N_EVENTS = 240_000
N_USERS = 2_000
HOT_USER = 1
HOT_SHARE = 0.30
SPAN_DAYS = 30
_BASE = 1_700_000_000

N_DOCS = 1_500
HOT_DOCS = 450  # near-copies of one template -> one dominant band


def _write_events_corpus(tmpdir: str, hot: bool) -> str:
    rng = np.random.default_rng(42)
    n_hot = int(N_EVENTS * HOT_SHARE) if hot else 0
    users = np.concatenate(
        [
            np.full(n_hot, HOT_USER, dtype=np.int64),
            rng.integers(1, N_USERS + 1, size=N_EVENTS - n_hot),
        ]
    )
    secs = _BASE + rng.integers(0, SPAN_DAYS * 86400, size=N_EVENTS)
    order = np.argsort(secs, kind="stable")
    table = pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
            "ts": pa.array(
                (secs[order] * 1_000_000).astype("int64"),
                pa.timestamp("us"),
            ),
            "user_id": pa.array(users[order]),
            "event_type": pa.array(
                np.array(["click", "view", "purchase"])[
                    rng.integers(0, 3, size=N_EVENTS)
                ]
            ),
            "value": pa.array(
                rng.integers(0, 100, size=N_EVENTS).astype("float64")
            ),
            "props": pa.array([None] * N_EVENTS, pa.string()),
        }
    )
    d = os.path.join(tmpdir, "events.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))
    # a customer dim covering every user id, for the salted join query
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, N_USERS + 1, dtype=np.int64)),
            "c_mktsegment": pa.array(
                np.array(["AUTOMOBILE", "BUILDING", "MACHINERY"])[
                    np.arange(N_USERS) % 3
                ]
            ),
        }
    )
    dc = os.path.join(tmpdir, "customer.parquet")
    os.makedirs(dc, exist_ok=True)
    pq.write_table(cust, os.path.join(dc, "part-0.parquet"))
    return tmpdir


def _write_docs_corpus(tmpdir: str, hot: bool) -> str:
    rng = np.random.default_rng(7)
    template = [f"boiler{i}" for i in range(12)]
    texts = []
    for i in range(N_DOCS):
        if hot and i < HOT_DOCS:
            # near-copy: one token varied -> shingle sets almost equal,
            # minhash signatures collide, ONE band bucket dominates
            toks = list(template)
            toks[rng.integers(0, 12)] = f"var{i % 5}"
            texts.append(" ".join(toks))
        else:
            texts.append(
                " ".join(f"u{i}w{j}" for j in range(int(rng.integers(5, 14))))
            )
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(1, N_DOCS + 1, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * N_DOCS, pa.string()),
            "source": pa.array(["web"] * N_DOCS, pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    d = os.path.join(tmpdir, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))
    return tmpdir


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    return {
        "uniform": _write_events_corpus(
            str(tmp_path_factory.mktemp("skew_uni")), hot=False
        ),
        "hot": _write_events_corpus(
            str(tmp_path_factory.mktemp("skew_hot")), hot=True
        ),
        "docs_uniform": _write_docs_corpus(
            str(tmp_path_factory.mktemp("skewd_uni")), hot=False
        ),
        "docs_hot": _write_docs_corpus(
            str(tmp_path_factory.mktemp("skewd_hot")), hot=True
        ),
    }


def _timed_run(spark, name: str, sf_dir: str) -> tuple[float, list]:
    from eecs_485___mapreduce_spark.functions import release_scope

    q = all_queries()[name]
    t0 = time.monotonic()
    rows = q.fn(spark, sf_dir).collect()
    dt = time.monotonic() - t0
    release_scope(sf_dir)
    return dt, rows


def _oracle_rows(sf_dir: str, name: str, tables: tuple[str, ...]):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    res = con.execute(all_queries()[name].oracle)
    return [d[0] for d in res.description], res.fetchall()


def _assert_envelope(name, t_uniform, t_hot):
    assert t_hot <= 3.0 * t_uniform + 2.0, (
        f"{name}: hot-key corpus took {t_hot:.2f}s vs uniform "
        f"{t_uniform:.2f}s — exceeds the 3x+2s skew envelope; a "
        "skew-safety regression (raw hot-key partitioning?)"
    )


def test_two_level_stitch_hot_user_correct_and_bounded(spark, corpora):
    t_uni, _ = _timed_run(spark, "sessionize_two_level_stitch", corpora["uniform"])
    t_hot, rows = _timed_run(spark, "sessionize_two_level_stitch", corpora["hot"])
    o_cols, o_rows = _oracle_rows(
        corpora["hot"], "sessionize_two_level_stitch", ("events",)
    )
    cols = ["user_id", "n_events", "n_sessions", "total_value"]
    assert normalize([tuple(r) for r in rows], cols) == normalize(o_rows, o_cols)
    _assert_envelope("sessionize_two_level_stitch", t_uni, t_hot)


def test_salted_join_hot_user_correct_and_bounded(spark, corpora):
    t_uni, _ = _timed_run(spark, "skew_salted_join_events", corpora["uniform"])
    t_hot, rows = _timed_run(spark, "skew_salted_join_events", corpora["hot"])
    o_cols, o_rows = _oracle_rows(
        corpora["hot"], "skew_salted_join_events", ("events", "customer")
    )
    cols = ["c_mktsegment", "n_events", "total_value"]
    assert normalize([tuple(r) for r in rows], cols) == normalize(o_rows, o_cols)
    _assert_envelope("skew_salted_join_events", t_uni, t_hot)


def test_minhash_lsh_hot_band_correct_and_bounded(spark, corpora):
    """One dominant band bucket (450 near-copies of a template): the
    banded path's cost must scale with the TRUE candidate pairs (the
    ~450^2/2 real near-dups it is obligated to emit), not corpus^2 —
    and stay oracle-exact while doing it."""
    t_uni, _ = _timed_run(spark, "dedup_minhash_lsh", corpora["docs_uniform"])
    t_hot, rows = _timed_run(spark, "dedup_minhash_lsh", corpora["docs_hot"])
    o_cols, o_rows = _oracle_rows(
        corpora["docs_hot"], "dedup_minhash_lsh", ("documents",)
    )
    assert len(rows) == len(o_rows)
    cols = ["doc_a", "doc_b", "jaccard"]
    assert normalize([tuple(r) for r in rows], cols) == normalize(o_rows, o_cols)
    # the hot corpus does ~100k pair-verifications the uniform one
    # doesn't — that work is the OUTPUT, so the envelope here is an
    # absolute budget, not a ratio: candidate-proportional cost on
    # local[32] stays well under a minute
    assert t_hot <= max(60.0, 10.0 * t_uni), (
        f"dedup_minhash_lsh: {t_hot:.1f}s on the hot-band corpus "
        f"(uniform {t_uni:.1f}s) — banded candidate generation is no "
        "longer proportional to true-dup density"
    )


def test_stitch_plan_partitions_event_scale_window_by_user_day(spark, corpora):
    """Structural gate: the event-scale window exchange MUST be on
    (user_id, day). A raw per-user session window over events would
    drop 'day' from the first hashpartitioning — the exact regression
    the two-level design exists to prevent."""
    df = all_queries()["sessionize_two_level_stitch"].fn(spark, corpora["hot"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    event_scale = [p for p in parts if "user_id" in p and "day" in p]
    assert event_scale, (
        "no (user_id, day) exchange in the stitch plan — the event-"
        f"scale window lost its day split:\n{plan[:2000]}"
    )
    from eecs_485___mapreduce_spark.functions import release_scope

    release_scope(corpora["hot"])


def test_salted_join_plan_keys_on_salt(spark, corpora):
    """Structural gate: the salted join must shuffle on the composite
    (key, salt) — if the _salt column disappears from the join's
    exchange, the hot key is back on one reducer."""
    df = all_queries()["skew_salted_join_events"].fn(spark, corpora["hot"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, (
        f"salt column missing from the salted-join plan:\n{plan[:2000]}"
    )
    from eecs_485___mapreduce_spark.functions import release_scope

    release_scope(corpora["hot"])
