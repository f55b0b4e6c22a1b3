"""Unit + invariant tests for the ML-prep operators
(eecs_485___mapreduce_spark/queries/mlprep.py) — independent of the
DuckDB oracle comparison in test_queries_oracle.py, these pin the
semantics directly (numpy ground truth for the gram matrix, key
arithmetic for merge/diff, determinism for the shuffle shards)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from eecs_485___mapreduce_spark.queries.mlprep import (
    GRAM_SCALE,
    N_SHARDS,
    embedding_gram_matrix,
    merge_upsert_orders,
    shuffle_shard_assignment,
    snapshot_diff_documents,
    text_unigram_logprob,
)

from .conftest import SF_SMALL


def test_gram_matrix_matches_numpy(spark):
    """The distributed partial-gram reduction must equal the single
    matrix product over the whole table (associativity of the exact
    integer arithmetic is the whole point of the quantization)."""
    table = pq.read_table(f"{SF_SMALL}/embeddings.parquet", columns=["embedding"])
    x = np.stack(table["embedding"].to_pylist()).astype(np.float64)
    xi = np.floor(x * GRAM_SCALE + 0.5).astype(np.int64)
    want = xi.T @ xi

    got = {(r.i, r.j): r.gram for r in embedding_gram_matrix(spark, SF_SMALL).collect()}
    d = xi.shape[1]
    assert len(got) == d * (d + 1) // 2  # upper triangle, diagonal included
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == want[i, j], (i, j)


def test_merge_upsert_action_arithmetic(spark):
    """inserted + updated = |batch|; kept = |target| - updated; the
    three actions partition the merged table."""
    orders = pq.read_table(f"{SF_SMALL}/orders.parquet", columns=["o_orderkey"])
    keys = np.asarray(orders["o_orderkey"])
    n_target = int((keys % 4 != 0).sum())
    n_batch = int((keys % 2 == 0).sum())
    n_updated = int(((keys % 2 == 0) & (keys % 4 != 0)).sum())

    rows = merge_upsert_orders(spark, SF_SMALL).collect()
    by_action: dict[str, int] = {}
    for r in rows:
        by_action[r.merge_action] = by_action.get(r.merge_action, 0) + r.n_rows
    assert by_action["updated"] == n_updated
    assert by_action["inserted"] == n_batch - n_updated
    assert by_action["kept"] == n_target - n_updated


def test_snapshot_diff_status_arithmetic(spark):
    """added = docs dropped from OLD only; removed = dropped from NEW
    only; changed = version-marked docs present in both."""
    docs = pq.read_table(f"{SF_SMALL}/documents.parquet", columns=["doc_id"])
    ids = np.asarray(docs["doc_id"])
    n_added = int((ids % 20 == 3).sum())  # %20==3 is never dropped by NEW (7)
    n_removed = int((ids % 20 == 7).sum())
    n_changed = int(((ids % 13 == 0) & (ids % 20 != 3) & (ids % 20 != 7)).sum())

    rows = snapshot_diff_documents(spark, SF_SMALL).collect()
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_docs
    assert by_status["added"] == n_added
    assert by_status["removed"] == n_removed
    assert by_status["changed"] == n_changed
    assert set(by_status) == {"added", "removed", "changed", "unchanged"}


def test_shuffle_shards_cover_and_deterministic(spark):
    """Every shard populated on the test corpus, censuses sum to the
    corpus, and a re-run reproduces the identical assignment (the
    pure-function-of-id property that makes epoch order reproducible)."""
    a = {r.shard: r for r in shuffle_shard_assignment(spark, SF_SMALL).collect()}
    assert len(a) == N_SHARDS
    assert sum(r.n_docs for r in a.values()) == 500
    b = {r.shard: r for r in shuffle_shard_assignment(spark, SF_SMALL).collect()}
    assert {k: (v.n_docs, v.first_doc, v.min_order_key) for k, v in a.items()} == {
        k: (v.n_docs, v.first_doc, v.min_order_key) for k, v in b.items()
    }


def test_surprisal_buckets_populated(spark):
    """The head/middle/tail gate must actually split the corpus (a
    degenerate all-one-bucket threshold would make the quality signal
    useless) and mean surprisal must be positive and finite."""
    rows = text_unigram_logprob(spark, SF_SMALL).collect()
    buckets = {r.ppl_bucket for r in rows}
    assert buckets == {"head", "middle", "tail"}
    for r in rows:
        assert 0 < r.mean_surprisal_mnat < 20000
        assert r.sum_surprisal_mnat >= r.n_tokens  # >= 1 mnat per token


def test_gram_matrix_plan_no_join_single_shuffle(spark):
    """Scale shape: the gram matrix must plan as scan -> mapInPandas ->
    one d^2-key aggregation. Any join (the oracle's self-join form) or
    a second exchange would explode at 100 TB."""
    from eecs_485___mapreduce_spark.plans import physical_plan

    plan = physical_plan(embedding_gram_matrix(spark, SF_SMALL))
    assert "Join" not in plan, plan
    # formatted plans name each node twice (tree + detail) — count tree
    # nodes, which render as "Exchange (<id>)".
    assert plan.count("Exchange (") <= 1, plan
    assert "MapInPandas" in plan


def test_power_iteration_matches_exact_eigendecomposition(spark):
    """The distributed power iteration must land on numpy's exact top
    eigenpair of the SAME integer Gram matrix: |cosine| >= 0.995,
    Rayleigh quotient within 0.1% (the eigengap on this corpus is
    ~0.93 per hop — 60 hops converge), unit norm, deterministic sign
    (anchor component positive)."""
    from eecs_485___mapreduce_spark.queries.mlprep import (
        embedding_gram_matrix,
        pca_top_component_power,
    )

    rows = pca_top_component_power(spark, SF_SMALL).collect()
    assert len(rows) == 64
    v = np.zeros(64)
    for r in rows:
        v[r.dim] = r.component
    lam = rows[0].eigenvalue
    assert len({r.eigenvalue for r in rows}) == 1  # one scalar, replicated

    G = np.zeros((64, 64))
    for r in embedding_gram_matrix(spark, SF_SMALL).collect():
        G[r.i, r.j] = r.gram
        G[r.j, r.i] = r.gram
    wvals, wvecs = np.linalg.eigh(G)
    top = wvecs[:, -1]

    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    cos = abs(v @ top) / np.linalg.norm(v)
    assert cos >= 0.995, cos
    assert abs(lam - wvals[-1]) / wvals[-1] < 1e-3
    # sign anchor: the largest-|component| dim is positive
    assert v[int(np.argmax(np.abs(v)))] > 0


def test_naive_bayes_learns_a_separable_corpus(spark, tmp_path):
    """On a corpus whose classes use disjoint vocabularies the
    held-out confusion matrix must be perfectly diagonal (the
    oracle-parity run certifies engine equality; this certifies the
    classifier actually LEARNS). Also pins the md5 split: train and
    test are disjoint by construction of the same hash rule."""
    from eecs_485___mapreduce_spark.queries.mlprep_supervised import (
        naive_bayes_source_confusion,
    )

    words = {
        "alpha": ["ant", "apple", "arrow"],
        "beta": ["bee", "bread", "brick"],
        "gamma": ["goat", "grape", "glass"],
    }
    rows = []
    for i in range(180):
        src = list(words)[i % 3]
        ws = words[src]
        text = " ".join(ws[(i + j) % 3] for j in range(6))
        rows.append((i, text, "en", src, len(text)))
    d = str(tmp_path / "fixture")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = naive_bayes_source_confusion(spark, d).collect()
    assert sum(r.n_docs for r in out) > 0  # the 10% split is non-empty
    assert all(r.actual == r.predicted for r in out), out


def test_padding_waste_invariants(spark):
    """Both strategies batch the SAME corpus, so real token mass and
    batch count must be identical; length-sorting can only reduce
    padding (equal at worst); utilization is the exact cross-ratio."""
    from eecs_485___mapreduce_spark.queries.mlprep_supervised import (
        padding_waste_batching,
    )

    rows = {r.strategy: r for r in padding_waste_batching(spark, SF_SMALL).collect()}
    rnd, srt = rows["random"], rows["length_sorted"]
    assert rnd.real_tokens == srt.real_tokens
    assert rnd.n_batches == srt.n_batches
    assert srt.pad_tokens <= rnd.pad_tokens
    for r in (rnd, srt):
        assert r.utilization_milli == round(
            1000.0 * r.real_tokens / (r.real_tokens + r.pad_tokens)
        )
