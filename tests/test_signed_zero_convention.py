"""Executable SIGNED-ZERO convention for rounded oracle outputs —
the round-8 analogue of the time-unit convention
(tests/test_time_unit_convention.py).

The seam (pinned below by raw-engine probes): DuckDB's ``round`` on a
DOUBLE preserves IEEE negative zero — ``round(-1e-7, 6)`` is ``-0.0``
— while Spark's ``round`` goes through BigDecimal and always returns
``0.0``. The driver's value compare renders floats with ``repr``, so
``'-0.0' != '0.0'`` is a hash FAIL. Aggregates (SUM/MIN/MAX), GROUP
BY, and DISTINCT normalize or merge signed zeros identically on both
engines, and ``round(-0.0, n)`` itself returns ``0.0`` in both — so
the ONLY reachable divergence is a double-valued ROUND **output
column** whose argument can be a tiny negative at the rounding scale
(correlations, slopes, centroids, cosines, deviations, Flesch
scores).

Convention: every such signed rounded output carries a ``+ 0`` guard
in the oracle SQL (IEEE: ``-0.0 + 0 == 0.0``; every other value,
including NaN and infinities, is unchanged) — Spark's side needs
nothing. The audit below extracts every double-valued ROUND site from
every registered oracle; a query with unguarded sites must be
enrolled here with a sign-safety justification, so a NEW signed
rounded output cannot land unexamined.
"""

from __future__ import annotations

import math
import os
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eecs_485___mapreduce_spark.registry import all_queries

# ------------------------------------------------------- seam probes


def test_duckdb_round_preserves_negative_zero():
    con = duckdb.connect()
    v = con.execute("SELECT round(CAST(-0.0000001 AS DOUBLE), 6)").fetchone()[0]
    assert v == 0.0 and math.copysign(1.0, v) == -1.0, repr(v)
    # the guard normalizes, and only touches the signed zero
    g, a, b = con.execute(
        "SELECT round(CAST(-0.0000001 AS DOUBLE), 6) + 0,"
        "       round(CAST(-2.5 AS DOUBLE), 0) + 0,"
        "       round(CAST(0.1255 AS DOUBLE), 3) + 0"
    ).fetchone()
    assert math.copysign(1.0, g) == 1.0 and g == 0.0
    assert (a, b) == (-3.0, 0.126)
    # round of an exact -0.0 argument is already positive zero
    z = con.execute("SELECT round(CAST(-0.0 AS DOUBLE), 6)").fetchone()[0]
    assert math.copysign(1.0, z) == 1.0
    # grouping/distinct merge the two zeros (sort ties are benign)
    n = con.execute(
        "SELECT COUNT(*) FROM (SELECT DISTINCT x FROM (VALUES "
        "(CAST(0.0 AS DOUBLE)), (CAST(-0.0 AS DOUBLE))) t(x))"
    ).fetchone()[0]
    assert n == 1


def test_spark_round_normalizes_negative_zero(spark):
    row = spark.sql(
        "SELECT round(CAST(-0.0000001 AS DOUBLE), 6) AS a,"
        "       round(CAST(-0.125 AS DOUBLE), 0) AS b,"
        "       round(CAST(-2.5 AS DOUBLE), 0) AS c"
    ).collect()[0]
    assert math.copysign(1.0, row.a) == 1.0 and row.a == 0.0
    assert math.copysign(1.0, row.b) == 1.0 and row.b == 0.0
    assert row.c == -3.0  # same half-away-from-zero rule as DuckDB


# ------------------------------------------------- mechanical audit

# Query -> why its remaining UNGUARDED double-valued ROUND sites can
# never emit a negative zero. Categories:
#   nonneg      — the rounded quantity is provably >= 0
#   int-cast    — the round is consumed by an integer/decimal CAST the
#                 extractor's 8-char prefix window can't see (CASE/
#                 nested-round wrappers); integers render '0' == '0'
#   order-only  — the round appears only as a sort/comparison key;
#                 both engines treat -0.0 == 0.0 in comparisons
#   inner-cte   — the round feeds later algebra whose final outputs
#                 are re-rounded WITH the guard
SIGN_SAFE = {
    "percentiles_lineitem": "nonneg: price quantiles",
    "text_repetition_signals": "nonneg: count ratios in [0, 1]",
    "text_tfidf_top_terms": "nonneg: tf * ln((N+1)/(df+1)) with df <= N",
    "embedding_quantize_int8": "nonneg: scale filtered > 0",
    "outlier_orders_robust_z": "nonneg: median/MAD of positive prices",
    "source_overlap_matrix": "nonneg: jaccard",
    "dedup_embedding_cosine": "nonneg: output filtered >= 0.30",
    "similarity_topk_ivf": "order-only: rank key; ties merge",
    "similarity_topk_ivf_kmeans": "order-only: rank key; ties merge",
    "embedding_array_stats": "nonneg: remaining site is the L2 norm",
    "kmeans_assign_cells": "nonneg: squared distance",
    "kmeans_cell_profile": "int-cast: nested round inside CAST AS BIGINT",
    "dedup_semantic_cells": "order-only: WHERE >= threshold compare",
    "anova_order_value_by_segment": "nonneg: rounded term is s^2/n",
    "ir_rrf_hybrid_topk": "order-only: rank key; ties merge",
    "regr_qty_price_by_nation": "nonneg: remaining site is r^2",
    "abtest_conversion_ztest": "int-cast: CASE wrapped in CAST AS BIGINT",
    "bootstrap_ci_order_value": "nonneg: means of positive cent sums",
    "text_bigram_surprisal": "nonneg: surprisal = -ln p >= 0",
    "text_unigram_logprob": "nonneg: surprisal = -ln p >= 0",
    "source_mixture_weights": "nonneg: mixture weights",
    "merge_upsert_orders": "int-cast: DECIMAL cast of positive price",
    "training_manifest": "nonneg: mixture weight",
    "pca_top_component_power": "nonneg: remaining site is the eigenvalue",
    "bigram_lm_doc_perplexity": "nonneg: surprisal = -ln p >= 0",
    "target_encode_mktsegment": "nonneg: means of positive cent sums",
    "t_closeness_audit": "order-only: > threshold boolean; EMD >= 0 anyway",
    "zipf_coverage_by_source": "nonneg: coverage ratio",
    "eval_langid_metrics": "int-cast: CASE wrapped in CAST AS BIGINT",
    "trimmed_mean_price_by_status": "order-only: ORDER BY int-cast cents",
    "winsorized_mean_price_by_status": "order-only: ORDER BY int-cast cents",
    "json_events": "nonneg: mean of nonneg counts",
    "string_part_stats": "nonneg: mean name length",
    "pacf_hourly_events": "inner-cte: acf feeds guarded pacf outputs",
    "stats_quantity_price": "nonneg: remaining sites are means/variances "
    "of positive quantities",
}


def _round_sites(sql: str):
    """(guarded, snippet) for every double-valued ROUND site: each
    ``round(`` occurrence minus those immediately CAST to an integer
    type, with ``+ 0`` right after the closing paren counting as the
    guard."""
    out = []
    for m in re.finditer(r"(?i)round\s*\(", sql):
        start = m.start()
        prefix = sql[max(0, start - 8) : start].upper()
        depth, i = 0, m.end() - 1
        while i < len(sql):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        tail = sql[i + 1 : i + 40]
        if ("CAST(" in prefix or "CAST (" in prefix) and re.match(
            r"\s*AS\s+(BIGINT|INT|INTEGER|SMALLINT)", tail, re.I
        ):
            continue
        guarded = bool(re.match(r"\s*\+\s*0", tail))
        out.append((guarded, re.sub(r"\s+", " ", sql[max(0, start - 50) : i + 25])))
    return out


def test_unguarded_round_outputs_are_enrolled():
    unenrolled, stale = {}, []
    reg = all_queries()
    for name, q in reg.items():
        if not q.oracle:
            continue
        ung = [s for g, s in _round_sites(q.oracle) if not g]
        if ung and name not in SIGN_SAFE:
            unenrolled[name] = ung[:2]
    for name in SIGN_SAFE:
        assert name in reg, f"SIGN_SAFE names a query not in the registry: {name}"
        if not [s for g, s in _round_sites(reg[name].oracle or "") if not g]:
            stale.append(name)
    assert not unenrolled, (
        "oracles with UNGUARDED double-valued ROUND outputs not enrolled in "
        f"SIGN_SAFE — add a '+ 0' guard (signed quantity) or enroll with a "
        f"sign-safety justification: {unenrolled}"
    )
    assert not stale, f"SIGN_SAFE entries with no unguarded sites left: {stale}"


# -------------------------------------------- functional divergence

# float32-exact pair whose double sum is -2^-25 ~ -2.98e-8: inside the
# round-to-zero band at 6 dp, so the unguarded oracle emits -0.0.
_POS = 0.25
_NEG = -0.250000029802322387695312  # -(0.25 + 2^-25), exact in float32


@pytest.fixture(scope="module")
def tiny_negative_embeddings_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("negzero-emb"))
    vecs = [
        [_POS] + [0.5] * 63,
        [_NEG] + [0.5] * 63,
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([7, 7], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
    return d


def test_centroid_guard_closes_the_divergence(
    spark, tiny_negative_embeddings_dir
):
    """embedding_label_centroids on a corpus whose dim-1 coordinate sum
    is exactly -2^-25: the unguarded oracle provably emits -0.0 (the
    counterfactual below) while Spark emits 0.0 — the '+ 0' guard
    makes both render '0.0' under the driver's repr compare."""
    d = tiny_negative_embeddings_dir
    q = all_queries()["embedding_label_centroids"]
    s_rows = {r.dim: r.coord_sum for r in q.fn(spark, d).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    o_rows = dict(
        con.execute(
            f"SELECT dim, coord_sum FROM ({q.oracle})"
        ).fetchall()
    )
    assert s_rows.keys() == o_rows.keys()
    for dim in s_rows:
        assert repr(s_rows[dim]) == repr(o_rows[dim]), (
            dim,
            s_rows[dim],
            o_rows[dim],
        )
    assert s_rows[1] == 0.0 and math.copysign(1.0, s_rows[1]) == 1.0
    # counterfactual: WITHOUT the guard the oracle's dim-1 sum is -0.0
    raw = con.execute(
        "SELECT round(SUM(val), 6) FROM ("
        "  SELECT unnest(CAST(embedding AS DOUBLE[])) AS val,"
        "         generate_subscripts(embedding, 1) AS d FROM embeddings"
        ") WHERE d = 1"
    ).fetchone()[0]
    assert raw == 0.0 and math.copysign(1.0, raw) == -1.0, repr(raw)


def test_special_value_seams_are_loud(spark):
    """The OTHER cross-engine special-value seams are self-announcing,
    unlike the silent signed-zero one: Spark (ANSI) errors on double
    division by zero where DuckDB yields NULL, DuckDB errors on
    ln(0)/ln(<0)/sqrt(<0)/asin(>1) where Spark yields NULL or NaN — so
    an unguarded oracle/engine pair that reaches them FAILS the gate
    loudly instead of hash-matching wrongly. Both agree on inf
    (power(0,-1), exp(1000)) and on NaN propagation through SUM/MAX.
    Pinned so a future engine upgrade that silently changes any of
    these (e.g. NULL instead of an error) is caught here, not in a
    production oracle."""
    con = duckdb.connect()
    assert con.execute(
        "SELECT CAST(0.0 AS DOUBLE)/CAST(0.0 AS DOUBLE)"
    ).fetchone()[0] is None
    with pytest.raises(Exception, match="(?i)logarithm"):
        con.execute("SELECT ln(CAST(0.0 AS DOUBLE))").fetchone()
    with pytest.raises(Exception, match="(?i)square root"):
        con.execute("SELECT sqrt(CAST(-1.0 AS DOUBLE))").fetchone()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT CAST(0.0 AS DOUBLE)/CAST(0.0 AS DOUBLE)").collect()
    assert spark.sql("SELECT ln(CAST(0.0 AS DOUBLE)) AS v").collect()[0].v is None
    v = spark.sql("SELECT sqrt(CAST(-1.0 AS DOUBLE)) AS v").collect()[0].v
    assert math.isnan(v)
    # agreements both engines share (no guard needed for these)
    assert con.execute("SELECT exp(CAST(1000.0 AS DOUBLE))").fetchone()[0] == math.inf
    assert (
        spark.sql("SELECT exp(CAST(1000.0 AS DOUBLE)) AS v").collect()[0].v
        == math.inf
    )
    assert math.isnan(
        con.execute(
            "SELECT MAX(x) FROM (VALUES (CAST('nan' AS DOUBLE)),"
            "(CAST(1.0 AS DOUBLE))) t(x)"
        ).fetchone()[0]
    )
    assert math.isnan(
        spark.sql(
            "SELECT MAX(x) AS v FROM VALUES (CAST('NaN' AS DOUBLE)),"
            "(CAST(1.0 AS DOUBLE)) t(x)"
        ).collect()[0].v
    )
