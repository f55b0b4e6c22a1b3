"""Adversarial-input harness: every document-shaped query vs its own
DuckDB oracle over an EDGE corpus — empty text, whitespace-only,
single token, unicode, a 500-char single token, heavy repetition, and
case collisions. The standard oracle gate (test_queries_oracle.py)
runs on well-behaved synthetic data; this harness is what caught the
chunker's ANSI element_at throw and the empty-chunk key asymmetry.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from eecs_485___mapreduce_spark.functions import release_scope
from eecs_485___mapreduce_spark.registry import all_queries

from .conftest import normalize

EDGE_ROWS = [
    (0, "", "en", "srcA", 0),
    (1, "   \t \n ", "en", "srcA", 7),
    (2, "solo", "en", "srcA", 4),
    (3, "héllo wörld ünïcode tokens répeat répeat", "de", "srcB", 40),
    (4, "a " * 200, "en", "srcB", 400),
    (5, "x" * 500, "en", "srcC", 500),
    (6, "the quick brown fox jumps over the lazy dog", "en", "srcC", 43),
    (7, "ONE TWO THREE one two three", "en", "srcC", 27),
    # Docs 8-11 plant EXACT-THRESHOLD jaccard pairs (the dedup
    # analogue of the r6 session exact-gap boundary; both dedup
    # thresholds filter with >=, so exactly-at-threshold pairs must
    # EMIT on both engines):
    #   (8, 9): 2 vs 4 shingles sharing 2 -> jaccard exactly 0.5 ==
    #           MINHASH_JACCARD_THRESHOLD (the ngram inverted index
    #           always pairs them; the LSH path pairs them only when a
    #           band collides — identical hashes on both engines
    #           either way)
    #   (10, 11): 1 vs 5 shingles sharing 1 -> jaccard exactly 0.2 ==
    #           NGRAM_JACCARD_THRESHOLD
    (8, "alpha beta gamma delta", "en", "srcD", 22),
    (9, "alpha beta gamma delta epsil zeta", "en", "srcD", 33),
    (10, "omega phi chi", "en", "srcD", 13),
    (11, "omega phi chi one two three four", "en", "srcD", 32),
    # Doc 12 is the BENCHMARK split (src0 = pipeline.BENCH_SOURCE):
    # 5 distinct shingles, exactly ONE shared with train docs 10/11 ->
    # containment exactly 1/5 = 0.2 == CONTAINMENT_THRESHOLD, so the
    # decontamination filter (>=) must flag both pairs — previously
    # the edge corpus had no src0 docs and the query passed vacuously.
    (12, "omega phi chi b1 b2 b3 b4", "en", "src0", 25),
]

# Document-shaped queries whose oracles read only the documents table.
EDGE_QUERIES = [
    "text_token_stats",
    "text_quality_score",
    "text_lang_stats",
    "text_fingerprint",
    "text_top_bigrams",
    "text_lang_id",
    "text_bpe_token_stats",
    "text_repetition_signals",
    "text_unigram_logprob",
    "text_tfidf_top_terms",
    "text_chunk_windows",
    "zipf_coverage_by_source",
    "source_mixture_weights",
    "split_train_val_test",
    "dedup_exact",
    "snapshot_diff_documents",
    "shuffle_shard_assignment",
    # round-3 mining/multimodal additions (document-shaped)
    "text_distinctive_terms_llr",
    "text_char_entropy",
    "text_bigram_surprisal",
    "dedup_prefix_filter_jaccard",
    "multimodal_image_headers",
    "multimodal_audio_headers",
    "ks_doclen_by_source",
    "chi2_source_lang",
    # continuation additions (document-shaped): empty/whitespace/
    # sentence-free docs must flow through the readability counts and
    # NULLIF guards identically
    "text_readability",
    "text_novelty_census",
    "blocks_contiguous_stream",
    "source_token_budget_trim",
    "udf_arrow_scalar_bucket",
    "multimodal_phash_neardup",
    # tiny vocabulary -> every token is a sketch candidate; the exact
    # recount filter must agree with the full-count oracle
    "heavy_hitters_tokens",
    # round-3 UDTF (document-shaped): empty/whitespace-only text must
    # yield zero sentences; explicit whitespace class strips \t\n
    "udtf_split_sentences",
    # evaluation census: classes with zero predictions must surface
    # NULL precision identically through the FULL OUTER join
    "eval_langid_metrics",
    # continuation batch: empty docs contribute zero tokens but the
    # largest-remainder allocations must still sum exactly to budget
    "budget_apportion_sources",
    # unicode docs spread the ASCII-share score across several bins;
    # empty text hits the zero-length guard
    "calibration_bins_langid",
    # neither tested source exists in the fixture -> the statistic row
    # must degrade to all-NULL identically on both engines
    "mannwhitney_doclen_sources",
    # inference batch: every doc lands in the clamp bins (empty text
    # scores 0 -> bin 0); srcA{solo} shares no vocabulary with srcB ->
    # the JSD pair must still emit a row with exactly ln2; KS pairs
    # over 3 tiny sources exercise the coalesced-grid cumsum
    "isotonic_calibration_langid",
    "ks_doclen_sources",
    "jsd_source_unigrams",
    # full-payload codecs: stats depend only on doc_id, so the edge
    # corpus exercises the serialize->decode round-trip end to end
    "multimodal_bmp_pixel_stats",
    "multimodal_wav_pcm_stats",
    "multimodal_png_pixel_stats",
    "multimodal_gif_pixel_stats",
    "multimodal_jpeg_pixel_stats",
    # round-4 additions (document-shaped): containment and sparse
    # cosine must drop empty/whitespace shingle sets identically on
    # both engines; quantile normalization must map the tiny per-source
    # ranks (n_s as small as 2) onto the 8-row pooled distribution
    "dedup_containment_pairs",
    "ir_doc_cosine_topk",
    "quantile_normalize_doclen",
    # r7 full enrollment: every remaining documents-only oracle query
    # joins the edge harness (previously only a curated subset ran
    # here — the rest saw adversarial text never)
    "ir_ndcg_bm25_eval",
    "threshold_sweep_stopword_en",
    "brier_decomposition_langid",
    "conformal_token_interval",
    "wasserstein_doclen_sources",
    "spearman_chars_tokens",
    "gate_ablation_census",
    "fdr_drift_decisions",
    "stored_query_matches",
    "greedy_coverage_selection",
    "text_byte_mass_census",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    # r8 driver-gate twin: on this corpus both sampled docs (0, 10)
    # fall below the 2-shingle floor, so the check degrades to
    # empty-on-both-engines; the discriminating shape is pinned by
    # test_dedup_threshold_sweep.py::test_jaccard_boundary_fixture_*
    "dedup_jaccard_boundary_fixture",
    "multimodal_binary_meta",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "multimodal_feature_extract",
    "sample_weighted_topk",
    "source_overlap_matrix",
    "split_leakage_audit",
    "stratified_kfold_assignment",
    "curriculum_interleave_order",
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "dedup_survivorship",
    "dedup_lsh_recall_audit",
    "ir_inverted_index",
    "ir_bm25_topk",
    "ir_pmi_collocations",
    "training_manifest",
    "bigram_lm_doc_perplexity",
    "negative_pair_mining",
    "naive_bayes_source_confusion",
    "padding_waste_batching",
    "decontaminate_containment",
    "pack_sequences_greedy",
    "text_pii_audit",
    "sample_fixed_per_source",
    "pipeline_e2e_funnel",
    "sample_stratified",
    "dedup_chunk_windows",
    "text_unicode_hygiene",
    "cohens_kappa_langid",
    "wordcount",
    "grep",
    "grep_count_by_source",
    "pipe_wordcount",
    "bpe_learn_merges",
    "bpe_apply_corpus",
    "udf_token_stats_arrow",
    "udf_grouped_rank_arrow",
    "udf_mapinpandas_bytes",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("edge-corpus"))
    (
        spark.createDataFrame(
            EDGE_ROWS,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    yield d
    release_scope(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_query_matches_oracle_on_edge_corpus(name, spark, edge_dir, edge_duck):
    q = all_queries()[name]
    sdf = q.fn(spark, edge_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = edge_duck.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row counts differ"
    assert normalize(s_rows, sdf.columns) == normalize(o_rows, o_cols), (
        f"{name}: values differ on the edge corpus"
    )


# ------------------------------------------------------- edge events

import datetime

_T0 = datetime.datetime(2024, 1, 10, 12, 0, 0)


def _t(s: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(seconds=s)


# NULL user/type/value/props, malformed and json-null payloads,
# same-timestamp ties (both same-user and cross-user), a session-gap
# boundary, negatives, and a zero value. Events 12+ plant EXACT
# session-boundary pairs (the r6 judge-found seam: Spark's
# session_window merges INCLUSIVELY at ts == prev_end, so the shipped
# sf corpora — which never place two same-user events exactly gap
# seconds apart — could not distinguish the strict and inclusive
# rules; this fixture can):
#   user 4: pair exactly SESSION_GAP_S/DYNGAP_DEFAULT_S apart -> MERGE
#   user 5: view exactly DYNGAP_ERROR_S after an error -> MERGE (the
#           dynamic gap, not the static one, decides)
#   user 6: running-max bridge — a short-gap error between two views;
#           the third view lands exactly at the FIRST view's end
#   user 7: one microsecond PAST the boundary -> SPLIT
#   user 8: one microsecond SHORT of the boundary -> MERGE
EDGE_EVENTS = [
    (1, _t(0), 1, "view", 1.0, '{"k": 1}'),
    (2, _t(0), 2, "view", 2.0, '{"k": 2}'),
    (3, _t(0), 2, "click", 2.5, '{"k": 3}'),
    (4, _t(1), 2, "view", None, None),
    (5, _t(1), 2, "view", 3.0, "{bad json"),
    (6, _t(1800), 2, "view", 1.5, "{}"),
    (7, _t(3600), 3, None, 4.0, '{"k": null}'),
    (8, _t(3601), None, "purchase", 5.0, '{"k": 9}'),
    (9, _t(3601), 3, "purchase", 5.0, '{"k": 9}'),
    (10, _t(0), 3, "view", -1.0, '{"k": -5}'),
    (11, _t(7203), 3, "click", 0.0, '{"k": 0}'),
    (12, _t(10000), 4, "view", 1.0, '{"k": 1}'),
    (13, _t(10000 + 1800), 4, "view", 1.0, '{"k": 1}'),
    (14, _t(20000), 5, "error", 1.0, '{"k": 1}'),
    (15, _t(20000 + 300), 5, "view", 1.0, '{"k": 1}'),
    (16, _t(30000), 6, "view", 1.0, '{"k": 1}'),
    (17, _t(30000 + 900), 6, "error", 1.0, '{"k": 1}'),
    (18, _t(30000 + 1800), 6, "view", 1.0, '{"k": 1}'),
    (19, _t(40000), 7, "view", 1.0, '{"k": 1}'),
    (
        20,
        _t(40000 + 1800) + datetime.timedelta(microseconds=1),
        7,
        "view",
        1.0,
        '{"k": 1}',
    ),
    (21, _t(50000), 8, "view", 1.0, '{"k": 1}'),
    (
        22,
        _t(50000 + 1800) - datetime.timedelta(microseconds=1),
        8,
        "view",
        1.0,
        '{"k": 1}',
    ),
    # user 9: as-of tie fixtures — a purchase at the SAME instant as
    # two simultaneous clicks must match the strictly-earlier click
    # (strict p.ts > c.ts on both engines); the later purchase must
    # collapse the simultaneous-click tie to MAX(value).
    (23, _t(60000), 9, "click", 5.0, '{"k": 1}'),
    (24, _t(60060), 9, "click", 1.0, '{"k": 1}'),
    (25, _t(60060), 9, "click", 9.0, '{"k": 1}'),
    (26, _t(60060), 9, "purchase", 50.0, '{"k": 1}'),
    (27, _t(60120), 9, "purchase", 60.0, '{"k": 1}'),
    # user 10: range-join edge — a click EXACTLY 30 minutes before the
    # purchase is IN (>= on both engines).
    (28, _t(70000), 10, "click", 1.0, '{"k": 1}'),
    (29, _t(70000 + 1800), 10, "purchase", 1.0, '{"k": 1}'),
    # user 11: RANGE-frame edges for the sequence pattern — click
    # EXACTLY SEQ_CLICK_WINDOW_S (600 s) after the view is IN
    # (inclusive frame end on both engines); purchase EXACTLY
    # SEQ_PURCHASE_WINDOW_S (3600 s) after the view is IN; a click at
    # the view's own second is OUT (frame starts at 1 FOLLOWING).
    (30, _t(75000), 11, "view", 1.0, '{"k": 1}'),
    (31, _t(75000 + 600), 11, "click", 1.0, '{"k": 1}'),
    (32, _t(75000 + 3600), 11, "purchase", 1.0, '{"k": 1}'),
    (33, _t(76000), 11, "view", 1.0, '{"k": 1}'),
    (34, _t(76000), 11, "click", 1.0, '{"k": 1}'),
    # users 12/13/14: interval-overlap edges — user 12's session
    # [80000, 80300] TOUCHES user 13's [80300, 80600] (zero-length
    # intersection, strictly-positive overlap excludes it on both
    # engines) while user 14's [80200, 80500] genuinely overlaps both.
    (35, _t(80000), 12, "view", 1.0, '{"k": 1}'),
    (36, _t(80300), 12, "view", 1.0, '{"k": 1}'),
    (37, _t(80300), 13, "view", 1.0, '{"k": 1}'),
    (38, _t(80600), 13, "view", 1.0, '{"k": 1}'),
    (39, _t(80200), 14, "view", 1.0, '{"k": 1}'),
    (40, _t(80500), 14, "view", 1.0, '{"k": 1}'),
    # user 15: calendar-edge fixtures — an event EXACTLY at midnight
    # (day-bucket boundary on both engines' CAST AS DATE), one exactly
    # 24 h later (consecutive-day streak edge for islands/retention),
    # then a 2-day gap that must break the streak
    (41, _t(43200), 15, "view", 1.0, '{"k": 1}'),        # Jan 11 00:00:00
    (42, _t(43200 + 86400), 15, "view", 1.0, '{"k": 1}'),  # Jan 12 00:00:00
    (43, _t(43200 + 3 * 86400), 15, "click", 1.0, '{"k": 1}'),  # Jan 14
]

EDGE_EVENT_QUERIES = [
    "events_hourly",
    "events_sliding_windows",
    "events_session_window",
    "sessionize_users",
    "rolling_1h_user_value",
    "events_gapfill_ffill",
    "dedup_latest_event",
    "window_events",
    "json_events",
    "variant_props_stats",
    "null_semantics_events",
    "user_decay_score",
    "events_multires_rollup",
    "daily_active_users_cumulative",
    "events_incremental_hourly_merge",
    "topk_per_group",
    "scd2_user_state",
    "cohort_retention",
    # round-3 mining additions (event-shaped)
    "events_markov_transitions",
    "events_hourly_anomalies",
    "events_pivot_hourly_types",
    "attribution_first_last_touch",
    # round-3 quality additions (event-shaped): NULL user_id must form
    # its own EWMA group but drop out of the CMS probe join (NULL never
    # equi-joins) on BOTH engines
    "ewma_user_value_recent",
    "sketch_cms_user_counts",
    "psi_value_drift_by_type",
    "bitmap_user_activity_days",
    "time_weighted_value_per_user",
    "rolling_7d_distinct_users",
    # NULL user_id is filtered before the bitmap construct on both
    # engines; days with views but no purchases hit the COALESCE path
    "bitmap_audience_overlap",
    # continuation additions (event-shaped): NULL event_type forms its
    # own dense-spine series that can never equi-join its rollup rows
    # (NULL != NULL on both engines); NULL users are excluded from the
    # KMV sketch on both sides; the sequence string skips NULL
    # initials in both array_join and string_agg
    "acf_hourly_events",
    "event_seq_regex",
    "approx_users_kmv_mergeable",
    "udf_cogroup_merge_arrow",
    "udf_grouped_mad_arrow",
    "events_session_dynamic_gap",
    "pit_join_event_states",
    "xml_roundtrip_events",
    "islands_user_activity_streaks",
    "fano_burstiness_by_type",
    "hazard_view_to_purchase",
    "abtest_conversion_ztest",
    "cohort_ltv_curve",
    "events_dow_hour_profile",
    "bot_rate_audit",
    # continuation batch (event-shaped): NULL users drop out of the
    # interval sweep; NULL types out of the DP scopes; the 25-hour
    # trend window never fills on a 2-hour fixture (0 rows on BOTH
    # sides is the agreed answer); trigrams need 3+ events per user
    "interval_union_coverage",
    "dp_noisy_event_counts",
    "seasonal_decompose_hourly",
    "event_trigram_paths",
    # split-then-stitch must reproduce the plain sessionization on
    # same-second ties, NULL users, and the session-gap boundary
    "sessionize_two_level_stitch",
    # malformed, json-null, and NULL payloads must be excluded
    # identically by Spark's NULL-keys and the oracle's json_valid/
    # json_type guard
    "json_schema_drift_weekly",
    # inference batch: the NULL user hashes to a NULL variant that
    # groups alone but never equi-joins its crossing row (both
    # engines); the 2-hour fixture cannot cross a Wald boundary
    "sprt_conversion_hourly",
    # 2 occupied hours in a 256-leaf pyramid: all energy concentrates
    # where the pair boundary falls; zero-fill must agree end to end
    "haar_energy_hourly",
    # r7 boundary-semantics audit: as-of ties (same-instant and
    # simultaneous-click MAX collapse), range-join interval edges
    # (exactly-at-window in, same-instant out), RANGE-frame edges
    # (exactly at 600 s / 3600 s FOLLOWING), and touching-interval
    # session overlaps — all planted in EDGE_EVENTS users 9-14
    "asof_join_purchase_click",
    "range_join_click_burst",
    "seq_pattern_conversion",
    "session_overlap_topk",
    # the planted-exact-gap twin must also hold on a corpus that
    # ALREADY contains exact-boundary pairs (double-planting)
    "events_session_boundary_fixture",
    # r7 full enrollment: every remaining events-only oracle query
    "pacf_hourly_events",
    "hurst_rs_hourly",
    "watermark_lateness_audit",
    "ucb1_variant_replay",
    "hll_register_census_users",
    "mase_seasonal_naive_hourly",
    "ccf_event_types_hourly",
    "funnel_view_click_purchase",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("edge-events"))
    (
        spark.createDataFrame(
            EDGE_EVENTS,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "events.parquet"))
    )
    yield d
    release_scope(d)


@pytest.fixture(scope="module")
def edge_events_duck(edge_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_events_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_event_query_matches_oracle_on_edge_events(
    name, spark, edge_events_dir, edge_events_duck
):
    """This variant of the harness caught DuckDB's json_extract
    throwing on malformed JSON (vs Spark's NULL) and Spark's FAILFAST
    parse_json — both sides now treat unparseable payloads as NULL."""
    q = all_queries()[name]
    sdf = q.fn(spark, edge_events_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = edge_events_duck.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row counts differ"
    assert normalize(s_rows, sdf.columns) == normalize(o_rows, o_cols), (
        f"{name}: values differ on the edge events"
    )


# ---------------------------------------------------- edge embeddings

import random

_D = 64


def _vec(seed: int, scale: float = 0.3) -> list:
    rnd = random.Random(seed)
    return [rnd.uniform(-scale, scale) for _ in range(_D)]


# zero vector (zero norm), NULL embedding, exact duplicate pair,
# constant vector, near-zero norm, exact antipode.
EDGE_EMBEDDINGS = [
    (0, [0.0] * _D, 0),
    (1, None, 0),
    (2, _vec(2), 1),
    (3, _vec(3), 1),
    (4, _vec(2), 2),
    (5, [0.5] * _D, 2),
    (6, _vec(6, 1e-6), 0),
    (7, _vec(7), 1),
    (8, _vec(8), 2),
    (9, [-x for x in _vec(2)], 0),
]

EDGE_EMBEDDING_QUERIES = [
    "similarity_topk_cosine",
    "dedup_embedding_cosine",
    "embedding_label_centroids",
    "embedding_array_stats",
    "embedding_quantize_int8",
    "embedding_gram_matrix",
    # round-5 additions: the whole converted iterative/ANN family runs
    # against its unrolled-SQL oracle on the edge vectors too — this
    # caught the NULL-seed centroid ordering divergence (Spark windows
    # default NULLS FIRST vs DuckDB NULLS LAST) and the un-guarded
    # zero-norm cosine in the LSH/IVF paths.
    "kmeans_assign_cells",
    "kmeans_cell_profile",
    "dedup_semantic_cells",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_ivf_kmeans",
    "similarity_topk_pq",
    # r7 full enrollment: the last embeddings-only oracle query
    "pca_top_component_power",
]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("edge-embeddings"))
    (
        spark.createDataFrame(
            EDGE_EMBEDDINGS, "vec_id long, embedding array<float>, label int"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "embeddings.parquet"))
    )
    yield d
    release_scope(d)


@pytest.fixture(scope="module")
def edge_emb_duck(edge_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_emb_dir}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EDGE_EMBEDDING_QUERIES)
def test_embedding_query_matches_oracle_on_edge_vectors(
    name, spark, edge_emb_dir, edge_emb_duck
):
    """This variant caught ANSI divide-by-zero on zero-norm cosine,
    the NULL-array posexplode-vs-zipped-unnest asymmetry in centroids,
    and np.stack crashing on NULL in the gram matrix — cosine-family
    queries now share an explicit valid-vector predicate."""
    q = all_queries()[name]
    sdf = q.fn(spark, edge_emb_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = edge_emb_duck.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row counts differ"
    assert normalize(s_rows, sdf.columns) == normalize(o_rows, o_cols), (
        f"{name}: values differ on the edge embeddings"
    )


# -------------------------------------------------- edge star schema

# Referential and value extremes over the TPC-H-ish tables: a region
# with no nations, a nation with a dangling region, a NULL market
# segment, dangling customer/order/part/supplier keys, an order with
# no lineitems, zero prices/quantities, a 100% discount, negative
# account balances, and a leap-day order date.

_EDGE_STAR = {
    "region": (
        [(0, "ASIA"), (1, "EMPTYREGION")],
        "r_regionkey int, r_name string",
    ),
    "nation": (
        [(0, "JAPAN", 0), (1, "CHINA", 0), (2, "NOWHERE", 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    ),
    "customer": (
        [
            (1, "Customer#1", 0, 1000.0, "FURNITURE"),
            (2, "Customer#2", 1, -50.0, "AUTO"),
            (3, "Customer#3", 0, 0.0, "FURNITURE"),
            (4, "Customer#4", 2, 500.0, None),
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ),
    "supplier": (
        [(1, "Supplier#1", 0, 100.0), (2, "Supplier#2", 1, -10.0), (3, "Supplier#3", 2, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
    "part": (
        [
            (1, "widget alpha", "Brand#1", "SMALL PLATED widget", 5, 100.0),
            (2, "gadget beta", "Brand#2", "PROMO BRUSHED gadget", 50, 0.0),
            (3, "orphan gamma", "Brand#1", "LARGE POLISHED thing", 1, 10.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ),
    "orders": (
        [
            (100, 1, "O", 0.0, datetime.datetime(1998, 1, 1), "1-URGENT"),
            (101, 1, "F", 200.0, datetime.datetime(1995, 6, 15), "5-LOW"),
            (102, 2, "O", 300.0, datetime.datetime(1998, 3, 3), "2-HIGH"),
            (103, 999, "F", 50.0, datetime.datetime(1997, 1, 1), "3-MEDIUM"),
            (104, 3, "P", 150.0, datetime.datetime(1996, 2, 29), "1-URGENT"),
            (105, 2, "O", 75.0, datetime.datetime(1998, 5, 5), "4-NOT SPECIFIED"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ),
    "lineitem": (
        [
            (100, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", datetime.datetime(1998, 1, 5)),
            (101, 1, 1, 1, 10.0, 100.0, 1.0, 0.08, "R", "F", datetime.datetime(1995, 7, 1)),
            (101, 2, 2, 2, 5.0, 50.0, 0.05, 0.0, "A", "F", datetime.datetime(1995, 7, 2)),
            (102, 2, 2, 1, 3.0, 30.0, 0.10, 0.04, "N", "O", datetime.datetime(1998, 3, 10)),
            (103, 1, 3, 1, 7.0, 70.0, 0.02, 0.01, "R", "F", datetime.datetime(1997, 2, 1)),
            (999, 2, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime.datetime(1998, 1, 1)),
            (102, 999, 999, 2, 2.0, 20.0, 0.0, 0.0, "N", "O", datetime.datetime(1998, 3, 11)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ),
}

EDGE_STAR_QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "topk_customers", "semi_anti_join", "set_ops_custkeys",
    "date_agg_orders", "math_lineitem", "agg_distinct_stats",
    "rollup_orders", "percentiles_lineitem", "string_part_stats",
    "q2_min_offer_supplier", "q4_order_priority", "q7_nation_volume",
    "q8_market_share", "q9_nation_profit", "q10_returned_items",
    "q11_important_parts", "q12_delay_priority", "q13_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_variety",
    "q18_large_orders", "q19_disjunctive_revenue", "q20_dominant_suppliers",
    "q21_waiting_suppliers", "q22_idle_customers", "correlated_subquery_q17",
    "exists_high_value_parts", "cube_orders", "pivot_status_by_priority",
    "unpivot_lineitem_measures", "sql_q6_discount_revenue",
    "full_outer_nation_activity", "set_ops_multiset", "grouping_sets_revenue",
    "stats_quantity_price", "histogram_totalprice", "second_richest_per_nation",
    "window_rank_suite", "merge_upsert_orders", "ntile_price_bands",
    "profile_orders_columns", "outlier_orders_robust_z",
    "fuzzy_match_customer_supplier", "pagerank_customer_supplier",
    # round-3 mining additions (star-shaped)
    "regr_qty_price_by_nation", "triangle_parts_coorder",
    "hits_customer_part", "rfm_customer_segments",
    "pareto_revenue_parts", "zorder_orders_locality",
    # round-3 quality/graph/window additions (star-shaped): dangling
    # keys, single-order customers (all-NULL lag/lead), <2-order
    # customers (NULL nth_value), zero/negative prices
    "benford_first_digit", "gini_revenue_by_nation",
    "weighted_median_price_by_nation", "bfs_hops_part_coorder",
    "order_cadence_gaps", "equidepth_buckets_orders",
    "integrity_checksum_orders", "dq_constraints_orders",
    "trimmed_mean_price_by_status", "trending_parts_7d",
    "laspeyres_price_index_monthly", "revenue_share_region_nation",
    "mix_shift_avg_order_value",
    "twin_invoice_screen",
    # continuation additions (star-shaped): dangling order custkeys
    # flow through the pseudonymized linkage exactly like the natural
    # join; single-day priorities give a 1-point CUSUM walk; years
    # with no customer overlap yield an empty transition matrix
    # without erroring; the SSSP census is exact on the tiny graph
    "cusum_changepoint_daily",
    "peak_open_orders",
    "backlog_lindley_daily",
    "orders_iso_week_profile",
    "param_sql_high_value_orders",
    "decile_transition_matrix",
    "theil_decomposition_revenue",
    "pseudonymize_linkage",
    "k_anonymity_audit",
    "l_diversity_audit",
    "sssp_weighted_coorder",
    # no customer clears the 9000 balance gate -> empty key set, empty
    # bloom map, empty verified result on both engines
    "bloom_semi_join_orders",
    # continuation batch (star-shaped): log-bucket sketch, bootstrap
    # weights, IVM delta algebra, and NTILE layouts on a 5-row orders
    # fixture with dangling custkeys
    "ddsketch_price_quantiles",
    "bootstrap_ci_order_value",
    "ivm_join_orders_customers",
    "zonemap_skipping_audit",
    # two-pass selection on a 5-row fixture: every bucket is its own
    # residual-rank case
    "exact_median_twopass",
    # drift predicates miss every fixture key -> the replica is
    # identical and both levels must report zero mismatches
    "merkle_bucket_diff_orders",
    # 5-key ring: the packed-argmin assignment and mod-N census must
    # agree exactly even when some shards own zero keys
    "consistent_hash_rebalance",
    # 4-shard merge over a 5-row fixture: some shards own zero rows
    "ddsketch_merge_by_source",
    # dangling custkeys keep their FD rows; the 999-key order has no
    # lines -> the no_lines reconciliation band is exercised
    "revenue_reconciliation_audit",
]


@pytest.fixture(scope="module")
def edge_star_dir(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("edge-star"))
    for name, (rows, schema) in _EDGE_STAR.items():
        (
            spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"{name}.parquet"))
        )
    yield d
    release_scope(d)


@pytest.fixture(scope="module")
def edge_star_duck(edge_star_dir):
    con = duckdb.connect()
    for t in _EDGE_STAR:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_star_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", EDGE_STAR_QUERIES)
def test_relational_query_matches_oracle_on_edge_star(
    name, spark, edge_star_dir, edge_star_duck
):
    q = all_queries()[name]
    sdf = q.fn(spark, edge_star_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = edge_star_duck.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(o_cols), f"{name}: column names differ"
    assert len(s_rows) == len(o_rows), f"{name}: row counts differ"
    assert normalize(s_rows, sdf.columns) == normalize(o_rows, o_cols), (
        f"{name}: values differ on the edge star schema"
    )


def test_rows_only_compression_queries_survive_edge_corpus(spark, edge_dir):
    """The two deflate-backed rows-only queries have no oracle for the
    parametrized harness above, but they must still survive the edge
    corpus: empty/whitespace/unicode text compresses without error,
    zero-byte docs hit the division guards, and shingle-less docs can
    never become NCD candidates."""
    from eecs_485___mapreduce_spark.queries.dedup import dedup_ncd_verify
    from eecs_485___mapreduce_spark.queries.text import text_compression_census

    census = {r.source: r for r in text_compression_census(spark, edge_dir).collect()}
    assert set(census) == {"srcA", "srcB", "srcC", "srcD", "src0"}
    for r in census.values():
        assert r.comp_bytes > 0 and r.min_doc_ratio_milli >= 0
    # srcA holds the empty + whitespace-only docs: the guard must have
    # kept their per-doc ratios finite (ratio of 0-byte raw is 0/1)
    assert census["srcA"].min_doc_ratio_milli >= 0

    pairs = dedup_ncd_verify(spark, edge_dir).collect()
    for r in pairs:
        assert 0 <= r.ncd_milli <= 400
        assert r.doc_a < r.doc_b
