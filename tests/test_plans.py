"""Physical-plan assertions: the 100 TB design criteria as tests —
filters pushed to the parquet scan, columns pruned, dims broadcast,
no accidental cartesian products."""

from __future__ import annotations

from eecs_485___mapreduce_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    codegen_stage_count,
    physical_plan,
)
from eecs_485___mapreduce_spark.queries.dedup import dedup_minhash_lsh
from eecs_485___mapreduce_spark.queries.reference import grep, wordcount
from eecs_485___mapreduce_spark.queries.relational import (
    q1_pricing_summary,
    q3_top_orders,
    q5_region_revenue,
    topk_per_group,
)

from .conftest import SF_SMALL


def test_q1_filter_pushed_to_scan(spark):
    df = q1_pricing_summary(spark, SF_SMALL)
    assert_pushed_filters(df, "l_shipdate")


def test_topk_per_group_pushes_event_type(spark):
    df = topk_per_group(spark, SF_SMALL)
    assert_pushed_filters(df, "event_type")


def test_wordcount_prunes_columns(spark):
    """The documents scan must read only `text` — a scan reading lang/
    source/n_chars for a words-only query is wrong at any scale."""
    plan = physical_plan(wordcount(spark, SF_SMALL))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "text" in scan
    for unused in ("lang", "source", "n_chars"):
        assert unused not in scan, f"column {unused} not pruned: {scan}"


def test_joins_broadcast_dims(spark):
    assert_broadcast_join(q3_top_orders(spark, SF_SMALL), expect=1)
    assert_broadcast_join(q5_region_revenue(spark, SF_SMALL), expect=2)


def test_no_cartesian_products(spark):
    from eecs_485___mapreduce_spark.queries.advanced import (
        asof_join_purchase_click,
        correlated_subquery_q17,
        range_join_click_burst,
    )
    from eecs_485___mapreduce_spark.queries.dedup import dedup_embedding_cosine

    for q in (
        q3_top_orders,
        q5_region_revenue,
        dedup_minhash_lsh,
        correlated_subquery_q17,
        range_join_click_burst,
        dedup_embedding_cosine,
        asof_join_purchase_click,
    ):
        assert_no_cartesian(q(spark, SF_SMALL))


def test_asof_join_is_window_based(spark):
    """The as-of composition must plan as union + window — no join
    operator at all (a join+argmax formulation would materialize
    per-pair rows and die at scale)."""
    from eecs_485___mapreduce_spark.queries.advanced import asof_join_purchase_click

    plan = physical_plan(asof_join_purchase_click(spark, SF_SMALL))
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_scan_agg_uses_codegen(spark):
    """Codegen subtrees are only visible pre-execution with AQE off
    (AQE hides them behind AdaptiveSparkPlan until runtime)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert codegen_stage_count(q1_pricing_summary(spark, SF_SMALL)) >= 1
        assert codegen_stage_count(grep(spark, SF_SMALL)) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def _plan_counts(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin"),
        "exch": (
            plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition")
        ),
        "plan": plan,
    }


def test_tpch_single_shuffle_join_trees(spark):
    """The Q7/Q8/Q10/Q4 docstrings claim 'dims broadcast, one fact
    shuffle' — pin it so a regression (e.g. a dropped broadcast hint or
    a threshold change) fails loudly rather than silently degrading the
    100 TB plan.

    At sf0.001 every table fits under the auto-broadcast threshold, so
    the threshold-driven pass alone can't distinguish a hinted
    broadcast from a lucky one: the second loop disables the threshold
    (the 100 TB regime, where only HINTED dims broadcast) and asserts
    the hinted BroadcastHashJoin count survives, the single fact-fact
    join is the only shuffled join, and the exchange count is the
    at-scale shape (two SMJ inputs + one aggregation)."""
    from eecs_485___mapreduce_spark.queries.tpch import (
        q4_order_priority,
        q7_nation_volume,
        q8_market_share,
        q9_nation_profit,
        q10_returned_items,
    )

    # Threshold-driven regime (small SF): everything collapses to
    # broadcast joins around a single aggregation exchange.
    for q in (q4_order_priority, q7_nation_volume, q8_market_share, q10_returned_items):
        c = _plan_counts(q(spark, SF_SMALL))
        assert c["exch"] <= 1, f"{q.__name__}: {c['exch']} shuffles\n{c['plan']}"
        assert_no_cartesian(q(spark, SF_SMALL))

    # Hint-only regime (auto-broadcast off = the 100 TB shape).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q, hinted_bhj in (
            (q4_order_priority, 0),  # semi join of two facts: no dims to hint
            (q7_nation_volume, 4),
            (q8_market_share, 4),
            (q9_nation_profit, 3),
            (q10_returned_items, 2),
        ):
            c = _plan_counts(q(spark, SF_SMALL))
            assert c["bhj"] == hinted_bhj, (
                f"{q.__name__}: {c['bhj']} broadcast joins, hinted {hinted_bhj}"
                f"\n{c['plan']}"
            )
            assert c["smj"] == 1, (
                f"{q.__name__}: expected exactly 1 shuffled fact join\n{c['plan']}"
            )
            assert c["exch"] <= 3, f"{q.__name__}: {c['exch']} exchanges\n{c['plan']}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_q19_predicates_push_to_both_scans(spark):
    """Q19's disjunction must decompose: the quantity envelope reaches
    the lineitem scan, the brand/size predicates the part scan."""
    from eecs_485___mapreduce_spark.queries.tpch import q19_disjunctive_revenue

    df = q19_disjunctive_revenue(spark, SF_SMALL)
    plan = physical_plan(df)
    assert "PushedFilters" in plan
    # lineitem scan gets the quantity bounds extracted from the OR
    assert "l_quantity" in plan[plan.index("PushedFilters") :]


def test_sample_fixed_per_source_plans_group_limit(spark):
    """Exact-size per-stratum sampling must plan the running top-K
    (WindowGroupLimit), never a full per-group sort."""
    from eecs_485___mapreduce_spark.queries.pipeline import sample_fixed_per_source

    plan = (
        sample_fixed_per_source(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_dedup_latest_event_single_shuffle_with_group_limit(spark):
    from eecs_485___mapreduce_spark.queries.tpch import dedup_latest_event

    df = dedup_latest_event(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange SinglePartition")
    )
    assert shuffles == 1, plan
    # rn=1 must plan the running-top-1 WindowGroupLimit, not a full sort
    assert "WindowGroupLimit" in plan


def test_multires_rollup_one_scan_one_shuffle(spark):
    """events_multires_rollup claims 'read once, Expand keys, one
    shuffle' — three separate groupBys would show three FileScans."""
    from eecs_485___mapreduce_spark.queries.timeseries import events_multires_rollup

    c = _plan_counts(events_multires_rollup(spark, SF_SMALL))
    assert c["plan"].count("Expand") == 1, c["plan"]
    assert c["exch"] == 1, c["plan"]
    assert c["plan"].count("FileScan") == 1, c["plan"]


def test_repetition_signals_prunes_and_equijoins(spark):
    """The mode computation must reach the join as an equi-join (no
    cartesian), and the documents scan must read only doc_id + text."""
    from eecs_485___mapreduce_spark.queries.text import text_repetition_signals

    df = text_repetition_signals(spark, SF_SMALL)
    assert_no_cartesian(df)
    plan = physical_plan(df)
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    for unused in ("lang", "source", "n_chars"):
        assert unused not in scan, f"column {unused} not pruned: {scan}"


def test_incremental_minhash_equijoins_only(spark):
    from eecs_485___mapreduce_spark.queries.dedup import dedup_incremental_minhash

    assert_no_cartesian(dedup_incremental_minhash(spark, SF_SMALL))


def test_scd2_both_windows_share_one_exchange(spark):
    """scd2_user_state claims lag (change detection) and lead (interval
    close) ride a SINGLE user_id shuffle: same partitioning, same
    order, so Catalyst plans one exchange feeding both Window nodes."""
    from eecs_485___mapreduce_spark.queries.curation import scd2_user_state

    c = _plan_counts(scd2_user_state(spark, SF_SMALL))
    assert c["exch"] == 1, c["plan"]
    assert c["plan"].count("Window") >= 2, c["plan"]


def test_split_census_is_scan_side_single_agg(spark):
    """The split column must be a scan-side projection (no shuffle of
    the corpus to assign splits) — one partial+final agg total."""
    from eecs_485___mapreduce_spark.queries.curation import split_train_val_test

    c = _plan_counts(split_train_val_test(spark, SF_SMALL))
    assert c["exch"] == 1, c["plan"]
    assert c["plan"].count("FileScan") == 1, c["plan"]


def test_mlprep_persist_shared_single_scan(spark):
    """The unigram-LM and manifest pipelines persist their working
    relation (token explode / grouped census) and every downstream
    branch must read it from cache — the printed plan shows one
    InMemoryTableScan per consumer branch, and cold builds
    scan the corpus once. No cartesian anywhere."""
    from eecs_485___mapreduce_spark.functions import release_scope
    from eecs_485___mapreduce_spark.queries.mlprep import (
        text_unigram_logprob,
        training_manifest,
    )
    from eecs_485___mapreduce_spark.queries.text import zipf_coverage_by_source

    release_scope(SF_SMALL)
    try:
        for q, n_cache_reads in (
            # tok -> cnt + scored; the corpus-total branch folded into
            # the vocab rollup in round 9 (total = SUM of cnt), so the
            # third cache pass is gone by design
            (text_unigram_logprob, 2),
            (training_manifest, 3),  # g -> output join, w branch, tot
            (zipf_coverage_by_source, 2),  # tc -> totals, top-k
        ):
            c = _plan_counts(q(spark, SF_SMALL))
            assert c["plan"].count("InMemoryTableScan") == n_cache_reads, (
                f"{q.__name__}\n{c['plan']}"
            )
            assert_no_cartesian(q(spark, SF_SMALL))
        # the zipf top-k must be a running group-limit, not a full sort
        plan = (
            zipf_coverage_by_source(spark, SF_SMALL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan
    finally:
        release_scope(SF_SMALL)


def test_unpivot_single_scan_expand(spark):
    """unpivot must plan as one scan + Expand + one shuffle — never the
    per-measure UNION ALL (3 scans) the oracle uses."""
    from eecs_485___mapreduce_spark.queries.advanced import unpivot_lineitem_measures

    c = _plan_counts(unpivot_lineitem_measures(spark, SF_SMALL))
    assert c["plan"].count("Expand") == 1, c["plan"]
    assert c["plan"].count("FileScan") == 1, c["plan"]
    assert c["exch"] == 1, c["plan"]


def test_runtime_bloom_filter_injects_on_fact_fact_join(spark):
    """100 TB evidence: Q4's orders-semi-lineitem is the engine's
    canonical fact-fact join, and at cluster scale Spark's
    InjectRuntimeFilter should build a bloom filter from the filtered
    orders keys and prune lineitem AT THE SCAN, before the shuffle.
    The stock thresholds (10 GB application-side scan) correctly
    suppress the filter at test scale, so this test lowers them to
    cluster-like ratios and pins that the join SHAPE is eligible — a
    refactor that broke eligibility (e.g. wrapping the join key in a
    non-deterministic expression) would silently forfeit the pruning
    exactly where it matters most."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    from eecs_485___mapreduce_spark.queries.tpch import q4_order_priority

    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        plan = (
            q4_order_priority(spark, SF_SMALL)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_tfidf_tokenizes_once_and_group_limits(spark):
    """The tf relation feeds both the score and the df branch through a
    persist barrier — exactly ONE Generate (tokenize+explode) may
    appear, not one per branch — and the per-doc top-k must plan as
    WindowGroupLimit so only running top-k rows reach the final
    exchange."""
    from eecs_485___mapreduce_spark.functions import release_scope
    from eecs_485___mapreduce_spark.queries.curation import text_tfidf_top_terms

    release_scope(SF_SMALL)  # force a fresh persist so the plan is cold
    try:
        c = _plan_counts(text_tfidf_top_terms(spark, SF_SMALL))
        # both the score branch and the df branch must read tf from the
        # cache (the plan PRINTER expands the cached subtree per use
        # site, so counting Generate strings would double-count; the
        # two InMemoryTableScans are what executes)
        assert c["plan"].count("InMemoryTableScan") == 2, c["plan"]
        assert "WindowGroupLimit" in c["plan"], c["plan"]
    finally:
        release_scope(SF_SMALL)


def test_mining_family_no_cartesian_and_broadcast(spark):
    """The mining module's join discipline: prefix-filtered Jaccard and
    triangle counting are pure equi-joins (candidates proportional to
    bucket occupancy / oriented wedge counts, never all-pairs); the
    OLS regression broadcasts both dims and shuffles the fact once."""
    from eecs_485___mapreduce_spark.queries.mining import (
        events_hourly_anomalies,
        regr_qty_price_by_nation,
    )
    from eecs_485___mapreduce_spark.queries.mining_behavioral import (
        events_markov_transitions,
    )
    from eecs_485___mapreduce_spark.queries.mining_graph import (
        hits_customer_part,
        triangle_parts_coorder,
    )
    from eecs_485___mapreduce_spark.queries.mining_text import (
        dedup_prefix_filter_jaccard,
        text_bigram_surprisal,
        text_distinctive_terms_llr,
    )

    for q in (
        dedup_prefix_filter_jaccard,
        triangle_parts_coorder,
        text_distinctive_terms_llr,
        regr_qty_price_by_nation,
        events_markov_transitions,
        hits_customer_part,
        text_bigram_surprisal,
        events_hourly_anomalies,
    ):
        assert_no_cartesian(q(spark, SF_SMALL))
    assert_broadcast_join(regr_qty_price_by_nation(spark, SF_SMALL), expect=2)


def test_llr_topk_is_window_group_limit(spark):
    """Top-k distinctive terms per source must plan as WindowGroupLimit
    (running top-k per partition), not a full sort of the scored
    (source x term) matrix."""
    from eecs_485___mapreduce_spark.plans import physical_plan
    from eecs_485___mapreduce_spark.queries.mining_text import text_distinctive_terms_llr

    assert "WindowGroupLimit" in physical_plan(
        text_distinctive_terms_llr(spark, SF_SMALL)
    )


def test_quality_family_plan_shapes(spark):
    """The session's statistical-quality operators keep their claimed
    100 TB shapes: EWMA prunes each user's partition to K rows DURING
    the window sort (WindowGroupLimit); the offset-window cadence runs
    all three functions in ONE Window node over ONE exchange; the
    trimmed mean shares one exchange between its two window frames;
    nothing in the family plans a cartesian product."""
    from eecs_485___mapreduce_spark.queries.quality import (
        benford_first_digit,
        bitmap_user_activity_days,
        equidepth_buckets_orders,
        ewma_user_value_recent,
        gini_revenue_by_nation,
        integrity_checksum_orders,
        psi_value_drift_by_type,
        rolling_7d_distinct_users,
        sketch_cms_user_counts,
        trimmed_mean_price_by_status,
        weighted_median_price_by_nation,
    )
    from eecs_485___mapreduce_spark.queries.timeseries import (
        order_cadence_gaps,
        time_weighted_value_per_user,
    )

    ewma = physical_plan(ewma_user_value_recent(spark, SF_SMALL))
    assert "WindowGroupLimit" in ewma, ewma

    cadence = physical_plan(order_cadence_gaps(spark, SF_SMALL))
    assert cadence.count("Window (") == 1, cadence
    assert cadence.count("Exchange (") == 1, cadence

    trimmed = physical_plan(trimmed_mean_price_by_status(spark, SF_SMALL))
    assert trimmed.count("Exchange (") == 1, trimmed

    twa = physical_plan(time_weighted_value_per_user(spark, SF_SMALL))
    assert twa.count("Window (") == 1 and twa.count("Exchange (") == 1, twa

    for q in (
        benford_first_digit,
        gini_revenue_by_nation,
        weighted_median_price_by_nation,
        sketch_cms_user_counts,
        psi_value_drift_by_type,
        bitmap_user_activity_days,
        integrity_checksum_orders,
        rolling_7d_distinct_users,
        equidepth_buckets_orders,
    ):
        assert_no_cartesian(q(spark, SF_SMALL))


def test_rolling_distinct_pushes_user_filter(spark):
    from eecs_485___mapreduce_spark.queries.quality import rolling_7d_distinct_users

    assert_pushed_filters(
        rolling_7d_distinct_users(spark, SF_SMALL), "IsNotNull(user_id)"
    )


def test_pit_join_is_keyed_not_cartesian(spark):
    """The temporal join must plan as a KEYED join (hash/sort-merge on
    user_id with the validity window as a post-join predicate) — a
    planner that saw only the range predicates would fall back to
    BroadcastNestedLoop over the fact stream, which dies at scale."""
    from eecs_485___mapreduce_spark.queries.curation import pit_join_event_states

    plan = physical_plan(pit_join_event_states(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan


def test_global_sort_is_range_partitioned_not_single_window(spark):
    """Total-order sort must scale: the rank must come from a range
    shuffle plus per-partition windows keyed on partition id — never
    from one `ORDER BY` window over the whole relation. The offsets
    prefix-sum window is over <=32 rows (one per partition), which is
    the only unpartitioned window allowed here."""
    from eecs_485___mapreduce_spark.queries.relational import global_sort_orders

    plan = physical_plan(global_sort_orders(spark, SF_SMALL))
    low = plan.lower()
    assert "rangepartitioning" in low, plan
    assert "hashpartitioning(_pid" in low, plan


def test_funnel_single_scan_single_data_shuffle(spark):
    """The funnel's three stage minima chain per-user windows over ONE
    hashpartitioning(user_id) exchange and ONE events scan — the
    join-per-stage form this replaced re-scanned events per stage
    reference. The only other exchange is the constant-size final
    scalar aggregate."""
    from eecs_485___mapreduce_spark.queries.tpch import funnel_view_click_purchase

    plan = physical_plan(funnel_view_click_purchase(spark, SF_SMALL))
    tree = plan.split("\n\n", 1)[0]  # tree section only, not node details
    assert tree.count("Scan parquet") == 1, plan
    assert tree.count("Window") == 3, plan
    assert plan.lower().count("hashpartitioning(user_id") == 1, plan


def test_rtbf_cascade_is_semi_joins_no_cartesian(spark):
    """Every RTBF hop must plan as a LeftSemi join on its FK (never an
    inner join materializing matches, never a cartesian): erased users
    -> events, erased users -> orders, erased orderkeys -> lineitem."""
    from eecs_485___mapreduce_spark.queries.pipeline import rtbf_delete_audit

    plan = physical_plan(rtbf_delete_audit(spark, SF_SMALL))
    assert plan.count("Cartesian") == 0, plan
    tree = plan.split("\n\n", 1)[0]
    # 4 semi joins in the tree: events, orders, and the lineitem hop
    # (whose build side re-plans the orders semi join).
    assert tree.count("LeftSemi") == 4, plan
    assert "Join Inner" not in tree, plan


def test_order_chain_plans_native_union_loop(spark):
    """The recursive-CTE walk must execute through Spark 4's native
    UnionLoop operator (true recursion), not an unrolled union."""
    from eecs_485___mapreduce_spark.queries.graph import order_chain_recursive_cte

    plan = physical_plan(order_chain_recursive_cte(spark, SF_SMALL))
    assert "UnionLoop" in plan, plan
    assert "UnionLoopRef" in plan, plan


def test_temporal_family_plans(spark):
    """Scale shapes of the temporal module: the CUSUM and sweep-line
    argmaxes plan as WindowGroupLimit (running top-1 per partition,
    no per-partition sort materialized); no query in the family plans
    a cartesian product (the ACF spine join is a broadcast of a
    calendar-bounded relation)."""
    from eecs_485___mapreduce_spark.queries.temporal import (
        acf_hourly_events,
        cusum_changepoint_daily,
        decile_transition_matrix,
        event_seq_regex,
        peak_open_orders,
    )

    for q in (
        acf_hourly_events,
        cusum_changepoint_daily,
        decile_transition_matrix,
        event_seq_regex,
        peak_open_orders,
    ):
        assert_no_cartesian(q(spark, SF_SMALL))
    assert "WindowGroupLimit" in physical_plan(cusum_changepoint_daily(spark, SF_SMALL))
    assert "WindowGroupLimit" in physical_plan(peak_open_orders(spark, SF_SMALL))


def test_privacy_family_plans(spark):
    """Privacy family: every query is equi-join + bounded agg — no
    cartesian anywhere; the l-diversity dim join broadcasts."""
    from eecs_485___mapreduce_spark.queries.privacy import (
        k_anonymity_audit,
        l_diversity_audit,
        pseudonymize_linkage,
    )

    for q in (pseudonymize_linkage, k_anonymity_audit, l_diversity_audit):
        assert_no_cartesian(q(spark, SF_SMALL))


def test_sssp_is_equijoin_only(spark):
    """Bellman-Ford rounds must relax via equi-joins on the node key —
    a cartesian in any round would be |V| x |V| at scale."""
    from eecs_485___mapreduce_spark.queries.graph import sssp_weighted_coorder

    assert_no_cartesian(sssp_weighted_coorder(spark, SF_SMALL))


def test_registry_wide_no_cartesian(spark):
    """EVERY registered query must plan without a CartesianProduct —
    the one plan property with no legitimate exception in this engine
    (intentional tiny cross joins all broadcast, so they surface as
    BroadcastNestedLoopJoin, never CartesianProduct). Registry-wide so
    a new query can't regress it unnoticed."""
    from eecs_485___mapreduce_spark.registry import all_queries

    for name, q in all_queries().items():
        plan = physical_plan(q.fn(spark, SF_SMALL))
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


def test_zonemap_audit_rank_is_range_partitioned_not_single_window(spark):
    """Both simulated layouts must derive their file ids from the
    TeraSort-style distributed rank (range shuffle + pid-keyed local
    windows) — never from an NTILE/ORDER BY window pulling the whole
    orders relation through one partition. The only unpartitioned
    windows allowed are the two <=32-row offset prefix sums."""
    from eecs_485___mapreduce_spark.queries.mining_layout import zonemap_skipping_audit

    plan = physical_plan(zonemap_skipping_audit(spark, SF_SMALL))
    low = plan.lower()
    assert low.count("rangepartitioning") >= 2, plan
    assert "hashpartitioning(_pid" in low, plan
    assert "ntile" not in low, plan


def test_inference_family_plans(spark):
    """The inference module's scale discipline: ANOVA/Welch shuffle
    the joined fact ONCE onto the segment key (partial+final agg);
    the JSD term join and the KS support joins are equi-joins (the
    only nested-loop joins are the broadcast-tiny source-pair and
    bounded-bin relations); SPRT aggregates to (variant, hour) before
    any window."""
    from eecs_485___mapreduce_spark.queries.inference import (
        anova_order_value_by_segment,
        isotonic_calibration_langid,
        jsd_source_unigrams,
        ks_doclen_sources,
        sprt_conversion_hourly,
        welch_ttest_building_machinery,
    )

    for q in (
        anova_order_value_by_segment,
        welch_ttest_building_machinery,
        jsd_source_unigrams,
        ks_doclen_sources,
        sprt_conversion_hourly,
        isotonic_calibration_langid,
    ):
        assert_no_cartesian(q(spark, SF_SMALL))

    for q in (anova_order_value_by_segment, welch_ttest_building_machinery):
        c = _plan_counts(q(spark, SF_SMALL))
        assert c["plan"].count("Exchange hashpartitioning(seg") == 1, c["plan"]
    # the JSD term join keys on the term column (hash or sort-merge,
    # never a loop over the vocabulary)
    c = _plan_counts(jsd_source_unigrams(spark, SF_SMALL))
    assert c["bhj"] + c["smj"] >= 1, c["plan"]
    c = _plan_counts(sprt_conversion_hourly(spark, SF_SMALL))
    assert "Exchange hashpartitioning(variant" in c["plan"], c["plan"]


def test_session2_family_plans_cartesian_free(spark):
    """The statistics/eval/recommendation additions must keep the
    no-cartesian discipline (their only crossJoins are broadcast-tiny
    scalar/constant relations: fitted ratios, class stats, discount
    tables, 1-row medians)."""
    from eecs_485___mapreduce_spark.queries.inference_order import (
        conformal_token_interval,
        kaplan_meier_reorder_gaps,
        theilsen_monthly_revenue,
        wasserstein_doclen_sources,
    )
    from eecs_485___mapreduce_spark.queries.mining_graph import (
        itemcf_topk_similar_parts,
    )
    from eecs_485___mapreduce_spark.queries.mlprep_supervised import (
        ivm_agg_retraction_daily,
        naive_bayes_source_confusion,
        padding_waste_batching,
    )
    from eecs_485___mapreduce_spark.queries.temporal import (
        ccf_event_types_hourly,
        mase_seasonal_naive_hourly,
    )
    from eecs_485___mapreduce_spark.queries.text import (
        brier_decomposition_langid,
        threshold_sweep_stopword_en,
    )

    for q in (
        theilsen_monthly_revenue,
        kaplan_meier_reorder_gaps,
        conformal_token_interval,
        wasserstein_doclen_sources,
        itemcf_topk_similar_parts,
        naive_bayes_source_confusion,
        padding_waste_batching,
        ivm_agg_retraction_daily,
        mase_seasonal_naive_hourly,
        ccf_event_types_hourly,
        brier_decomposition_langid,
        threshold_sweep_stopword_en,
    ):
        assert_no_cartesian(q(spark, SF_SMALL))


def test_q17_broadcasts_brand_dim_single_fact_join(spark):
    """Q17's docstring claims the brand dim broadcasts ahead of the
    per-part average (hint-driven, so it survives the 100 TB regime)
    and the threshold probe is the only shuffled join. The brand-
    filtered lineitem subtree appears twice (aggregate input + probe),
    so the hinted broadcast shows up twice — never as a shuffle."""
    from eecs_485___mapreduce_spark.queries.tpch import q17_small_quantity_revenue

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c = _plan_counts(q17_small_quantity_revenue(spark, SF_SMALL))
        assert c["bhj"] == 2, f"brand dim not broadcast\n{c['plan']}"
        assert c["smj"] == 1, f"expected 1 shuffled partkey join\n{c['plan']}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert_no_cartesian(q17_small_quantity_revenue(spark, SF_SMALL))


def test_containment_pairs_never_cross_join(spark):
    """Containment candidates come from the prefix-vs-index equi-join;
    an all-pairs plan would be quadratic in the corpus."""
    from eecs_485___mapreduce_spark.queries.mining_text import dedup_containment_pairs

    assert_no_cartesian(dedup_containment_pairs(spark, SF_SMALL))


def test_quantile_normalize_ranks_are_range_partitioned(spark):
    """Both ranks (within-source and pooled) must come from the
    TeraSort pattern — range shuffle + per-partition-id windows — never
    one ORDER BY window over the whole corpus; the quantile map itself
    must be an equi-join, not a cartesian."""
    from eecs_485___mapreduce_spark.queries.curation import (
        quantile_normalize_doclen,
    )

    df = quantile_normalize_doclen(spark, SF_SMALL)
    plan = physical_plan(df)
    low = plan.lower()
    assert "rangepartitioning" in low, plan
    assert "hashpartitioning(_pid" in low, plan
    assert_no_cartesian(df)


def test_lpa_iteration_is_group_limit_not_full_sort(spark):
    """Each LPA iteration's argmax-label pick must plan the running
    top-1 (WindowGroupLimit), and the iteration joins must never
    degenerate to a cartesian."""
    from eecs_485___mapreduce_spark.queries.graph import lpa_communities_coorder

    df = lpa_communities_coorder(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert_no_cartesian(df)


def test_watermark_audit_running_max_is_range_partitioned(spark):
    """The global arrival-order running max must come from the
    TeraSort-offset pattern (range shuffle + per-partition-id windows
    + broadcast carry), never one ORDER BY window over the corpus."""
    from eecs_485___mapreduce_spark.queries.timeseries import (
        watermark_lateness_audit,
    )

    df = watermark_lateness_audit(spark, SF_SMALL)
    plan = physical_plan(df)
    low = plan.lower()
    assert "rangepartitioning" in low, plan
    assert "hashpartitioning(_pid" in low, plan
    assert_no_cartesian(df)


def test_round4_ops_plan_shapes(spark):
    """Round-4 operators keep their documented shapes: the percolator
    rule catalog broadcasts (never shuffles the token stream twice),
    the FIFO staircase join is a real join (no cartesian), and target
    encoding pays one fact shuffle plus cell-grid rollups only."""
    from eecs_485___mapreduce_spark.queries.audit import fifo_allocation_parts
    from eecs_485___mapreduce_spark.queries.ir import stored_query_matches
    from eecs_485___mapreduce_spark.queries.mlprep_supervised import (
        target_encode_mktsegment,
    )

    perc = stored_query_matches(spark, SF_SMALL)
    assert_no_cartesian(perc)
    c = _plan_counts(perc)
    assert c["bhj"] >= 1, f"rule catalog must broadcast\n{c['plan']}"

    fifo = fifo_allocation_parts(spark, SF_SMALL)
    assert_no_cartesian(fifo)

    enc = target_encode_mktsegment(spark, SF_SMALL)
    plan = _plan_counts(enc)["plan"]
    # the persisted cell grid: all four consumers (cell + category/
    # fold/grand rollups) read the InMemory grid — without the persist
    # barrier each branch re-ran the fact join (plan showed 4 live
    # parquet joins; the remaining Scan parquet strings sit inside the
    # cached relation's definition, not live subtrees)
    assert plan.count("InMemoryTableScan") >= 4, plan


def test_tfidf_unigram_scalar_fold(spark):
    """Round-9 stage-floor fix: the scalar branches (corpus total /
    n_docs) fold into the VOCAB-sized relation, so the big (doc, term)
    side never crosses a nested-loop join and the per-row score is one
    multiply.

    - unigram: the corpus total is a window over the term rollup —
      NO BroadcastNestedLoopJoin anywhere, and the third pass over the
      token relation (the old count(*) branch) is gone.
    - tfidf: the one remaining nested-loop join (n_docs x df) sits on
      the vocab branch BELOW the broadcast — the broadcast relation
      carries the precomputed idf, and the big side crosses exactly
      one BroadcastHashJoin built on the vocab side."""
    import re

    from eecs_485___mapreduce_spark.queries.curation import text_tfidf_top_terms
    from eecs_485___mapreduce_spark.queries.mlprep import text_unigram_logprob

    uni = physical_plan(text_unigram_logprob(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" not in uni, uni
    assert "Window" in uni, uni

    tfidf = physical_plan(text_tfidf_top_terms(spark, SF_SMALL))
    # the fold happened below the join: some projection emits the
    # per-term idf (whichever side the planner decides to broadcast
    # locally — at scale both sides outgrow the threshold and the term
    # join degrades to spill-safe sort-merge)
    assert re.search(r"AS idf#\d+", tfidf), tfidf
    # exactly one nested-loop join survives and it is the vocab-branch
    # scalar attach, not the old big-side one: the score projection
    # multiplies by the folded idf instead of recomputing ln per
    # (doc, term) row
    assert tfidf.count("BroadcastNestedLoopJoin") <= 2, tfidf  # tree+detail
    assert re.search(r"\* idf#\d+", tfidf), tfidf


def test_bootstrap_weight_fold_no_range_join(spark):
    """Round-9 straggler fix: the Poisson-bootstrap replicate fan-out
    is a scan-side Generate (explode of a literal sequence) and the
    weight a folded constant-boundary projection — NOT a 32-row BNLJ
    plus an inequality BNLJ against the threshold table (~9 range
    predicates per fanned row, off codegen). The only nested-loop
    joins left are the two 1-row scalar attaches (point estimate and
    the CI-bound rows), each counted in tree + detail sections."""
    import re

    from eecs_485___mapreduce_spark.queries.mining import (
        bootstrap_ci_order_value,
    )

    plan = physical_plan(bootstrap_ci_order_value(spark, SF_SMALL))
    # catalyst constant-folds sequence(0, 31) into a literal array, so
    # the Generate's explode argument renders as an UnsafeArrayData
    # literal — assert the Generate producing b, not the fold's spelling
    assert re.search(r"explode\(.*\[b#\d+L?\]", plan), plan
    assert plan.count("BroadcastNestedLoopJoin") <= 4, plan
    # the weight fold reaches the plan: a sum of (u32 >= boundary)
    # comparisons projected as w, no join producing it
    assert re.search(r"AS w#\d+", plan), plan


def test_lineage_cuts_and_equidepth_crossing(spark):
    """Round-9 straggler fixes stay fixed:

    - haar/mase/naive_bayes: the bounded intermediate (hour grid /
      hour rollup / model count table) is checkpointed, so the union
      or self-join branches read an RDD — the base-table scan must
      not reappear once per branch in the action-time plan.
    - equidepth: the decile boundaries come from the lag+explode
      crossing form, not a ks-crossJoin fan-out — at most one
      nested-loop join (the 1-row boundary-array attach) survives.
    """
    from eecs_485___mapreduce_spark.queries.mlprep_supervised import (
        naive_bayes_source_confusion,
    )
    from eecs_485___mapreduce_spark.queries.quality import (
        equidepth_buckets_orders,
    )
    from eecs_485___mapreduce_spark.queries.temporal import (
        haar_energy_hourly,
        mase_seasonal_naive_hourly,
    )

    haar = physical_plan(haar_energy_hourly(spark, SF_SMALL))
    assert "Scan parquet" not in haar, haar  # 8 branches read the RDD
    assert haar.count("Scan ExistingRDD") >= 8, haar

    mase = physical_plan(mase_seasonal_naive_hourly(spark, SF_SMALL))
    assert "Scan parquet" not in mase, mase  # 3-way self-join on RDD
    assert mase.count("Scan ExistingRDD") >= 3, mase

    nb = physical_plan(naive_bayes_source_confusion(spark, SF_SMALL))
    # ctab's three consumers (vocab, class totals, delta) read the
    # checkpointed model table; docs itself is NOT materialized, so
    # parquet scans remain — just not one per ctab branch
    assert nb.count("Scan ExistingRDD") >= 3, nb

    eq = physical_plan(equidepth_buckets_orders(spark, SF_SMALL))
    assert eq.count("BroadcastNestedLoopJoin") <= 2, eq  # tree+detail
    assert "explode(sequence(" in eq or "Generate" in eq, eq


def test_bench_headliners_exchange_budgets(spark):
    """Per-query shuffle ceilings for every bench headliner (round-5
    VERDICT Next round #7): a future edit that silently adds an
    exchange must FAIL here instead of only drifting PLANS.md. The
    budgets are the PLANS.md values at round-5 HEAD — the plans the
    audit certified scale-safe. Counting matches
    tools/explain_report.py (`\\bExchange\\b` in the formatted plan,
    so broadcast exchanges count too — a regression from broadcast to
    shuffle join cannot hide)."""
    import re

    from eecs_485___mapreduce_spark.registry import all_queries

    budgets = {
        "asof_join_purchase_click": 2,
        # the CPU-scaling probe: scan -> EXPLICIT full-width
        # repartition (a probe needs every core by definition — this
        # one is unconditional, not the gated fan-out) -> chain work
        # -> partial/final agg. Two Exchange nodes, each counted in
        # tree + detail sections.
        "cpu_probe_lcg": 4,
        "ddsketch_price_quantiles": 10,
        "dedup_exact": 2,
        "dedup_minhash_lsh": 2,
        "embedding_gram_matrix": 2,
        "embedding_quantize_int8": 0,
        "events_hourly": 2,
        "events_sliding_windows": 2,
        "funnel_view_click_purchase": 4,
        "multimodal_frame_sample": 0,
        "q10_returned_items": 2,
        "q1_pricing_summary": 2,
        "q3_top_orders": 2,
        "q5_region_revenue": 2,
        "q7_nation_volume": 2,
        "rolling_1h_user_value": 2,
        "sessionize_two_level_stitch": 4,
        "similarity_topk_cosine": 2,
        # round 9: tfidf/unigram scalar branches fold into the
        # vocab-sized relation (BNLJ off the big path; unigram's third
        # token-relation pass gone) — \bExchange\b counts are unchanged
        # (BroadcastExchange never matched), so ceilings stay; the BNLJ
        # placement is pinned by test_tfidf_unigram_scalar_fold below.
        "text_tfidf_top_terms": 9,
        "text_token_stats": 0,
        "text_unigram_logprob": 6,
        "wordcount": 2,
    }
    reg = all_queries()
    bench_names = {n for n, q in reg.items() if q.bench}
    assert bench_names == set(budgets), (
        "bench set changed — update the exchange budgets: "
        f"missing={sorted(bench_names - set(budgets))} "
        f"stale={sorted(set(budgets) - bench_names)}"
    )
    over = {}
    for name, ceiling in budgets.items():
        plan = physical_plan(reg[name].fn(spark, SF_SMALL))
        n = len(re.findall(r"\bExchange\b", plan))
        if n > ceiling:
            over[name] = (n, ceiling)
    assert not over, f"exchange budgets exceeded (got, ceiling): {over}"


# ----------------- single-partition window budget (r7 verdict #5)
#
# 2,391 WindowExec single-partition WARNs per full driver mimic means
# a NEW unbounded Window.orderBy() would drown in audited noise. Two
# gates make it loud instead:
#  - a SOURCE gate: every `Window.orderBy(` site in the package is
#    pinned per file; an unaudited addition fails until it is
#    consciously enrolled here (each of the 33 r6-audited sites
#    operates on a bounded or pre-aggregated relation — see the r6
#    audit trail in SURVEY.md section 6);
#  - a PLAN gate on the bench headliners: the scale-graded queries
#    must plan ZERO single-partition Window nodes, except the pinned
#    ddsketch census window (constant-size bucket relation).


def _top_bracket_groups(line: str) -> list[str]:
    groups, depth, cur = [], 0, None
    for ch in line:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
            else:
                cur += ch
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                cur = None
            else:
                cur += ch
        elif depth >= 1:
            cur += ch
    return groups


def single_partition_windows(plan: str) -> int:
    """Count Window nodes with an ORDER spec but no partition spec.

    Plan-text grammar (probed on Spark 4.1): a Window node renders
    `Window [funcs], [partitionSpec], [orderSpec]`; an unordered
    window drops the order group, an UNPARTITIONED one drops the
    partition group. The partition spec never contains ASC/DESC; the
    order spec always does — so a Window whose every non-function
    group is an order spec runs on Exchange SinglePartition."""
    n = 0
    for raw in plan.splitlines():
        s = raw.strip().lstrip("+-: ").strip()
        if not s.startswith("Window "):
            continue
        rest = _top_bracket_groups(s)[1:]
        if rest and all((" ASC" in r or " DESC" in r) for r in rest):
            n += 1
    return n


def test_single_partition_window_detector_power(spark):
    """The detector must flag a deliberately unpartitioned window over
    raw events (the verdict's scratch-test criterion) and stay quiet
    on partitioned and partitioned-unordered windows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    bad = ev.select(F.row_number().over(Window.orderBy("ts")).alias("rn"))
    assert single_partition_windows(plan_of(bad)) == 1

    good = ev.select(
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts"))
        .alias("rn")
    )
    assert single_partition_windows(plan_of(good)) == 0

    unordered = ev.select(
        F.min("ts").over(Window.partitionBy("user_id")).alias("first_ts")
    )
    assert single_partition_windows(plan_of(unordered)) == 0


def test_bench_headliners_single_partition_window_budget(spark):
    from eecs_485___mapreduce_spark.registry import all_queries

    budget = {"ddsketch_price_quantiles": 1}  # constant-size census
    reg = all_queries()
    over = {}
    for name, q in sorted(reg.items()):
        if not q.bench:
            continue
        plan = q.fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        n = single_partition_windows(plan)
        if n > budget.get(name, 0):
            over[name] = n
    assert not over, (
        "bench headliners grew single-partition windows (count): "
        f"{over} — partition the window or enroll a bounded-relation "
        "exemption here with its audit"
    )


def test_window_orderby_source_sites_are_audited():
    """Static allowlist of `Window.orderBy(` sites per module — the 33
    r6-audited bounded sites. A new site anywhere in the package fails
    until its relation is audited as bounded and the count updated."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "eecs_485___mapreduce_spark"
    audited = {
        "queries/advanced.py": 1,
        "queries/curation.py": 2,
        "queries/inference.py": 1,
        "queries/inference_order.py": 7,
        "queries/ir.py": 4,
        "queries/mining.py": 5,
        "queries/mining_behavioral.py": 4,
        "queries/privacy.py": 1,
        # equidepth_buckets_orders: the cumsum window plus the round-9
        # lag(kmax) crossing window — BOTH over the (distinct value,
        # count) collapsed relation (bounded by the value domain, the
        # documented weighted-median trade), same ordering, one sort.
        "queries/quality.py": 2,
        "queries/quality_sketch.py": 2,
        "queries/similarity.py": 2,
        "queries/temporal.py": 3,
    }
    # the other single-partition form: an explicit empty partitionBy
    # (UNORDERED grand-total window). The audited sites all run over
    # pre-aggregated bounded relations (e.g. region x nation shares,
    # flag x status cells) — cheap at any corpus size.
    audited_empty = {
        "queries/inference.py": 1,
        "queries/inference_order.py": 3,
        # text_unigram_logprob's corpus-total window: runs over the
        # VOCAB-sized term rollup (bounded — term space, not corpus),
        # replacing the old count(*) re-scan of the token relation
        # (OPTIMIZATION_r09).
        "queries/mlprep.py": 1,
        # (the pre-r8 mlprep site was the PCA per-hop norm window; the
        # r8 numpy rewrite removed that windowed loop entirely.)
        "queries/quality.py": 1,
        "queries/relational.py": 1,
    }
    got = {}
    got_empty = {}
    for p in pkg.rglob("*.py"):
        src = p.read_text()
        rel = str(p.relative_to(pkg))
        n = len(re.findall(r"Window\.orderBy\(", src))
        if n:
            got[rel] = n
        n_empty = src.count("partitionBy()")
        if n_empty:
            got_empty[rel] = n_empty
    assert got == audited, (
        "Window.orderBy( sites changed — audit the new site's relation "
        f"(bounded/pre-aggregated?) and update the allowlist: {got}"
    )
    assert got_empty == audited_empty, (
        "empty Window.partitionBy() sites changed — audit the new "
        f"site's relation and update the allowlist: {got_empty}"
    )
