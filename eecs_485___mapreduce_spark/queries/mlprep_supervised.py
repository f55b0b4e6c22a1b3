"""Supervised training prep: contrastive negative-pair mining, the
Naive Bayes source classifier with its confusion census, the
batching padding-waste audit, aggregate-view IVM with retractions,
and leakage-safe K-fold target encoding.

Split out of queries/mlprep.py along its docstring family lines (the
corpus/shuffle/Gram half stays there); the shuffle-shard constants it
shares with the padding audit are imported from there, one source of
truth.

Reference parity: none of these exist in the reference (its query
surface is wordcount + grep, mapreduce/__init__.py); they are
committed ML-prep families from SURVEY.md section 2.B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import (
    dec,
    md5_long,
    md5_long_sql,
    scoped_persist,
    tokens,
    truncate_plan,
)
from ..registry import register
from ..sources import load_table, load_tables

# The padding-waste audit reuses the exact shard/order keys of
# shuffle_shard_assignment, which stays in the corpus-prep half.
from .mlprep import N_SHARDS, _TOKS

# --------------------------------------------- contrastive negatives

# Hash-bucketed negative sampling for contrastive / embedding training:
# each anchor document draws K negatives from ONE deterministic probe
# bucket, so candidate volume is anchors * (corpus / n_buckets) — never
# the all-pairs cross join a naive sampler implies.
NEG_N_ANCHORS = 50
NEG_N_BUCKETS = 16
NEG_K = 4


@register(
    "negative_pair_mining",
    tags=("mlprep", "pipeline", "join", "window"),
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source,
             {md5_long_sql("'neg:' || CAST(doc_id AS VARCHAR)")} AS h,
             {md5_long_sql("'neg:' || CAST(doc_id AS VARCHAR)")} % {NEG_N_BUCKETS} AS bucket
      FROM documents
    ),
    a AS (
      SELECT doc_id, source, (bucket + 1) % {NEG_N_BUCKETS} AS probe
      FROM b ORDER BY h, doc_id LIMIT {NEG_N_ANCHORS}
    ),
    j AS (
      SELECT a.doc_id AS doc_id, c.doc_id AS neg_doc_id, c.source AS neg_source,
             {md5_long_sql("CAST(a.doc_id AS VARCHAR) || ':' || CAST(c.doc_id AS VARCHAR)")} AS ph
      FROM a JOIN b c ON a.probe = c.bucket
      WHERE c.source <> a.source AND c.doc_id <> a.doc_id
    )
    SELECT doc_id, neg_doc_id, neg_source, CAST(rn AS BIGINT) AS neg_rank
    FROM (
      SELECT j.*, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY ph, neg_doc_id) AS rn
      FROM j
    )
    WHERE rn <= {NEG_K}
    ORDER BY doc_id, neg_rank
    """,
)
def negative_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucketed negative sampling: pick
    ``NEG_N_ANCHORS`` anchor documents (smallest md5 rank — an
    unbiased fixed-size sample), and for each anchor mine ``NEG_K``
    negatives from a single probe bucket ((anchor_bucket + 1) mod B),
    requiring a DIFFERENT source so the negatives are plausibly
    semantically unrelated. Per-pair ordering is the md5 of the pair
    id, so the chosen negatives are a pure function of the corpus —
    re-runs and backfills reproduce the same training pairs.

    Determinism: every choice (anchor set, candidate order) is an md5
    rank; no RNG state anywhere.

    Scale (100 TB): the anchor side is bounded (TakeOrdered top-N by
    hash, then broadcast); candidates come from ONE bucket equi-join,
    so the pair stream is |anchors| * corpus / B rows, tuned by B —
    never the |corpus|^2 cross join. The per-anchor top-K is a
    WindowGroupLimit (rank pushed below the sort). To mine hard
    negatives instead of random ones, swap the probe-bucket key for an
    IVF cell id from kmeans_assign_cells — same join shape.

    Reference parity: none — no sampling surface in the reference;
    SURVEY.md section 2.B training-pipeline family.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        md5_long(F.concat(F.lit("neg:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    b = docs.withColumn("bucket", F.col("h") % NEG_N_BUCKETS)
    anchors = (
        b.orderBy("h", "doc_id")
        .limit(NEG_N_ANCHORS)
        .select(
            F.col("doc_id").alias("a_doc_id"),
            F.col("source").alias("a_source"),
            ((F.col("bucket") + 1) % NEG_N_BUCKETS).alias("probe"),
        )
    )
    j = (
        F.broadcast(anchors)
        .join(b, anchors.probe == b.bucket)
        .where((F.col("source") != F.col("a_source")) & (F.col("doc_id") != F.col("a_doc_id")))
        .select(
            F.col("a_doc_id").alias("adoc"),
            F.col("doc_id").alias("neg_doc_id"),
            F.col("source").alias("neg_source"),
            md5_long(
                F.concat_ws(":", F.col("a_doc_id").cast("string"), F.col("doc_id").cast("string"))
            ).alias("ph"),
        )
    )
    w = Window.partitionBy("adoc").orderBy("ph", "neg_doc_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= NEG_K)
        .select(
            F.col("adoc").alias("doc_id"),
            "neg_doc_id",
            "neg_source",
            F.col("rn").cast("long").alias("neg_rank"),
        )
        .orderBy("doc_id", "neg_rank")
    )


# -------------- Naive Bayes source classifier (train -> confusion)

_NB_SPLIT = 90  # curation.SPLIT_TRAIN_PCT: same md5 split key


@register(
    "naive_bayes_source_confusion",
    tags=("stats", "join", "text", "pipeline"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {_TOKS} AS tk,
             {md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS h
      FROM documents
    ),
    train_tok AS (SELECT source, unnest(tk) AS term FROM d
                  WHERE h < {_NB_SPLIT}),
    ctab AS (SELECT source, term, COUNT(*) AS c FROM train_tok GROUP BY 1, 2),
    vocab AS (SELECT COUNT(DISTINCT term) AS v FROM ctab),
    cls AS (
      SELECT t.source, t.tot, p.n_s, p.n_train, vocab.v,
             CAST(ROUND(1000 * ln(1.0 / (t.tot + vocab.v))) AS BIGINT)
                 AS oov_milli,
             CAST(ROUND(1000 * ln(CAST(p.n_s AS DOUBLE) / p.n_train))
                  AS BIGINT) AS prior_milli
      FROM (SELECT source, SUM(c) AS tot FROM ctab GROUP BY 1) t
      JOIN (SELECT source, COUNT(*) AS n_s,
                   SUM(COUNT(*)) OVER () AS n_train
            FROM d WHERE h < {_NB_SPLIT} GROUP BY 1) p USING (source),
           vocab
    ),
    delta AS (SELECT source, term,
                     CAST(ROUND(1000 * ln(CAST(c + 1 AS DOUBLE))) AS BIGINT)
                         AS d_milli
              FROM ctab),
    test AS (SELECT doc_id, source AS actual, tk,
                    CAST(len(tk) AS BIGINT) AS t_doc
             FROM d WHERE h >= {_NB_SPLIT}),
    dt AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS k
           FROM (SELECT doc_id, unnest(tk) AS term FROM test) GROUP BY 1, 2),
    known AS (
      SELECT dt.doc_id, delta.source,
             CAST(SUM(dt.k * delta.d_milli) AS BIGINT) AS known_milli
      FROM dt JOIN delta ON dt.term = delta.term GROUP BY 1, 2
    ),
    scored AS (
      SELECT test.doc_id, test.actual, cls.source,
             COALESCE(known.known_milli, 0)
               + test.t_doc * cls.oov_milli + cls.prior_milli AS score
      FROM test CROSS JOIN cls
      LEFT JOIN known ON known.doc_id = test.doc_id
                     AND known.source = cls.source
    ),
    pred AS (
      SELECT doc_id, actual, source AS predicted FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, source) AS rn
        FROM scored) WHERE rn = 1
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def naive_bayes_source_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial Naive Bayes classifier (add-1 smoothing) on
    the deterministic 90% md5 document split and report the held-out
    CONFUSION MATRIX of predicted vs actual source — distributed
    supervised model training as ONE aggregation (the per-class token
    table IS the model), the real shape of large-scale NB/quality-
    classifier training.

    Determinism lane: each (class, term) weight collapses to
    ``round(1000*ln(c+1))`` milli-nats (the lp − oov identity: with
    add-1 smoothing, a zero-count class differs from a counted one by
    exactly ln(c+1)), so every document score is an exact BIGINT
    ``Σ k·Δ + T_doc·oov(s) + prior(s)`` and the argmax compares
    integers with a class-name tie-break.

    Scale (100 TB): training is one (class, term) shuffle with map-side
    combine (model size = vocabulary x classes, independent of corpus
    rows); scoring joins per-doc term COUNTS (not raw tokens) to the
    model on the term key, and the per-(doc, class) assembly is a
    broadcast of the |classes|-row stats relation — a 20x linear
    fan-out of the test DOC relation, never of the token stream.
    Reference parity: none; SURVEY.md section 2.B training-pipeline
    family.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        tokens("text").alias("tk"),
        F.pmod(
            md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            F.lit(100),
        ).alias("h"),
    )
    train = docs.where(F.col("h") < _NB_SPLIT)
    train_tok = train.select("source", F.explode("tk").alias("term"))
    # truncate_plan (round-9): ctab feeds three branches (vocab, the
    # class totals, delta) — without the cut the train tokenize +
    # (class, term) shuffle ran three times per invocation. ctab is
    # MODEL-sized (vocabulary x classes), bounded at any corpus scale;
    # the corpus-sized docs/tok relations are deliberately NOT
    # materialized.
    ctab = (
        train_tok.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(truncate_plan)
    )
    vocab = ctab.agg(F.countDistinct("term").alias("v"))
    priors = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    cls = (
        ctab.groupBy("source")
        .agg(F.sum("c").alias("tot"))
        .join(priors, "source")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_train))
        .select(
            "source",
            F.round(1000 * F.log(1.0 / (F.col("tot") + F.col("v"))))
            .cast("bigint")
            .alias("oov_milli"),
            F.round(
                1000 * F.log(F.col("n_s").cast("double") / F.col("n_train"))
            )
            .cast("bigint")
            .alias("prior_milli"),
        )
    )
    delta = ctab.select(
        "source",
        "term",
        F.round(1000 * F.log((F.col("c") + 1).cast("double")))
        .cast("bigint")
        .alias("d_milli"),
    )
    test = docs.where(F.col("h") >= _NB_SPLIT).select(
        "doc_id",
        F.col("source").alias("actual"),
        "tk",
        F.size("tk").cast("bigint").alias("t_doc"),
    )
    dt = (
        test.select("doc_id", F.explode("tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    known = (
        dt.join(delta, "term")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("k") * F.col("d_milli")).cast("bigint").alias("known_milli"))
    )
    scored = (
        test.drop("tk")
        .crossJoin(F.broadcast(cls))
        .join(known, ["doc_id", "source"], "left")
        .select(
            "doc_id",
            "actual",
            "source",
            (
                F.coalesce("known_milli", F.lit(0))
                + F.col("t_doc") * F.col("oov_milli")
                + F.col("prior_milli")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "source")
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("actual", F.col("source").alias("predicted"))
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


# --------------- batching padding-waste census (random vs sorted)

PAD_BATCH = 8  # sequences per batch


@register(
    "padding_waste_batching",
    tags=("pipeline", "window", "agg"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tok,
             {md5_long_sql("'shard:' || CAST(doc_id AS VARCHAR)")}
                 % {N_SHARDS} AS shard,
             {md5_long_sql("'order:' || CAST(doc_id AS VARCHAR)")} AS ord
      FROM documents
    ),
    strat AS (
      SELECT 'random' AS strategy, shard, n_tok,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id)
                 AS pos
      FROM d
      UNION ALL
      SELECT 'length_sorted', shard, n_tok,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY n_tok, ord, doc_id)
      FROM d
    ),
    batches AS (
      SELECT strategy, shard, (pos - 1) // {PAD_BATCH} AS batch,
             COUNT(*) AS bsz,
             CAST(SUM(n_tok) AS BIGINT) AS used,
             CAST(MAX(n_tok) AS BIGINT) AS mx
      FROM strat GROUP BY 1, 2, 3
    )
    SELECT strategy,
           CAST(COUNT(*) AS BIGINT)                 AS n_batches,
           CAST(SUM(used) AS BIGINT)                AS real_tokens,
           CAST(SUM(bsz * mx - used) AS BIGINT)     AS pad_tokens,
           CAST(ROUND(1000.0 * SUM(used)
                      / SUM(bsz * mx)) AS BIGINT)   AS utilization_milli
    FROM batches GROUP BY strategy ORDER BY strategy
    """,
)
def padding_waste_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste census of fixed-size-{b} training batches under
    the two standard batching orders: the deterministic md5 shuffle
    (``random``) vs length-sorted within each shard
    (``length_sorted`` — the bucketing trick every large-scale trainer
    uses). Each batch pads to its longest member; utilization = real
    tokens / padded slots. The delta between the two rows IS the
    measured value of length bucketing on this corpus.

    Scale (100 TB): both orders derive from the SAME deterministic
    shard/order keys as shuffle_shard_assignment (pure md5 of doc_id —
    reproducible across re-runs/backfills); every window is
    PARTITIONED BY shard (never a global sort), so per-partition state
    is corpus/{ns} and the census is one partial+final agg on
    (strategy, shard, batch). Reference parity: none;
    SURVEY.md section 2.B training-pipeline family.
    """.format(b=PAD_BATCH, ns=N_SHARDS)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("n_tok"),
        F.pmod(
            md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(N_SHARDS),
        ).alias("shard"),
        md5_long(F.concat(F.lit("order:"), F.col("doc_id").cast("string"))).alias(
            "ord"
        ),
    )
    w_rand = Window.partitionBy("shard").orderBy("ord", "doc_id")
    w_sort = Window.partitionBy("shard").orderBy("n_tok", "ord", "doc_id")
    strat = docs.select(
        F.lit("random").alias("strategy"),
        "shard",
        "n_tok",
        F.row_number().over(w_rand).alias("pos"),
    ).unionByName(
        docs.select(
            F.lit("length_sorted").alias("strategy"),
            "shard",
            "n_tok",
            F.row_number().over(w_sort).alias("pos"),
        )
    )
    batches = strat.groupBy(
        "strategy", "shard", ((F.col("pos") - 1) / PAD_BATCH).cast("long").alias("batch")
    ).agg(
        F.count(F.lit(1)).alias("bsz"),
        F.sum("n_tok").cast("bigint").alias("used"),
        F.max("n_tok").cast("bigint").alias("mx"),
    )
    return (
        batches.groupBy("strategy")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_batches"),
            F.sum("used").cast("bigint").alias("real_tokens"),
            F.sum(F.col("bsz") * F.col("mx") - F.col("used"))
            .cast("bigint")
            .alias("pad_tokens"),
            F.round(
                1000.0 * F.sum("used") / F.sum(F.col("bsz") * F.col("mx"))
            )
            .cast("bigint")
            .alias("utilization_milli"),
        )
        .orderBy("strategy")
    )


# ---------- aggregate-view IVM with retractions (insert + DELETE)

_IVM_R_INS = md5_long_sql("'ivmins:' || CAST(o_orderkey AS VARCHAR)") + " % 20 = 0"
_IVM_R_DEL = md5_long_sql("'ivmdel:' || CAST(o_orderkey AS VARCHAR)") + " % 20 = 0"


@register(
    "ivm_agg_retraction_daily",
    tags=("agg", "pipeline", "datetime"),
    oracle=f"""
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders
    WHERE ({_IVM_R_INS})
       OR NOT ({_IVM_R_DEL})
    GROUP BY 1 ORDER BY 1
    """,
)
def ivm_agg_retraction_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-view maintenance WITH RETRACTIONS: the stored daily
    view (base = everything outside the insert batch) absorbs an
    insert delta at weight +1 and a DELETE delta at weight −1 through
    one weighted re-aggregation; days whose count reaches zero drop
    out. The DuckDB oracle computes the final state DIRECTLY (filter,
    no delta algebra), so a green driver row certifies the retraction
    rule — the half of IVM the append-only merge
    (events_incremental_hourly_merge) doesn't cover, and the batch
    form of the txnlog change-feed count-view rule
    (txnlog.apply_changes_to_count_view).

    Scale (100 TB): each maintenance cycle aggregates ONLY the arriving
    insert/delete batches (pushed-down predicate scans here, standing
    in for the change feed) and merges |days|-sized partials — never a
    history rescan. COUNT and SUM(cents) are algebraic: merge =
    component-wise signed sum, exact in BIGINT.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.pmod(
                md5_long(F.concat(F.lit("ivmins:"), F.col("o_orderkey").cast("string"))),
                F.lit(20),
            )
            == 0
        ).alias("is_ins"),
        (
            F.pmod(
                md5_long(F.concat(F.lit("ivmdel:"), F.col("o_orderkey").cast("string"))),
                F.lit(20),
            )
            == 0
        ).alias("is_del"),
    )

    def agg_w(part, w):
        return part.groupBy("day").agg(
            (F.count(F.lit(1)) * w).alias("n_orders"),
            (F.sum("cents") * w).alias("cents"),
        )

    base_view = agg_w(orders.where(~F.col("is_ins")), 1)  # the stored view
    d_ins = agg_w(orders.where("is_ins"), 1)
    d_del = agg_w(orders.where(F.col("is_del") & ~F.col("is_ins")), -1)
    return (
        base_view.unionByName(d_ins)
        .unionByName(d_del)
        .groupBy("day")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .where(F.col("n_orders") > 0)
        .orderBy("day")
    )


# --------------------- leakage-safe K-fold target encoding

TENC_FOLDS = 5
TENC_SMOOTH = 100  # m-estimate pseudo-count


@register(
    "target_encode_mktsegment",
    tags=("mlprep", "agg", "join"),
    oracle=f"""
    WITH j AS (
      SELECT c_mktsegment AS seg,
             CAST(o_totalprice AS DECIMAL(18,2)) AS t,
             {md5_long_sql("'enc:' || CAST(o_orderkey AS VARCHAR)")}
               % {TENC_FOLDS} AS fold
      FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    cell AS (SELECT seg, fold, COUNT(*) AS n, SUM(t) AS s
             FROM j GROUP BY 1, 2),
    cat AS (SELECT seg, SUM(n) AS n_cat, SUM(s) AS s_cat
            FROM cell GROUP BY 1),
    ftot AS (SELECT fold, SUM(n) AS n_fold, SUM(s) AS s_fold
             FROM cell GROUP BY 1),
    tot AS (SELECT SUM(n) AS n_tot, SUM(s) AS s_tot FROM cell)
    SELECT seg AS c_mktsegment,
           CAST(fold AS BIGINT) AS fold,
           CAST(n AS BIGINT) AS n_infold,
           CAST(n_cat - n AS BIGINT) AS n_oof,
           ROUND(CAST(s_cat - s AS DOUBLE) / (n_cat - n), 6) AS oof_mean,
           ROUND((CAST(s_cat - s AS DOUBLE)
                  + {TENC_SMOOTH}.0
                    * (CAST(s_tot - s_fold AS DOUBLE) / (n_tot - n_fold)))
                 / (n_cat - n + {TENC_SMOOTH}.0), 6) AS oof_mean_smoothed
    FROM cell JOIN cat USING (seg) JOIN ftot USING (fold) CROSS JOIN tot
    """,
)
def target_encode_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold target encoding of the customer market
    segment against order value: each fold's encoding uses ONLY the
    other folds' rows — out-of-fold category mean plus the m-estimate
    smoothed variant (pseudo-count {m} toward the out-of-fold GLOBAL
    mean) — the standard high-cardinality categorical feature without
    target leakage (fold assignment = salted md5 of the order key, a
    pure function of the data).

    Exactness: every sum is DECIMAL-exact and the out-of-fold values
    are algebraic complements (category total minus in-fold cell,
    grand total minus fold total) — NO second pass over excluded rows;
    the two final ratios are identical double expressions rounded to
    1e-6 on both engines.

    Scale (100 TB): ONE shuffle builds the (category, fold) cell
    grid; category, fold, and grand totals are rollups of the
    |categories| x K cells, never the fact stream; the encode-time
    join back to rows is a broadcast of that same tiny grid. Adding
    folds or categories never adds fact passes.
    """.format(m=TENC_SMOOTH)
    t = load_tables(spark, sf_dir, "orders", "customer")
    j = t["orders"].join(
        t["customer"], F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_mktsegment").alias("seg"),
        dec("o_totalprice").alias("t"),
        (
            md5_long(F.concat(F.lit("enc:"), F.col("o_orderkey").cast("string")))
            % TENC_FOLDS
        ).alias("fold"),
    )
    # The cell grid feeds FOUR consumers (itself + category/fold/grand
    # rollups); without the persist barrier Catalyst re-runs the fact
    # join once per branch — four corpus passes instead of one.
    cell = scoped_persist(
        ("tenc.cell", sf_dir),
        j.groupBy("seg", "fold").agg(
            F.count(F.lit(1)).alias("n"), F.sum("t").alias("s")
        ),
    )
    cat = cell.groupBy("seg").agg(
        F.sum("n").alias("n_cat"), F.sum("s").alias("s_cat")
    )
    ftot = cell.groupBy("fold").agg(
        F.sum("n").alias("n_fold"), F.sum("s").alias("s_fold")
    )
    tot = cell.agg(F.sum("n").alias("n_tot"), F.sum("s").alias("s_tot"))
    oof_mean = F.round(
        (F.col("s_cat") - F.col("s")).cast("double")
        / (F.col("n_cat") - F.col("n")),
        6,
    )
    prior = (F.col("s_tot") - F.col("s_fold")).cast("double") / (
        F.col("n_tot") - F.col("n_fold")
    )
    smoothed = F.round(
        (
            (F.col("s_cat") - F.col("s")).cast("double")
            + F.lit(float(TENC_SMOOTH)) * prior
        )
        / (F.col("n_cat") - F.col("n") + F.lit(float(TENC_SMOOTH))),
        6,
    )
    return (
        cell.join(cat, "seg")
        .join(F.broadcast(ftot), "fold")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("fold").cast("long").alias("fold"),
            F.col("n").cast("long").alias("n_infold"),
            (F.col("n_cat") - F.col("n")).cast("long").alias("n_oof"),
            oof_mean.alias("oof_mean"),
            smoothed.alias("oof_mean_smoothed"),
        )
    )
