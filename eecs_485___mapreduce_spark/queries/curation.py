r"""Corpus-curation operators: deterministic dataset splitting, TF-IDF
term extraction, embedding quantization, temporal state tracking
(SCD2), and cohort retention.

These round out the training-pipeline surface (SURVEY.md section 2.B,
training-pipeline row) with the curation steps that sit AROUND dedup /
decontamination / packing in a production corpus build:

- **split assignment** decides which shard of the corpus trains,
  validates, and tests — it must be a pure function of a stable key
  (never RNG, never row order) so re-runs, backfills, and incremental
  ingests all land every document in the same split;
- **TF-IDF top terms** is the classic content descriptor used for
  topic-level corpus audits and lightweight relevance filtering;
- **int8 quantization** is what an embedding store actually persists
  at 100 TB — 4x smaller than float32, and the quantization error is
  an auditable quantity;
- **SCD2 state tracking** turns an append-only event log into the
  versioned dimension table (valid_from / valid_to) analytic joins
  want;
- **cohort retention** is the canonical "first-seen vs active"
  engagement matrix.

Scale notes are per-query; the shared discipline is the same as the
rest of the package: pure functions of stable keys, equi-join /
partial-agg shapes only, no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dec, md5_long, md5_long_sql, scoped_persist, tokens, truncate_plan
from ..registry import register
from ..sources import load_table

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"

# ------------------------------------------------------ dataset split

SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5  # test gets the remainder

_SPLIT_EXPR_SQL = f"""CASE
    WHEN {md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
         < {SPLIT_TRAIN_PCT} THEN 'train'
    WHEN {md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
         < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
    ELSE 'test' END"""


def split_assignment(doc_id_col) -> F.Column:
    """Deterministic 90/5/5 split from the md5 of the document id —
    a pure function of the key, so every re-run, backfill, and
    incremental batch assigns identically (the property random()
    splits lack). Salted with a ``split:`` prefix so this hash is
    independent of every other md5-derived key in the engine."""
    col = F.col(doc_id_col) if isinstance(doc_id_col, str) else doc_id_col
    h = F.pmod(md5_long(F.concat(F.lit("split:"), col.cast("string"))), F.lit(100))
    return (
        F.when(h < SPLIT_TRAIN_PCT, "train")
        .when(h < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )


@register(
    "split_train_val_test",
    tags=("sampling", "pipeline", "hash"),
    oracle=f"""
    SELECT {_SPLIT_EXPR_SQL} AS split,
           source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(split, source) census of the deterministic 90/5/5 hash
    split — the audit a pipeline runs after assignment to confirm the
    split is balanced within every source.

    Scale: the split column is a scan-side projection (md5 + mod in
    codegen, no shuffle); the census is one partial+final agg on a key
    space of |splits| x |sources| — constant-size output regardless of
    corpus size. Assigning the split NEVER shuffles the corpus itself;
    a writer would fan out via partitionBy(split) on the same
    expression.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        split_assignment("doc_id").alias("split"), "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


# ------------------------------------------------------------- TF-IDF

TFIDF_TOP_K = 3


@register(
    "text_tfidf_top_terms",
    bench=True,
    tags=("text", "string", "window"),
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf,
             ROUND(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    r AS (SELECT doc_id, term, tf, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rk
          FROM scored)
    SELECT doc_id, term, tf, tfidf, rk FROM r WHERE rk <= {TFIDF_TOP_K}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} TF-IDF terms per document (smoothed idf =
    ln((N+1)/(df+1))) — the classic content descriptor for corpus
    topic audits.

    Ranking happens on the ROUNDED score (then term) so tie-breaks are
    well-defined identically in both engines — ranking on the raw
    double would let a last-ulp ln() difference flip near-equal
    neighbors.

    Scale: one shuffle to (doc_id, term) for tf, one agg to term for
    df (both partial-agg first — term space is much smaller than token
    count), the scalar N folded into the vocab-sized idf relation (so
    the big (doc, term) side crosses only ONE broadcast hash join and
    the ln runs per vocab entry, not per row), then a per-doc window
    (planned as WindowGroupLimit, so only each doc's running top-k
    survives the final exchange). The tf relation feeds BOTH the score and the df
    branch, so it is scoped-persisted — without the barrier Catalyst
    re-runs scan+tokenize+partial-agg once per branch, doubling the
    dominant cost at 100 TB. df is vocabulary-sized and broadcast
    (AQE falls back to a (term)-keyed sort-merge join if the
    vocabulary outgrows the threshold).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = scoped_persist(
        ("tfidf_tf", sf_dir),
        tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")),
    )
    # idf is a pure function of (df, N): compute it once per VOCAB
    # entry — the scalar N attaches to the vocab-sized df relation, so
    # the (doc, term) relation never passes through a nested-loop
    # join and the per-row score is one multiply (the ln ran per
    # (doc, term) row before). Same IEEE doubles, same rounding.
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.log(
                (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
            ).alias("idf"),
        )
    )
    # No broadcast hint on purpose: locally the planner broadcasts
    # whichever side its (cached-relation-accurate) stats say is
    # smaller — measured faster than forcing the vocab side — and at
    # 100 TB both sides outgrow the threshold and the join degrades to
    # a spill-safe sort-merge on term. Forcing broadcast(dfreq) would
    # pessimize locally AND gamble on vocabulary size at scale.
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "tfidf", "rk")
    )


# ------------------------------------------- weighted reservoir sample

WEIGHTED_SAMPLE_K = 50
_U_DENOM = 1 << 53  # 53-bit uniform from the 60-bit md5 hash


@register(
    "sample_weighted_topk",
    tags=("sampling", "pipeline", "hash"),
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source, n_chars,
             (CAST({md5_long_sql("'wsample:' || CAST(doc_id AS VARCHAR)")}
                   % {_U_DENOM} AS DOUBLE) + 0.5) / {_U_DENOM}.0 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars
    FROM u ORDER BY -ln(u) / n_chars, doc_id LIMIT {WEIGHTED_SAMPLE_K}
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis):
    keep the K documents with the smallest exponential key
    -ln(u)/weight, where u is a DETERMINISTIC 53-bit uniform derived
    from md5(doc_id) and the weight is the document length — each doc's
    inclusion probability is proportional to its weight, yet the whole
    sample is a pure function of the keys (reproducible across runs,
    engines, and retries, unlike rand()-based weighted reservoirs).
    The +0.5 offset keeps u strictly in (0,1) so ln(u) is finite.

    Scale: scan-side key computation, then a global top-K — Spark
    plans TakeOrderedAndProject (per-partition top-K, K-row merge on
    the driver-side coordinator), NOT a full sort; nothing shuffles
    but K-row heaps. This is the one-pass distributed form of weighted
    reservoir sampling.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h = F.pmod(
        md5_long(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string"))),
        F.lit(_U_DENOM),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_U_DENOM))
    es_key = -F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "source", "n_chars", es_key.alias("es_key"))
        .orderBy("es_key", "doc_id")
        .limit(WEIGHTED_SAMPLE_K)
        .select("doc_id", "source", "n_chars")
    )


# ------------------------------------------- embedding int8 quantization


@register(
    "embedding_quantize_int8",
    bench=True,
    tags=("vector", "pipeline"),
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM v
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(v, x -> CAST(round(x / scale, 0) AS BIGINT)) AS qv
      FROM s WHERE scale > 0
    )
    SELECT vec_id,
           ROUND(scale, 9) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(len(list_filter(qv, x -> abs(x) > 127)) AS BIGINT) AS n_clipped
    FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of each embedding (scale =
    max|v|/127, q = round(v/scale)) summarized per vector: the scale, a
    checksum (sum of quantized values), the L1 mass, and the clipped
    count (0 by construction — the audit column a quantizing writer
    monitors).

    Hash-stability: the per-vector reductions are INTEGER sums over the
    quantized values — exact and association-order-independent — so
    both engines agree bit-for-bit; only the scale itself is a rounded
    double. Array traversal order is the stored element order in both
    engines, but no float accumulates across elements.

    Scale: pure scan->project, zero shuffle; this is the shape of the
    actual quantizing writer (which would emit qv as array<tinyint> via
    partitionBy-free write). 100 TB of float32 becomes 25 TB of int8.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    qv = F.transform(
        F.col("v"), lambda x: F.round(x / F.col("scale"), 0).cast("bigint")
    )
    isum = lambda arr: F.aggregate(  # noqa: E731  (integer fold — exact)
        arr, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return (
        emb.select("vec_id", scale.alias("scale"), v.alias("v"))
        .filter(F.col("scale") > 0)
        .select("vec_id", "scale", qv.alias("qv"))
        .select(
            "vec_id",
            F.round("scale", 9).alias("scale"),
            isum(F.col("qv")).alias("q_sum"),
            isum(F.transform("qv", F.abs)).alias("q_l1"),
            F.size(F.filter("qv", lambda x: F.abs(x) > 127))
            .cast("bigint")
            .alias("n_clipped"),
        )
    )


# ------------------------------------------------- SCD2 state tracking


@register(
    "scd2_user_state",
    tags=("window", "datetime", "events"),
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    ch AS (
      SELECT user_id, ts, event_id, event_type FROM c
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM ch
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) view of each user's
    event_type stream: collapse consecutive repeats into state
    intervals with valid_from / valid_to (NULL = still current) — the
    standard versioned-dimension build from an append-only log.

    Scale: ONE shuffle on user_id serves both windows (lag to detect
    changes, lead to close intervals — same partitioning, same order,
    so Catalyst plans a single exchange + sort and runs both window
    functions in the same stage pair). State per user is O(1); ties on
    ts break on event_id so the intervals are deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.withColumn(
        "prev", F.lag("event_type").over(w)
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lead_ts = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        lead_ts.alias("valid_to"),
        F.when(lead_ts.isNull(), 1).otherwise(0).alias("is_current"),
    )


# ---------------------------------------------------- cohort retention


@register(
    "cohort_retention",
    tags=("agg", "datetime", "events"),
    oracle="""
    WITH co AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    )
    SELECT cohort_date,
           CAST(CAST(e.ts AS DATE) - cohort_date AS BIGINT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN co USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users grouped by first-seen date (cohort) and
    the day offset of each later activity — the canonical engagement
    triangle.

    Scale: cohort assignment is a per-user min (one shuffle on
    user_id); rather than joining a separate cohort relation back to
    the log (a second fact-sized shuffle), the min is a WINDOW over the
    same user_id partitioning, so assignment rides the single exchange.
    The final (cohort, offset) agg has calendar-bounded cardinality.
    COUNT(DISTINCT user_id) is Spark's two-phase distinct aggregate —
    partial distinct per partition before the final exchange.
    """
    events = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    w = Window.partitionBy("user_id")
    return (
        events.select(
            "user_id",
            F.min(d).over(w).alias("cohort_date"),
            d.alias("active_date"),
        )
        .groupBy(
            "cohort_date",
            F.datediff("active_date", "cohort_date")
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# ------------------------------------------- robust outlier detection

MAD_SIGMA = 1.4826  # consistency constant: MAD * 1.4826 ~ stddev for normal
MAD_K = 3.0


@register(
    "outlier_orders_robust_z",
    tags=("agg", "math", "pipeline"),
    oracle=f"""
    WITH med AS (
      SELECT o_orderpriority, ROUND(median(o_totalprice), 4) AS med
      FROM orders GROUP BY 1
    ),
    mad AS (
      SELECT o.o_orderpriority,
             ROUND(median(abs(o_totalprice - m.med)), 4) AS mad
      FROM orders o JOIN med m USING (o_orderpriority) GROUP BY 1
    )
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           MIN(m.med) AS med,
           MIN(d.mad) AS mad,
           CAST(SUM(CASE WHEN abs(o_totalprice - m.med)
                              > {MAD_K} * {MAD_SIGMA} * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM orders o
    JOIN med m USING (o_orderpriority)
    JOIN mad d USING (o_orderpriority)
    GROUP BY 1
    """,
)
def outlier_orders_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per order priority: flag orders more than
    3 scaled-MADs from their group median (median/MAD resist the very
    outliers mean/stddev would absorb) — the data-quality gate a
    pipeline runs on numeric columns before training on them.

    Both engines rank and flag against the ROUNDED median/MAD so the
    outlier threshold is bit-identical (exact interpolated medians can
    differ in the last ulp across engines).

    Scale: exact medians here (that is what the oracle can check);
    the group key has 5 values, so all rows funnel to 5 reducers —
    fine at sf0.1, a skew problem at 100 TB, where the production
    swap-in is approx_percentile (t-digest sketch, mergeable partial
    aggs, bounded error) over the same plan shape. The med/mad
    relations are 5 rows — broadcast back, no second fact shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("med")
    )
    with_med = orders.join(F.broadcast(med), "o_orderpriority")
    mad = with_med.groupBy("o_orderpriority").agg(
        F.round(
            F.percentile(F.abs(F.col("o_totalprice") - F.col("med")), F.lit(0.5)),
            4,
        ).alias("mad")
    )
    thresh = F.lit(MAD_K) * F.lit(MAD_SIGMA) * F.col("mad")
    return (
        with_med.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("o_totalprice") - F.col("med")) > thresh, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --------------------------------------------- blocked fuzzy matching

FUZZY_MAX_EDITS = 5


@register(
    "fuzzy_match_customer_supplier",
    tags=("join", "string", "pipeline"),
    oracle=f"""
    SELECT c.c_custkey, s.s_suppkey,
           c.c_name AS c_name, s.s_name AS s_name,
           CAST(levenshtein(c.c_name, s.s_name) AS BIGINT) AS edit_dist
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND right(c.c_name, 4) = right(s.s_name, 4)
    WHERE levenshtein(c.c_name, s.s_name) <= {FUZZY_MAX_EDITS}
    """,
)
def fuzzy_match_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked fuzzy matching: candidate pairs
    come from an EQUI-join on a blocking key (same nation + same name
    suffix), then edit-distance verification keeps pairs within
    {FUZZY_MAX_EDITS} edits — the linkage pattern for joining dirty
    catalogs where exact keys don't exist.

    Scale: the same candidate-generation-then-verify discipline as the
    dedup family — levenshtein (quadratic per pair) runs ONLY on
    bucket-mates of the blocking key, never all |C| x |S| pairs; the
    join is a plain shuffle/broadcast equi-join on (nation, suffix).
    Looser recall => wider blocking key (shorter suffix, phonetic
    code), same shape.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring("c_name", -4, 4).alias("blk"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").alias("c_nationkey"),
        F.substring("s_name", -4, 4).alias("blk"),
    )
    dist = F.levenshtein("c_name", "s_name")
    return (
        cust.join(supp, ["c_nationkey", "blk"])
        .filter(dist <= FUZZY_MAX_EDITS)
        .select(
            "c_custkey",
            "s_suppkey",
            "c_name",
            "s_name",
            dist.cast("bigint").alias("edit_dist"),
        )
    )


# ------------------------------------- incremental rollup maintenance

INCR_CUTOFF = "2024-01-20 00:00:00"


@register(
    "events_incremental_hourly_merge",
    tags=("datetime", "agg", "pipeline"),
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_incremental_hourly_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the hourly rollup
    computed as STATE (events before a cutoff — the stored aggregate a
    production pipeline keeps) algebraically MERGED with the DELTA
    (events since the cutoff), which must equal the direct rollup over
    everything — the oracle computes the direct form, so the driver row
    certifies the merge identity itself.

    Merge-ability is why the partials carry count + DECIMAL sum
    (algebraic aggregates: merge = component-wise sum, exact); the
    double cast happens only after the final merge. avg/stddev ride
    the same pattern as (sum, count, sum-of-squares) triples;
    median/distinct need sketches (t-digest / HLL) instead.

    Scale: this is THE append-only pattern — each ingest batch
    aggregates only its own rows (delta shuffle is batch-sized, not
    history-sized) and merges into stored state keyed identically;
    state never rescans history.
    """
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(INCR_CUTOFF).cast(events.schema["ts"].dataType)

    def partial(part):
        return part.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).alias("total_dec"),
        )

    state = partial(events.filter(F.col("ts") < cutoff))
    delta = partial(events.filter(F.col("ts") >= cutoff))
    return (
        state.unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_dec").cast("double").alias("total_value"),
        )
    )


# -------------------------------------------------- user growth / DAU


@register(
    "daily_active_users_cumulative",
    tags=("agg", "datetime", "window", "events"),
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    new_by_day AS (SELECT day, COUNT(*) AS n_new FROM firsts GROUP BY 1)
    SELECT d.day, d.dau,
           COALESCE(n.n_new, 0) AS n_new,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM daily d LEFT JOIN new_by_day n USING (day)
    """,
)
def daily_active_users_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users plus the cumulative registered-user curve
    (running sum of first-seen counts) — the growth dashboard primitive.

    Scale: DAU is a two-phase distinct agg (partial distinct before the
    day shuffle); first-seen is a per-user min (user_id shuffle). The
    only unpartitioned window runs over the JOINED relation, which is
    calendar-sized (one row per day) — a global window over day rows is
    O(years), not O(events), so the single-partition sort is safe at
    any corpus size.
    """
    events = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    daily = events.groupBy(d.alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    firsts = events.groupBy("user_id").agg(F.min(d).alias("day"))
    new_by_day = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(new_by_day, "day", "left")
        .select("day", "dau", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .withColumn("cum_users", F.sum("n_new").over(w).cast("bigint"))
    )


# --------------------------------------------- source overlap matrix


@register(
    "source_overlap_matrix",
    tags=("dedup", "join", "agg", "pipeline"),
    oracle="""
    WITH t AS (SELECT doc_id, source,
        CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  t -> t <> '')) >= 3
             THEN list_distinct(list_transform(
                  range(1, len(list_filter(regexp_split_to_array(lower(text),
                        '\\s+'), t -> t <> '')) - 1),
                  i -> concat(
                    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                t -> t <> '')[i], ' ',
                    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                t -> t <> '')[i+1], ' ',
                    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                t -> t <> '')[i+2])))
             WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  t -> t <> '')) > 0
             THEN [array_to_string(list_filter(regexp_split_to_array(
                      lower(text), '\\s+'), t -> t <> ''), ' ')]
             ELSE CAST([] AS VARCHAR[]) END AS sh
        FROM documents),
    ss AS (SELECT DISTINCT source, unnest(sh) AS s FROM t),
    per AS (SELECT source, COUNT(*) AS n_sh FROM ss GROUP BY 1),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
      FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_common,
           ROUND(CAST(n_common AS DOUBLE)
                 / (pa.n_sh + pb.n_sh - n_common), 6) AS jaccard
    FROM pairs
    JOIN per pa ON pa.source = source_a
    JOIN per pb ON pb.source = source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health matrix: pairwise shingle Jaccard between SOURCES —
    which feeds of a multi-source corpus are near-copies of each other
    (mirrored crawls, re-scraped dumps) and should be merged or
    down-weighted before dedup even runs at the document level.

    Scale: the inverted-index discipline again — the pair relation
    comes from an equi-join on the shingle (candidates proportional to
    bucket occupancy: only sources that actually SHARE a shingle meet),
    never an all-pairs source scan; the output is bounded |sources|^2
    and the per-source distinct-shingle relation reuses the persisted
    shingle working set shared with the whole dedup family.
    """
    from .dedup import _shingle_relation

    t = _shingle_relation(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ss = (
        t.join(docs, "doc_id")
        .select("source", F.explode("sh").alias("s"))
        .distinct()
    )
    per = ss.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        ss.alias("a")
        .join(
            ss.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    pa = per.select(F.col("source").alias("source_a"), F.col("n_sh").alias("na"))
    pb = per.select(F.col("source").alias("source_b"), F.col("n_sh").alias("nb"))
    return (
        pairs.join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


# ------------------------------------------- split leakage audit


def _leakage_oracle() -> str:
    from ..functions import CANONICAL_TEXT_SQL

    ck = f"md5({CANONICAL_TEXT_SQL.format(c='text')})"
    split_of = lambda key: f"""CASE
        WHEN {md5_long_sql(f"'split:' || {key}")} % 100
             < {SPLIT_TRAIN_PCT} THEN 'train'
        WHEN {md5_long_sql(f"'split:' || {key}")} % 100
             < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
        ELSE 'test' END"""
    return f"""
    WITH keyed AS (
      SELECT doc_id, {ck} AS ck,
             {split_of('CAST(doc_id AS VARCHAR)')} AS split_by_id,
             {split_of(ck)} AS split_by_content
      FROM documents
    ),
    by_id AS (
      SELECT ck, COUNT(*) AS n_docs,
             COUNT(DISTINCT split_by_id) AS n_splits
      FROM keyed GROUP BY ck
    ),
    by_ck AS (
      SELECT ck, COUNT(*) AS n_docs,
             COUNT(DISTINCT split_by_content) AS n_splits
      FROM keyed GROUP BY ck
    )
    SELECT 'by_doc_id' AS strategy,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky_groups,
           CAST(SUM(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END) AS BIGINT)
             AS n_leaked_docs
    FROM by_id
    UNION ALL
    SELECT 'by_content_key',
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END) AS BIGINT)
    FROM by_ck
    ORDER BY strategy
    """


@register(
    "split_leakage_audit",
    tags=("sampling", "pipeline", "hash", "dedup"),
    oracle=_leakage_oracle(),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit of the 90/5/5 split: for each split
    strategy, how many exact-duplicate groups (same canonical content)
    end up with members in MORE THAN ONE split. Splitting by doc_id
    hash leaks every duplicated document across splits with high
    probability; splitting by the CONTENT key is leak-free by
    construction (the split is a pure function of the group key) —
    this audit is the census that proves it on the actual corpus, and
    the reason production splits key on content, not row ids.

    Scale (100 TB): one shuffle on the 128-bit content key (same key
    the exact-dedup pass already computes — shared work in a real
    pipeline); both strategy censuses aggregate the SAME grouped
    relation, and the output is 2 rows. Split assignment itself stays
    a scan-side pure-function projection, exactly as in
    ``split_train_val_test``.
    """
    from ..functions import canonical_text

    docs = load_table(spark, sf_dir, "documents")
    ck = F.md5(canonical_text("text"))
    keyed = docs.select(
        ck.alias("ck"),
        split_assignment("doc_id").alias("split_by_id"),
    ).withColumn("split_by_content", split_assignment(F.col("ck")))

    def census(split_col: str, label: str) -> DataFrame:
        grouped = keyed.groupBy("ck").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(split_col).alias("n_splits"),
        )
        return grouped.agg(
            F.lit(label).alias("strategy"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias(
                "n_dup_groups"
            ),
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0)).alias(
                "n_leaky_groups"
            ),
            F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs")).otherwise(0)).alias(
                "n_leaked_docs"
            ),
        )

    return census("split_by_id", "by_doc_id").unionAll(
        census("split_by_content", "by_content_key")
    ).orderBy("strategy")


# ------------------------------------- point-in-time (temporal) join


@register(
    "pit_join_event_states",
    tags=("join", "datetime", "events", "window"),
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    ch AS (
      SELECT user_id, ts, event_id, event_type FROM c
      WHERE prev IS NULL OR prev <> event_type
    ),
    scd AS (
      SELECT user_id,
             event_type AS state,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS valid_to
      FROM ch
    )
    SELECT s.state,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN scd s
      ON s.user_id = e.user_id
     AND e.ts >= s.valid_from
     AND (s.valid_to IS NULL OR e.ts < s.valid_to)
    GROUP BY s.state
    """,
)
def pit_join_event_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: every event looks up the SCD2
    state version that was current AT its timestamp — the versioned-
    dimension lookup every warehouse fact load performs, and the join
    shape Delta/Iceberg users call "as-of the fact's event time"
    (distinct from the event-event as-of join in queries/advanced.py).
    Census: events and distinct users attributed to each state.

    Correctness contract: the SCD2 intervals partition each user's
    timeline from their first event (zero-length intervals from
    same-timestamp state flips match nothing), so every event matches
    EXACTLY one version — conservation pinned by
    tests/test_pipeline_ops.py::test_pit_join_matches_every_event_once.

    Scale (100 TB): an equi-join on user_id with the containment
    predicate evaluated post-match — interval versions per user are
    few (bounded by state flips), so the join fan-out tracks the fact
    stream, never |fact| x |versions-global|. The dimension side is
    the collapsed SCD2 relation (one shuffle, shared partitioning
    with the fact side). Same plan at production scale with the
    dimension pre-bucketed on the key.
    """
    events = load_table(spark, sf_dir, "events")
    scd = scd2_user_state(spark, sf_dir).select(
        F.col("user_id").alias("s_user"), "state", "valid_from", "valid_to"
    )
    # plain equality (not eqNullSafe): NULL-user events drop out of
    # the lookup, matching the oracle's standard-SQL join semantics
    joined = events.join(
        scd,
        (events.user_id == F.col("s_user"))
        & (events.ts >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (events.ts < F.col("valid_to"))),
    )
    return joined.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ------------------------------------------------ cohort LTV curve


@register(
    "cohort_ltv_curve",
    tags=("window", "agg", "datetime", "events"),
    oracle="""
    WITH co AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_date, COUNT(*) AS cohort_users FROM co GROUP BY 1
    ),
    daily AS (
      SELECT co.cohort_date,
             CAST(CAST(e.ts AS DATE) - co.cohort_date AS BIGINT) AS day_offset,
             CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events e JOIN co ON co.user_id = e.user_id
      WHERE e.value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT d.cohort_date,
           d.day_offset,
           s.cohort_users,
           CAST(SUM(d.cents) OVER (PARTITION BY d.cohort_date
                                   ORDER BY d.day_offset) AS BIGINT)
             AS cum_cents,
           CAST(ROUND(10.0 * SUM(d.cents) OVER (PARTITION BY d.cohort_date
                                                ORDER BY d.day_offset)
                 / s.cohort_users) AS BIGINT) AS ltv_per_user_milli
    FROM daily d JOIN sizes s USING (cohort_date)
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: cumulative event value per
    signup cohort by day offset, normalized per cohort user — the
    money-side companion of cohort_retention (which counts active
    users; this accumulates what they spend).

    Determinism: exact integer cents collapsed per (cohort, offset)
    BEFORE the running sum; the window orders by the integer offset
    (unique per cohort); per-user LTV is one milli rounding.

    Scale (100 TB): two keyed aggs (first-seen per user, then the
    (cohort, offset) rollup) and a window over the rollup — the
    cumulative sum never sees raw events. Cohort sizes broadcast.
    """
    events = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    co = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_date"))
    sizes = co.groupBy("cohort_date").agg(F.count(F.lit(1)).alias("cohort_users"))
    daily = (
        events.where(F.col("value").isNotNull())
        .join(co, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.to_date("ts"), F.col("cohort_date")).cast("long").alias(
                "day_offset"
            ),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.partitionBy("cohort_date").orderBy("day_offset")
    cum = F.sum("cents").over(w)
    return daily.join(F.broadcast(sizes), "cohort_date").select(
        "cohort_date",
        "day_offset",
        "cohort_users",
        cum.cast("long").alias("cum_cents"),
        F.round(F.lit(10.0) * cum / F.col("cohort_users"))
        .cast("long")
        .alias("ltv_per_user_milli"),
    )


# ------------------------------------- per-source token budgeting


@register(
    "source_token_budget_trim",
    tags=("pipeline", "sampling", "window"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '\\S+')) AS n_tok,
             {md5_long_sql("'trim:' || CAST(doc_id AS VARCHAR)")} AS ord_key
      FROM documents
    ),
    totals AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total
               FROM d GROUP BY source),
    cap AS (SELECT MIN(total) AS budget FROM totals),
    walk AS (
      SELECT d.source, d.n_tok,
             CAST(SUM(d.n_tok) OVER (PARTITION BY d.source ORDER BY d.ord_key
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM d
    )
    SELECT w.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN w.cum <= cap.budget THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN w.cum <= cap.budget THEN w.n_tok ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           cap.budget AS budget,
           CAST(ROUND(1000000.0
                 * SUM(CASE WHEN w.cum <= cap.budget THEN w.n_tok ELSE 0 END)
                 / cap.budget) AS BIGINT) AS utilization_micro
    FROM walk w, cap
    GROUP BY w.source, cap.budget
    """,
)
def source_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-representation source capping: every source gets the SAME
    token budget (the smallest source's total — the water level at
    which no source needs upsampling), and documents are admitted in
    deterministic hash order until their running token total would
    stay under it. The census reports what survives per source — the
    mixing-table input for "don't let the biggest crawl drown the
    curated sources".

    Determinism: admission order is the pure md5 order key (the same
    reproducible-epoch trick as shuffle_shard_assignment), the running
    total is an exact windowed cumsum, and the keep rule `cum <=
    budget` depends only on those integers — identical under re-runs,
    backfills, and any partitioning.

    Scale: one scan-side projection (token count + hash), one shuffle
    on source for the per-source walk (the epoch-writer order), a
    |sources|-row totals relation whose MIN broadcasts back as a
    1-row cap. Nothing global-windows; nothing re-scans.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.regexp_count("text", F.lit(r"\S+")).alias("n_tok"),
        md5_long(F.concat(F.lit("trim:"), F.col("doc_id").cast("string"))).alias(
            "ord_key"
        ),
    )
    totals = d.groupBy("source").agg(F.sum("n_tok").cast("bigint").alias("total"))
    cap = totals.agg(F.min("total").alias("budget"))
    w = (
        Window.partitionBy("source")
        .orderBy("ord_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = d.select(
        "source", "n_tok", F.sum("n_tok").over(w).cast("bigint").alias("cum")
    )
    kept_tok = F.sum(F.when(F.col("cum") <= F.col("budget"), F.col("n_tok")).otherwise(0))
    return (
        walk.crossJoin(F.broadcast(cap))
        .groupBy("source", "budget")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("cum") <= F.col("budget"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_kept"),
            kept_tok.cast("bigint").alias("tokens_kept"),
            F.round(F.lit(1000000.0) * kept_tok / F.col("budget"))
            .cast("bigint")
            .alias("utilization_micro"),
        )
        .select(
            "source", "n_docs", "n_docs_kept", "tokens_kept", "budget",
            "utilization_micro",
        )
    )


# -------------------------------------- largest-remainder apportionment

_APPORTION_BUDGET = 1_000_000  # global token budget to allocate
_TOKS_SQL = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"


@register(
    "budget_apportion_sources",
    tags=("pipeline", "agg", "window"),
    oracle=f"""
    WITH per_source AS (
      SELECT source, CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per_source),
    base AS (
      SELECT s.source, s.n_tokens,
             (s.n_tokens * {_APPORTION_BUDGET}) // t.total AS base_alloc,
             (s.n_tokens * {_APPORTION_BUDGET}) % t.total  AS remainder
      FROM per_source s CROSS JOIN tot t
    ),
    short AS (
      SELECT CAST({_APPORTION_BUDGET} - SUM(base_alloc) AS BIGINT) AS n_extra
      FROM base
    ),
    ranked AS (
      SELECT b.source, b.n_tokens, b.base_alloc, x.n_extra,
             ROW_NUMBER() OVER (ORDER BY b.remainder DESC, b.source) AS rk
      FROM base b CROSS JOIN short x
    )
    SELECT source, n_tokens, base_alloc,
           base_alloc + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END AS alloc_tokens
    FROM ranked
    """,
)
def budget_apportion_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a fixed global
    token budget across document sources: each source gets
    floor(budget * share), and the leftover seats go to the largest
    fractional remainders (source name as the deterministic
    tie-break) — so the integer allocations sum EXACTLY to the budget,
    which proportional-rounding pipelines (mixture sampling quotas,
    shard budgets) silently get wrong when they round independently.

    Determinism: everything is BIGINT — remainders are exact modular
    arithmetic, never floats. n_tokens * budget fits 2^63 up to ~9e12
    corpus tokens per source at this budget; a 100 TB corpus with
    bigger products would widen the intermediate to DECIMAL(38,0) (the
    package's dec() discipline) without changing the shape.

    Scale (100 TB): one partial+final agg keyed by source for the
    token census; apportionment itself runs on the source-count-
    bounded result (a few rows), so the window sort is constant-size.
    Composes with source_mixture_weights (temperature-scaled shares)
    and source_token_budget_trim (per-source trims) as the final
    exact-integer allocation step.

    Reference parity: none (beyond wordcount/grep); SURVEY.md
    section 2.B training-pipeline row.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens")
    )
    tot = per_source.agg(F.sum("n_tokens").cast("long").alias("total"))
    base = per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"n_tokens * {_APPORTION_BUDGET} div total").alias("base_alloc"),
        ((F.col("n_tokens") * _APPORTION_BUDGET) % F.col("total")).alias("remainder"),
    )
    short = base.agg(
        (F.lit(_APPORTION_BUDGET) - F.sum("base_alloc")).cast("long").alias("n_extra")
    )
    wr = Window.orderBy(F.col("remainder").desc(), "source")
    ranked = base.crossJoin(F.broadcast(short)).withColumn(
        "rk", F.row_number().over(wr)
    )
    return ranked.select(
        "source",
        "n_tokens",
        "base_alloc",
        (
            F.col("base_alloc")
            + F.when(F.col("rk") <= F.col("n_extra"), 1).otherwise(0)
        ).alias("alloc_tokens"),
    )


# ------------------------------------------------- balanced k-fold

KFOLD_K = 5


@register(
    "stratified_kfold_assignment",
    tags=("sampling", "pipeline", "window", "hash"),
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {md5_long_sql("'fold:' || CAST(doc_id AS VARCHAR)")},
                        doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST((rn - 1) % {KFOLD_K} AS BIGINT) AS fold,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM ranked
    GROUP BY 1, 2
    """,
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced {k}-fold cross-validation assignment, stratified by
    source: within each source the documents are ranked by a salted
    md5 (a deterministic shuffle) and dealt round-robin, so fold sizes
    differ by at most 1 per stratum — the exact-balance guarantee the
    hash-mod split (split_train_val_test) deliberately trades away for
    scan-side statelessness. Output is the per-(source, fold) audit:
    counts, char mass, and an id checksum that pins membership.

    Determinism: the shuffle key is md5 with a ``fold:`` salt (unique
    (hash, doc_id) tiebreak), so assignment is a pure function of the
    data — stable across runs, partitionings, and engines.

    Scale (100 TB): one shuffle on the stratum key for the per-source
    rank; the deal and the rollup reuse the same partitioning (no
    second exchange). A stratum is bounded by a source's corpus, so a
    hot source serializes one window sort — the documented mitigation
    is the two-level form: rank within (source, shard) on a salted
    shard key, then offset folds by the per-shard counts (same
    distributed-rank trick as zonemap_skipping_audit).
    """.format(k=KFOLD_K)
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("fold:"), F.col("doc_id").cast("string")))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    )
    return (
        docs.select("source", "doc_id", "n_chars", rn.alias("rn"))
        .groupBy(
            "source",
            ((F.col("rn") - 1) % KFOLD_K).cast("bigint").alias("fold"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


# ------------------------------------------- curriculum interleave

CURRICULUM_HEAD = 40


@register(
    "curriculum_interleave_order",
    tags=("sampling", "pipeline", "window", "topk"),
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    deciled AS (
      SELECT source, doc_id, n_chars,
             CAST(((rn - 1) * 10) // n AS BIGINT) AS decile
      FROM ranked
    ),
    dealt AS (
      SELECT source, doc_id, n_chars, decile,
             ROW_NUMBER() OVER (
               PARTITION BY source, decile
               ORDER BY {md5_long_sql("'curr:' || CAST(doc_id AS VARCHAR)")},
                        doc_id) AS rd
      FROM deciled
    )
    SELECT source,
           CAST((rd - 1) * 10 + decile AS BIGINT) AS pos,
           decile, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM dealt
    ORDER BY source, pos
    LIMIT {CURRICULUM_HEAD}
    """,
)
def curriculum_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order with difficulty mixing: per source,
    documents are exact-deciled by length (the difficulty proxy), then
    each decile is internally shuffled (salted md5) and the deciles are
    interleaved round-robin — position ``(rank_in_decile - 1) * 10 +
    decile`` — so every consecutive window of 10 positions sees the
    full easy→hard spectrum. This is the deterministic version of the
    "mix difficulties within each batch" curriculum used when packing
    training shards; the head of the schedule is the audit output.

    Determinism: difficulty rank ties break on doc_id; the in-decile
    shuffle is a salted md5 with a doc_id tiebreak — the schedule is a
    pure function of the corpus.

    Scale (100 TB): two window passes sharing the source partitioning
    (rank+count in one sorted pass, then the in-decile deal on the
    finer (source, decile) key — a strict repartition refinement, so
    AQE plans one exchange + local sort). Exact deciles need the
    per-source rank; the scale swap-in is approx_percentile bounds at
    the scan (same downstream deal). Head-of-schedule is TakeOrdered.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(ws.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc()))
        .alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    deciled = ranked.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr("((rn - 1) * 10) div n").cast("bigint").alias("decile"),
    )
    h = md5_long(F.concat(F.lit("curr:"), F.col("doc_id").cast("string")))
    rd = F.row_number().over(
        Window.partitionBy("source", "decile").orderBy(h.asc(), F.col("doc_id").asc())
    )
    return (
        deciled.select(
            "source",
            "doc_id",
            "n_chars",
            "decile",
            rd.alias("rd"),
        )
        .select(
            "source",
            ((F.col("rd") - 1) * 10 + F.col("decile")).cast("bigint").alias("pos"),
            "decile",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("source", "pos")
        .limit(CURRICULUM_HEAD)
    )


# --------------------------------- quantile normalization across sources


@register(
    "quantile_normalize_doclen",
    tags=("curation", "window", "join"),
    oracle="""
    WITH d AS (SELECT doc_id, source, length(text) AS len FROM documents),
    src AS (
      SELECT source, doc_id, len,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY len, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS n_s
      FROM d
    ),
    pooled AS (
      SELECT len AS plen,
             ROW_NUMBER() OVER (ORDER BY len, doc_id) AS p
      FROM d
    ),
    tot AS (SELECT COUNT(*) AS n FROM d),
    mapped AS (
      SELECT source, r, n_s, len, plen
      FROM src CROSS JOIN tot
      JOIN pooled ON p = (r * n + n_s - 1) // n_s
    )
    SELECT source,
           CAST(((r - 1) * 10) // n_s + 1 AS BIGINT) AS decile,
           COUNT(*) AS n,
           CAST(SUM(plen) AS BIGINT) AS sum_norm_len,
           CAST(SUM(len) AS BIGINT) AS sum_raw_len
    FROM mapped
    GROUP BY 1, 2
    """,
)
def quantile_normalize_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources — the
    distribution-alignment transform (classic in bioinformatics, used
    in corpus mixing to make per-source quality/length scores
    comparable before gating): each document's length is replaced by
    the POOLED distribution's value at the equivalent quantile
    (pooled position ceil(r·N / n_s) for within-source rank r), so
    every source ends up with the same marginal distribution. Output
    is the per-(source, decile) census of raw vs normalized mass —
    identical sum_norm_len profiles across sources is the defining
    invariant.

    Exactness: ranks are total orders on (len, doc_id); the quantile
    map is pure integer arithmetic (ceil via (r·N + n_s − 1) div n_s);
    sums are exact bigints.

    Scale (100 TB): NO single-partition window anywhere — both the
    within-source rank and the pooled rank use the TeraSort pattern
    (functions.distributed_rank: range shuffle + broadcast prefix
    offsets); the within-source rank derives from the global
    (source, len, doc_id) rank minus each source's broadcast base
    offset, so one ranged relation serves every source regardless of
    skew. The quantile map is an integer equi-join (src on target
    position, pooled on position). The DuckDB oracle uses plain
    windows — same math, different physical plan.
    """
    from ..functions import distributed_rank

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").alias("len")
    )
    ranked = distributed_rank(
        d, ["source", "len", "doc_id"], ("qn_src_rank", sf_dir), rank_alias="g"
    )
    smin = ranked.groupBy("source").agg(
        F.min("g").alias("g0"), F.count(F.lit(1)).alias("n_s")
    )
    src = (
        ranked.join(F.broadcast(smin), "source")
        .withColumn("r", F.col("g") - F.col("g0") + F.lit(1))
    )
    pooled = distributed_rank(
        d.select("len", "doc_id"),
        ["len", "doc_id"],
        ("qn_pool_rank", sf_dir),
        rank_alias="p",
    ).select(F.col("p"), F.col("len").alias("plen"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    mapped = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("pt", F.expr("(r * n + n_s - 1) div n_s"))
        .join(pooled, F.col("pt") == F.col("p"))
    )
    return mapped.groupBy(
        "source",
        (F.expr("((r - 1) * 10) div n_s") + 1).cast("long").alias("decile"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("plen").alias("sum_norm_len"),
        F.sum("len").cast("long").alias("sum_raw_len"),
    )


# ------------------- greedy coverage selection (submodular set cover)

GREEDY_COVER_K = 3


def _greedy_cover_oracle() -> str:
    from .dedup import _SHINGLES

    sql = """
    WITH tok AS MATERIALIZED (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest(list_filter({sh}, x -> x IS NOT NULL AND x <> ''))
               AS term
        FROM documents)
    ),
    g1 AS (SELECT doc_id, COUNT(*) AS gain FROM tok GROUP BY 1),
    p1 AS MATERIALIZED (SELECT doc_id, gain FROM g1
                        ORDER BY gain DESC, doc_id LIMIT 1),
    sel1 AS MATERIALIZED (SELECT doc_id FROM p1),
    cov1 AS MATERIALIZED (SELECT DISTINCT term FROM tok JOIN p1 USING (doc_id))
    """
    for i in range(2, GREEDY_COVER_K + 1):
        sql += f""",
    g{i} AS (
      SELECT t.doc_id, COUNT(*) AS gain FROM tok t
      WHERE t.term NOT IN (SELECT term FROM cov{i - 1})
        AND t.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})
      GROUP BY 1
    ),
    p{i} AS MATERIALIZED (SELECT doc_id, gain FROM g{i}
             ORDER BY gain DESC, doc_id LIMIT 1),
    sel{i} AS MATERIALIZED (SELECT doc_id FROM sel{i - 1}
               UNION ALL SELECT doc_id FROM p{i}),
    cov{i} AS MATERIALIZED (SELECT term FROM cov{i - 1}
               UNION SELECT term FROM tok JOIN p{i} USING (doc_id))
        """
    sql += "\n" + "\n    UNION ALL ".join(
        f"SELECT {i} AS round, doc_id, CAST(gain AS BIGINT) AS gain, "
        f"(SELECT COUNT(*) FROM cov{i}) AS covered_total FROM p{i}"
        for i in range(1, GREEDY_COVER_K + 1)
    )
    return sql.replace("{sh}", _SHINGLES)


@register(
    "greedy_coverage_selection",
    tags=("curation", "iterative", "topk"),
    oracle=_greedy_cover_oracle(),
)
def greedy_coverage_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage data selection: pick {k} documents, each
    round taking the document adding the MOST yet-uncovered vocabulary
    (ties -> smallest doc_id) — the classic (1 - 1/e)-approximate
    submodular selection behind coverage-driven corpus subsetting
    (select few docs spanning the most vocabulary/topics). Output per
    round: the pick, its marginal gain, and cumulative coverage — a
    diminishing-returns curve by construction.

    Determinism: gains are exact distinct-term counts; the argmax
    tie-break is total; unrolled rounds make the whole trajectory one
    fixed dataflow the DuckDB CTEs replay exactly.

    Scale (100 TB): per round ONE anti-join of the persisted distinct
    (doc, term) relation against the covered-term set (itself bounded
    by the selected docs' vocabularies, broadcast when small), one
    partial-agg gain count, and a TakeOrdered limit(1) argmax
    re-joined as a 1-row broadcast — zero driver data, the BPE
    trainer's argmax discipline. K rounds = K bounded passes over the
    SAME cached relation, never a growing lineage (per-round
    localCheckpoints truncate it).
    """.format(k=GREEDY_COVER_K)
    from .dedup import _shingle_relation

    tok = scoped_persist(
        ("cover.tok", sf_dir),
        _shingle_relation(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(
                F.filter(F.col("sh"), lambda x: x != F.lit(""))
            ).alias("term"),
        )
        .distinct(),
    )
    selected: DataFrame | None = None
    covered: DataFrame | None = None
    rounds = []
    for i in range(1, GREEDY_COVER_K + 1):
        cand = tok
        if selected is not None:
            cand = cand.join(selected, "doc_id", "left_anti")
        if covered is not None:
            cand = cand.join(covered, "term", "left_anti")
        # localCheckpoint, not scoped_persist: the pick feeds three
        # consumers and the covered set two, so a lazy persist leaves
        # the full round lineage nested in every consumer's LOGICAL
        # plan — Catalyst re-analysis + cache matching over those trees
        # dominated the cold run (measured ~30s at sf0.01, ~3s
        # checkpointed; same pathology as the kcore loop).
        pick = (
            cand.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .transform(truncate_plan)
        )
        new_terms = tok.join(pick.select("doc_id"), "doc_id").select("term")
        covered = (
            new_terms
            if covered is None
            else covered.unionByName(new_terms).distinct()
        ).transform(truncate_plan)
        selected = (
            pick.select("doc_id")
            if selected is None
            else selected.unionByName(pick.select("doc_id"))
        )
        cov_n = covered.agg(F.count(F.lit(1)).alias("covered_total"))
        rounds.append(
            pick.select(
                F.lit(i).cast("long").alias("round"),
                "doc_id",
                F.col("gain").cast("long").alias("gain"),
            ).crossJoin(F.broadcast(cov_n))
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out
