r"""ML-prep operators: corpus statistics and dataset-maintenance ops a
large-scale training pipeline runs between curation and training.

These extend the training-pipeline surface (SURVEY.md section 2.B) with
the steps that sit DOWNSTREAM of dedup/decontamination/packing:

- **unigram LM surprisal** is the CCNet-style quality signal: score
  every document by its mean token surprisal under the corpus's own
  unigram language model, then bucket into head/middle/tail. Documents
  whose tokens are all corpus-frequent read as boilerplate; documents
  full of rare tokens read as noise.
- **mixture weights** decide how much of each source the sampler draws:
  the standard temperature-scaled multinomial (weight proportional to
  token_count^alpha, alpha=0.5) that up-weights small high-quality
  sources without letting giant crawls drown them.
- **snapshot diff** is the CDC audit between two corpus snapshots —
  which documents were added, removed, or changed — computed from
  content hashes, never text comparison.
- **merge upsert** is MERGE INTO semantics (update matches, insert the
  rest) expressed as a join, the incremental-ingest primitive for any
  table the pipeline maintains.
- **shard assignment** is the deterministic global training shuffle:
  every document lands in a pseudo-random shard, with a pseudo-random
  order key within the shard, as a pure function of its id — re-runs
  and backfills reproduce the exact same epoch order.
- **gram matrix** is the distributed linear-algebra building block
  (X^T X over the embedding table) behind PCA whitening, covariance
  audits, and linear-probe fits.

Determinism discipline (the driver value-hashes results against DuckDB):
every floating-point intermediate is either quantized to integers
before any aggregation (surprisal millinats, fixed-point sqrt weights,
fixed-point embedding coordinates) or summed as decimals — sums are
then exact and association-order-independent in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import canonical_text, dec, md5_long, md5_long_sql, scoped_persist, tokens
from ..registry import register
from ..sources import load_table

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"

# ------------------------------------------------- unigram LM surprisal

# Mean-surprisal bucket edges in millinats. Fixed constants (not data
# quantiles) so bucket membership is a pure function of the document,
# stable across corpus growth. Calibrated once against the synthetic
# corpus (mean ~3406 mnat, range ~3380-3718) so all three buckets are
# populated; a production corpus would calibrate its own edges the
# same way (from a one-off quantile sweep, then frozen).
SURPRISAL_HEAD_MNAT = 3400
SURPRISAL_TAIL_MNAT = 3500


@register(
    "text_unigram_logprob",
    bench=True,
    tags=("text", "pipeline"),
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    cnt AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM tok),
    scored AS (
      SELECT doc_id,
             CAST(ROUND(1000 * ln(CAST(total AS DOUBLE) / cnt)) AS BIGINT) AS s
      FROM tok JOIN cnt USING (term) CROSS JOIN tot
    ),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(s) AS sum_s
      FROM scored GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum_s AS BIGINT) AS sum_surprisal_mnat,
           ROUND(CAST(sum_s AS DOUBLE) / n_tokens, 3) AS mean_surprisal_mnat,
           CASE WHEN CAST(sum_s AS DOUBLE) / n_tokens < {SURPRISAL_HEAD_MNAT}
                THEN 'head'
                WHEN CAST(sum_s AS DOUBLE) / n_tokens < {SURPRISAL_TAIL_MNAT}
                THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM perdoc
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token surprisal under the corpus unigram LM —
    the CCNet-style perplexity proxy used to split a crawl into
    head/middle/tail quality buckets.

    Surprisal is quantized per token to integer millinats
    (``round(1000 * ln(N / count(term)))``) BEFORE summation, so the
    per-document sum is exact integer arithmetic — identical in any
    association order, hence hash-identical between Spark and the
    oracle. ``ln`` of the same IEEE double agrees across engines; the
    quantization step is the only place a ½-ulp difference could leak,
    and it lands on a rounding boundary with probability ~1e-10.

    Scale (100 TB): the token relation is exploded once and persisted
    for the two consumers (term counts, per-doc join). Term counts are
    one partial+final agg on the term key (vocab-sized result, ~1e7
    rows — broadcast-able at 100 TB or shuffled as an equi-join; AQE
    picks). The corpus total rides the SAME vocab relation as an
    unpartitioned-unordered window (total tokens = sum of term counts
    — exact identity), so the old third pass over the token relation
    (a count(*) branch + BroadcastNestedLoopJoin of the scalar) is
    gone; the window's single-partition exchange moves only the
    vocab-sized rollup, never corpus data. The per-doc surprisal is
    quantized per TERM (it depends only on (total, cnt)) before the
    join fans it out to token rows — same double math, computed once
    per vocab entry instead of once per token. The per-doc rollup is
    one shuffle on doc_id. Nothing is ever all-pairs and no Python
    touches the data path.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = scoped_persist(
        ("text_unigram_logprob.tok", sf_dir),
        docs.select("doc_id", F.explode(tokens("text")).alias("term")),
    )
    # total = sum(cnt) over the vocab-sized term rollup — identical to
    # count(*) over tok, without re-scanning the token relation.
    total = F.sum("cnt").over(Window.partitionBy())
    cnt = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "term",
            # surprisal millinats per TERM: round(1000*ln(total/cnt))
            # is a pure function of (total, cnt) — same IEEE doubles as
            # the old per-token expression, evaluated |vocab| times
            # instead of |tokens| times.
            F.round(1000 * F.log(total.cast("double") / F.col("cnt")))
            .cast("bigint")
            .alias("s"),
        )
    )
    scored = tok.join(cnt, "term").select("doc_id", "s")
    perdoc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("s").alias("sum_s"),
    )
    mean = F.col("sum_s").cast("double") / F.col("n_tokens")
    return perdoc.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("sum_s").cast("bigint").alias("sum_surprisal_mnat"),
        F.round(mean, 3).alias("mean_surprisal_mnat"),
        F.when(mean < SURPRISAL_HEAD_MNAT, "head")
        .when(mean < SURPRISAL_TAIL_MNAT, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


# ---------------------------------------------------- mixture weights

# alpha = 0.5 temperature: weight proportional to sqrt(token_count).
# sqrt is IEEE-exact for both engines; the weights are quantized to
# 1e-6 fixed point before normalization so the denominator is an exact
# integer sum.


@register(
    "source_mixture_weights",
    tags=("pipeline", "sampling"),
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    w AS (
      SELECT source, n_docs, n_tokens,
             CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS w_fixed
      FROM per_source
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(w_fixed) AS BIGINT) AS total_w
      FROM w
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           n_tokens,
           ROUND(CAST(w_fixed AS DOUBLE) / total_w, 6) AS weight_alpha05,
           ROUND((CAST(w_fixed AS DOUBLE) / total_w)
                 / (CAST(n_tokens AS DOUBLE) / total_tokens), 4)
             AS oversample_factor
    FROM w CROSS JOIN tot
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) sampling weight per source — the
    domain-mixing table a training sampler consumes. ``oversample_factor``
    > 1 means the source is drawn more often than its natural token
    share (small sources get boosted; the biggest crawl is damped).

    Scale: one partial+final agg over the corpus onto a |sources|-sized
    relation, then arithmetic on that constant-size table (the
    normalizing total is a broadcast scalar). The corpus is scanned
    once and never shuffled; at 100 TB this is scan-bound.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
    )
    w = per_source.withColumn(
        "w_fixed",
        F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast("bigint"),
    )
    tot = w.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("w_fixed").cast("bigint").alias("total_w"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("w_fixed").cast("double") / F.col("total_w"), 6).alias(
            "weight_alpha05"
        ),
        F.round(
            (F.col("w_fixed").cast("double") / F.col("total_w"))
            / (F.col("n_tokens").cast("double") / F.col("total_tokens")),
            4,
        ).alias("oversample_factor"),
    )


# ------------------------------------------------------- snapshot diff

# Two deterministic pseudo-snapshots derived from the documents table:
# OLD drops doc_id % 20 == 3 (those read as "added" since), NEW drops
# doc_id % 20 == 7 (those read as "removed"), and documents with
# doc_id % 13 == 0 carry revised content in NEW (a version marker mixed
# into the content hash), so every diff status is exercised.

_CANON_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


@register(
    "snapshot_diff_documents",
    tags=("pipeline", "join"),
    oracle=f"""
    WITH old AS (
      SELECT doc_id, source, md5({_CANON_SQL}) AS h
      FROM documents WHERE doc_id % 20 <> 3
    ),
    new AS (
      SELECT doc_id, source,
             md5({_CANON_SQL} ||
                 CASE WHEN doc_id % 13 = 0 THEN ':v2' ELSE '' END) AS h
      FROM documents WHERE doc_id % 20 <> 7
    ),
    diff AS (
      SELECT COALESCE(o.source, n.source) AS source,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.h <> n.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT source, status, COUNT(*) AS n_docs
    FROM diff GROUP BY 1, 2
    """,
)
def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff of two corpus snapshots: per-(source, status)
    census of added / removed / changed / unchanged documents, decided
    by content hash (md5 of canonical text), never by text comparison.

    Scale: the diff is ONE full outer equi-join on the stable document
    id, carrying only (id, source, 16-byte hash) — the text never
    crosses the shuffle. With both snapshots bucketed by doc_id the
    join is co-located and shuffle-free; the census is a constant-size
    partial+final agg. This is the audit a pipeline runs before
    promoting a new snapshot to training.
    """
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 20 != 3).select(
        "doc_id", "source", F.md5(canonical_text("text")).alias("h")
    )
    new = docs.filter(F.col("doc_id") % 20 != 7).select(
        "doc_id",
        "source",
        F.md5(
            F.concat(
                canonical_text("text"),
                F.when(F.col("doc_id") % 13 == 0, ":v2").otherwise(""),
            )
        ).alias("h"),
    )
    joined = old.alias("o").join(
        new.alias("n"), F.col("o.doc_id") == F.col("n.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.h") != F.col("n.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("o.source"), F.col("n.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# -------------------------------------------------------- merge upsert

# MERGE INTO semantics over a lakehouse-style table: target = current
# orders table (three quarters of rows), batch = revised rows for every
# even order key (price uplift, status 'U'). Matched rows take the
# batch version; unmatched batch rows insert; untouched target rows
# carry forward.


@register(
    "merge_upsert_orders",
    tags=("join", "pipeline"),
    oracle="""
    WITH target AS (
      SELECT * FROM orders WHERE o_orderkey % 4 <> 0
    ),
    batch AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.05 AS DECIMAL(3,2)), 2) AS DECIMAL(18,2))
               AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    merged AS (
      SELECT b.o_orderkey, b.o_orderstatus,
             b.o_totalprice,
             CASE WHEN t.o_orderkey IS NULL THEN 'inserted'
                  ELSE 'updated' END AS merge_action
      FROM batch b LEFT JOIN target t ON b.o_orderkey = t.o_orderkey
      UNION ALL
      SELECT t.o_orderkey, t.o_orderstatus,
             CAST(t.o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
             'kept' AS merge_action
      FROM target t ANTI JOIN batch b ON t.o_orderkey = b.o_orderkey
    )
    SELECT merge_action, o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(o_totalprice) AS DOUBLE) AS sum_totalprice
    FROM merged GROUP BY 1, 2
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) expressed as join algebra: matched target
    rows are replaced by the batch version, unmatched batch rows are
    inserted, untouched target rows carry forward — then a per-(action,
    status) census with an exact decimal price sum certifies the merge.

    Scale: one left join (batch vs target keys) plus one anti join —
    both equi-joins on the table's primary key, so with the target
    maintained bucketed by key (as a lakehouse table would be) the
    merge is co-located and only the batch (the small side) moves.
    This is the row-level incremental-ingest primitive behind SCD1
    maintenance; the census output is constant-size.
    """
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    batch = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        # ROUND half-up in both engines, THEN an exact (no-op) downcast:
        # a bare decimal downcast would round in Spark but TRUNCATE in
        # DuckDB — 0.0045/row of silent divergence.
        F.round(dec("o_totalprice") * F.lit("1.05").cast("decimal(3,2)"), 2)
        .cast("decimal(18,2)")
        .alias("o_totalprice"),
    )
    upserts = (
        batch.alias("b")
        .join(
            target.select("o_orderkey").alias("t"),
            F.col("b.o_orderkey") == F.col("t.o_orderkey"),
            "left",
        )
        .select(
            F.col("b.o_orderstatus").alias("o_orderstatus"),
            F.col("b.o_totalprice").alias("o_totalprice"),
            F.when(F.col("t.o_orderkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("merge_action"),
        )
    )
    kept = target.join(batch, "o_orderkey", "left_anti").select(
        "o_orderstatus",
        dec("o_totalprice").alias("o_totalprice"),
        F.lit("kept").alias("merge_action"),
    )
    return (
        upserts.unionByName(kept)
        .groupBy("merge_action", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_totalprice").cast("double").alias("sum_totalprice"),
        )
    )


# ----------------------------------------------- training shuffle shards

N_SHARDS = 64


@register(
    "shuffle_shard_assignment",
    tags=("sampling", "hash", "pipeline"),
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             {md5_long_sql("'shard:' || CAST(doc_id AS VARCHAR)")}
               % {N_SHARDS} AS shard,
             {md5_long_sql("'order:' || CAST(doc_id AS VARCHAR)")}
               AS order_key
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(order_key) AS min_order_key,
           MIN_BY(doc_id, order_key) AS first_doc
    FROM assigned GROUP BY 1
    """,
)
def shuffle_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: every document gets a
    pseudo-random shard (md5 % {N_SHARDS}) and a pseudo-random order
    key within its shard, both pure functions of doc_id — so every
    re-run, resume, and backfill reproduces the identical epoch order
    (the property a seeded RNG over a non-deterministic row order does
    NOT have). Output is the per-shard census plus each shard's first
    document under the order key.

    Scale: assignment is a scan-side projection (two md5s in codegen);
    the census is one partial+final agg on the shard key. An actual
    epoch writer would ``repartition(N, shard)`` +
    ``sortWithinPartitions(order_key)`` — one shuffle, and the sort is
    per-shard, never global.
    """
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        "n_chars",
        F.pmod(
            md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(N_SHARDS),
        ).alias("shard"),
        md5_long(F.concat(F.lit("order:"), F.col("doc_id").cast("string"))).alias(
            "order_key"
        ),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("order_key").alias("min_order_key"),
        F.min_by("doc_id", "order_key").alias("first_doc"),
    )


# --------------------------------------------------------- gram matrix

GRAM_SCALE = 10000  # fixed-point quantization: x -> floor(x*1e4 + 0.5)


@register(
    "embedding_gram_matrix",
    bench=True,
    tags=("similarity", "udf"),
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS d,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {GRAM_SCALE} + 0.5)
                  AS BIGINT) AS x
      FROM embeddings
    )
    SELECT CAST(a.d AS INTEGER) AS i,
           CAST(b.d AS INTEGER) AS j,
           CAST(SUM(a.x * b.x) AS BIGINT) AS gram
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.d <= b.d
    GROUP BY 1, 2
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix (X^T X, upper triangle) over the
    embedding table — the building block behind covariance/PCA
    whitening and linear-probe fits.

    Coordinates are quantized to integer fixed point
    (``floor(x * {GRAM_SCALE} + 0.5)``, identical formula in both
    engines — np.rint's half-to-even would NOT match SQL rounding) so
    every partial product and sum is exact int64 arithmetic: the result
    is bit-identical regardless of partitioning or summation order.
    With |x| <= 0.5 * {GRAM_SCALE} the per-pair product is <= 2.5e7;
    int64 holds the sum up to ~3.7e11 rows — far past 100 TB of
    embeddings (a production variant past that would hierarchical-sum
    into decimal(38,0)).

    Scale: each Arrow batch contributes one d x d partial via a BLAS
    integer matmul inside ``mapInPandas`` — communication is
    O(partitions * d^2) tiny (i, j, partial) rows, reduced by one
    constant-size agg. The oracle's self-join-on-vec_id form is the
    O(n * d^2)-row plan we deliberately avoid. The embedding table is
    scanned once, never shuffled.
    """
    import numpy as np
    import pandas as pd

    # NULL embeddings would crash np.stack; the oracle's unnest drops
    # them implicitly, so filter explicitly for shared semantics.
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("embedding")
    )

    def partial_gram(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xi = np.floor(x * GRAM_SCALE + 0.5).astype(np.int64)
            g = xi.T @ xi
            iu, ju = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {"i": iu.astype(np.int32), "j": ju.astype(np.int32), "partial": g[iu, ju]}
            )

    partials = emb.mapInPandas(partial_gram, "i int, j int, partial long")
    return partials.groupBy("i", "j").agg(F.sum("partial").cast("bigint").alias("gram"))


# ---------------------------------------------------- training manifest

from .curation import _SPLIT_EXPR_SQL as _SPLIT_EXPR_ORACLE  # noqa: E402

MANIFEST_BUCKETS = 8  # shard space coarsened for the manifest census


@register(
    "training_manifest",
    tags=("pipeline", "sampling", "hash"),
    oracle=f"""
    WITH assigned AS (
      SELECT source,
             {_SPLIT_EXPR_ORACLE} AS split,
             {md5_long_sql("'shard:' || CAST(doc_id AS VARCHAR)")}
               % {MANIFEST_BUCKETS} AS bucket,
             len({_TOKS}) AS n_toks
      FROM documents
    ),
    g AS (
      SELECT split, source, bucket,
             COUNT(*) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      FROM assigned GROUP BY 1, 2, 3
    ),
    src AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
      FROM g GROUP BY 1
    ),
    w AS (
      SELECT source, src_tokens,
             CAST(ROUND(sqrt(CAST(src_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS w_fixed
      FROM src
    ),
    tot AS (SELECT CAST(SUM(w_fixed) AS BIGINT) AS total_w FROM w)
    SELECT g.split, g.source, g.bucket, g.n_docs, g.n_tokens,
           ROUND(CAST(w_fixed AS DOUBLE) / total_w, 6) AS source_weight
    FROM g JOIN w USING (source) CROSS JOIN tot
    """,
)
def training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized training manifest: per (split, source, shard
    bucket) — document/token counts plus the source's temperature-
    scaled sampling weight. This is the artifact a trainer's data
    loader actually consumes, and it COMPOSES the engine's
    deterministic assignment primitives (hash split, hash shard,
    alpha=0.5 mixture) into one relation: every row is reproducible
    from document ids alone.

    Scale: one corpus scan computes all three assignments scan-side;
    one partial+final agg onto the |splits| x |sources| x |buckets|
    key space (constant-size); the weight normalization is arithmetic
    on the |sources|-sized rollup of that SAME aggregate — the corpus
    is never re-scanned or shuffled a second time.
    """
    from .curation import split_assignment

    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "source",
        split_assignment("doc_id").alias("split"),
        F.pmod(
            md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(MANIFEST_BUCKETS),
        ).alias("bucket"),
        F.size(tokens("text")).alias("n_toks"),
    )
    g = scoped_persist(
        ("training_manifest.g", sf_dir),
        assigned.groupBy("split", "source", "bucket").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        ),
    )
    src = g.groupBy("source").agg(F.sum("n_tokens").cast("bigint").alias("src_tokens"))
    w = src.withColumn(
        "w_fixed",
        F.round(F.sqrt(F.col("src_tokens").cast("double")) * 1000000).cast("bigint"),
    )
    tot = w.agg(F.sum("w_fixed").cast("bigint").alias("total_w"))
    return (
        g.join(w.select("source", "w_fixed"), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "split",
            "source",
            "bucket",
            "n_docs",
            "n_tokens",
            F.round(F.col("w_fixed").cast("double") / F.col("total_w"), 6).alias(
                "source_weight"
            ),
        )
    )


# ------------------------------------------- power-iteration PCA

POWER_ITERS = 60  # eigengap on this corpus is ~0.93: need ~60 hops


def _pca_oracle() -> str:
    """DuckDB replay of the power iteration: the Gram relation is
    integer-exact (embedding_gram_matrix's fixed-point oracle, reused
    verbatim as a CTE), so both engines iterate from bit-identical
    matrices; the 60 matvec+normalize hops unroll as MATERIALIZED CTE
    pairs. Cross-engine float-sum order differs at the last ulp per
    hop, but power iteration is CONTRACTIVE toward the dominant
    eigenvector (eigengap ~0.93), so per-hop noise decays instead of
    compounding — the final vectors agree far inside the ROUND(6) /
    ROUND(3) output quantization (verified at sf0.001/0.01/0.1)."""
    from ..registry import REGISTRY

    gram_sql = REGISTRY["embedding_gram_matrix"].oracle
    ctes = [
        f"""
    ut AS MATERIALIZED ({gram_sql}),
    full_g AS MATERIALIZED (
      SELECT i, j, CAST(gram AS DOUBLE) AS g FROM ut
      UNION ALL
      SELECT j AS i, i AS j, CAST(gram AS DOUBLE) AS g FROM ut WHERE i <> j),
    v0 AS MATERIALIZED (SELECT DISTINCT i AS dim, 1.0 AS x FROM full_g)"""
    ]
    for it in range(1, POWER_ITERS + 1):
        ctes.append(f"""
    w{it} AS MATERIALIZED (
      SELECT f.i AS dim, SUM(f.g * v.x) AS wx
      FROM full_g f JOIN v{it - 1} v ON f.j = v.dim GROUP BY f.i),
    v{it} AS MATERIALIZED (
      SELECT dim, wx / sqrt(SUM(wx * wx) OVER ()) AS x FROM w{it})""")
    vf = f"v{POWER_ITERS}"
    return f"""
    WITH {",".join(ctes)},
    lam AS (
      SELECT SUM(xi.x * f.g * xj.x) AS eigenvalue
      FROM full_g f
      JOIN {vf} xj ON f.j = xj.dim
      JOIN {vf} xi ON f.i = xi.dim),
    anchor AS (
      SELECT CASE WHEN ax > 0 THEN 1.0 WHEN ax < 0 THEN -1.0
                  ELSE 0.0 END AS s
      FROM (SELECT x AS ax FROM {vf}
            ORDER BY abs(x) DESC, dim ASC LIMIT 1))
    SELECT v.dim,
           ROUND(v.x * a.s, 6) + 0 AS component,
           ROUND(l.eigenvalue, 3) AS eigenvalue
    FROM {vf} v CROSS JOIN anchor a CROSS JOIN lam l
    """


@register(
    "pca_top_component_power",
    tags=("similarity", "iterative"),
    oracle=_pca_oracle(),
)
def pca_top_component_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram matrix by power
    iteration ({it} fixed iterations): v <- normalize(G v) — the
    simplest distributed eigensolver, the building block under PCA
    whitening, spectral hashing, and embedding-drift monitors.

    The Gram relation reuses embedding_gram_matrix's integer-exact
    (i, j, gram) upper triangle (mirrored to full symmetry). The
    matrix is d x d for model width d — constant-size at ANY corpus
    scale (100 TB only changes the cell values) — so the whole
    60-hop loop is dense linear algebra over one Arrow batch: a
    single repartition(1) collects the d^2 relation (16M rows at
    d=4096) into the same BLAS-via-mapInPandas execution the Gram
    builder itself uses, and numpy runs matvec + normalize per hop
    in-process. No driver state; nothing row-at-a-time. Sign is
    fixed deterministically (the largest-|component| dimension,
    lowest dim on ties, is made positive), so the result is
    reproducible run to run.

    Hash-oracled (round-5 conversion): the Gram input is integer-exact
    in both engines and power iteration is contractive, so the oracle
    unrolls the same {it} hops as DuckDB CTEs (see _pca_oracle) and the
    outputs agree inside the ROUND quantization. tests/test_mlprep.py
    additionally certifies against numpy's exact eigendecomposition of
    the SAME matrix: |cosine| >= 0.999, Rayleigh quotient within 1e-6
    relative, unit norm.
    """.format(it=POWER_ITERS)
    ut = embedding_gram_matrix(spark, sf_dir)
    full = ut.unionByName(
        ut.where(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "gram"
        )
    ).select("i", "j", F.col("gram").cast("double").alias("g"))

    # The Gram relation is d x d where d is the MODEL width — a
    # constant, not a data-scale quantity (the 100 TB corpus only
    # changes the integer cell values, never the row count). Iterating
    # a d x d matvec as 60 distributed join+agg+window rounds paid
    # ~180 scheduled stages to move a few-KB vector (measured 13s at
    # d=64 with per-round checkpoints; a broadcast-hint variant was
    # 33s — each hop's broadcast build re-serializes through the
    # driver). The right execution for constant-size dense algebra is
    # the same one embedding_gram_matrix already uses for its partial
    # products: hand the whole relation to BLAS inside one Arrow
    # batch. One repartition(1) (bounded by d^2 rows — 16M at
    # d=4096), one numpy power loop, identical recurrence: matvec,
    # L2-normalize per hop, Rayleigh quotient, largest-|component|
    # (lowest dim on ties) sign anchor. Float-sum order differs from
    # the old per-partition partial sums at the last ulp — the same
    # cross-engine tolerance the oracle already absorbs by design
    # (contractive iteration + ROUND quantization; see _pca_oracle).
    def _power_all(batches):
        import numpy as np
        import pandas as pd

        parts = [b for b in batches if len(b)]
        if not parts:
            return
        rows = pd.concat(parts)
        d = int(rows["i"].max()) + 1
        # Contract with embedding_gram_matrix: it emits the COMPLETE
        # upper triangle (zeros included, via triu_indices), so after
        # mirroring the relation is exactly d*d cells. If that producer
        # ever started dropping zero cells, this dense fill would
        # silently mis-shape — fail loudly instead (round-8 ADVICE).
        assert len(rows) == d * d, (
            f"gram relation is {len(rows)} cells, expected {d}*{d} — "
            "embedding_gram_matrix no longer emits the full triangle?"
        )
        g = np.zeros((d, d), dtype=np.float64)
        g[rows["i"].to_numpy(), rows["j"].to_numpy()] = rows["g"].to_numpy()
        v = np.ones(d, dtype=np.float64)
        for _ in range(POWER_ITERS):
            w = g @ v
            v = w / np.sqrt(float(np.dot(w, w)))
        lam = float(v @ (g @ v))
        # deterministic sign: the largest-|x| dimension (lowest dim
        # wins ties) is made positive
        k = int(np.lexsort((np.arange(d), -np.abs(v)))[0])
        s = float(np.sign(v[k]))

        def round_half_up(x: np.ndarray, digits: int) -> np.ndarray:
            # Spark/DuckDB ROUND semantics (half away from zero), plus
            # `+ 0.0` so a rounded-to-zero negative is +0.0 on both
            # engines (the signed-zero convention the oracles pin).
            # Residual ulp risk (round-8 ADVICE, accepted): this scales
            # in binary floating point (abs(x)*10^d + 0.5), which can
            # disagree with an engine's decimal-exact ROUND only when a
            # component lands exactly on a representation boundary —
            # probability ~1e-10 per value for these contractive
            # iterates, and the oracle quantizes identically; green at
            # every shipped SF.
            scale = 10.0 ** digits
            return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale + 0.0

        yield pd.DataFrame(
            {
                "dim": np.arange(d, dtype=np.int32),
                "component": round_half_up(v * s, 6),
                "eigenvalue": np.full(d, round_half_up(np.array([lam]), 3)[0]),
            }
        )

    return full.repartition(1).mapInPandas(
        _power_all, "dim int, component double, eigenvalue double"
    )


# ------------------------------------- contiguous block formation

BLOCK_TOKENS = 512


@register(
    "blocks_contiguous_stream",
    tags=("pipeline", "window", "hash"),
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '\\S+')) AS n_tok,
             {md5_long_sql("'shard:' || CAST(doc_id AS VARCHAR)")}
               % {N_SHARDS} AS shard,
             {md5_long_sql("'order:' || CAST(doc_id AS VARCHAR)")}
               AS order_key
      FROM documents
    ),
    walk AS (
      SELECT shard, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY order_key
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS cum
      FROM assigned
    ),
    flagged AS (
      SELECT shard, n_tok, cum,
             CASE WHEN n_tok > 0
                  AND (cum - n_tok) // {BLOCK_TOKENS}
                      <> (cum - 1) // {BLOCK_TOKENS}
                  THEN 1 ELSE 0 END AS crossing
      FROM walk
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tok) + {BLOCK_TOKENS} - 1) // {BLOCK_TOKENS} AS BIGINT)
             AS n_blocks,
           CAST(SUM(crossing) AS BIGINT) AS n_crossing_docs,
           CAST((SUM(n_tok) + {BLOCK_TOKENS} - 1) // {BLOCK_TOKENS}
                * {BLOCK_TOKENS} - SUM(n_tok) AS BIGINT) AS tail_waste
    FROM flagged GROUP BY shard
    """,
)
def blocks_contiguous_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style contiguous block formation census: documents are laid
    end-to-end in the deterministic epoch order (the shard/order hash
    pair from shuffle_shard_assignment above) and cut into fixed
    {block}-token training blocks; per shard, how many blocks result,
    how many documents straddle a block boundary (the attention-mask /
    document-causal-masking cost), and the tokens wasted padding the
    final partial block. The third classic dataset-formatting mode
    next to sliding-window chunking (text_chunk_windows) and
    greedy packing (pack_sequences_greedy).

    Determinism: token counts are integer regexp counts; the stream
    position is an exact windowed cumsum keyed by the unique md5 order
    key. Boundary indices stay non-negative, so truncating (Spark
    ``div``) and flooring (DuckDB ``/`` on integers) division agree —
    the crossing test is guarded to n_tok > 0 precisely so the
    ``cum - 1`` never goes negative where the engines' integer
    divisions diverge.

    Scale: one scan-side projection (two md5s + one regexp count in
    codegen), one shuffle on shard, a per-shard window walk (the
    epoch-writer order), and a |shards|-row census. The cumsum is per
    shard — the global stream never serializes through one partition.
    """.format(block=BLOCK_TOKENS)
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"\S+")).alias("n_tok"),
        F.pmod(
            md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(N_SHARDS),
        ).alias("shard"),
        md5_long(F.concat(F.lit("order:"), F.col("doc_id").cast("string"))).alias(
            "order_key"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("order_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = assigned.select(
        "shard", "n_tok", F.sum("n_tok").over(w).cast("bigint").alias("cum")
    )
    crossing = F.when(
        (F.col("n_tok") > 0)
        & (
            F.expr(f"(cum - n_tok) div {BLOCK_TOKENS}")
            != F.expr(f"(cum - 1) div {BLOCK_TOKENS}")
        ),
        1,
    ).otherwise(0)
    flagged = walk.select("shard", "n_tok", crossing.alias("crossing"))
    total = F.sum("n_tok")
    n_blocks = F.expr(f"(sum(n_tok) + {BLOCK_TOKENS - 1}) div {BLOCK_TOKENS}")
    return flagged.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.cast("bigint").alias("total_tokens"),
        n_blocks.cast("bigint").alias("n_blocks"),
        F.sum("crossing").cast("bigint").alias("n_crossing_docs"),
        (n_blocks * BLOCK_TOKENS - total).cast("bigint").alias("tail_waste"),
    )


# ----------------------------------------- join IVM (delta propagation)

# Incremental view maintenance for a JOIN view when BOTH sides change:
#   V(A ∪ dA, B ∪ dB) = V(A,B) + dA⋈B + A⋈dB + dA⋈dB
# (count/sum aggregates distribute over the union, so the three delta
# terms ADD onto the stored view). The splits below simulate an
# append batch on each side with deterministic key predicates.
_IVM_ORD_DELTA = "o_orderkey % 10 = 0"   # ~10% of orders arrive in the batch
_IVM_CUST_DELTA = "c_custkey % 7 = 0"    # ~14% of customers are new


@register(
    "ivm_join_orders_customers",
    tags=("join", "agg", "pipeline"),
    oracle=f"""
    SELECT c.c_nationkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def ivm_join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a join-aggregate view with changes on
    BOTH sides: the engine computes base(A,B) + dA⋈B + A⋈dB + dA⋈dB
    and the DuckDB oracle recomputes the full join from scratch — the
    driver row passing means the delta algebra is EXACTLY right
    (missing the dA⋈dB cross term, the classic IVM bug, shifts counts
    and fails the hash).

    Scale (100 TB): the production win is that the three delta terms
    scan only the arriving batches (dA, dB are pushed-down predicate
    scans here, standing in for the stored view + change feed): at a
    1% daily append rate the maintenance cost is ~2% of a full
    recompute. Each term is an equi-join on the same key; the dim
    side broadcasts. The final combine is a 25-key agg of four
    constant-size partial views.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B training-pipeline / incremental family (joins sibling
    of events_incremental_hourly_merge's agg-only IVM).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    a_old = orders.where(f"NOT ({_IVM_ORD_DELTA})")
    d_a = orders.where(_IVM_ORD_DELTA)
    b_old = cust.where(f"NOT ({_IVM_CUST_DELTA})")
    d_b = cust.where(_IVM_CUST_DELTA)

    def view(o: DataFrame, c: DataFrame) -> DataFrame:
        return (
            o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("cents").alias("revenue_cents"),
            )
        )

    base = view(a_old, b_old)
    deltas = [view(d_a, b_old), view(a_old, d_b), view(d_a, d_b)]
    merged = base
    for d in deltas:
        merged = merged.unionByName(d)
    return merged.groupBy("c_nationkey").agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("revenue_cents").cast("long").alias("revenue_cents"),
    )


# ---------------------------------- consistent-hash rebalance audit

# Growing a mod-N layout by one shard remaps ~N/(N+1) of all keys;
# a consistent-hash ring remaps ~1/(N+1). This audit MEASURES both
# on the real key population — the number every resharding plan
# (shuffle shards, cache nodes, kafka-style partition growth) needs
# before touching 100 TB. Ring math is integer-exact: 40-bit md5
# hashes, clockwise distance = (vnode - key) mod 2^40, assignment =
# argmin distance packed as dist*64+shard so ONE MIN aggregate is
# deterministic on both engines.
_CH_SHARDS = 32
_CH_VNODES = 8          # virtual nodes per shard on the ring
_CH_HASH_BITS = 40
_CH_SCALE = 1 << _CH_HASH_BITS


def _h40_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 10)) AS BIGINT)"


@register(
    "consistent_hash_rebalance",
    tags=("hash", "layout", "agg"),
    oracle=f"""
    WITH keys AS (
      SELECT o_orderkey AS k, {_h40_sql("'k:' || CAST(o_orderkey AS VARCHAR)")} AS h
      FROM orders
    ),
    vn AS (
      SELECT s.shard, v.vnode,
             {_h40_sql("'vn:' || CAST(s.shard AS VARCHAR) || ':' || CAST(v.vnode AS VARCHAR)")} AS vh
      FROM (SELECT unnest(generate_series(0, {_CH_SHARDS})) AS shard) s,
           (SELECT unnest(generate_series(0, {_CH_VNODES - 1})) AS vnode) v
    ),
    assign AS (
      SELECT k,
             CAST(MIN(CASE WHEN vn.shard < {_CH_SHARDS}
                  THEN ((vn.vh - keys.h + {_CH_SCALE}) % {_CH_SCALE}) * 64 + vn.shard
                  END) % 64 AS BIGINT) AS ring_before,
             CAST(MIN(((vn.vh - keys.h + {_CH_SCALE}) % {_CH_SCALE}) * 64 + vn.shard)
                  % 64 AS BIGINT) AS ring_after
      FROM keys CROSS JOIN vn GROUP BY k
    ),
    census AS (
      SELECT 'mod_n' AS strategy,
             COUNT(*) AS n_keys,
             CAST(SUM(CASE WHEN k % {_CH_SHARDS} <> k % {_CH_SHARDS + 1}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
      FROM keys
      UNION ALL
      SELECT 'consistent_ring', COUNT(*),
             CAST(SUM(CASE WHEN ring_before <> ring_after THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM assign
    )
    SELECT strategy, n_keys, n_moved,
           n_moved * 100000 // n_keys AS moved_per_100k
    FROM census
    """,
)
def consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured rebalance cost of adding one shard (32 -> 33) under
    mod-N hashing vs a consistent-hash ring with 8 virtual nodes per
    shard, over the real order-key population: mod-N moves ~97% of
    keys, the ring ~3% — the audit behind every resharding decision
    (shuffle_shard_assignment's growth story).

    Determinism: 40-bit md5 hashes; ring assignment = MIN over
    (clockwise_distance * 64 + shard) — one packed integer argmin,
    identical cross-engine; wrap-around handled by modular distance
    (no special case).

    Scale (100 TB): the vnode ring (33 x 8 entries) is a plan-time
    literal array, so per-key assignment is a pure scan-side array
    argmin — no join, no fan-out, no per-key shuffle; the only
    exchange is the constant-size census aggregation. Both epochs'
    assignments come from the SAME projection (the before-ring is the
    filtered subset of the after ring's array).

    Reference parity: the reference hard-codes md5(key) % R routing
    (mapreduce/worker/__main__.py:142-144, SURVEY.md section 2.A
    row 4) — exactly the mod-N strategy whose resharding cost this
    audit quantifies; the ring is the production alternative.
    """
    orders = load_table(spark, sf_dir, "orders", fanout=True)

    def h40(c) -> F.Column:
        return F.conv(F.substring(F.md5(c), 1, 10), 16, 10).cast("long")

    keys = orders.select(
        F.col("o_orderkey").alias("k"),
        h40(F.concat(F.lit("k:"), F.col("o_orderkey").cast("string"))).alias("h"),
    )
    # The ring is a CONSTANT 33x8 relation: fold it into a literal
    # struct array (vnode hashes computed once at plan build, exactly
    # like minhash_params derives its constants) and take the per-key
    # argmin with array expressions in the scan projection. The former
    # crossJoin(broadcast(vn)) + groupBy(k) materialized a |keys| x 264
    # row fan-out through the aggregation machinery and re-aggregated
    # 150k groups — ~40M rows of partial-MIN state for a value each row
    # can compute alone; this form is one projection, no fan-out, no
    # per-key exchange (measured ~5-6s -> ~1s at sf0.01). Same packed
    # integer math, bit-identical results.
    import hashlib

    vn_lits = []
    for shard in range(_CH_SHARDS + 1):
        for vnode in range(_CH_VNODES):
            vh = int(
                hashlib.md5(f"vn:{shard}:{vnode}".encode()).hexdigest()[:10], 16
            )
            vn_lits.append(
                F.struct(
                    F.lit(vh).cast("long").alias("vh"),
                    F.lit(shard).cast("long").alias("shard"),
                )
            )
    vn_arr = F.array(*vn_lits)

    def ring_min(only_before: bool) -> F.Column:
        arr = (
            F.filter(vn_arr, lambda x: x.shard < _CH_SHARDS)
            if only_before
            else vn_arr
        )
        packed = F.transform(
            arr,
            lambda x: F.pmod(x.vh - F.col("h") + _CH_SCALE, F.lit(_CH_SCALE)) * 64
            + x.shard,
        )
        return (F.array_min(packed) % 64).cast("long")

    assign = keys.select(
        "k",
        ring_min(only_before=True).alias("ring_before"),
        ring_min(only_before=False).alias("ring_after"),
    )
    mod_n = keys.agg(
        F.lit("mod_n").alias("strategy"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(
            F.when(
                F.col("k") % _CH_SHARDS != F.col("k") % (_CH_SHARDS + 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved"),
    )
    ring = assign.agg(
        F.lit("consistent_ring").alias("strategy"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("ring_before") != F.col("ring_after"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
    )
    return (
        mod_n.unionByName(ring)
        .withColumn("moved_per_100k", F.expr("n_moved * 100000 div n_keys"))
    )


# ------------------------------------------- bigram LM perplexity

# Add-one smoothing over the observed-bigram vocabulary; surprisal is
# quantized per bigram to integer millinats before summation (same
# cross-engine argument as text_unigram_logprob above).


@register(
    "bigram_lm_doc_perplexity",
    tags=("text", "pipeline", "topk"),
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, toks FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
      WHERE len(toks) >= 2
    ),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM tok, UNNEST(range(1, len(toks))) AS r(i)
    ),
    uni AS (
      SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1
    ),
    vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM bg),
    pair AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ),
    scored AS (
      SELECT bg.doc_id,
             CAST(ROUND(1000 * ln(CAST(c1 + v AS DOUBLE) / (c12 + 1)))
                  AS BIGINT) AS s
      FROM bg
      JOIN pair ON pair.w1 = bg.w1 AND pair.w2 = bg.w2
      JOIN uni ON uni.w1 = bg.w1
      CROSS JOIN vocab
    ),
    perdoc AS (
      SELECT doc_id, COUNT(*) AS n_bigrams, SUM(s) AS sum_s
      FROM scored GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(sum_s AS BIGINT) AS sum_surprisal_mnat,
           ROUND(CAST(sum_s AS DOUBLE) / n_bigrams, 3) AS mean_surprisal_mnat
    FROM perdoc
    ORDER BY mean_surprisal_mnat DESC, doc_id
    LIMIT 50
    """,
)
def bigram_lm_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal under an add-one-smoothed
    corpus bigram LM — the order-2 upgrade of text_unigram_logprob's
    CCNet-style quality proxy, surfacing the 50 most out-of-model
    documents (the classic "weird text" skim list a curation pass
    reviews before setting a perplexity filter threshold).

    Model: P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V) with V = distinct
    successor vocabulary — i.e. add-one over observed bigram types.
    Surprisal is quantized per bigram to integer millinats
    (``round(1000 * ln((c1 + V) / (c12 + 1)))``) BEFORE the per-doc
    sum, so aggregation is exact bigint arithmetic in any association
    order; ln sees the identical IEEE double in both engines (exact
    integer operands, one division).

    Scale (100 TB): the bigram stream is exploded array-side (zip of
    the token array with its tail — no self-join) and persisted once
    for its three consumers (pair counts, left-context counts, the
    scoring join). Pair counts are one partial+final agg on the
    (w1, w2) key; context counts on w1. The scoring join is equi on
    (w1, w2) — model-sized right side, broadcast-able at vocab scale
    or shuffled; AQE picks. Per-doc rollup is one shuffle on doc_id;
    top-50 is TakeOrdered, never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("toks")).where(
        F.size("toks") >= 2
    )
    bg = scoped_persist(
        ("bigram_lm.bg", sf_dir),
        toks.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")),
    )
    uni = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = bg.agg(F.countDistinct("w2").alias("v"))
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        bg.join(pair, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                1000
                * F.log(
                    (F.col("c1") + F.col("v")).cast("double") / (F.col("c12") + 1)
                )
            )
            .cast("bigint")
            .alias("s"),
        )
    )
    perdoc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("s").alias("sum_s")
    )
    return (
        perdoc.select(
            "doc_id",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.col("sum_s").cast("bigint").alias("sum_surprisal_mnat"),
            F.round(F.col("sum_s").cast("double") / F.col("n_bigrams"), 3).alias(
                "mean_surprisal_mnat"
            ),
        )
        .orderBy(F.desc("mean_surprisal_mnat"), "doc_id")
        .limit(50)
    )


