r"""Training-data pipeline operators beyond dedup: benchmark
decontamination, deterministic sequence packing, and a PII audit.

These are the ops a pre-training corpus pipeline runs between "raw
documents" and "token shards":

- decontamination: remove train documents that CONTAIN a benchmark
  document's n-grams (containment = |A∩B| / |B|, asymmetric by design
  — a giant train doc that swallows a small eval doc is contaminated
  even though symmetric Jaccard is tiny). Same inverted-index
  equi-join discipline as the dedup module: never compare all pairs.
- sequence packing: concat-and-chunk documents into fixed-capacity
  token bins, the standard way training examples are packed. Packing
  is per-shard (hash of doc_id), because a GLOBAL running sum is a
  single-partition sort at 100 TB; within a shard the assignment is a
  window cumulative sum — deterministic, so resumable and
  oracle-checkable.
- PII audit/scrub: regex surface for emails/phones/SSNs/IPs via
  built-in regexp functions (JVM codegen, no UDF). The synthetic
  corpus contains no PII, so the audit is exercised for wiring here
  and the masking behavior is pinned by unit fixtures
  (tests/test_pipeline_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import canonical_text, md5_long_sql, shingles, tokens
from ..registry import register
from ..sources import load_table

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"
# Token-less docs shingle to the EMPTY set on both engines (see
# functions.shingles: the single-element fallback rendered '' in
# Spark but NULL in DuckDB).
_SHINGLES = f"""
    CASE WHEN len({_TOKS}) >= 3
         THEN list_distinct(list_transform(range(1, len({_TOKS}) - 1),
              i -> concat({_TOKS}[i], ' ', {_TOKS}[i+1], ' ', {_TOKS}[i+2])))
         WHEN len({_TOKS}) > 0
         THEN [array_to_string({_TOKS}, ' ')]
         ELSE CAST([] AS VARCHAR[]) END
"""

BENCH_SOURCE = "src0"  # the held-out "benchmark" split of the corpus
CONTAINMENT_THRESHOLD = 0.2


@register(
    "decontaminate_containment",
    tags=("dedup", "pipeline", "join"),
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_SHINGLES} AS sh FROM documents),
    bench AS (SELECT doc_id, sh FROM t WHERE source = '{BENCH_SOURCE}'),
    train AS (SELECT doc_id, sh FROM t WHERE source <> '{BENCH_SOURCE}'),
    be AS (SELECT doc_id, unnest(sh) AS s FROM bench),
    te AS (SELECT doc_id, unnest(sh) AS s FROM train),
    inter AS (
      SELECT te.doc_id AS train_doc, be.doc_id AS bench_doc,
             COUNT(*) AS n_common
      FROM te JOIN be ON te.s = be.s
      GROUP BY 1, 2
    )
    SELECT train_doc, bench_doc, n_common,
           CAST(n_common AS DOUBLE) / len(b.sh) AS containment
    FROM inter
    JOIN bench b ON b.doc_id = bench_doc
    WHERE CAST(n_common AS DOUBLE) / len(b.sh) >= {CONTAINMENT_THRESHOLD}
    """,
)
def decontaminate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train documents sharing >= 20% of a
    benchmark document's 3-word shingles (containment in the BENCHMARK
    doc, the standard eval-leak metric — asymmetric on purpose).

    Scale: the candidate join is the inverted index on the shingle
    (equi-join, no all-pairs); the benchmark side is the small split,
    so its exploded index broadcasts, and |bench shingles| rides along
    instead of re-joining the corpus. Division happens once per
    candidate PAIR, after both counts are exact integers.
    """
    from ..functions import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    # Persisting the shingled corpus is both reuse (two consumers) and
    # the projection barrier that stops CollapseProject from fusing
    # tokens() back into the shingles lambda (~6x re-eval otherwise;
    # measured 17s -> ~2s at sf0.1 for this query).
    t = scoped_persist(
        ("decontaminate_containment", sf_dir),
        docs.select("doc_id", "source", tokens("text").alias("tok")).select(
            "doc_id", "source", shingles(F.col("tok")).alias("sh")
        ),
    )
    bench = t.filter(F.col("source") == BENCH_SOURCE).select(
        F.col("doc_id").alias("bench_doc"),
        F.col("sh").alias("bench_sh"),
        F.size("sh").alias("bench_size"),
    )
    be = bench.select(
        "bench_doc", "bench_size", F.explode("bench_sh").alias("s")
    )
    te = (
        t.filter(F.col("source") != BENCH_SOURCE)
        .select(F.col("doc_id").alias("train_doc"), F.explode("sh").alias("s"))
    )
    inter = (
        te.join(F.broadcast(be), "s")
        .groupBy("train_doc", "bench_doc", "bench_size")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    containment = F.col("n_common").cast("double") / F.col("bench_size")
    return (
        inter.filter(containment >= CONTAINMENT_THRESHOLD)
        .select("train_doc", "bench_doc", "n_common", containment.alias("containment"))
    )


PACK_CAPACITY = 512  # tokens per packed sequence
N_PACK_SHARDS = 32


@register(
    "pack_sequences_greedy",
    tags=("pipeline", "window"),
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             doc_id % {N_PACK_SHARDS} AS shard,
             len({_TOKS}) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
      FROM d
    )
    SELECT doc_id, shard, n_tokens,
           CAST(FLOOR(cum_before / {PACK_CAPACITY}) AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_CAPACITY} AS BIGINT) AS pack_offset
    FROM c
    """,
)
def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): assign each document a
    (shard, pack_id, pack_offset) under a {PACK_CAPACITY}-token bin
    capacity, packing greedily in doc_id order within each shard.

    Scale: a GLOBAL running sum would be one sorted partition — the
    shard axis (hash of doc_id) keeps every cumulative-sum window
    parallel, the same layout the token-shard writer wants anyway
    (partitionBy(shard) on disk). One shuffle on shard; everything
    else is a window over the sorted shard.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % N_PACK_SHARDS).alias("shard"),
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("cum_before") / PACK_CAPACITY).cast("bigint").alias("pack_id"),
        (F.col("cum_before") % PACK_CAPACITY).cast("bigint").alias("pack_offset"),
    )


# ------------------------------------------------------------- PII scrub

_PII_PATTERNS = {
    # order matters: scrub emails before bare phone-ish digit runs
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b(?:\+?1[-. ]?)?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def scrub_pii(text_col) -> F.Column:
    """Mask emails / SSNs / phone numbers / IPv4s with typed tags
    (``[EMAIL]`` etc.) — chained built-in ``regexp_replace`` calls, so
    the whole scrub stays inside JVM codegen on the scan stage (no UDF,
    no shuffle). Pattern order is load-bearing: emails first so their
    digit runs can't half-match the phone pattern."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat in _PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, f"[{name.upper()}]")
    return col


def pii_counts(text_col) -> list[F.Column]:
    """One count column per PII class (regexp_count, JVM-side)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
        for name, pat in _PII_PATTERNS.items()
    ]


@register(
    "text_pii_audit",
    tags=("text", "pipeline"),
    oracle=r"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')))
                AS BIGINT) AS n_email,
           CAST(SUM(len(regexp_extract_all(text,
               '\b\d{3}-\d{2}-\d{4}\b'))) AS BIGINT) AS n_ssn
    FROM documents
    GROUP BY source
    """,
)
def text_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure counts (emails, SSNs). The synthetic
    corpus is PII-free so every count is zero — the masking semantics
    themselves are pinned on fixture rows in
    tests/test_pipeline_ops.py; this entry keeps the scan-side wiring
    (regexp_count over the corpus) oracle-checked.

    Scale: scan -> partial agg on the tiny source key; the regexes run
    inside codegen on the scan, nothing shuffles but the counters.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.regexp_count("text", F.lit(_PII_PATTERNS["email"]))).alias("n_email"),
        F.sum(F.regexp_count("text", F.lit(_PII_PATTERNS["ssn"]))).alias("n_ssn"),
    )


# ------------------------------------------- fixed-size sampling

SAMPLE_K_PER_SOURCE = 5


@register(
    "sample_fixed_per_source",
    tags=("sampling", "window", "pipeline"),
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5('fix:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hkey
      FROM documents
    ),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY hkey, doc_id) AS rk
          FROM h)
    SELECT doc_id, source, n_chars, rk
    FROM r WHERE rk <= {SAMPLE_K_PER_SOURCE}
    """,
)
def sample_fixed_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size deterministic sample: the K documents with the
    smallest md5 rank per source — the distributed equivalent of
    per-stratum reservoir sampling, but reproducible (the sample is a
    pure function of the keys, so re-runs, retries, and incremental
    loads agree; a classic reservoir's sample depends on encounter
    order). Complements ``sample_stratified`` (fixed RATE) with fixed
    SIZE per stratum.

    Scale: one shuffle on source; rk <= K plans as WindowGroupLimit
    (running top-K per group), so no group is ever fully sorted.
    """
    from ..functions import md5_long

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        "n_chars",
        md5_long(F.concat(F.lit("fix:"), F.col("doc_id").cast("string"))).alias("hkey"),
    )
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K_PER_SOURCE)
        .select("doc_id", "source", "n_chars", "rk")
    )


# ------------------------------------------- skew-safe join surface


@register(
    "skew_salted_join_events",
    tags=("join", "skew", "pipeline"),
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
)
def skew_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value per customer segment computed through the SALTED
    join operator (operators/skew.py): the events fact side gets a
    deterministic xxhash64 salt, the customer dim is replicated
    n_salts times, and the join key becomes (user_id, salt) — the
    formulation for a hot key that AQE's skew split can't fix. The
    oracle is the PLAIN join: salting must be semantically invisible.

    Scale: trades n_salts-fold dim replication for n_salts-way reducer
    parallelism on the hot key; the aggregate after the join is partial
    -agg'd map-side as usual.
    """
    from ..functions import dsum
    from ..operators.skew import salted_join

    t_events = load_table(spark, sf_dir, "events").select("user_id", "value")
    t_cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        t_events,
        t_cust.withColumnRenamed("c_custkey", "user_id"),
        on="user_id",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "total_value"),
    )


# --------------------------------------------- end-to-end funnel

_CANON = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "pipeline_e2e_funnel",
    tags=("pipeline", "agg"),
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, source, text, {_TOKS} AS toks FROM documents
    ),
    q AS MATERIALIZED (
      SELECT * FROM tok
      WHERE len(toks) BETWEEN 10 AND 1000
        AND len(list_distinct(toks)) * 5 >= len(toks)
    ),
    ex AS (SELECT *, MIN(doc_id) OVER (PARTITION BY md5({_CANON})) AS keep_id
           FROM q),
    kept AS MATERIALIZED (SELECT * FROM ex WHERE doc_id = keep_id),
    sh AS MATERIALIZED (
      SELECT doc_id, source, {_SHINGLES} AS sgl FROM documents
    ),
    be AS (SELECT doc_id, len(sgl) AS bsz, unnest(sgl) AS s FROM sh
           WHERE source = '{BENCH_SOURCE}'),
    te AS (SELECT k.doc_id, s.s
           FROM kept k JOIN (SELECT doc_id, unnest(sgl) AS s FROM sh) s
             ON s.doc_id = k.doc_id
           WHERE k.source <> '{BENCH_SOURCE}'),
    contaminated AS MATERIALIZED (
      SELECT DISTINCT te.doc_id
      FROM te JOIN be ON te.s = be.s
      GROUP BY te.doc_id, be.doc_id, be.bsz
      HAVING CAST(COUNT(*) AS DOUBLE) / bsz >= {CONTAINMENT_THRESHOLD}
    ),
    clean AS (
      SELECT * FROM kept
      WHERE source <> '{BENCH_SOURCE}'
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    shard_tokens AS (
      SELECT doc_id % {N_PACK_SHARDS} AS shard, SUM(len(toks)) AS tot
      FROM clean GROUP BY 1
    )
    SELECT 'total' AS stage, COUNT(*) AS n FROM documents
    UNION ALL SELECT 'quality', COUNT(*) FROM q
    UNION ALL SELECT 'exact_dedup', COUNT(*) FROM kept
    UNION ALL SELECT 'decontaminated', COUNT(*) FROM clean
    UNION ALL SELECT 'packs',
      CAST(SUM(CAST(CEIL(CAST(tot AS DOUBLE) / {PACK_CAPACITY}) AS BIGINT))
           AS BIGINT)
      FROM shard_tokens
    """,
)
def pipeline_e2e_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE composed job: quality
    gate -> exact dedup (keep min doc_id per canonical text) -> drop
    the benchmark split and train docs contaminated by it -> count the
    packed sequences the survivors fill. Output is the stage funnel
    (stage, n) — the report a pipeline run ships.

    Composition evidence: every stage reuses the same library pieces
    the standalone queries use (tokens/shingles/canonical_text,
    containment join, shard packing), so this pins that the operators
    COMPOSE, not just run in isolation.

    Scale: quality/dedup/packing are scan + one keyed shuffle each;
    the contamination check joins only quality-surviving train docs
    against the small benchmark index (broadcast); stage counts are
    scalar aggregates unioned at the end — no stage materializes to
    the driver.
    """
    from ..functions import canonical_text, scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    # tok feeds every funnel stage (quality filter, dedup window, the
    # packing token sums, and three of the five stage counters) —
    # persist once rather than re-tokenize per branch.
    tok = scoped_persist(
        ("pipeline_e2e_funnel:tok", sf_dir),
        docs.select("doc_id", "source", "text", tokens("text").alias("toks")),
    )
    n = F.size("toks")
    nuniq = F.size(F.array_distinct("toks"))
    q = tok.filter((n >= 10) & (n <= 1000) & (nuniq * 5 >= n))
    wq = Window.partitionBy(F.md5(canonical_text("text")))
    kept = (
        q.withColumn("keep_id", F.min("doc_id").over(wq))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )

    sh = scoped_persist(
        ("pipeline_e2e_funnel:shingles", sf_dir),
        docs.select("doc_id", "source", tokens("text").alias("tok2")).select(
            "doc_id", "source", shingles(F.col("tok2")).alias("sgl")
        ),
    )
    be = sh.filter(F.col("source") == BENCH_SOURCE).select(
        F.col("doc_id").alias("bench_doc"),
        F.size("sgl").alias("bsz"),
        F.explode("sgl").alias("s"),
    )
    te = (
        kept.filter(F.col("source") != BENCH_SOURCE)
        .select("doc_id")
        .join(sh.select("doc_id", F.explode("sgl").alias("s")), "doc_id")
    )
    contaminated = (
        te.join(F.broadcast(be), "s")
        .groupBy("doc_id", "bench_doc", "bsz")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common").cast("double") / F.col("bsz")
                >= CONTAINMENT_THRESHOLD)
        .select("doc_id")
        .distinct()
    )
    clean = (
        kept.filter(F.col("source") != BENCH_SOURCE)
        .join(contaminated, "doc_id", "left_anti")
    )
    shard_tokens = clean.groupBy(
        (F.col("doc_id") % N_PACK_SHARDS).alias("shard")
    ).agg(F.sum(F.size("toks")).alias("tot"))
    n_packs = shard_tokens.agg(
        F.sum(
            F.ceil(F.col("tot").cast("double") / PACK_CAPACITY).cast("bigint")
        ).cast("bigint").alias("n")
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )

    return (
        stage("total", docs)
        .unionByName(stage("quality", q))
        .unionByName(stage("exact_dedup", kept))
        .unionByName(stage("decontaminated", clean))
        .unionByName(n_packs.select(F.lit("packs").alias("stage"), "n"))
    )


# --------------------------------- right-to-be-forgotten cascade audit


RTBF_SAMPLE_MOD = 37  # deterministic erasure cohort: md5(user) % 37 == 0


@register(
    "rtbf_delete_audit",
    tags=("pipeline", "join", "audit"),
    oracle=f"""
    WITH erased AS (
      SELECT c_custkey AS user_key FROM customer
      WHERE {{h}} % {RTBF_SAMPLE_MOD} = 0
    ),
    ev AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
      WHERE user_id IN (SELECT user_key FROM erased)
    ),
    ords AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT user_key FROM erased)
    ),
    li AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM ords)
    )
    SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows FROM erased
    UNION ALL SELECT 'events', n FROM ev
    UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM ords
    UNION ALL SELECT 'lineitem', n FROM li
    ORDER BY tbl
    """.format(h=md5_long_sql("'rtbf:' || CAST(c_custkey AS VARCHAR)")),
)
def rtbf_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: for a deterministic erasure
    cohort (md5-sampled customers, no RNG), count every row each
    downstream table would lose — events directly keyed by user, and
    the TWO-HOP cascade orders -> lineitem (lineitems have no customer
    key; their erasure set is defined through the order FK).

    This is the dry-run half of a GDPR/CCPA delete pipeline: the same
    semi-join spine, executed as LEFT ANTI joins against the erasure
    set, produces the retained tables.

    Scale (100 TB): the erasure cohort is a projection of the customer
    dim; each count is ONE semi-join (Spark plans LeftSemi) keyed on
    the FK — the lineitem hop semi-joins against the erased ORDER
    KEYS (itself a semi-join output), so no fact table is ever joined
    to more than a key set. Erased-key sets broadcast when small;
    at larger cohorts they degrade gracefully to shuffled semi-joins
    on the FK. Output is a 4-row census.
    """
    from ..functions import md5_long

    cust = load_table(spark, sf_dir, "customer")
    erased = cust.select(F.col("c_custkey").alias("user_key")).where(
        F.pmod(
            md5_long(F.concat(F.lit("rtbf:"), F.col("c_custkey").cast("string"))),
            F.lit(RTBF_SAMPLE_MOD),
        )
        == 0
    )
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    ev_n = events.join(
        erased, events.user_id == erased.user_key, "left_semi"
    )
    ords = orders.join(
        erased, orders.o_custkey == erased.user_key, "left_semi"
    ).select("o_orderkey")
    li_n = lineitem.join(
        ords, lineitem.l_orderkey == ords.o_orderkey, "left_semi"
    )

    def census(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("tbl"), "n_rows"
        )

    return (
        census("customer", erased)
        .unionByName(census("events", ev_n))
        .unionByName(census("orders", ords))
        .unionByName(census("lineitem", li_n))
        .orderBy("tbl")
    )


# ------------------------------------------------ join-skew profiler

# The diagnostic that decides WHEN the salting tools in operators/
# skew.py are worth their overhead: for each prospective join/agg key,
# how concentrated is the key distribution, and how many salts would
# flatten the hottest key to roughly an average shuffle partition?
_SKEW_N_PARTITIONS = 32  # the session's shuffle width


@register(
    "join_skew_profile",
    tags=("pipeline", "agg", "audit"),
    oracle=f"""
    WITH per_key AS (
      SELECT 'events.user_id' AS key_col, CAST(user_id AS VARCHAR) AS k,
             COUNT(*) AS n FROM events WHERE user_id IS NOT NULL GROUP BY 2
      UNION ALL
      SELECT 'events.event_type', event_type, COUNT(*)
      FROM events WHERE event_type IS NOT NULL GROUP BY 2
      UNION ALL
      SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS VARCHAR), COUNT(*)
      FROM lineitem GROUP BY 2
    )
    SELECT key_col,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_key_rows,
           MAX(n) * 1000000 // CAST(SUM(n) AS BIGINT) AS top_share_micro,
           MAX(n) * COUNT(*) * 100 // CAST(SUM(n) AS BIGINT) AS skew_factor_pct,
           CAST(CASE WHEN MAX(n) * {_SKEW_N_PARTITIONS} <= CAST(SUM(n) AS BIGINT)
                     THEN 1
                     ELSE (MAX(n) * {_SKEW_N_PARTITIONS}
                           + CAST(SUM(n) AS BIGINT) - 1)
                          // CAST(SUM(n) AS BIGINT)
                END AS BIGINT) AS recommended_salts
    FROM per_key GROUP BY 1
    """,
)
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution skew profile for the three join/agg keys the
    workload actually shuffles on: rows, distinct keys, the hottest
    key's row count and per-million share, a skew factor (hottest key
    vs perfectly uniform, percent), and the salt count that would
    flatten the hottest key to about one average shuffle partition —
    ceil(max_key_rows * P / n_rows). This is the measurement that
    justifies (or vetoes) operators/skew.py's salted join: salting a
    uniform key only adds a shuffle.

    Determinism: all integer (exact ceil-division in BIGINT).

    Scale (100 TB): one partial+final count per key column (the same
    shuffle the profiled join would pay, but carrying (key, count)
    pairs only), then a constant-size census per column. At cluster
    scale you run this on a TABLESAMPLE; shares and the salt
    recommendation are scale-free so the sample estimate carries.

    Reference parity: the reference's md5 % R routing has exactly
    this hot-key failure mode and no diagnostic for it
    (mapreduce/worker/__main__.py:142-144); SURVEY.md section 2.B
    training-pipeline/skew family.
    """
    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        per_key = (
            df.where(F.col(col).isNotNull())
            .groupBy(F.col(col).cast("string").alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return per_key.agg(
            F.lit(label).alias("key_col"),
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").cast("long").alias("max_key_rows"),
        )

    base = (
        profile(events, "user_id", "events.user_id")
        .unionByName(profile(events, "event_type", "events.event_type"))
        .unionByName(profile(lineitem, "l_orderkey", "lineitem.l_orderkey"))
    )
    return base.select(
        "key_col",
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.expr("max_key_rows * 1000000 div n_rows").alias("top_share_micro"),
        F.expr("max_key_rows * n_keys * 100 div n_rows").alias("skew_factor_pct"),
        F.expr(
            f"CASE WHEN max_key_rows * {_SKEW_N_PARTITIONS} <= n_rows THEN 1L "
            f"ELSE (max_key_rows * {_SKEW_N_PARTITIONS} + n_rows - 1) div n_rows "
            "END"
        ).alias("recommended_salts"),
    )


# ------------------------------------------ join-cardinality estimator

# The other half of the planning pair with join_skew_profile: BEFORE
# paying for a join, compute exactly how many rows it would emit —
# from per-key count histograms, never from the join itself.


@register(
    "join_cardinality_estimate",
    tags=("pipeline", "agg", "audit", "join"),
    oracle="""
    WITH lo AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
    oo AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
    lp AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
    pp AS (SELECT p_partkey AS k, COUNT(*) AS c FROM part GROUP BY 1),
    oc AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
    cu AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
    pairs AS (
      SELECT 'lineitem*orders@orderkey' AS join_name, lo.c AS cl, oo.c AS cr
      FROM lo JOIN oo USING (k)
      UNION ALL
      SELECT 'lineitem*part@partkey', lp.c, pp.c FROM lp JOIN pp USING (k)
      UNION ALL
      SELECT 'orders*customer@custkey', oc.c, cu.c FROM oc JOIN cu USING (k)
    )
    SELECT join_name,
           COUNT(*)                            AS n_join_keys,
           CAST(SUM(cl) AS BIGINT)             AS left_matched_rows,
           CAST(SUM(cr) AS BIGINT)             AS right_matched_rows,
           CAST(SUM(cl * cr) AS BIGINT)        AS out_rows,
           CAST(MAX(cl * cr) AS BIGINT)        AS max_key_out,
           CAST(SUM(cl * cr) AS BIGINT) * 100
             // CAST(SUM(cl) AS BIGINT)        AS amplification_pct
    FROM pairs GROUP BY 1
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pre-join output-size estimation from key histograms: for
    each prospective equi-join, |A join B| = sum over matched keys of
    count_A(k) * count_B(k) — computed WITHOUT executing the join.
    Emits per join: matched key count, matched rows on each side, the
    exact output row count, the hottest key's contribution, and the
    output-vs-left amplification percent. This is the number that
    decides shuffle-partition sizing and whether a join needs the
    skew treatment BEFORE any executor touches a fact row.

    Determinism: pure integer counts and products.

    Scale (100 TB): each side collapses to a (key, count) histogram
    with full map-side partial aggregation — the shuffle carries one
    row per DISTINCT key, not one per fact row, then the histogram
    join is tiny relative to the real join it predicts. At cluster
    scale run the fact sides on TABLESAMPLE and scale counts by the
    sampling rate; the amplification ratio is scale-free. The same
    histograms feed join_skew_profile's salt recommendation.

    Reference parity: none — the reference executes blind
    (mapreduce/manager/__main__.py runs whatever M/R layout it is
    given); SURVEY.md section 2.B pipeline/planning family.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")

    def hist(df: DataFrame, col: str) -> DataFrame:
        return df.groupBy(F.col(col).alias("k")).agg(F.count(F.lit(1)).alias("c"))

    def pair(left: DataFrame, right: DataFrame, name: str) -> DataFrame:
        return (
            left.withColumnRenamed("c", "cl")
            .join(right.withColumnRenamed("c", "cr"), "k")
            .select(F.lit(name).alias("join_name"), "cl", "cr")
        )

    pairs = (
        pair(hist(li, "l_orderkey"), hist(orders, "o_orderkey"), "lineitem*orders@orderkey")
        .unionByName(pair(hist(li, "l_partkey"), hist(part, "p_partkey"), "lineitem*part@partkey"))
        .unionByName(pair(hist(orders, "o_custkey"), hist(customer, "c_custkey"), "orders*customer@custkey"))
    )
    return pairs.groupBy("join_name").agg(
        F.count(F.lit(1)).alias("n_join_keys"),
        F.sum("cl").cast("long").alias("left_matched_rows"),
        F.sum("cr").cast("long").alias("right_matched_rows"),
        F.sum(F.col("cl") * F.col("cr")).cast("long").alias("out_rows"),
        F.max(F.col("cl") * F.col("cr")).cast("long").alias("max_key_out"),
        F.expr("CAST(SUM(cl * cr) AS BIGINT) * 100 div CAST(SUM(cl) AS BIGINT)").alias(
            "amplification_pct"
        ),
    )


# ---------------- gate ablation census (filter Venn attribution)


@register(
    "gate_ablation_census",
    tags=("pipeline", "text", "agg"),
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             {_TOKS} AS toks,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS k
      FROM documents
    ),
    dup AS (SELECT k, COUNT(*) AS c FROM t GROUP BY k),
    flags AS (
      SELECT CASE WHEN len(t.toks) >= 10 AND len(t.toks) <= 1000
                   AND len(list_distinct(t.toks)) * 5 >= len(t.toks)
             THEN 1 ELSE 0 END AS passes_quality,
             CASE WHEN t.lang = 'en' THEN 1 ELSE 0 END AS is_en,
             CASE WHEN dup.c = 1 THEN 1 ELSE 0 END AS is_unique,
             CAST(len(t.toks) AS BIGINT) AS n_tok
      FROM t JOIN dup ON dup.k = t.k
    )
    SELECT passes_quality, is_en, is_unique,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM flags GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def gate_ablation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-gate ablation: the full 2³ Venn census of the three
    standard corpus gates — heuristic quality pass (the
    text_quality_score rule), language (en), and exact-dup uniqueness
    (md5 of canonical text seen once) — with doc and token mass per
    cell. This is the attribution table a pipeline owner reads before
    changing a gate: the (0,1,1) cell is exactly what tightening the
    quality gate would additionally delete, and cells never
    double-count the way sequential funnel stage counts do.

    Scale (100 TB): quality/lang flags are scan-side; the dup flag is
    ONE shuffle on the 128-bit canonical-text key (the dedup_exact
    key, map-side combined); the census is an 8-row agg. Reference
    parity: none; SURVEY.md section 2.B training-pipeline family.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    t = docs.select(
        "lang",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tok"),
        F.md5(canonical_text("text")).alias("k"),
    )
    dup = t.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    flags = t.join(dup, "k").select(
        F.when(
            (F.col("n_tok") >= 10)
            & (F.col("n_tok") <= 1000)
            & (F.col("n_uniq_tok") * 5 >= F.col("n_tok")),
            1,
        )
        .otherwise(0)
        .alias("passes_quality"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
        F.when(F.col("c") == 1, 1).otherwise(0).alias("is_unique"),
        "n_tok",
    )
    return (
        flags.groupBy("passes_quality", "is_en", "is_unique")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("passes_quality", "is_en", "is_unique")
    )
