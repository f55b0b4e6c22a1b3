r"""Text-analysis operators over the ``documents`` table: token stats,
quality scoring, language stats, a stopword language-ID heuristic,
document fingerprinting, and reproducible stratified sampling.

These extend the reference's string surface (lowercase + whitespace
tokenize in tests/testdata/exec/wc_map.sh:12) into the operators a
training-data pipeline needs. Everything is Catalyst higher-order
functions on arrays — no Python in the data path — so at 100 TB these
are embarrassingly parallel scan->project pipelines with zero shuffle
(the per-doc ones) or a tiny agg shuffle (the per-lang ones).

The Spark expression and the DuckDB oracle implement the *same
tokenizer* (split lowercased text on \s+, drop empties) so results are
bit-identical; ratios divide exact ints into one double at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import tokens
from ..registry import register
from ..sources import load_table

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"
_STOPWORDS = ("the", "a", "and", "of", "to")
_STOP_SQL = "('" + "', '".join(_STOPWORDS) + "')"


@register(
    "text_token_stats",
    bench=True,
    tags=("text", "string"),
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           n_chars,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_uniq_tokens,
           CASE WHEN len(toks) = 0 THEN NULL
                ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                     / len(toks) END AS avg_token_len
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting: total, distinct, mean token length.

    fanout=True: zero-exchange scan->project pipeline whose per-row
    HOF work all sits in the single scan task otherwise (measured
    0.40s -> 0.32s at sf0.1)."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    # Materialize tokens once: inlining tokens() into every use would
    # re-run the regexp split per reference (see functions.shingles).
    base = docs.select("doc_id", "n_chars", tokens("text").alias("tok"))
    toks = F.col("tok")
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return base.select(
        "doc_id",
        "n_chars",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.when(n == 0, F.lit(None)).otherwise(total_len.cast("double") / n).alias(
            "avg_token_len"
        ),
    )


@register(
    "text_quality_score",
    tags=("text",),
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, length(text) AS len_chars, {_TOKS} AS toks
               FROM documents)
    SELECT doc_id, lang, len_chars,
           len(toks) AS n_tokens,
           CASE WHEN len(toks) = 0 THEN NULL
                ELSE CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
                     / len(toks) END AS stop_ratio,
           CASE WHEN len(toks) = 0 THEN NULL
                ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END AS uniq_ratio,
           CASE WHEN len(toks) >= 10 AND len(toks) <= 1000
                     AND len(list_distinct(toks)) * 5 >= len(toks)
                THEN 1 ELSE 0 END AS passes_quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length bounds, stopword ratio,
    type/token (repetitiveness) ratio, and a pass/fail gate — the
    standard pre-training corpus filter shape."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "lang", F.length("text").alias("len_chars"),
        tokens("text").alias("tok"),
    )
    toks = F.col("tok")
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    is_stop = lambda x: x.isin(*_STOPWORDS)  # noqa: E731
    n_stop = F.size(F.filter(toks, is_stop))
    return base.select(
        "doc_id",
        "lang",
        "len_chars",
        n.alias("n_tokens"),
        F.when(n == 0, None).otherwise(n_stop.cast("double") / n).alias("stop_ratio"),
        F.when(n == 0, None).otherwise(n_uniq.cast("double") / n).alias("uniq_ratio"),
        F.when((n >= 10) & (n <= 1000) & (n_uniq * 5 >= n), 1).otherwise(0).alias(
            "passes_quality"
        ),
    )


@register(
    "text_lang_stats",
    tags=("text", "agg"),
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition per language."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(tokens("text"))).alias("total_tokens"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@register(
    "text_fingerprint",
    tags=("text", "hash"),
    oracle=f"""
    WITH c AS (SELECT doc_id,
                      trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS canon
               FROM documents)
    SELECT doc_id,
           md5(canon) AS fp,
           CAST(('0x' || substr(md5(canon), 1, 15)) AS BIGINT) AS fp64
    FROM c
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint: md5 over the canonical token
    stream (whitespace-insensitive, case-insensitive; computed by the
    single-pass regex collapse). ``fp64`` is the 60-bit integer form
    used as an exact-dedup join key at scale."""
    from ..functions import canonical_text, md5_long

    docs = load_table(spark, sf_dir, "documents")
    canon = canonical_text("text")
    return docs.select(
        "doc_id",
        F.md5(canon).alias("fp"),
        md5_long(canon).alias("fp64"),
    )


@register(
    "text_top_bigrams",
    tags=("text", "agg", "topk"),
    oracle=f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    b AS (SELECT unnest(list_transform(range(1, len(toks)),
                                       i -> concat(toks[i], ' ', toks[i+1]))) AS bigram
          FROM t WHERE len(toks) >= 2)
    SELECT bigram, COUNT(*) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 50
    """,
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 bigrams (word-level 2-grams): the n-gram
    mining primitive behind contamination checks and boilerplate
    detection.

    Scale: bigrams are generated array-side (higher-order transform,
    no join), partially aggregated map-side before the single shuffle
    on the bigram key; top-k plans TakeOrdered. Hot bigrams are exactly
    the partial-agg win — duplicates collapse before the exchange.
    """
    docs = load_table(spark, sf_dir, "documents")
    # tok is referenced inside the per-bigram lambda: it MUST be a
    # materialized column, or the tokenizer re-runs per bigram.
    base = docs.select(tokens("text").alias("tok"))
    toks = F.col("tok")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


# Language-ID heuristic profiles: distinctive function words per
# language plus a CJK-character signal. On real corpora these separate
# languages sharply; scoring is deterministic (argmax with alphabetical
# tiebreak) so both engines agree exactly.
_LANG_PROFILES = {
    "de": ("der", "die", "und", "ist", "das", "nicht"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "y", "los", "que", "una"),
    "fr": ("le", "la", "et", "les", "des", "une"),
}
_CJK = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"


def _lang_scores_sql() -> str:
    cols = [
        f"len(list_filter(toks, t -> t IN ('" + "', '".join(words) + f"'))) AS s_{lang}"
        for lang, words in _LANG_PROFILES.items()
    ]
    cols.append(f"len(regexp_extract_all(text, '{_CJK}')) AS s_zh")
    return ",\n           ".join(cols)


@register(
    "text_lang_id",
    tags=("text", "string"),
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
           {_lang_scores_sql()}
          FROM t)
    SELECT doc_id, lang,
           CASE
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh
               THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_fr >= s_zh THEN 'fr'
             ELSE 'zh'
           END AS pred_lang,
           s_de, s_en, s_es, s_fr, s_zh
    FROM s
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language identification: score each document
    against per-language function-word profiles (plus a CJK character
    count for zh) and take the argmax, alphabetical on ties.

    The synthetic corpus's text is language-agnostic so predictions
    here don't track the stored ``lang`` column — the operator is the
    committed surface; swap richer profiles for real corpora.

    Scale: pure scan->project (set-membership filters over the token
    array, one regex count), zero shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "lang", "text", tokens("text").alias("tok"))
    toks = F.col("tok")
    def in_profile(words):  # noqa: ANN001 - single-arg lambda for F.filter
        return lambda t: t.isin(*words)

    scores = {
        f"s_{lang}": F.size(F.filter(toks, in_profile(words)))
        for lang, words in _LANG_PROFILES.items()
    }
    scores["s_zh"] = F.size(F.regexp_extract_all("text", F.lit(_CJK), 0))
    s = base.select(
        "doc_id", "lang", *[c.alias(n) for n, c in scores.items()]
    )
    c = F.col
    pred = (
        F.when(
            (c("s_de") >= c("s_en")) & (c("s_de") >= c("s_es"))
            & (c("s_de") >= c("s_fr")) & (c("s_de") >= c("s_zh")),
            "de",
        )
        .when((c("s_en") >= c("s_es")) & (c("s_en") >= c("s_fr")) & (c("s_en") >= c("s_zh")), "en")
        .when((c("s_es") >= c("s_fr")) & (c("s_es") >= c("s_zh")), "es")
        .when(c("s_fr") >= c("s_zh"), "fr")
        .otherwise("zh")
    )
    return s.select(
        "doc_id", "lang", pred.alias("pred_lang"), "s_de", "s_en", "s_es", "s_fr", "s_zh"
    )


# BPE-ish pre-tokenizer classes: letter runs, digit runs, single
# non-alnum marks — the regex shape GPT-2-style byte-pair encoders use
# as their pre-split (identical semantics in Java regex and RE2).
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_bpe_token_stats",
    tags=("text", "string"),
    oracle=f"""
    WITH m AS (SELECT doc_id,
                      regexp_extract_all(text, '{_BPE_PATTERN}') AS pieces
               FROM documents)
    SELECT doc_id,
           len(pieces) AS n_pieces,
           len(list_filter(pieces, p -> regexp_matches(p, '^[A-Za-z]+$')))
               AS n_word_pieces,
           len(list_filter(pieces, p -> regexp_matches(p, '^[0-9]+$')))
               AS n_num_pieces,
           len(list_filter(pieces, p -> NOT regexp_matches(p, '^[A-Za-z0-9]')))
               AS n_punct_pieces
    FROM m
    """,
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization counts per document: total pieces and
    the word / number / punctuation class split — the token-budget
    estimator for a training corpus (whitespace tokens undercount;
    BPE pre-pieces track real tokenizer output much more closely).

    Scale: pure scan->project, zero shuffle; the regex runs inside
    codegen on the JVM (no Python).
    """
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)

    def n_matching(pat: str) -> F.Column:
        return F.size(F.filter(pieces, lambda p: p.rlike(pat)))

    return docs.select(
        "doc_id",
        F.size(pieces).alias("n_pieces"),
        n_matching("^[A-Za-z]+$").alias("n_word_pieces"),
        n_matching("^[0-9]+$").alias("n_num_pieces"),
        F.size(F.filter(pieces, lambda p: ~p.rlike("^[A-Za-z0-9]"))).alias(
            "n_punct_pieces"
        ),
    )


# Per-language sampling rates (percent) for the stratified sample:
# downsample the dominant language, keep the rest.
_SAMPLE_PCT = {"en": 30, "fr": 80, "de": 80, "es": 80, "zh": 80}
_SAMPLE_PCT_SQL = " ".join(
    f"WHEN '{lang}' THEN {pct}" for lang, pct in _SAMPLE_PCT.items()
)


@register(
    "text_repetition_signals",
    tags=("text", "quality"),
    oracle=f"""
    WITH t AS MATERIALIZED (SELECT doc_id, {_TOKS} AS toks FROM documents),
    b AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) >= 2
                    THEN list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END AS bg
        FROM t
    ),
    c AS (
        SELECT doc_id, max(cnt) AS top_cnt
        FROM (SELECT doc_id, token, count(*) AS cnt
              FROM (SELECT doc_id, unnest(toks) AS token FROM t)
              GROUP BY doc_id, token)
        GROUP BY doc_id
    )
    SELECT b.doc_id,
           len(b.toks) AS n_tokens,
           CASE WHEN len(b.toks) = 0 THEN NULL
                ELSE ROUND(CAST(c.top_cnt AS DOUBLE) / len(b.toks), 6)
                END AS top_token_frac,
           CASE WHEN len(b.bg) = 0 THEN NULL
                ELSE ROUND(CAST(len(b.bg) - len(list_distinct(b.bg)) AS DOUBLE)
                           / len(b.bg), 6)
                END AS dup_bigram_frac
    FROM b LEFT JOIN c USING (doc_id)
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: fraction
    of tokens that are the single most-frequent token, and fraction of
    contiguous bigrams that are duplicates. High values flag the
    boilerplate/spam documents a pre-training filter drops.

    Scale design: the bigram-duplication signal is pure array math on
    a materialized token column — zero shuffle. The most-frequent-token
    signal is the canonical distributed *mode*: explode -> partial
    count on (doc_id, token) (map-side combine shrinks the blow-up
    before it crosses the wire) -> per-doc max, then one equi-join back
    on doc_id. No per-doc data ever sits on the driver.

    Both ratios divide exact ints and round(6) with identical
    expression shape on the oracle side (float-stability rule,
    functions/__init__.py).

    fanout=True (round-9, measured): the tokenize + bigram HOF work
    otherwise sits in the single scan task — off 1.28-1.41 s vs
    fanned-out 0.95-0.98 s at sf0.1 (min-of-3, two interleaved A/B
    windows). Its single-task-HOF siblings were measured too and NOT
    converted: text_fingerprint regressed under fan-out (md5 per row
    is too cheap to pay the exchange) and text_lang_id was a wash.
    """
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    # tok materialized in its own projection: the bigram lambda below
    # references it, and an inlined tokens() would re-run the regexp
    # split per emitted bigram (see functions.shingles).
    base = docs.select("doc_id", tokens("text").alias("tok"))
    toks = F.col("tok")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = base.select(
        "doc_id", F.size(toks).alias("n_tokens"), bigrams.alias("bg")
    )

    top = (
        base.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_cnt"))
    )

    n = F.col("n_tokens")
    n_bg = F.size("bg")
    return per_doc.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.when(n == 0, None)
        .otherwise(F.round(F.col("top_cnt").cast("double") / n, 6))
        .alias("top_token_frac"),
        F.when(n_bg == 0, None)
        .otherwise(
            F.round((n_bg - F.size(F.array_distinct("bg"))).cast("double") / n_bg, 6)
        )
        .alias("dup_bigram_frac"),
    )


@register(
    "sample_stratified",
    tags=("text", "sampling"),
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 100
          < CASE lang {_SAMPLE_PCT_SQL} ELSE 0 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sampling by hash-mod gating: a document
    is kept iff md5('sample:'||doc_id) mod 100 falls under its
    language's rate — the corpus-rebalancing step of a training-data
    pipeline.

    Hash gating beats rand()-based Bernoulli sampling at scale: the
    decision is a pure function of the row key, so it is reproducible
    across runs/engines/retries (a re-executed task keeps the same
    sample — rand() would not), composes with incremental ingestion,
    and needs no seed-per-partition bookkeeping. Zero shuffle: pure
    scan->filter.
    """
    from ..functions import md5_long

    docs = load_table(spark, sf_dir, "documents")
    gate = F.pmod(
        md5_long(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), F.lit(100)
    )
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pct))
            for lang, pct in _SAMPLE_PCT.items()
        ],
        F.lit(0),
    )
    return docs.filter(gate < rate).select("doc_id", "lang", "n_chars")


# ----------------------------------------------------- chunk windows

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "text_chunk_windows",
    tags=("text", "pipeline"),
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    starts AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, GREATEST(len(toks), 1),
                                    {CHUNK_STRIDE})) AS s
      FROM t
    ),
    chunks AS (
      SELECT doc_id,
             CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
             toks[s : LEAST(s + {CHUNK_TOKENS} - 1, len(toks))] AS chunk
      FROM starts
    )
    SELECT doc_id, chunk_id,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           chunk[1] AS first_tok,
           chunk[len(chunk)] AS last_tok,
           CAST(('0x' || substr(md5(array_to_string(chunk, ' ')), 1, 15))
                AS BIGINT) AS chunk_key
    FROM chunks
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking ({chunk} tokens, stride
    {stride}, so consecutive chunks overlap by {overlap}) — the
    RAG/embedding-pipeline shape: every chunk gets a deterministic
    64-bit content key (``chunk_key``) usable directly as a chunk-level
    dedup/citation handle, plus its boundary tokens for audit.

    Scale: pure per-document array arithmetic — tokenize once,
    ``sequence`` the window starts, ``posexplode``+``slice`` the
    windows; zero shuffle, zero Python, output rows proportional to
    corpus tokens / stride. The chunk keys feed the same equi-join
    dedup/similarity machinery as document keys (queries/dedup.py);
    an embedding step would ``mapInPandas`` over exactly this relation.
    """.format(
        chunk=CHUNK_TOKENS,
        stride=CHUNK_STRIDE,
        overlap=CHUNK_TOKENS - CHUNK_STRIDE,
    )
    from ..functions import md5_long

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens("text").alias("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = tok.select("doc_id", "toks", F.posexplode(starts).alias("pos", "s"))
    chunk = F.slice("toks", F.col("s"), CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        F.col("pos").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        # try_: an all-whitespace document yields ONE empty chunk whose
        # boundary tokens are NULL (matches the oracle's chunk[1] on an
        # empty list); plain element_at throws under ANSI semantics.
        F.try_element_at(chunk, F.lit(1)).alias("first_tok"),
        F.try_element_at(chunk, F.lit(-1)).alias("last_tok"),
        # no content -> no key (NULL), matching the oracle where the
        # empty doc's slice is NULL; md5('') would mint a real-looking
        # dedup key shared by every empty document.
        F.when(F.size(chunk) > 0, md5_long(F.array_join(chunk, " "))).alias(
            "chunk_key"
        ),
    )


# ------------------------------------------------ Zipf coverage audit

ZIPF_TOP_K = 10


@register(
    "zipf_coverage_by_source",
    tags=("text", "agg", "window"),
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS term FROM documents),
    tc AS (SELECT source, term, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_tokens
            FROM tc GROUP BY 1),
    r AS (SELECT source, term, cnt,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY cnt DESC, term) AS rk
          FROM tc)
    SELECT r.source,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(cnt) AS BIGINT) AS topk_tokens,
           n_tokens,
           ROUND(CAST(SUM(cnt) AS DOUBLE) / n_tokens, 6) AS coverage,
           MIN_BY(term, rk) AS top_term
    FROM r JOIN tot USING (source)
    WHERE rk <= {ZIPF_TOP_K}
    GROUP BY r.source, n_tokens
    """,
)
def zipf_coverage_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head-coverage audit: what fraction of each source's token
    mass its top-{k} terms carry (plus the #1 term). Natural text sits
    around 0.2-0.4; a source near 1.0 is boilerplate/templated and a
    source near 0.0 is noise — a cheap corpus-health dashboard row per
    source.

    Scale: token counts are one partial+final agg on (source, term);
    the top-k is a WindowGroupLimit (running top-k per source, no full
    sort of the vocabulary); totals and coverage are arithmetic on the
    |sources|-sized result. The corpus is scanned once.
    """.format(k=ZIPF_TOP_K)
    from pyspark.sql import Window

    from ..functions import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("term"))
    # tc feeds both the totals and the top-k branch — persist so the
    # corpus really is scanned once (the single-scan claim above).
    tc = scoped_persist(
        ("zipf.tc", sf_dir),
        tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cnt")),
    )
    tot = tc.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("n_tokens"))
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("term"))
    top = tc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= ZIPF_TOP_K
    )
    return (
        top.join(tot, "source")
        .groupBy("source", "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k"),
            F.sum("cnt").cast("bigint").alias("topk_tokens"),
            # n_tokens is a grouping column, so reference it directly
            # rather than through a first-value aggregate.
            F.round(
                F.sum("cnt").cast("double") / F.col("n_tokens"), 6
            ).alias("coverage"),
            F.min_by("term", "rk").alias("top_term"),
        )
        .select("source", "k", "topk_tokens", "n_tokens", "coverage", "top_term")
    )


@register(
    "dedup_chunk_windows",
    tags=("text", "dedup", "pipeline"),
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    starts AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, GREATEST(len(toks), 1),
                                    {CHUNK_STRIDE})) AS s
      FROM t
    ),
    chunks AS (
      SELECT doc_id,
             toks[s : LEAST(s + {CHUNK_TOKENS} - 1, len(toks))] AS chunk
      FROM starts
    ),
    keyed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(array_to_string(chunk, ' ')), 1, 15))
                  AS BIGINT) AS chunk_key
      FROM chunks WHERE len(chunk) > 0
    )
    SELECT chunk_key,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM keyed
    GROUP BY chunk_key
    HAVING COUNT(*) > 1
    """,
)
def dedup_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup census: which {k}-token sliding windows
    recur, and across how many documents — the sub-document signal
    document-level dedup misses (boilerplate headers/footers shared by
    otherwise-distinct pages), and the consumer of the chunker's
    ``chunk_key``.

    Scale: reuses text_chunk_windows' zero-shuffle chunking, then ONE
    partial+final agg on the 64-bit chunk key; map-side combine
    collapses within-partition repeats before the exchange, and the
    HAVING keeps only recurring keys (output is proportional to the
    duplicated tail, not the corpus). Removal joins this censusback on
    chunk_key = the standard equi-join shape.
    """.format(k=CHUNK_TOKENS)
    chunks = text_chunk_windows(spark, sf_dir).filter(F.col("n_tokens") > 0)
    return (
        chunks.groupBy("chunk_key")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ------------------------------------------ classifier evaluation

from ..registry import REGISTRY as _REGISTRY  # noqa: E402

_LANG_ID_ORACLE = _REGISTRY["text_lang_id"].oracle


@register(
    "eval_langid_metrics",
    tags=("text", "agg", "stats"),
    oracle=f"""
    WITH preds AS ({_LANG_ID_ORACLE}),
    t AS (
      SELECT lang,
             COUNT(*) AS n_true,
             CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM preds GROUP BY lang
    ),
    p AS (SELECT pred_lang AS lang, COUNT(*) AS n_pred FROM preds GROUP BY 1)
    SELECT COALESCE(t.lang, p.lang) AS lang,
           COALESCE(t.n_true, 0) AS n_true,
           COALESCE(p.n_pred, 0) AS n_pred,
           COALESCE(t.n_correct, 0) AS n_correct,
           CAST(CASE WHEN COALESCE(p.n_pred, 0) > 0
                     THEN ROUND(1000.0 * COALESCE(t.n_correct, 0) / p.n_pred)
                END AS BIGINT) AS precision_milli,
           CAST(CASE WHEN COALESCE(t.n_true, 0) > 0
                     THEN ROUND(1000.0 * COALESCE(t.n_correct, 0) / t.n_true)
                END AS BIGINT) AS recall_milli,
           CAST(CASE WHEN COALESCE(t.n_true, 0) + COALESCE(p.n_pred, 0) > 0
                     THEN ROUND(2000.0 * COALESCE(t.n_correct, 0)
                                / (t.n_true + p.n_pred))
                END AS BIGINT) AS f1_milli
    FROM t FULL OUTER JOIN p ON t.lang = p.lang
    """,
)
def eval_langid_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation census over the language-ID predictor:
    per-class support, prediction count, hits, and precision / recall
    / F1 — the metrics plane an ML-data pipeline runs after every
    labeling/filtering model change (here evaluating text_lang_id
    against the stored lang labels).

    Determinism: counts are exact; each metric is one integer
    cross-multiplied rounding (F1 uses the algebraic identity
    2*hits/(support+predicted) — no float P/R intermediates). Classes
    with no predictions (or no support) surface NULL for the
    undefined metric, identically cross-engine via the FULL OUTER
    join.

    Scale (100 TB): the predictor is scan-side projection; the
    evaluation is two partial+final aggs on a |classes|-sized key and
    a |classes|-row join — the metrics cost nothing next to the scan.
    """
    preds = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    t = preds.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
    )
    p = preds.groupBy(F.col("pred_lang").alias("p_lang")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = t.join(p, t.lang == p.p_lang, "full_outer")
    n_true = F.coalesce(F.col("n_true"), F.lit(0))
    n_pred = F.coalesce(F.col("n_pred"), F.lit(0))
    n_corr = F.coalesce(F.col("n_correct"), F.lit(0))
    return j.select(
        F.coalesce(F.col("lang"), F.col("p_lang")).alias("lang"),
        n_true.alias("n_true"),
        n_pred.alias("n_pred"),
        n_corr.alias("n_correct"),
        F.when(n_pred > 0, F.round(F.lit(1000.0) * n_corr / F.col("n_pred")))
        .cast("long")
        .alias("precision_milli"),
        F.when(n_true > 0, F.round(F.lit(1000.0) * n_corr / F.col("n_true")))
        .cast("long")
        .alias("recall_milli"),
        F.when(
            n_true + n_pred > 0,
            F.round(F.lit(2000.0) * n_corr / (F.col("n_true") + F.col("n_pred"))),
        )
        .cast("long")
        .alias("f1_milli"),
    )


# ------------------------------------------ unicode / encoding hygiene

# Shared char-class patterns — identical literal strings compiled by
# BOTH engines (Java regex and RE2 agree on \xNN escapes and literal
# code points inside a class; the edge-divergent constructs \b and
# {m,n} are deliberately absent). The zero-width class embeds the
# actual code points.
UNICODE_NONASCII = r"[^\x00-\x7f]"
UNICODE_CTRL = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
UNICODE_ZEROWIDTH = "[​‌‍﻿]"


@register(
    "text_unicode_hygiene",
    tags=("text", "quality", "agg"),
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{UNICODE_NONASCII}')
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_ascii_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{UNICODE_NONASCII}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nonascii_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{UNICODE_CTRL}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl_docs,
           CAST(SUM(CASE WHEN contains(text, chr(65533))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_replacement_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{UNICODE_ZEROWIDTH}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zerowidth_docs,
           CAST(SUM(strlen(text) - length(text)) AS BIGINT)
             AS utf8_overhead_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def text_unicode_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-hygiene census per source: ASCII purity, control
    characters, U+FFFD replacement chars (the tombstone of a broken
    decode upstream), zero-width characters (invisible tokens that
    poison dedup keys and tokenizers), and total UTF-8 multibyte
    overhead.

    This corpus is pure ASCII, so the defect counters are zero here by
    construction — tests/test_text_operators.py pins NONZERO counts
    per class cross-engine on a unicode fixture (the same discipline
    as the PII audit's nonzero fixture), so Java-regex vs RE2
    divergence cannot hide behind a clean corpus.

    Scale: scan-side predicates into one partial+final aggregate onto
    |sources| groups — the q1 shape; all counters exact BIGINTs.
    """
    return _hygiene_census(load_table(spark, sf_dir, "documents"))


def _hygiene_census(docs: DataFrame) -> DataFrame:
    """The census aggregate over any (source, text) relation — split
    out so the nonzero unicode fixture test runs the EXACT production
    expressions."""
    nonascii = F.col("text").rlike(UNICODE_NONASCII)
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            flag(~nonascii).alias("n_ascii_docs"),
            flag(nonascii).alias("n_nonascii_docs"),
            flag(F.col("text").rlike(UNICODE_CTRL)).alias("n_ctrl_docs"),
            flag(F.col("text").contains(F.lit("�"))).alias(
                "n_replacement_docs"
            ),
            flag(F.col("text").rlike(UNICODE_ZEROWIDTH)).alias(
                "n_zerowidth_docs"
            ),
            F.sum(F.octet_length("text") - F.length("text")).alias(
                "utf8_overhead_bytes"
            ),
        )
        .orderBy("source")
    )


# ------------------------------------------------ readability census


@register(
    "text_readability",
    tags=("text", "agg", "string"),
    oracle=r"""
    WITH per_doc AS (
      SELECT source,
             len(regexp_extract_all(text, '\S+')) AS words,
             len(regexp_extract_all(text, '[.!?]+')) AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
      FROM documents
    ),
    agg AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(words) AS BIGINT) AS words,
             CAST(SUM(sentences) AS BIGINT) AS sentences,
             CAST(SUM(syllables) AS BIGINT) AS syllables
      FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, words, sentences, syllables,
           ROUND(206.835
                 - 1.015 * (words / CAST(NULLIF(sentences, 0) AS DOUBLE))
                 - 84.6 * (syllables / CAST(NULLIF(words, 0) AS DOUBLE)),
                 4) + 0 AS flesch
    FROM agg
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source from three exact corpus counts —
    words (non-space runs), sentence ends ([.!?]+ runs), and the
    standard vowel-group syllable approximation. The score that gates
    "too hard / too easy" buckets in readability-stratified sampling.

    Determinism: all three counts are BIGINT sums of per-doc regexp
    counts (character classes only — identical in Java regex and
    RE2); the score is one double expression from identical integers,
    rounded at 4 dp, NULLIF-guarded for sentence-free or empty
    corpora on both engines.

    Scale: scan-side regexp counting in codegen -> partial agg on the
    tiny source key; nothing but the counters shuffles (the q1
    shape).
    """
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.regexp_count("text", F.lit(r"\S+")).alias("words"),
        F.regexp_count("text", F.lit(r"[.!?]+")).alias("sentences"),
        F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+")).alias("syllables"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("words"),
        F.sum("sentences").alias("sentences"),
        F.sum("syllables").alias("syllables"),
    )
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("words") / F.nullif(F.col("sentences"), F.lit(0)).cast("double"))
        - F.lit(84.6)
        * (F.col("syllables") / F.nullif(F.col("words"), F.lit(0)).cast("double")),
        4,
    )
    return agg.select(
        "source", "n_docs", "words", "sentences", "syllables", flesch.alias("flesch")
    )


# ------------------------------------------- calibration reliability

_CAL_N_BINS = 10


@register(
    "calibration_bins_langid",
    tags=("stats", "agg", "eval"),
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN length(text) = 0 THEN 0
                  ELSE length(regexp_replace(text, '[^\\x00-\\x7f]', '', 'g'))
                       * 100 // length(text)
             END AS score_pct,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
      FROM documents
    ),
    binned AS (
      SELECT CASE WHEN score_pct >= 100 THEN {_CAL_N_BINS - 1}
                  ELSE score_pct * {_CAL_N_BINS} // 100 END AS bin,
             score_pct, is_en
      FROM scored
    )
    SELECT bin,
           COUNT(*) AS n_docs,
           CAST(SUM(score_pct) * 10 // COUNT(*) AS BIGINT)
             AS mean_score_milli,
           CAST(SUM(is_en) AS BIGINT) * 1000 // COUNT(*)
             AS observed_rate_milli
    FROM binned GROUP BY 1
    """,
)
def calibration_bins_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability bins for a deterministic language
    scorer: the ASCII-character share of each document is read as a
    'probability of English' score, bucketed into 10 fixed bins, and
    each bin reports its mean score vs the OBSERVED English rate —
    the reliability-diagram table behind every classifier-calibration
    review (a well-calibrated scorer has mean_score ≈ observed_rate
    per bin). Complements eval_langid_metrics (threshold metrics)
    with the threshold-free calibration view.

    Determinism: score, bin, and both reported rates are exact BIGINT
    arithmetic (floor divisions); no floats anywhere.

    Scale (100 TB): scoring is a scan-side projection (regex counting
    in codegen); the census is one partial+final agg on a 10-value
    key. Swapping in a real model's scores keeps the same shape —
    only the score expression changes.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    ascii_chars = F.length(F.regexp_replace("text", UNICODE_NONASCII, ""))
    score = F.when(n_chars == 0, 0).otherwise(
        F.expr(
            r"length(regexp_replace(text, '[^\\x00-\\x7f]', '')) * 100"
            " div length(text)"
        )
    )
    scored = docs.select(
        score.alias("score_pct"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
    )
    bin_col = F.when(
        F.col("score_pct") >= 100, _CAL_N_BINS - 1
    ).otherwise(F.expr(f"score_pct * {_CAL_N_BINS} div 100"))
    return (
        scored.select(bin_col.alias("bin"), "score_pct", "is_en")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(score_pct) * 10 div count(1)").alias("mean_score_milli"),
            F.expr("sum(is_en) * 1000 div count(1)").alias("observed_rate_milli"),
        )
    )


# ------------------------------------------- JSON schema drift census


@register(
    "json_schema_drift_weekly",
    tags=("json", "datetime", "agg", "audit"),
    oracle="""
    WITH objs AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, props
      FROM events
      WHERE props IS NOT NULL AND json_valid(props)
        AND json_type(props) = 'OBJECT'
    ),
    keyed AS (
      SELECT week, unnest(json_keys(props)) AS key FROM objs
    ),
    per AS (
      SELECT week, key, COUNT(*) AS n_events FROM keyed GROUP BY 1, 2
    )
    SELECT week, key, n_events,
           CAST(week = MIN(week) OVER (PARTITION BY key) AS BOOLEAN)
             AS first_seen
    FROM per
    """,
)
def json_schema_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema-drift census: which JSON keys appear in
    the event payloads each week, how often, and whether that week is
    the key's FIRST appearance — the governance view that catches a
    producer shipping a new field (or typo-forking an old one) before
    downstream parsers break. Malformed and non-object payloads are
    excluded identically on both engines (Spark json_object_keys
    yields NULL exactly where the oracle's json_valid/json_type guard
    filters).

    Scale (100 TB): key extraction is a scan-side projection; the
    census is one partial+final agg on the (week, key) key, bounded
    by calendar x vocabulary; the first-seen window runs over that
    bounded rollup, never the stream.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B array/map/JSON family (the drift sibling of
    json_events / variant_props_stats).
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = (
        ev.select(
            F.date_trunc("week", "ts").alias("week"),
            F.explode(F.json_object_keys("props")).alias("key"),
        )
    )
    per = keyed.groupBy("week", "key").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("key")
    return per.select(
        "week",
        "key",
        "n_events",
        (F.col("week") == F.min("week").over(w)).alias("first_seen"),
    )


# ------------------------------------------- inter-rater agreement


@register(
    "cohens_kappa_langid",
    tags=("stats", "agg", "eval"),
    oracle=f"""
    WITH preds AS ({_LANG_ID_ORACLE}),
    n AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_agree
          FROM preds),
    row_m AS (SELECT lang AS cls, COUNT(*) AS row_n FROM preds GROUP BY 1),
    col_m AS (SELECT pred_lang AS cls, COUNT(*) AS col_n FROM preds GROUP BY 1),
    marg AS (
      SELECT CAST(SUM(COALESCE(r.row_n, 0) * COALESCE(c.col_n, 0)) AS BIGINT)
               AS sum_marg_prod
      FROM row_m r FULL OUTER JOIN col_m c ON r.cls = c.cls
    )
    SELECT n.n_docs, n.n_agree, m.sum_marg_prod,
           CAST(ROUND(1000000.0
                 * (n.n_docs * n.n_agree - m.sum_marg_prod)
                 / NULLIF(CAST(n.n_docs AS BIGINT) * n.n_docs
                          - m.sum_marg_prod, 0)) AS BIGINT) AS kappa_micro
    FROM n CROSS JOIN marg m
    """,
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the stored ``lang`` labels and the
    n-gram language-ID heuristic: chance-corrected agreement
    kappa = (po - pe) / (1 - pe), computed with denominators CLEARED —
    (n*agree - sum(row_c*col_c)) / (n^2 - sum(row_c*col_c)) — so every
    term is an exact BIGINT and only ONE rounded double division
    happens, identically on both engines. The metric every
    labeling-pipeline review wants next to raw accuracy
    (eval_langid_metrics) because chance agreement inflates accuracy
    under skewed class priors.

    Scale (100 TB): prediction is the scan-side lang-ID projection;
    the confusion marginals are two |classes|-sized aggs and the
    kappa row is constant-size.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B eval/stats family.
    """
    preds = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    n = preds.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("lang") == F.col("pred_lang"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    row_m = preds.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("row_n")
    )
    col_m = preds.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("col_n")
    )
    marg = (
        row_m.join(col_m, "cls", "full_outer")
        .agg(
            F.sum(
                F.coalesce("row_n", F.lit(0)) * F.coalesce("col_n", F.lit(0))
            )
            .cast("long")
            .alias("sum_marg_prod")
        )
    )
    num = (F.col("n_docs") * F.col("n_agree") - F.col("sum_marg_prod")).cast(
        "double"
    )
    den = F.nullif(
        (F.col("n_docs").cast("long") * F.col("n_docs") - F.col("sum_marg_prod"))
        .cast("double"),
        F.lit(0.0),
    )
    return (
        n.crossJoin(F.broadcast(marg))
        .select(
            "n_docs", "n_agree", "sum_marg_prod",
            F.round(F.lit(1000000.0) * num / den).cast("long").alias("kappa_micro"),
        )
    )


# ------------------------------------ compression-ratio quality signal

# zlib level pinned so the signal is a pure function of the text (the
# byte-identical stdlib zlib ships on driver and executors alike).
COMPRESS_LEVEL = 6


@register(
    "text_compression_census",
    tags=("text", "udf", "pipeline", "stats"),
    # No SQL oracle: DuckDB has no deflate function, so the driver runs
    # its rows-only check; tests/test_text_operators.py recomputes the
    # census exactly from the raw corpus (same pinned zlib level).
    oracle=None,
)
def text_compression_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compression-ratio census — the classic
    repetitiveness/quality signal (highly compressible text is
    boilerplate or degenerate repetition; barely-compressible text is
    often binary junk or high-entropy noise; Gopher- and
    FineWeb-style pipelines gate on exactly this): UTF-8 byte mass,
    deflate (zlib level {lvl}) byte mass, and the per-source ratio in
    milli-units, plus the extreme per-document ratios that bound the
    source's spread.

    Determinism: zlib's output for a given (input, level) is a pure
    function shipped identically everywhere in this single-version
    environment, and the census reports only integer byte sums and
    floor-division ratios — stable across partitionings and runs. The
    driver's check is rows-only by design (no SQL deflate exists);
    the census is pinned instead by an exact recompute test over the
    raw corpus.

    Scale (100 TB): compression runs per-partition inside Arrow
    batches (the embarrassingly-parallel map shape — no shuffle, no
    driver payloads); only the per-source counters shuffle (the q1
    partial+final agg shape). Wire a real gate by filtering on the
    per-doc ratio before this rollup — same plan, one more scan-side
    predicate.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B text/pipeline family.
    """.format(lvl=COMPRESS_LEVEL)
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = [t.encode("utf-8") if t is not None else b"" for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "source": pdf["source"],
                    "raw_bytes": [len(b) for b in raw],
                    "comp_bytes": [
                        len(zlib.compress(b, COMPRESS_LEVEL)) for b in raw
                    ],
                }
            )

    per_doc = docs.select("source", "text").mapInPandas(
        batches, "source string, raw_bytes long, comp_bytes long"
    )
    ratio = F.expr("comp_bytes * 1000 div greatest(raw_bytes, 1)")
    return (
        per_doc.select("source", "raw_bytes", "comp_bytes", ratio.alias("r"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("raw_bytes").cast("bigint").alias("raw_bytes"),
            F.sum("comp_bytes").cast("bigint").alias("comp_bytes"),
            F.expr("sum(comp_bytes) * 1000 div greatest(sum(raw_bytes), 1)")
            .cast("bigint")
            .alias("ratio_milli"),
            F.min("r").cast("bigint").alias("min_doc_ratio_milli"),
            F.max("r").cast("bigint").alias("max_doc_ratio_milli"),
        )
    )


@register(
    "text_byte_mass_census",
    tags=("text", "pipeline", "stats"),
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(COALESCE(text, ''))) AS BIGINT) AS raw_bytes,
           CAST(MIN(strlen(COALESCE(text, ''))) AS BIGINT) AS min_doc_bytes,
           CAST(MAX(strlen(COALESCE(text, ''))) AS BIGINT) AS max_doc_bytes
    FROM documents
    GROUP BY source
    """,
)
def text_byte_mass_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable companion to ``text_compression_census``: the
    census's deterministic non-deflate columns — per-source UTF-8 byte
    mass and the per-document extremes — as exact SQL, so the
    compression family gets a value-hash driver gate even though the
    deflate column itself is rows-only (no SQL deflate exists; the
    round-4 verdict asked for exactly this split). NULL text counts as
    0 bytes, matching the deflate census's ``b""`` encoding of NULLs.

    Scale (100 TB): pure scan -> per-source partial+final agg (the q1
    shape); octet_length is a codegen projection — no UDF, no extra
    pass over the corpus next to the deflate census it audits.
    """
    docs = load_table(spark, sf_dir, "documents")
    nbytes = F.octet_length(F.coalesce(F.col("text"), F.lit("")))
    return (
        docs.select("source", nbytes.alias("nb"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nb").cast("bigint").alias("raw_bytes"),
            F.min("nb").cast("bigint").alias("min_doc_bytes"),
            F.max("nb").cast("bigint").alias("max_doc_bytes"),
        )
    )


# ----------- filter-threshold sweep: stopword ratio as an en-detector

_SWEEP_THRESHOLDS = tuple(range(0, 500, 50))  # milli-ratio cutoffs


@register(
    "threshold_sweep_stopword_en",
    tags=("text", "stats", "agg"),
    oracle=f"""
    WITH t AS (
      SELECT (lang = 'en') AS is_en,
             CAST(len(list_filter({_TOKS}, x -> x IN {{stop}})) AS BIGINT)
                 AS n_stop,
             CAST(len({_TOKS}) AS BIGINT) AS n
      FROM documents
    ),
    sweep AS (
      SELECT th.th, t.is_en,
             (t.n > 0 AND 1000 * t.n_stop >= th.th * t.n) AS pred
      FROM t, (VALUES {{ths}}) AS th(th)
    ),
    cm AS (
      SELECT th AS threshold_milli,
             CAST(SUM(CASE WHEN pred AND is_en THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN pred AND NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN NOT pred AND is_en THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN NOT pred AND NOT is_en THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM sweep GROUP BY 1
    )
    SELECT threshold_milli, tp, fp, fn, tn,
           CAST(ROUND(1000.0 * tp / NULLIF(tp + fp, 0)) AS BIGINT)
               AS precision_milli,
           CAST(ROUND(1000.0 * tp / NULLIF(tp + fn, 0)) AS BIGINT)
               AS recall_milli,
           CAST(ROUND(2000.0 * tp / NULLIF(2 * tp + fp + fn, 0)) AS BIGINT)
               AS f1_milli
    FROM cm ORDER BY threshold_milli
    """.replace("{stop}", _STOP_SQL).replace(
        "{ths}", ", ".join(f"({t})" for t in _SWEEP_THRESHOLDS)
    ),
)
def threshold_sweep_stopword_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-threshold tuning census: sweep {n} stopword-ratio cutoffs
    for the "is this English?" gate (the stopword list is English, so
    the ratio IS an en-score) and report the full confusion +
    precision/recall/F1 per threshold — the curve a pipeline reads to
    pick its filter operating point, computed in ONE pass.

    Determinism lane: the predicate is cross-multiplied
    (``1000*n_stop >= th*n`` — no per-row division anywhere), all
    confusion cells are exact BIGINTs, and the three rates are final
    rounded ratios with NULLIF guards.

    Scale (100 TB): per-doc signals are scan-side array expressions;
    the {n}-row threshold relation fans out BEFORE the aggregation so
    one partial+final agg keyed by threshold produces the whole curve
    — never {n} separate corpus passes. Reference parity: none;
    SURVEY.md section 2.B training-pipeline family.
    """.format(n=len(_SWEEP_THRESHOLDS))
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    t = docs.select(
        (F.col("lang") == "en").alias("is_en"),
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(toks).cast("bigint").alias("n"),
    )
    ths = spark.createDataFrame(
        [(t_,) for t_ in _SWEEP_THRESHOLDS], "th long"
    )
    sweep = t.crossJoin(F.broadcast(ths)).select(
        "th",
        "is_en",
        (
            (F.col("n") > 0)
            & (1000 * F.col("n_stop") >= F.col("th") * F.col("n"))
        ).alias("pred"),
    )
    cm = sweep.groupBy(F.col("th").alias("threshold_milli")).agg(
        F.sum(F.when(F.col("pred") & F.col("is_en"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_en"), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_en"), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when(~F.col("pred") & ~F.col("is_en"), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cm.select(
        "threshold_milli",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(1000.0 * tp / F.nullif(tp + fp, F.lit(0)))
        .cast("bigint")
        .alias("precision_milli"),
        F.round(1000.0 * tp / F.nullif(tp + fn, F.lit(0)))
        .cast("bigint")
        .alias("recall_milli"),
        F.round(2000.0 * tp / F.nullif(2 * tp + fp + fn, F.lit(0)))
        .cast("bigint")
        .alias("f1_milli"),
    ).orderBy("threshold_milli")


# ------------- Brier score Murphy decomposition over the same bins


@register(
    "brier_decomposition_langid",
    tags=("stats", "agg", "eval"),
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN length(text) = 0 THEN 0
                  ELSE length(regexp_replace(text, '[^\\x00-\\x7f]', '', 'g'))
                       * 100 // length(text)
             END AS p,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS o
      FROM documents
    ),
    binned AS (
      SELECT CASE WHEN p >= 100 THEN {_CAL_N_BINS - 1}
                  ELSE p * {_CAL_N_BINS} // 100 END AS bin, p, o
      FROM scored
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(o) AS BIGINT) AS so,
                   CAST(SUM((p - 100 * o) * (p - 100 * o)) AS BIGINT) AS se
            FROM binned),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(p) AS BIGINT) AS sp,
             CAST(SUM(o) AS BIGINT) AS sok,
             CAST(SUM(p * p) AS BIGINT) AS spp
      FROM binned GROUP BY 1
    ),
    terms AS (
      SELECT
        CAST(ROUND(1000000.0 * (CAST(sp - 100 * sok AS DOUBLE) / nk)
                   * (CAST(sp - 100 * sok AS DOUBLE) / 10000)
                   / tot.n) AS BIGINT) AS rel_t,
        CAST(ROUND(1000000.0 * (CAST(tot.n * sok - nk * tot.so AS DOUBLE)
                                / tot.n)
                   * (CAST(tot.n * sok - nk * tot.so AS DOUBLE) / tot.n)
                   / (nk * CAST(tot.n AS DOUBLE))) AS BIGINT) AS res_t,
        CAST(ROUND(1000000.0 * (CAST(spp AS DOUBLE)
                                - CAST(sp AS DOUBLE) * sp / nk)
                   / (10000.0 * tot.n)) AS BIGINT) AS wbv_t
      FROM bins, tot
    )
    SELECT tot.n AS n_docs,
           CAST(ROUND(1000000.0 * tot.se / (10000.0 * tot.n)) AS BIGINT)
               AS bs_micro,
           CAST(SUM(rel_t) AS BIGINT) AS rel_micro,
           CAST(SUM(res_t) AS BIGINT) AS res_micro,
           CAST(SUM(wbv_t) AS BIGINT) AS wbv_micro,
           CAST(ROUND(1000000.0 * tot.so * (tot.n - tot.so)
                      / (CAST(tot.n AS DOUBLE) * tot.n)) AS BIGINT)
               AS unc_micro
    FROM terms, tot GROUP BY tot.n, tot.se, tot.so
    """,
)
def brier_decomposition_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the ASCII-share
    language scorer over the SAME 10 calibration bins as
    calibration_bins_langid: BS = REL − RES + UNC + WBV (reliability −
    resolution + uncertainty + within-bin variance — the exact
    identity; the textbook 3-term form holds only for discrete
    forecasts). REL says "how far are bin means from observed rates",
    RES "how much do bins separate the base rate", UNC the base-rate
    entropy, WBV the score scatter the binning hides.

    Determinism lane: every bin moment (n_k, Σp, Σo, Σp², squared
    error) is an exact BIGINT; each component's per-bin term is ONE
    fixed double tree over those integers quantized to integer
    micro-units BEFORE the cross-bin sum (sub-expressions stay under
    2^53 by dividing early: (A/n_k)·(A/1e4)/N, never A²).

    Scale (100 TB): two aggregations — the global moment row and the
    10-bin moment relation — then constant-size arithmetic; scoring is
    the same scan-side regex projection as the calibration census.
    Reference parity: none; SURVEY.md section 2.B eval/stats family.
    """
    docs = load_table(spark, sf_dir, "documents")
    p = F.when(F.length("text") == 0, 0).otherwise(
        F.expr(
            r"length(regexp_replace(text, '[^\\x00-\\x7f]', '')) * 100"
            " div length(text)"
        )
    )
    binned = docs.select(
        p.alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("o"),
    ).select(
        F.when(F.col("p") >= 100, _CAL_N_BINS - 1)
        .otherwise(F.expr(f"p * {_CAL_N_BINS} div 100"))
        .alias("bin"),
        "p",
        "o",
    )
    tot = binned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("o").cast("bigint").alias("so"),
        F.sum((F.col("p") - 100 * F.col("o")) * (F.col("p") - 100 * F.col("o")))
        .cast("bigint")
        .alias("se"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum("p").cast("bigint").alias("sp"),
        F.sum("o").cast("bigint").alias("sok"),
        F.sum(F.col("p") * F.col("p")).cast("bigint").alias("spp"),
    )
    t = bins.crossJoin(F.broadcast(tot))
    a_rel = (F.col("sp") - 100 * F.col("sok")).cast("double")
    a_res = (F.col("n") * F.col("sok") - F.col("nk") * F.col("so")).cast(
        "double"
    )
    terms = t.select(
        F.round(
            1000000.0 * (a_rel / F.col("nk")) * (a_rel / 10000) / F.col("n")
        )
        .cast("bigint")
        .alias("rel_t"),
        F.round(
            1000000.0
            * (a_res / F.col("n"))
            * (a_res / F.col("n"))
            / (F.col("nk") * F.col("n").cast("double"))
        )
        .cast("bigint")
        .alias("res_t"),
        F.round(
            1000000.0
            * (
                F.col("spp").cast("double")
                - F.col("sp").cast("double") * F.col("sp") / F.col("nk")
            )
            / (10000.0 * F.col("n"))
        )
        .cast("bigint")
        .alias("wbv_t"),
        "n",
        "se",
        "so",
    )
    return terms.groupBy("n", "se", "so").agg(
        F.sum("rel_t").cast("bigint").alias("rel_micro"),
        F.sum("res_t").cast("bigint").alias("res_micro"),
        F.sum("wbv_t").cast("bigint").alias("wbv_micro"),
    ).select(
        F.col("n").alias("n_docs"),
        F.round(1000000.0 * F.col("se") / (10000.0 * F.col("n")))
        .cast("bigint")
        .alias("bs_micro"),
        "rel_micro",
        "res_micro",
        "wbv_micro",
        F.round(
            1000000.0
            * F.col("so")
            * (F.col("n") - F.col("so"))
            / (F.col("n").cast("double") * F.col("n"))
        )
        .cast("bigint")
        .alias("unc_micro"),
    )
