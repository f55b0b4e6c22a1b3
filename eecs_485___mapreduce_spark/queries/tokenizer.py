r"""Tokenizer training: distributed BPE merge induction + application.

The canonical LLM-pipeline operator the reference has no analogue for
(SURVEY.md section 2.B north-star families): learn byte-pair-encoding
merge rules from the corpus, then re-tokenize the corpus with them.
Mirrors how production tokenizer trainers (e.g. the published BPE
algorithm of Sennrich et al. 2016) structure the computation:

1. ONE distributed pass aggregates the corpus into a (word, freq)
   relation — this is the only part that touches all the data, and it
   is the exact word-count shape the reference itself computes
   (tests/testdata/exec/wc_map.sh + wc_reduce.py).
2. Merge learning then iterates on the compact frequency-capped
   vocabulary (top ``VOCAB`` words): count adjacent token pairs
   weighted by word frequency, pick the (count DESC, pair ASC) argmax,
   rewrite the vocabulary with that pair merged, repeat ``K_MERGES``
   times. Every step is declarative DataFrame code — the argmax is a
   1-row DataFrame broadcast onto the vocabulary, NOT a driver-side
   collect, so nothing leaves the cluster.
3. Application replays the K learned rules over the FULL word-frequency
   relation (merges are tiny broadcast values; the corpus is scanned
   once and shuffled once for the final token census).

Token-boundary encoding: a tokenization [t1, t2, ...] is stored as the
string ``(t1)(t2)...``. Merging rule (a, b) is then the literal string
replacement ``(a)(b)`` -> ``(ab)``, and because both Spark's and
DuckDB's ``replace`` scan left-to-right and continue AFTER each
replacement, a run like ``(a)(a)(a)`` merges greedily to
``(aa)(a)`` — exactly the standard BPE merge semantics. Words are
restricted to ``^[a-z]+$`` so the parens can never collide with token
text.

Cross-engine determinism (SCALE.md): pair counts are exact BIGINT sums
of BIGINT word frequencies; the argmax tie-break (count DESC, pair
ASC) is a total order; the rewrite is exact string algebra. No doubles
anywhere.

Scale (100 TB): the corpus-wide work is one word-count aggregate
(map-side partial, one shuffle). The K-iteration loop runs on a
VOCAB-row relation (constant size, persisted once), so iteration cost
is independent of corpus size — the same reason production BPE
trainers pre-aggregate to word counts. Application is K chained
broadcast-scalar string rewrites fused into one codegen stage over a
single corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scoped_persist, tokens, truncate_plan
from ..registry import register
from ..sources import load_table

K_MERGES = 6
VOCAB = 2000

# ---- shared expression fragments (Spark SQL + DuckDB twins) ----------

# one word per row, lowercase pure-ascii-letter words of length >= 2
_WORDS_ORACLE = r"""
  SELECT w AS word, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              t -> t <> '')) AS w
    FROM documents
  ) WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
  GROUP BY w
"""

# (word)(char)(split): 'abc' -> '(a)(b)(c)'
_ENCODE_ORACLE = r"regexp_replace(word, '(.)', '(\1)', 'g')"

# string '(t1)(t2)...' -> list [t1, t2, ...]
_ARR_ORACLE = r"regexp_split_to_array(trim(s, '()'), '\)\(')"


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _encode(word_col) -> F.Column:
    return F.regexp_replace(word_col, r"(.)", r"($1)")


# adjacent-pair multiset of one encoded word, each pair as 'left right'
_PAIRS_EXPR = (
    "CASE WHEN size(arr) >= 2 THEN "
    "transform(sequence(0, size(arr) - 2), "
    "j -> concat(element_at(arr, j + 1), ' ', element_at(arr, j + 2))) "
    "ELSE array() END"
)


def _arr(s_col) -> F.Column:
    return F.split(F.expr("trim(BOTH '()' FROM s)"), r"\)\(")


def _best_pair(cur: DataFrame) -> DataFrame:
    """1-row DataFrame: the (freq-weighted count DESC, pair ASC) argmax
    adjacent pair of the current tokenization state."""
    pairs = (
        cur.select("freq", F.split(F.expr("trim(BOTH '()' FROM s)"), r"\)\(").alias("arr"))
        .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("pr"))
        .groupBy("pr")
        .agg(F.sum("freq").alias("cnt"))
    )
    return pairs.orderBy(F.desc("cnt"), F.asc("pr")).limit(1)


def _merge_step(cur: DataFrame, best: DataFrame) -> DataFrame:
    """Rewrite the tokenization state with the best pair merged: the
    1-row argmax is broadcast; the rewrite is a literal replace."""
    b = F.broadcast(best.select(
        F.split_part(F.col("pr"), F.lit(" "), F.lit(1)).alias("_bl"),
        F.split_part(F.col("pr"), F.lit(" "), F.lit(2)).alias("_br"),
    ))
    return cur.crossJoin(b).select(
        "word",
        "freq",
        F.replace(
            F.col("s"),
            F.concat(F.lit("("), F.col("_bl"), F.lit(")("), F.col("_br"), F.lit(")")),
            F.concat(F.lit("("), F.col("_bl"), F.col("_br"), F.lit(")")),
        ).alias("s"),
    )


def _learn(spark: SparkSession, sf_dir: str) -> tuple[list[DataFrame], DataFrame]:
    """Shared trainer: returns (per-iteration 1-row best DataFrames,
    the persisted full word-frequency relation)."""
    words = scoped_persist(("bpe_words", sf_dir), _words(spark, sf_dir))
    vocab = words.orderBy(F.desc("freq"), F.asc("word")).limit(VOCAB)
    cur = vocab.select("word", "freq", _encode(F.col("word")).alias("s"))
    bests: list[DataFrame] = []
    for _ in range(K_MERGES):
        # The 1-row argmax feeds BOTH the merge table and the next
        # rewrite's broadcast — localCheckpoint materializes it once
        # (a 1-row job) so neither consumer re-derives the whole
        # iteration chain, and the broadcast build reads a done RDD
        # instead of re-running the prior rounds.
        best = _best_pair(cur).transform(truncate_plan)
        bests.append(best)
        cur = _merge_step(cur, best)
    return bests, words


def _oracle_iterations() -> str:
    """The K unrolled learning iterations as DuckDB CTEs (it0..itK,
    b1..bK), over the frequency-capped vocabulary."""
    parts = [
        f"words AS ({_WORDS_ORACLE}),",
        f"vocab AS (SELECT word, freq FROM words "
        f"ORDER BY freq DESC, word LIMIT {VOCAB}),",
        f"it0 AS (SELECT word, freq, {_ENCODE_ORACLE} AS s FROM vocab),",
    ]
    for i in range(1, K_MERGES + 1):
        parts.append(f"""
    p{i} AS (
      SELECT pr, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(arr)),
                                     j -> arr[j] || ' ' || arr[j + 1])) AS pr
        FROM (SELECT freq, {_ARR_ORACLE} AS arr FROM it{i - 1})
      ) GROUP BY pr
    ),
    b{i} AS (SELECT pr, cnt FROM p{i} ORDER BY cnt DESC, pr LIMIT 1),
    it{i} AS (
      SELECT word, freq,
             replace(s,
                     '(' || split_part(pr, ' ', 1) || ')('
                         || split_part(pr, ' ', 2) || ')',
                     '(' || replace(pr, ' ', '') || ')') AS s
      FROM it{i - 1} CROSS JOIN b{i}
    ),""")
    return "\n".join(parts)


def _merge_table_oracle() -> str:
    rows = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, split_part(pr, ' ', 1) AS left_tok, "
        f"split_part(pr, ' ', 2) AS right_tok, "
        f"replace(pr, ' ', '') AS merged, cnt AS pair_count FROM b{i}"
        for i in range(1, K_MERGES + 1)
    )
    return rows


@register(
    "bpe_learn_merges",
    tags=("text", "tokenizer", "iterative", "pipeline"),
    oracle=f"""
    WITH
    {_oracle_iterations()}
    merges AS (
      {_merge_table_oracle()}
    )
    SELECT rank, left_tok, right_tok, merged, pair_count
    FROM merges ORDER BY rank
    """,
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-K BPE merge rules from the documents corpus.

    Output: one row per learned rule — (rank, left_tok, right_tok,
    merged, pair_count), in learning order. Fully deterministic
    (count DESC, pair ASC argmax tie-break), so the DuckDB oracle
    unrolls the identical K iterations in SQL.

    Scale: see module docstring — one corpus-wide word-count shuffle,
    then constant-size iteration state. The per-iteration argmax is a
    TakeOrdered limit(1) (no global sort materialization, no driver
    data); each rewrite broadcasts that 1-row result.

    Reference parity: step 1 IS the reference's word-count program
    (SURVEY.md section 2.C); the merge loop is the capability the
    reference's fixed two-phase map/reduce cannot express (no
    iteration — SURVEY.md section 3 lifecycle).
    """
    bests, _ = _learn(spark, sf_dir)
    merges = None
    for i, best in enumerate(bests, start=1):
        row = best.select(
            F.lit(i).alias("rank"),
            F.split_part(F.col("pr"), F.lit(" "), F.lit(1)).alias("left_tok"),
            F.split_part(F.col("pr"), F.lit(" "), F.lit(2)).alias("right_tok"),
            F.replace(F.col("pr"), F.lit(" "), F.lit("")).alias("merged"),
            F.col("cnt").alias("pair_count"),
        )
        merges = row if merges is None else merges.unionAll(row)
    return merges.orderBy("rank")


@register(
    "bpe_apply_corpus",
    tags=("text", "tokenizer", "pipeline"),
    oracle=f"""
    WITH
    {_oracle_iterations()}
    full0 AS (SELECT word, freq, {_ENCODE_ORACLE} AS s FROM words),
    {"".join(
        f'''full{i} AS (
      SELECT word, freq,
             replace(s,
                     '(' || split_part(pr, ' ', 1) || ')('
                         || split_part(pr, ' ', 2) || ')',
                     '(' || replace(pr, ' ', '') || ')') AS s
      FROM full{i - 1} CROSS JOIN b{i}
    ),'''
        for i in range(1, K_MERGES + 1)
    )}
    toks AS (
      SELECT unnest({_ARR_ORACLE}) AS token, freq
      FROM full{K_MERGES}
    )
    SELECT token,
           CAST(SUM(freq) AS BIGINT) AS n_occurrences,
           length(token) AS token_len
    FROM toks
    GROUP BY token, token_len
    ORDER BY n_occurrences DESC, token
    LIMIT 25
    """,
)
def bpe_apply_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the K learned merge rules to the FULL word-frequency
    relation and report the top-25 resulting subword tokens by
    corpus occurrence count.

    Train -> apply composition: the learned rules are K 1-row
    DataFrames broadcast in sequence onto the full vocabulary; the K
    chained literal replaces fuse into one projection over a single
    pass, then one shuffle aggregates the final token census.

    Scale: the full word relation is the word-count aggregate already
    computed (and persisted) by the trainer — applying merges never
    re-reads the corpus; the token census shuffles (token, count)
    pairs only.
    """
    bests, words = _learn(spark, sf_dir)
    cur = words.select("word", "freq", _encode(F.col("word")).alias("s"))
    for best in bests:
        cur = _merge_step(cur, best)
    toks = cur.select(
        F.explode(F.split(F.expr("trim(BOTH '()' FROM s)"), r"\)\(")).alias("token"),
        "freq",
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
        .select("token", "n_occurrences", F.length("token").alias("token_len"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(25)
    )
