"""Formula-level checks for statistics whose DuckDB oracle only proves
ENGINE PARITY (both sides evaluate the same expression): the U
statistic must also equal the brute-force pair-count definition."""

from __future__ import annotations

import bisect

from eecs_485___mapreduce_spark.queries.mining import (
    _MW_SRC_A,
    _MW_SRC_B,
    mannwhitney_doclen_sources,
)
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_mannwhitney_u_matches_pair_count_definition(spark):
    """U_a = #{(x in A, y in B): x > y} + #ties/2 — the definition,
    computed brute-force over the sf0.001 sample, must match the
    rank-sum derivation (floored, since ties can make U half-integer),
    and the rank-biserial must equal 2U/(n_a*n_b) - 1."""
    import pyspark.sql.functions as F

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .where(F.col("source").isin(_MW_SRC_A, _MW_SRC_B))
        .select(F.length("text").alias("v"), "source")
        .collect()
    )
    a = sorted(r.v for r in docs if r.source == _MW_SRC_A)
    b = sorted(r.v for r in docs if r.source == _MW_SRC_B)
    u = 0.0
    for x in a:
        lt = bisect.bisect_left(b, x)
        eq = bisect.bisect_right(b, x) - lt
        u += lt + eq * 0.5

    row = mannwhitney_doclen_sources(spark, SF_SMALL).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.u_a_floor == int(u)  # floor of the (possibly .5) U
    want_rb = round(1000 * (2 * u / (len(a) * len(b)) - 1))
    assert row.rank_biserial_milli == want_rb


def test_fuzzy_join_blocking_has_zero_false_negatives(spark):
    """The q-gram prefix blocking must reproduce EXACTLY the naive
    all-pairs levenshtein <= K self-join (the oracle replays it in
    DuckDB; this pins the Spark side independently), and its plan must
    stay cartesian-free (the short-bucket fallback is broadcast-tiny)."""
    from eecs_485___mapreduce_spark.queries.mining_text import (
        FUZZY_K,
        fuzzy_join_part_names,
    )
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.plans import assert_no_cartesian

    got = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_join_part_names(spark, SF_SMALL).collect()
    }
    names = [
        r.name
        for r in load_table(spark, SF_SMALL, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .collect()
    ]

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b, lev(a, b))
        for i, a in enumerate(sorted(names))
        for b in sorted(names)[i + 1 :]
        if lev(a, b) <= FUZZY_K
    }
    assert got == want and want  # non-empty on this corpus
    assert_no_cartesian(fuzzy_join_part_names(spark, SF_SMALL))


def test_itemcf_topk_is_window_group_limit_and_cosine_exact(spark):
    """The per-part top-k must plan as a running WindowGroupLimit (no
    global sort) and the similarity must equal the exact cosine
    recomputed from raw (order, part) incidence."""
    from collections import Counter, defaultdict

    from eecs_485___mapreduce_spark.queries.mining_graph import (
        itemcf_topk_similar_parts,
    )

    out = itemcf_topk_similar_parts(spark, SF_SMALL)
    assert "WindowGroupLimit" in out._jdf.queryExecution().executedPlan().toString()
    rows = out.collect()
    po = {
        (r.l_orderkey, r.l_partkey)
        for r in load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    n = Counter(p for _, p in po)
    orders = defaultdict(set)
    for o, p in po:
        orders[p].add(o)
    for r in rows[:200]:
        m = len(orders[r.part] & orders[r.nb])
        assert r.sim_micro == round(1e6 * m / (n[r.part] * n[r.nb]) ** 0.5)
    # every listed part has <= K neighbors, ranked 1..K
    by_part = defaultdict(list)
    for r in rows:
        by_part[r.part].append(r.rk)
    assert all(rks == list(range(1, len(rks) + 1)) for rks in by_part.values())


def test_containment_prefix_filter_has_zero_false_negatives(spark):
    """The contained-side prefix pigeonhole must reproduce EXACTLY the
    naive all-pairs containment >= t over the shingle sets: brute-force
    every ordered doc pair at sf0.001 and compare."""
    from eecs_485___mapreduce_spark.queries.dedup import _shingle_relation
    from eecs_485___mapreduce_spark.queries.mining_text import (
        CONT_MILLI,
        dedup_containment_pairs,
    )
    import pyspark.sql.functions as F

    rows = (
        _shingle_relation(spark, SF_SMALL)
        .select(
            "doc_id",
            F.filter(F.col("sh"), lambda x: x != F.lit("")).alias("s"),
        )
        .where(F.size("s") > 0)
        .collect()
    )
    sets = {r.doc_id: frozenset(r.s) for r in rows}
    want = set()
    ids = sorted(sets)
    for d1 in ids:
        s1 = sets[d1]
        for d2 in ids:
            if d1 == d2:
                continue
            common = len(s1 & sets[d2])
            if 1000 * common >= CONT_MILLI * len(s1):
                want.add((d1, d2, len(s1), len(sets[d2]), common))
    got = {
        (r.d1, r.d2, r.n_tok1, r.n_tok2, r.n_common)
        for r in dedup_containment_pairs(spark, SF_SMALL).collect()
    }
    assert got == want
    assert want, "fixture corpus must contain at least one containment pair"


def test_doc_cosine_topk_matches_bruteforce(spark):
    """ir_doc_cosine_topk's index-join dots must equal the brute-force
    sparse dot products over the quantized weight vectors (same df cap),
    and the returned top-k must be the global (cos, d1, d2) head."""
    import math

    from eecs_485___mapreduce_spark.queries.ir import (
        DOC_COS_DF_CAP,
        DOC_COS_TOPK,
        ir_doc_cosine_topk,
    )
    import pyspark.sql.functions as F

    from eecs_485___mapreduce_spark.functions import tokens
    from eecs_485___mapreduce_spark.sources import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term")).collect()
    tf: dict[tuple, int] = {}
    for r in tok:
        tf[(r.doc_id, r.term)] = tf.get((r.doc_id, r.term), 0) + 1
    df: dict[str, int] = {}
    for (_d, t), _c in tf.items():
        df[t] = df.get(t, 0) + 1
    cap = max(DOC_COS_DF_CAP, n_docs // 8)
    vecs: dict[int, dict[str, int]] = {}
    for (d, t), c in tf.items():
        if df[t] <= cap:
            w = round(c * math.log((n_docs + 1.0) / (df[t] + 1.0)) * 1_000_000)
            vecs.setdefault(d, {})[t] = w
    scored = []
    ids = sorted(vecs)
    for i, d1 in enumerate(ids):
        v1 = vecs[d1]
        n1 = sum(w * w for w in v1.values())
        for d2 in ids[i + 1 :]:
            v2 = vecs[d2]
            dot = sum(w * v2[t] for t, w in v1.items() if t in v2)
            if dot:
                n2 = sum(w * w for w in v2.values())
                cm = round(1000.0 * dot / (math.sqrt(n1) * math.sqrt(n2)))
                scored.append((-cm, d1, d2, dot))
    scored.sort()
    want = [(d1, d2, dot, -neg) for neg, d1, d2, dot in scored[:DOC_COS_TOPK]]
    got = [
        (r.d1, r.d2, r.dot, r.cos_milli)
        for r in ir_doc_cosine_topk(spark, SF_SMALL).collect()
    ]
    assert got == want
    assert len(got) == DOC_COS_TOPK
