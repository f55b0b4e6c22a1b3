"""Similarity search over the ``embeddings`` table (array<float>
column): brute-force cosine top-k (the correctness baseline, with a
DuckDB oracle) and a signed-random-projection LSH variant (the scale
path; rows-only check — the unit tests assert its recall against
brute force).

Scale: brute force is O(n_queries * n_corpus) — fine for a bounded
query set against any corpus size (it's a broadcast nested-loop of the
small query side; the corpus is never shuffled), but wrong for
all-pairs. The LSH variant splits each vector's sign-bit sketch into
band keys so candidate generation is an EQUI-JOIN on (band, key) with
multi-probe on the query side — the same no-all-pairs rule as dedup
(pinned by tests/test_similarity.py's plan test).

All arithmetic is double (array<float> cast element-exact to double);
similarities are rounded to 6 decimals on both engines before the
top-k tiebreak (rounded-sim DESC, then neighbor id) so accumulation
micro-differences cannot reorder results.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions import (
    VALID_VEC_SQL,
    as_double_array,
    cosine,
    l2_norm,
    truncate_plan,
    valid_vector,
)
from ..registry import register
from ..sources import load_table

N_QUERIES = 5
TOP_K = 10

_COS_SQL = (
    "list_dot_product(qe, ce) / "
    "(sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))"
)


def _cos_sql(a: str, b: str) -> str:
    """DuckDB cosine between two DOUBLE[] expressions — the exact
    engine-parity pattern proven by similarity_topk_cosine: both sides
    fold element-wise in array order, and callers round to 6 decimals
    before any compare/tiebreak."""
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * "
        f"sqrt(list_dot_product({b}, {b}))))"
    )


def _qmean_sql(src: str, keys: str, dim: int, vcol: str = "v") -> str:
    """DuckDB rendering of the quantized-integer centroid mean over
    ``src`` (which must expose the group ``keys`` and a DOUBLE[] column
    ``v``): per-(keys, pos) EXACT mean SUM(ROUND(val*1e6)) / (n*1e6),
    re-assembled into a DOUBLE[] ordered by pos. Matches the Spark
    side's quantized posexplode+sum bit-for-bit under ANY summation
    order — integer sums are associative, so engine/partitioning
    reorder cannot move the result (the mining.py:696 discipline
    applied to centroids)."""
    return f"""(
      SELECT {keys}, list(cval ORDER BY pos) AS cvec FROM (
        SELECT {keys}, pos,
               CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1000000.0) AS cval
        FROM (SELECT {keys}, u.pos,
                     CAST(ROUND(u.val * 1000000.0, 0) AS BIGINT) AS q
              FROM {src},
                   LATERAL (SELECT unnest(generate_series(1, {dim})) AS pos,
                                   unnest({vcol}) AS val) u)
        GROUP BY {keys}, pos)
      GROUP BY {keys})"""


@register(
    "similarity_topk_cosine",
    bench=True,
    tags=("similarity", "vector"),
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES} AND {VALID_VEC_SQL}),
    c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ce
          FROM embeddings WHERE {VALID_VEC_SQL}),
    s AS (SELECT qid, nid, round({_COS_SQL}, 6) + 0 AS sim
          FROM q CROSS JOIN c WHERE qid <> nid),
    r AS (SELECT qid, nid, sim,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
          FROM s)
    SELECT qid, nid, sim, rk FROM r WHERE rk <= {TOP_K}
    """,
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline every ANN variant is
    measured against.

    Scale: query side broadcasts (bounded), corpus side streams through
    a single scan — no shuffle of the corpus; per-query top-k via
    window on the tiny scored set.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(
        valid_vector(as_double_array("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), as_double_array("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("nid"), as_double_array("embedding").alias("ce"))
    sim = F.round(cosine(F.col("qe"), F.col("ce")), 6)
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        scored.select("qid", "nid", "sim", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


# ------------------------------------------------ LSH (scale variant)

N_PLANES = 32
N_BANDS = 8
BAND_BITS = N_PLANES // N_BANDS  # 4-bit band keys
_PROBE_FLIPS = 1  # multi-probe radius: also probe each band key with 1 bit flipped
_DIM = 64


def _deterministic_planes(n_planes: int = N_PLANES, dim: int = _DIM) -> list[list[float]]:
    """+-1 hyperplanes derived from md5 — stable across runs/sessions
    (no RNG), so the operator is reproducible and resumable."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            digest = hashlib.md5(f"plane{p}:dim{j}".encode()).digest()
            row.append(1.0 if digest[0] & 1 else -1.0)
        planes.append(row)
    return planes


def _sketch(vec_col) -> F.Column:
    """Signed-random-projection sketch: one bigint of N_PLANES sign
    bits against the fixed +-1 hyperplanes.

    Arrow-vectorized pandas UDF: the projection is a (batch x dim) @
    (dim x planes) matmul — numpy does it in one BLAS call per Arrow
    batch. The previous formulation (transform/zip_with/aggregate
    higher-order functions) was evaluated interpreted per element —
    N_PLANES * dim lambda evals PER ROW — and measured ~20x slower.
    Deterministic: the plane matrix is md5-derived, no RNG.
    """
    planes_t = np.array(_deterministic_planes(), dtype=np.float64).T  # (dim, planes)
    pow2 = (np.int64(1) << np.arange(N_PLANES, dtype=np.int64)).astype(np.int64)

    @F.pandas_udf(LongType())
    def sketch_udf(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack(s.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes_t) > 0.0  # (batch, planes)
        return pd.Series((bits.astype(np.int64) * pow2).sum(axis=1))

    return sketch_udf(vec_col)


def _band_key(sk: F.Column, band: int) -> F.Column:
    return F.shiftright(sk, band * BAND_BITS).bitwiseAND(F.lit((1 << BAND_BITS) - 1))


def _lsh_oracle() -> str:
    """DuckDB replay of the SRP-LSH pipeline. The ±1 plane matrix is
    md5-derived (no RNG), so it can be embedded as 32 constant DOUBLE[]
    rows; sign bits, band keys, multi-probe flips, the (band, key)
    candidate equi-join, and the exact-cosine re-rank are then plain
    SQL. The only cross-engine float risk is a projection dot sitting
    within accumulation error of 0.0 (numpy BLAS vs sequential fold) —
    vanishingly rare for these magnitudes and absent at every tested
    SF."""
    plane_rows = ", ".join(
        f"({p}, CAST([{', '.join(str(x) for x in row)}] AS DOUBLE[]))"
        for p, row in enumerate(_deterministic_planes())
    )
    key = "(sk >> (band * {bb})) & {mask}".format(bb=BAND_BITS, mask=(1 << BAND_BITS) - 1)
    flips = ", ".join(
        f"xor({key}, {1 << i})" for i in range(BAND_BITS)
    )
    return f"""
    WITH vecs AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE {VALID_VEC_SQL}),
    planes(p, pl) AS (VALUES {plane_rows}),
    sk AS MATERIALIZED (
      SELECT vec_id,
             CAST(SUM(CASE WHEN list_dot_product(t.v, planes.pl) > 0
                           THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT)
                 AS sk
      FROM vecs t CROSS JOIN planes GROUP BY vec_id),
    bands AS (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band),
    c_bands AS MATERIALIZED (
      SELECT s.vec_id AS nid, bands.band, {key} AS key
      FROM sk s CROSS JOIN bands),
    q_probes AS (
      SELECT s.vec_id AS qid, bands.band, f.key
      FROM sk s CROSS JOIN bands,
           LATERAL (SELECT unnest([{key}, {flips}]) AS key) f
      WHERE s.vec_id < {N_QUERIES}),
    cand AS (
      SELECT DISTINCT q.qid, c.nid
      FROM c_bands c JOIN q_probes q ON c.band = q.band AND c.key = q.key
      WHERE q.qid <> c.nid),
    scored AS (
      SELECT cand.qid, cand.nid, ROUND({_cos_sql("qv.v", "cv.v")}, 6) + 0 AS sim
      FROM cand JOIN vecs cv ON cv.vec_id = cand.nid
                JOIN vecs qv ON qv.vec_id = cand.qid)
    SELECT qid, nid, sim, rk FROM (
      SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored)
    WHERE rk <= {TOP_K}
    """


@register(
    "similarity_topk_lsh",
    tags=("similarity", "vector", "approx"),
    oracle=_lsh_oracle(),
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via signed random projection LSH with a
    BANDED, multi-probe candidate join.

    Each vector gets a sketch of N_PLANES sign bits, split into N_BANDS
    band keys of BAND_BITS bits. The corpus side emits one (band, key)
    row per band; the query side emits its band keys plus every 1-bit
    flip of each (multi-probe, radius 1). Candidates are the EQUI-JOIN
    of the two on (band, key) — no per-query scan of the corpus
    anywhere in the plan; exact cosine re-ranks candidates only.

    Hash-oracled (round-5 conversion): approximate in RECALL terms but
    a deterministic pure function of the data — md5-derived planes,
    integer band keys, rounded-cosine re-rank — so the oracle replays
    the identical pipeline in SQL (see _lsh_oracle).
    tests/test_similarity.py still asserts recall@10 vs the
    brute-force baseline (currently ~0.9 at sf0.001; the pre-banded
    Hamming-filter formulation measured 0.86).

    Scale: corpus cost is N_BANDS small (nid, band, int-key) rows per
    vector and one shuffle-free broadcast-hash-join against the probe
    keys; bucket occupancy (not pair count) controls candidate volume,
    and BAND_BITS grows with corpus size to keep buckets bounded. For
    an UNBOUNDED query side the same plan holds with the probe side
    shuffled instead of broadcast — still an equi-join on (band, key).
    """
    # valid_vector guard: a NULL embedding crashes np.stack inside the
    # sketch UDF and a zero-norm vector hits ANSI divide-by-zero in the
    # cosine re-rank — same hardening as the brute-force baseline
    # (edge-embeddings harness).
    emb = load_table(spark, sf_dir, "embeddings").filter(
        valid_vector(as_double_array("embedding"))
    )
    vecs = emb.select(
        F.col("vec_id"),
        as_double_array("embedding").alias("v"),
        _sketch(as_double_array("embedding")).alias("sk"),
    )
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qe"), F.col("sk").alias("qsk")
    )

    # Corpus side: one (band, key) row per band per vector.
    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), _band_key(F.col("sk"), b).alias("key"))
            for b in range(N_BANDS)
        ]
    )
    c_bands = vecs.select(
        F.col("vec_id").alias("nid"), F.explode(band_structs).alias("b")
    ).select("nid", "b.band", "b.key")

    # Query side: exact band keys plus all 1-bit flips (multi-probe).
    probe_structs = []
    for b in range(N_BANDS):
        kb = _band_key(F.col("qsk"), b)
        probes = [kb]
        if _PROBE_FLIPS >= 1:
            probes += [kb.bitwiseXOR(F.lit(1 << i)) for i in range(BAND_BITS)]
        probe_structs += [
            F.struct(F.lit(b).alias("band"), p.alias("key")) for p in probes
        ]
    q_probes = q.select("qid", F.explode(F.array(*probe_structs)).alias("p")).select(
        "qid", "p.band", "p.key"
    )

    cand = (
        c_bands.join(F.broadcast(q_probes), ["band", "key"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )

    # Exact re-rank on candidates only: fetch vectors by id.
    c_vecs = vecs.select(F.col("vec_id").alias("nid"), F.col("v").alias("ce"))
    q_vecs = q.select("qid", "qe")
    sim = F.round(cosine(F.col("qe"), F.col("ce")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        cand.join(c_vecs, "nid")
        .join(F.broadcast(q_vecs), "qid")
        .select("qid", "nid", sim.alias("sim"))
        .select("qid", "nid", "sim", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


# ------------------------------------------------ IVF (cell-probe variant)

N_PROBE = 4


def _centroids(emb: DataFrame) -> DataFrame:
    """Per-cell mean vector (the coarse quantizer codebook). At 100 TB
    the codebook comes from sampled k-means; here the stored ``label``
    is the cell id and the codebook is its quantized-integer mean (see
    _qmean_centroids — exact under any summation order, which is what
    lets the IVF path carry a value-hash oracle) — computed
    distributed (posexplode + partial agg), never on the driver."""
    vecs = emb.filter(F.col("embedding").isNotNull()).select(
        "label", as_double_array("embedding").alias("v")
    )
    return _qmean_centroids(vecs, ["label"])


def ivf_topk(
    spark: SparkSession, sf_dir: str, n_probe: int = N_PROBE, top_k: int = TOP_K
) -> DataFrame:
    """IVF ANN: queries probe the ``n_probe`` nearest coarse cells, and
    only vectors in probed cells are scored exactly.

    With n_probe == number of cells this degrades to exhaustive search
    and must equal brute force exactly — the unit test asserts that.

    Scale: the codebook is tiny (cells x dim) and broadcasts; cell
    assignment is a broadcast nested-loop over the codebook only; the
    candidate fetch is an equi-join on cell id. Corpus is scanned once,
    shuffled once (on cell id) — the canonical IVF-Flat layout. On disk
    this pairs with partitionBy(cell) so probes prune files entirely.
    """
    # valid_vector guard: zero-norm/NULL vectors hit ANSI
    # divide-by-zero in the centroid and re-rank cosines — same
    # hardening as the brute-force baseline (edge-embeddings harness).
    emb = load_table(spark, sf_dir, "embeddings").filter(
        valid_vector(as_double_array("embedding"))
    )
    cent = _centroids(emb)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), as_double_array("embedding").alias("qe")
    )
    # Rank cells per query by centroid cosine; keep the n_probe best.
    cell_sim = F.round(cosine(F.col("qe"), F.col("cvec")), 6)
    wq = Window.partitionBy("qid").orderBy(F.col("cell_sim").desc(), "label")
    probed = (
        q.crossJoin(F.broadcast(cent))
        .select("qid", "qe", "label", cell_sim.alias("cell_sim"))
        .withColumn("cell_rk", F.row_number().over(wq))
        .filter(F.col("cell_rk") <= n_probe)
        .select("qid", "qe", "label")
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), as_double_array("embedding").alias("ce"), "label"
    )
    sim = F.round(cosine(F.col("qe"), F.col("ce")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        c.join(F.broadcast(probed), "label")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
        .select("qid", "nid", "sim", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= top_k)
    )


@register(
    "similarity_topk_ivf",
    tags=("similarity", "vector", "approx"),
    oracle=f"""
    WITH vecs AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE {VALID_VEC_SQL}),
    cents AS MATERIALIZED {_qmean_sql("vecs", "label", _DIM)},
    q AS (SELECT vec_id AS qid, v AS qe FROM vecs WHERE vec_id < {N_QUERIES}),
    probed AS (
      SELECT qid, qe, label FROM (
        SELECT q.qid, q.qe, c.label,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY ROUND({_cos_sql("q.qe", "c.cvec")}, 6) DESC,
                            c.label) AS cell_rk
        FROM q CROSS JOIN cents c)
      WHERE cell_rk <= {N_PROBE}),
    scored AS (
      SELECT p.qid, e.vec_id AS nid,
             ROUND({_cos_sql("p.qe", "e.v")}, 6) + 0 AS sim
      FROM probed p JOIN vecs e ON e.label = p.label AND e.vec_id <> p.qid)
    SELECT qid, nid, sim, rk FROM (
      SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored)
    WHERE rk <= {TOP_K}
    """,
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probe ANN at the default probe width.

    Hash-oracled even though the SEARCH is approximate: the operator
    itself is a deterministic pure function of the data (quantized-
    integer codebook means, rounded-cosine probe ranking with id
    tiebreaks), so the oracle replays the same probe-then-rerank plan
    in SQL. tests/test_similarity.py additionally asserts the
    exhaustive-probe limit equals brute force and measures recall at
    the default width."""
    return ivf_topk(spark, sf_dir)


@register(
    "embedding_label_centroids",
    tags=("similarity", "vector", "agg"),
    oracle="""
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE embedding IS NOT NULL),
    u AS (SELECT label, d, val
          FROM e, LATERAL (SELECT unnest(generate_series(1, 64)) AS d,
                                  unnest(v) AS val))
    SELECT label, d AS dim, round(SUM(val), 6) + 0 AS coord_sum, COUNT(*) AS n
    FROM u GROUP BY label, d
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid accumulation (the aggregation step of k-means
    / IVF coarse quantization): explode vectors positionally, sum per
    (label, dim).

    Rounded to 6 decimals: float-sum association differs across
    engines; at these magnitudes the rounded values agree.

    Scale: posexplode + partial agg — shuffle carries only
    (label, dim) keys, i.e. O(labels * dim) groups.
    """
    # Explicit NOT NULL on both sides: Spark's posexplode silently
    # drops NULL arrays while the oracle's zipped unnest pads them —
    # the filter makes the (sensible) drop semantics shared.
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    exploded = emb.select(
        "label", F.posexplode(as_double_array("embedding")).alias("pos", "val")
    )
    return (
        exploded.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.sum("val"), 6).alias("coord_sum"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "embedding_array_stats",
    tags=("vector", "array"),
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           ROUND(SQRT(list_aggregate(
                 list_transform(embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 'sum')), 6) AS l2,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) + 0 AS vmax
    FROM embeddings
    """,
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array profiling via higher-order functions only
    (size / filter / transform / aggregate / array_max — all JVM-side
    codegen, no UDF): dimensionality, positive-component count, L2
    norm, max component.

    Scale: pure scan->project, zero shuffle, column-pruned to the
    embedding column. The norm is a sequential in-order fold in both
    engines (same float addition order), rounded to 6 decimals so the
    value hash is insensitive to any residual last-bit drift.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "label", as_double_array("embedding").alias("v"))
    v = F.col("v")
    return base.select(
        "vec_id",
        "label",
        F.size(v).alias("dim"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(l2_norm(v), 6).alias("l2"),
        F.round(F.array_max(v), 6).alias("vmax"),
    )


# ------------------------------------------------ k-means (iterative)

KMEANS_K = 16
KMEANS_ITERS = 3


def _qmean_centroids(df: DataFrame, keys: list[str], vec_col: str = "v") -> DataFrame:
    """Quantized-integer centroid means per ``keys``: each coordinate is
    SUM(ROUND(val*1e6)) / (n*1e6) — an EXACT rational, identical under
    any summation order on any engine (integer sums are associative),
    then one IEEE double division. This is what makes the iterative
    k-means/IVF family hash-oracle-able: a float AVG would drift at the
    last ulp between Spark's partial-agg tree and DuckDB's scan order,
    and three Lloyd iterations amplify any flipped assignment. The
    1e-6 coordinate quantization is far below the synthetic corpus's
    coordinate scale (~1.0), so cluster quality is unchanged
    (tests/test_similarity.py's recall and Lloyd-invariant gates pin
    that).

    Scale: identical shuffle shape to the float-mean version — one
    (keys..., pos) partial+final agg; the quantization is a codegen
    projection on the map side."""
    return (
        df.select(*keys, F.posexplode(vec_col).alias("pos", "val"))
        .groupBy(*keys, "pos")
        .agg(
            F.sum(F.round(F.col("val") * 1_000_000.0, 0).cast("long")).alias("qsum"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            *keys,
            "pos",
            (
                F.col("qsum").cast("double")
                / (F.col("n").cast("double") * F.lit(1_000_000.0))
            ).alias("cval"),
        )
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("s"))
        .select(*keys, F.transform("s", lambda x: x["cval"]).alias("cvec"))
    )


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Distributed Lloyd's k-means over the embeddings, returning the
    final assignment ``(vec_id, cell, dist2)``.

    Deterministic by construction: seeds are the vectors with the k
    smallest md5 ranks (pure function of vec_id, no RNG), ties in the
    nearest-centroid argmin break on cell id, and each iteration's
    centroids are exact per-dimension means — so the operator is
    reproducible and resumable, the same discipline as every other
    iterative op here (see dedup_clusters).

    Scale per iteration: centroids broadcast (k x dim); assignment is
    a scan -> argmin over the broadcast (no shuffle); the centroid
    update is posexplode + two-level partial agg — one shuffle keyed
    by (cell, dim). ``localCheckpoint`` truncates lineage so the plan
    stays flat across iterations. The driver sees no data, only the
    loop counter.
    """
    from ..functions import md5_long

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", as_double_array("embedding").alias("v")
    ).transform(truncate_plan)

    # Seed selection must NOT be a global window (that would sort the
    # whole corpus on one partition): orderBy().limit(k) plans
    # TakeOrderedAndProject — per-partition top-k then a k-row merge.
    # The row_number that assigns cell ids runs on the k-row result.
    hkey = md5_long(F.concat(F.lit("kmeans:"), F.col("vec_id").cast("string")))
    # Seeds come from non-NULL vectors only: a NULL centroid would be a
    # dead cell and, worse, a NULLS-ordering divergence between engines
    # (Spark windows default NULLS FIRST, DuckDB NULLS LAST) — found by
    # the edge-embeddings harness.
    seeds = (
        vecs.filter(F.col("v").isNotNull())
        .select(hkey.alias("hkey"), "vec_id", "v")
        .orderBy("hkey", "vec_id")
        .limit(k)
    )
    cents = (
        seeds.withColumn(
            "rk", F.row_number().over(Window.orderBy("hkey", "vec_id"))
        )
        .select((F.col("rk") - 1).alias("cell"), F.col("v").alias("cvec"))
        .transform(truncate_plan)
    )

    assign = None
    for _ in range(iters):
        joined = vecs.crossJoin(F.broadcast(cents))
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # Argmin as a map-side-combinable aggregation, not a window
        # (round-9, same shape as pq_fit_encode): min_by over the
        # (dist2, cell) struct picks EXACTLY the row_number()=1 row of
        # the old ORDER BY dist2 NULLS LAST, cell window. Nullness is
        # uniform within a vec_id group (a NULL vector yields NULL
        # dist2 against EVERY centroid, a real vector against none),
        # so NULLS placement can never reorder rows within a group:
        # all-NULL groups tie on dist2 and resolve on the unique cell
        # id in both formulations, matching DuckDB's replay. The k-way
        # broadcast blow-up now collapses k->1 on the map side before
        # the vec_id exchange and no per-group sort runs.
        assign = (
            joined.select("vec_id", "v", "cell", d2.alias("dist2"))
            .groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct("cell", "v", "dist2"),
                    F.struct("dist2", "cell"),
                ).alias("m")
            )
            .select("vec_id", "m.cell", "m.v", "m.dist2")
        )
        cents = _qmean_centroids(assign, ["cell"]).transform(truncate_plan)
    return assign.select("vec_id", "cell", F.round("dist2", 6).alias("dist2"))


def _kmeans_sql_ctes(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """DuckDB WITH-clause body replaying :func:`kmeans_fit` exactly:
    md5-ranked seeds, then ``iters`` unrolled Lloyd iterations. Every
    CTE is MATERIALIZED — the assignment chain references vecs/cents
    multiply, and DuckDB re-evaluates plain CTEs per reference
    (exponential blowup across an unrolled iteration chain).

    Why a hash oracle is possible for an "iterative" operator at all:
    (1) seeds are a pure md5 rank (no RNG); (2) centroids are
    quantized-integer means (see :func:`_qmean_centroids`) — exact
    rationals under any summation order; (3) distances fold over
    bit-identical arrays in the same element order on both engines
    (the similarity_topk_cosine pattern); (4) the only residual float
    noise is under the final ROUND(dist2, 6)."""
    from ..functions import md5_long_sql

    d2 = (
        "list_sum(list_transform(list_zip(t.v, c.cvec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    hkey = md5_long_sql("'kmeans:' || CAST(vec_id AS VARCHAR)")
    ctes = [
        f"""
    vecs AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    cents0 AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY hkey, vec_id) - 1 AS cell, v AS cvec
      FROM (SELECT {hkey} AS hkey, vec_id, v
            FROM vecs WHERE v IS NOT NULL
            ORDER BY hkey, vec_id LIMIT {k}))"""
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""
    assign{i} AS MATERIALIZED (
      SELECT vec_id, v, cell, dist2 FROM (
        SELECT vec_id, v, cell, dist2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist2, cell) AS rk
        FROM (SELECT t.vec_id, t.v, c.cell, {d2} AS dist2
              FROM vecs t CROSS JOIN cents{i - 1} c))
      WHERE rk = 1)""")
        if i < iters:
            ctes.append(
                f"""
    cents{i} AS MATERIALIZED {_qmean_sql(f"assign{i}", "cell", _DIM)}"""
            )
    return ",".join(ctes)


KMEANS_FINAL = f"assign{KMEANS_ITERS}"


@register(
    "kmeans_assign_cells",
    tags=("similarity", "vector", "iterative"),
    oracle=f"""
    WITH {_kmeans_sql_ctes()}
    SELECT vec_id, cell, ROUND(dist2, 6) AS dist2 FROM {KMEANS_FINAL}
    """,
)
def kmeans_assign_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cell assignment after KMEANS_ITERS Lloyd iterations.

    Hash-oracled despite being iterative: the oracle UNROLLS the fixed
    Lloyd iterations as DuckDB CTEs (see _kmeans_sql_ctes) — possible
    because seeding is md5-ranked and centroids are exact quantized-
    integer means, so the whole fit is a pure function of the data.
    The Lloyd invariants (nearest-centroid assignment, monotone
    objective) stay pinned in tests/test_similarity.py."""
    return kmeans_fit(spark, sf_dir)


@register(
    "kmeans_cell_profile",
    tags=("similarity", "vector", "iterative"),
    oracle=f"""
    WITH {_kmeans_sql_ctes()}
    SELECT cell, COUNT(*) AS n_members,
           CAST(SUM(CAST(ROUND(ROUND(dist2, 6) * 1000000.0, 0) AS BIGINT))
                AS BIGINT) AS objective_micros
    FROM {KMEANS_FINAL}
    GROUP BY cell
    """,
)
def kmeans_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell summary of the k-means assignment: member count and the
    within-cell objective in exact integer micros after the fixed
    KMEANS_ITERS deterministic Lloyd iterations.

    The objective is reported as SUM of 1e6-quantized per-vector
    distances (a BIGINT) rather than a float sum: integer sums are
    order-independent, so the value hash cannot flake on aggregation
    order — the same discipline as the centroid means. The Lloyd
    invariants stay pinned in tests/test_similarity.py.

    Scale: one extra k-row aggregation over the assignment — free next
    to the fit itself.
    """
    assign = kmeans_fit(spark, sf_dir)
    return assign.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.round(F.col("dist2") * 1_000_000.0, 0).cast("long")).alias(
            "objective_micros"
        ),
    )


@register(
    "similarity_topk_ivf_kmeans",
    tags=("similarity", "vector", "approx", "iterative"),
    oracle=f"""
    WITH {_kmeans_sql_ctes()},
    labeled AS MATERIALIZED (
      SELECT vec_id, v, cell FROM {KMEANS_FINAL}
      WHERE v IS NOT NULL
        AND list_sum(list_transform(v, x -> x * x)) > 0),
    cellcents AS MATERIALIZED {_qmean_sql("labeled", "cell", _DIM)},
    q AS (SELECT vec_id AS qid, v AS qe FROM labeled
          WHERE vec_id < {N_QUERIES}),
    probed AS (
      SELECT qid, qe, cell FROM (
        SELECT q.qid, q.qe, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY ROUND({_cos_sql("q.qe", "c.cvec")}, 6) DESC,
                            c.cell) AS cell_rk
        FROM q CROSS JOIN cellcents c)
      WHERE cell_rk <= {N_PROBE}),
    scored AS (
      SELECT p.qid, e.vec_id AS nid,
             ROUND({_cos_sql("p.qe", "e.v")}, 6) + 0 AS sim
      FROM probed p JOIN labeled e ON e.cell = p.cell AND e.vec_id <> p.qid)
    SELECT qid, nid, sim, rk FROM (
      SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored)
    WHERE rk <= {TOP_K}
    """,
)
def similarity_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the LEARNED k-means codebook instead of the stored
    labels: kmeans_fit assigns each vector a cell, queries probe the
    N_PROBE nearest learned centroids, and only probed cells are scored
    exactly — the full IVF-Flat build path (train coarse quantizer ->
    assign -> probe) composed from the k-means and IVF pieces.

    Hash-oracled (the round-5 conversion): the whole chain — md5
    seeds, quantized-integer centroid means, rounded-cosine probe
    ranking with id tiebreaks — is a deterministic pure function of
    the data, so the oracle unrolls the k-means CTEs and replays the
    probe-then-rerank plan in SQL. Tests additionally assert recall@10
    — it matches the stored-label IVF's recall while probing a SMALLER
    corpus fraction (4 of 16 learned cells vs 4 of 10 labels), i.e.
    the learned codebook buys selectivity, not magic.

    Scale: codebook is k x dim (broadcast); assignment adds one
    argmin pass over the corpus; probing and re-ranking are the same
    equi-join-on-cell shape as ivf_topk.
    """
    assign = kmeans_fit(spark, sf_dir).select("vec_id", "cell")
    # valid_vector guard on the scored side (the k-means fit itself is
    # L2-based and handles NULL/zero rows): zero-norm/NULL vectors hit
    # ANSI divide-by-zero in the probe/re-rank cosines
    # (edge-embeddings harness).
    emb = load_table(spark, sf_dir, "embeddings").filter(
        valid_vector(as_double_array("embedding"))
    )
    vecs = emb.select("vec_id", as_double_array("embedding").alias("v"))
    labeled = vecs.join(assign, "vec_id")

    cents = _qmean_centroids(labeled, ["cell"])
    q = labeled.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qe")
    )
    cell_sim = F.round(cosine(F.col("qe"), F.col("cvec")), 6)
    wq = Window.partitionBy("qid").orderBy(F.col("cell_sim").desc(), "cell")
    probed = (
        q.crossJoin(F.broadcast(cents))
        .select("qid", "qe", "cell", cell_sim.alias("cell_sim"))
        .withColumn("cell_rk", F.row_number().over(wq))
        .filter(F.col("cell_rk") <= N_PROBE)
        .select("qid", "qe", "cell")
    )
    c = labeled.select(
        F.col("vec_id").alias("nid"), F.col("v").alias("ce"), "cell"
    )
    sim = F.round(cosine(F.col("qe"), F.col("ce")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        c.join(F.broadcast(probed), "cell")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("sim"))
        .select("qid", "nid", "sim", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


# --------------------------------------- PQ-ADC (product quantization)

PQ_M = 8                   # subspaces
PQ_SUBDIM = _DIM // PQ_M   # dims per subspace
PQ_K = 16                  # centroids per subspace codebook
PQ_ITERS = 2               # Lloyd refinement passes per subspace
PQ_SHORTLIST = 150         # ADC candidates kept for exact re-rank


def _pq_subvectors(vecs: DataFrame, id_col: str, sv_alias: str) -> DataFrame:
    """Explode unit-normalized vectors into (id, sub, subvector) rows.

    Normalizing FIRST makes squared-L2 ADC ranking equivalent to
    cosine ranking (||a-b||^2 = 2 - 2*cos for unit vectors), so the
    PQ path and the brute-force baseline order candidates by the same
    geometry."""
    norm = l2_norm(F.col("v"))
    unit = F.transform(F.col("v"), lambda x: x / norm)
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.struct(
            m.cast("int").alias("sub"),
            F.slice(F.col("u"), m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
        ),
    )
    return (
        vecs.select(F.col(id_col), unit.alias("u"))
        .select(id_col, F.explode(subs).alias("x"))
        .select(id_col, F.col("x.sub").alias("sub"), F.col("x.sv").alias(sv_alias))
    )


def _pq_d2(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_fit_encode(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks (PQ_K centroids each, md5-seeded
    deterministic Lloyd, PQ_ITERS passes) and encode every corpus
    vector as PQ_M 4-bit codes. Returns (codebook, codes):
    codebook = (sub, cell, cvec), codes = (vec_id, sub, code).

    Scale: all PQ_M sub-quantizers train in the SAME distributed
    passes (the sub id is just another key column, not a Python
    loop over subspaces); the codebook is PQ_M x PQ_K x PQ_SUBDIM
    (~4 KB) and broadcasts; each Lloyd pass is one broadcast argmin
    over the exploded corpus plus one (sub, cell, pos)-keyed mean
    shuffle. Codes are 8 x 4 bits per vector — a 64x compression of
    the 64-dim float corpus, which is what lets a 100 TB embedding
    corpus fit hot in executor memory for the ADC scan."""
    from ..functions import md5_long

    emb = load_table(spark, sf_dir, "embeddings").filter(
        valid_vector(as_double_array("embedding"))
    )
    vecs = emb.select(
        "vec_id", as_double_array("embedding").alias("v")
    ).transform(truncate_plan)
    subs = _pq_subvectors(vecs, "vec_id", "sv").transform(truncate_plan)

    hkey = md5_long(F.concat(F.lit("pq:"), F.col("vec_id").cast("string")))
    seed_ids = (
        vecs.select(hkey.alias("hkey"), "vec_id")
        .orderBy("hkey", "vec_id")
        .limit(PQ_K)
        .withColumn(
            "cell", F.row_number().over(Window.orderBy("hkey", "vec_id")) - 1
        )
        .select("vec_id", "cell")
    )
    book = (
        subs.join(F.broadcast(seed_ids), "vec_id")
        .select("sub", "cell", F.col("sv").alias("cvec"))
        .transform(truncate_plan)
    )

    # Argmin as a map-side-combinable aggregation, not a window
    # (round-9, guide-standard "aggregate before you shuffle"): min_by
    # over the (d2, cell) struct picks EXACTLY the row_number()=1 row
    # of the old ORDER BY d2, cell window — d2 ties break on the
    # unique cell id — but the K-way blow-up of the broadcast join
    # collapses 16->1 on the map side before the (vec_id, sub)
    # exchange, and no per-group sort runs. PQ subvectors are
    # NULL-free by construction (valid_vector filter upstream), so no
    # NULL-ordering caveat applies.
    assign = None
    for _ in range(PQ_ITERS):
        joined = subs.join(F.broadcast(book), "sub")
        assign = (
            joined.select(
                "vec_id", "sub", "sv", "cell",
                _pq_d2(F.col("sv"), F.col("cvec")).alias("d2"),
            )
            .groupBy("vec_id", "sub")
            .agg(
                F.min_by(
                    F.struct("cell", "sv"), F.struct("d2", "cell")
                ).alias("m")
            )
            .select(
                "vec_id", "sub",
                F.col("m.cell").alias("cell"), F.col("m.sv").alias("sv"),
            )
        )
        # Quantized-integer centroid means (see _qmean_centroids): exact
        # under any summation order, which is what lets PQ carry a
        # value-hash oracle despite the iterative training.
        book = _qmean_centroids(
            assign.select("sub", "cell", F.col("sv").alias("v")), ["sub", "cell"]
        ).transform(truncate_plan)
    # Final assignment against the FINAL codebook: the loop's last
    # `assign` predates the last centroid update, and ADC lookups
    # measure distances to the returned book — codes must be argmins
    # under that same book or every shifted vector is mis-encoded.
    joined = subs.join(F.broadcast(book), "sub")
    codes = (
        joined.select(
            "vec_id", "sub", "cell",
            _pq_d2(F.col("sv"), F.col("cvec")).alias("d2"),
        )
        .groupBy("vec_id", "sub")
        .agg(F.min_by("cell", F.struct("d2", "cell")).alias("code"))
        .select("vec_id", "sub", "code")
    )
    return book, codes


def _pq_oracle() -> str:
    """DuckDB replay of the full PQ-ADC pipeline: md5-ranked seeds,
    PQ_ITERS quantized-integer Lloyd passes per subspace, final encode
    against the final book, integer-micro ADC lookup sums, shortlist
    cut, exact-cosine re-rank. Deterministic for the same reasons as
    the k-means family (see _kmeans_sql_ctes); the unit-normalization
    division is the one float step before quantization, shared
    element-order on both engines."""
    from ..functions import md5_long_sql

    d2 = (
        "list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    hkey = md5_long_sql("'pq:' || CAST(vec_id AS VARCHAR)")
    ctes = [
        f"""
    vecs AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      WHERE embedding IS NOT NULL
        AND list_sum(list_transform(list_transform(embedding,
                x -> CAST(x AS DOUBLE)), x -> x * x)) > 0),
    units AS MATERIALIZED (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
      FROM vecs),
    subs AS MATERIALIZED (
      SELECT vec_id, m.sub,
             list_slice(u, m.sub * {PQ_SUBDIM} + 1,
                        m.sub * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM units, (SELECT unnest(generate_series(0, {PQ_M - 1})) AS sub) m),
    seed_ids AS MATERIALIZED (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY hkey, vec_id) - 1 AS cell
      FROM (SELECT {hkey} AS hkey, vec_id
            FROM vecs ORDER BY hkey, vec_id LIMIT {PQ_K})),
    book0 AS MATERIALIZED (
      SELECT s.sub, si.cell, s.sv AS cvec
      FROM subs s JOIN seed_ids si USING (vec_id))"""
    ]
    for i in range(1, PQ_ITERS + 1):
        ctes.append(f"""
    passign{i} AS MATERIALIZED (
      SELECT vec_id, sub, sv, cell FROM (
        SELECT t.vec_id, t.sub, t.sv, b.cell,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.sub
                   ORDER BY {d2.format(a="t.sv", b="b.cvec")}, b.cell) AS rk
        FROM subs t JOIN book{i - 1} b ON t.sub = b.sub)
      WHERE rk = 1),
    book{i} AS MATERIALIZED {_qmean_sql(f"passign{i}", "sub, cell", PQ_SUBDIM, "sv")}""")
    bookf = f"book{PQ_ITERS}"
    return f"""
    WITH {",".join(ctes)},
    codes AS MATERIALIZED (
      SELECT vec_id AS nid, sub, cell AS code FROM (
        SELECT t.vec_id, t.sub, b.cell,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.sub
                   ORDER BY {d2.format(a="t.sv", b="b.cvec")}, b.cell) AS rk
        FROM subs t JOIN {bookf} b ON t.sub = b.sub)
      WHERE rk = 1),
    lut AS MATERIALIZED (
      SELECT q.vec_id AS qid, q.sub, b.cell AS code,
             CAST(ROUND({d2.format(a="q.sv", b="b.cvec")} * 1000000.0, 0)
                  AS BIGINT) AS pd2
      FROM subs q JOIN {bookf} b ON q.sub = b.sub
      WHERE q.vec_id < {N_QUERIES}),
    adc AS MATERIALIZED (
      SELECT l.qid, c.nid, CAST(SUM(l.pd2) AS BIGINT) AS adc_d2
      FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
      WHERE l.qid <> c.nid
      GROUP BY l.qid, c.nid),
    shortlist AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY adc_d2, nid) AS srk
        FROM adc)
      WHERE srk <= {PQ_SHORTLIST}),
    scored AS (
      SELECT s.qid, s.nid, ROUND({_cos_sql("qv.v", "cv.v")}, 6) + 0 AS sim
      FROM shortlist s
      JOIN vecs cv ON cv.vec_id = s.nid
      JOIN vecs qv ON qv.vec_id = s.qid)
    SELECT qid, nid, sim, rk FROM (
      SELECT qid, nid, sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rk
      FROM scored)
    WHERE rk <= {TOP_K}
    """


@register(
    "similarity_topk_pq",
    tags=("similarity", "vector", "approx", "iterative"),
    oracle=_pq_oracle(),
)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jegou, Douze & Schmid, TPAMI 2011) and exact re-rank: corpus
    vectors are stored only as PQ_M 4-bit codes; each query builds a
    PQ_M x PQ_K lookup table of exact subspace distances to every
    centroid; candidate distance is then a pure TABLE LOOKUP SUM —
    the ADC scan never touches a corpus float. The PQ_SHORTLIST best
    ADC candidates are re-ranked with exact cosine, which recovers
    most of the recall the 4-bit codes give up.

    Hash-oracled (round-5 conversion): quantized-integer codebook
    means plus integer-micro ADC sums make the whole train-encode-
    scan-rerank chain a deterministic pure function of the data, so
    the oracle replays it in SQL (see _pq_oracle).
    tests/test_similarity.py asserts recall@10 against brute force
    and that the output is exact-cosine-consistent on the shortlist.

    Scale (100 TB): the codebook broadcasts (~4 KB); the per-query
    LUT relation is n_queries x PQ_M x PQ_K rows (bounded, broadcast);
    the ADC scan is an equi-join of the 4-bit code corpus against the
    broadcast LUT on (sub, code) followed by a map-side-combined
    (qid, nid) sum — one shuffle of Q x N x M/combine rows, no
    corpus-float I/O, no cartesian (plan-pinned like LSH/IVF). The
    exact re-rank touches PQ_SHORTLIST x n_queries vectors only.
    """
    book, codes = pq_fit_encode(spark, sf_dir)

    emb = load_table(spark, sf_dir, "embeddings").filter(
        valid_vector(as_double_array("embedding"))
    )
    vecs = emb.select("vec_id", as_double_array("embedding").alias("v"))
    q_subs = _pq_subvectors(
        vecs.filter(F.col("vec_id") < N_QUERIES), "vec_id", "qsv"
    ).withColumnRenamed("vec_id", "qid")

    # LUT distances quantized to integer micros: the ADC candidate
    # distance is then an exact BIGINT sum — order-independent, so the
    # shortlist cut at rank PQ_SHORTLIST is identical on any engine
    # (the same discipline as the centroid means).
    lut = q_subs.join(F.broadcast(book), "sub").select(
        "qid", "sub", F.col("cell").alias("code"),
        F.round(_pq_d2(F.col("qsv"), F.col("cvec")) * 1_000_000.0, 0)
        .cast("long")
        .alias("pd2"),
    )
    adc = (
        codes.withColumnRenamed("vec_id", "nid")
        .join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("qid") != F.col("nid"))
        .groupBy("qid", "nid")
        .agg(F.sum("pd2").alias("adc_d2"))
    )
    ws = Window.partitionBy("qid").orderBy(F.col("adc_d2"), "nid")
    shortlist = (
        adc.withColumn("srk", F.row_number().over(ws))
        .filter(F.col("srk") <= PQ_SHORTLIST)
        .select("qid", "nid")
    )

    q_vecs = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qe")
    )
    c_vecs = vecs.select(F.col("vec_id").alias("nid"), F.col("v").alias("ce"))
    sim = F.round(cosine(F.col("qe"), F.col("ce")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    return (
        shortlist.join(c_vecs, "nid")
        .join(F.broadcast(q_vecs), "qid")
        .select("qid", "nid", sim.alias("sim"))
        .select("qid", "nid", "sim", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )
