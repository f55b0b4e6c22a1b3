"""Data-layout mining (split from mining.py along its docstring family
lines, round 5): Morton Z-order locality key audit (the value audit for
``sinks.write_zorder_parquet``), zone-map file-skipping audit, and the
column encoding advisor.

The reference has no analytics surface at all (SURVEY.md section 2.B);
these extend the engine's committed north-star families.

Cross-engine determinism follows the package discipline (SCALE.md):
every aggregate is an exact BIGINT sum of per-row integers; doubles
appear only in a FINAL fixed expression tree over those exact
integers, then are quantized (micro-/milli-units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


# ---------------------------------------- Z-order locality key audit

ZORDER_TOPK = 40


def _zorder_oracle() -> str:
    from ..functions import zorder_key_sql

    zexpr = zorder_key_sql("an", "bn")
    return f"""
    WITH bounds AS (
      SELECT MIN(o_custkey) AS amin, MAX(o_custkey) AS amax,
             MIN(date_diff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE))) AS bmin,
             MAX(date_diff('day', DATE '1992-01-01',
                           CAST(o_orderdate AS DATE))) AS bmax
      FROM orders
    ),
    norm AS (
      SELECT o_orderkey,
             CAST(FLOOR((CAST(o_custkey - amin AS BIGINT) * 65535)
                        / CAST(amax - amin AS DOUBLE)) AS BIGINT) AS an,
             CAST(FLOOR((CAST(date_diff('day', DATE '1992-01-01',
                                        CAST(o_orderdate AS DATE)) - bmin
                              AS BIGINT) * 65535)
                        / CAST(bmax - bmin AS DOUBLE)) AS BIGINT) AS bn
      FROM orders CROSS JOIN bounds
    )
    SELECT o_orderkey, an AS cust_grid, bn AS day_grid,
           CAST({zexpr} AS BIGINT) AS z_value
    FROM norm
    ORDER BY z_value, o_orderkey
    LIMIT {ZORDER_TOPK}
    """


@register(
    "zorder_orders_locality",
    tags=("layout", "math"),
    oracle=_zorder_oracle(),
)
def zorder_orders_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (o_custkey, order-day):
    the first {k} orders in Z-sequence with their 16-bit grid
    coordinates — the value audit for the ``write_zorder_parquet``
    layout sink (sinks.py), whose per-file TWO-column bounding boxes
    are asserted separately in tests/test_sources_sinks.py.

    Determinism: grid normalization is floor((x-min)*65535/span) —
    numerator bounded far under 2^53, so the double division floors
    identically in both engines; the interleave itself is pure integer
    shift/mask arithmetic with an identical generated expression tree
    on both sides (``functions.zorder_key`` / ``zorder_key_sql``).

    Scale (100 TB): one scalar min/max agg (broadcast back as a
    1-row relation), then the key is a per-row codegen expression —
    no shuffle at all in this audit form; the layout sink adds the
    range exchange that buys two-column row-group pruning for every
    later scan.

    Reference parity: none; data-layout family next to the
    sort-clustered and bucketed writers (SURVEY.md section 2.B
    sinks row).
    """.format(k=ZORDER_TOPK)
    from ..functions import zorder_key, zorder_norm

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
    bounds = orders.agg(
        F.min("o_custkey").alias("amin"),
        F.max("o_custkey").alias("amax"),
        F.min(day).alias("bmin"),
        F.max(day).alias("bmax"),
    )
    norm = orders.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        zorder_norm(F.col("o_custkey"), F.col("amin"), F.col("amax")).alias("an"),
        zorder_norm(day, F.col("bmin"), F.col("bmax")).alias("bn"),
    )
    return (
        norm.select(
            "o_orderkey",
            F.col("an").alias("cust_grid"),
            F.col("bn").alias("day_grid"),
            zorder_key(F.col("an"), F.col("bn")).cast("long").alias("z_value"),
        )
        .orderBy("z_value", "o_orderkey")
        .limit(ZORDER_TOPK)
    )



# ------------------------------------------- zone-map skipping audit

_ZM_N_FILES = 64
_ZM_PROBE_LO = "1995-03-01"
_ZM_PROBE_HI = "1995-03-31"


@register(
    "zonemap_skipping_audit",
    tags=("layout", "window", "agg"),
    oracle=f"""
    WITH laid AS (
      SELECT o_orderdate,
             NTILE({_ZM_N_FILES}) OVER (ORDER BY o_orderkey) AS f_arrival,
             NTILE({_ZM_N_FILES}) OVER (ORDER BY o_orderdate, o_orderkey)
               AS f_sorted
      FROM orders
    ),
    files AS (
      SELECT 'arrival' AS layout, f_arrival AS file_id,
             MIN(o_orderdate) AS min_d, MAX(o_orderdate) AS max_d,
             COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_orderdate BETWEEN DATE '{_ZM_PROBE_LO}'
                            AND DATE '{_ZM_PROBE_HI}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_match
      FROM laid GROUP BY 2
      UNION ALL
      SELECT 'date_sorted', f_sorted,
             MIN(o_orderdate), MAX(o_orderdate), COUNT(*),
             CAST(SUM(CASE WHEN o_orderdate BETWEEN DATE '{_ZM_PROBE_LO}'
                            AND DATE '{_ZM_PROBE_HI}' THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM laid GROUP BY 2
    )
    SELECT layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN min_d <= DATE '{_ZM_PROBE_HI}'
                          AND max_d >= DATE '{_ZM_PROBE_LO}'
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN min_d <= DATE '{_ZM_PROBE_HI}'
                          AND max_d >= DATE '{_ZM_PROBE_LO}'
                    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching
    FROM files GROUP BY 1
    """,
)
def zonemap_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified data-skipping audit: lay the orders table out into
    64 simulated files two ways (arrival order vs sorted by order
    date), build each file's zone map (min/max date — what parquet
    footers and table-format manifests store), and count how many
    files/rows a one-month probe must scan under each layout. The
    date-sorted layout prunes to ~1-2 files; arrival order scans all
    of them — the measured argument for sort-on-write
    (write_zorder_parquet / compact_small_files) rather than a
    hand-waved one.

    Determinism: file assignment reproduces NTILE's exact bucket-size
    rule (the first n mod k files get one extra row) from a GLOBAL
    rank over a total order (o_orderkey tie-break) — identical
    cross-engine; everything else is date comparison and integer
    counting.

    Scale (100 TB): the oracle's ``NTILE() OVER (ORDER BY ...)``
    would funnel the whole table through ONE partition, so the Spark
    side instead derives the rank with the TeraSort pattern
    (global_sort_orders): range shuffle -> per-partition offsets
    (a |partitions|-row broadcast) -> parallel per-partition
    row_number — one range shuffle + one pid-keyed window per layout,
    never a single-partition sort. Output is 2 rows.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B layout family (zorder_orders_locality's audit
    sibling).
    """
    from ..functions import distributed_rank

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    probe_lo, probe_hi = F.lit(_ZM_PROBE_LO).cast("date"), F.lit(_ZM_PROBE_HI).cast("date")
    in_probe = F.col("o_orderdate").between(probe_lo, probe_hi)

    def dist_rank(order_cols: list, tag: str) -> DataFrame:
        # Shared TeraSort rank helper (functions.distributed_rank) —
        # the same primitive global_sort_orders uses.
        return distributed_rank(
            orders, order_cols, (f"zonemap_rank_{tag}", sf_dir)
        ).select("o_orderdate", "rank")

    def with_file_id(ranked: DataFrame, layout: str) -> DataFrame:
        """NTILE(k) from the global rank: with n rows the first
        r = n mod k files hold big = n div k + 1 rows each, the rest
        hold small = n div k."""
        tot = ranked.agg(F.count(F.lit(1)).alias("_tot"))
        k = F.lit(_ZM_N_FILES)
        small = F.expr(f"_tot div {_ZM_N_FILES}")
        big, r = small + 1, F.col("_tot") % k
        in_big = F.col("rank") <= r * big
        file_id = F.when(
            in_big, F.floor((F.col("rank") - 1) / big) + 1
        ).otherwise(
            r
            + F.floor((F.col("rank") - r * big - 1) / F.greatest(small, F.lit(1)))
            + 1
        )
        return ranked.crossJoin(F.broadcast(tot)).select(
            "o_orderdate",
            file_id.cast("int").alias("file_id"),
            F.lit(layout).alias("layout"),
        )

    laid = with_file_id(
        dist_rank([F.asc("o_orderkey")], "arrival"), "arrival"
    ).unionByName(
        with_file_id(
            dist_rank([F.asc("o_orderdate"), F.asc("o_orderkey")], "sorted"),
            "date_sorted",
        )
    )
    allf = laid.groupBy("layout", "file_id").agg(
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(in_probe, 1).otherwise(0)).cast("long").alias("n_match"),
    )
    scanned = (F.col("min_d") <= probe_hi) & (F.col("max_d") >= probe_lo)
    return allf.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(scanned, 1).otherwise(0)).cast("long").alias("files_scanned"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matching"),
    )



# ------------------------------------------- encoding advisor

# Storage-layout advisor: for each candidate string column, estimate
# the bytes a dictionary encoding would use (distinct values' chars +
# a code per row, width = bytes needed for the cardinality) vs plain
# encoding (every value's chars), and recommend the winner — the
# decision parquet writers make per column chunk, surfaced as a
# queryable census so wide-table layout reviews don't guess.


@register(
    "encoding_advisor",
    tags=("layout", "agg", "string"),
    oracle="""
    WITH cols AS (
      SELECT 'orders.o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
      UNION ALL
      SELECT 'orders.o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'documents.source', source FROM documents
      UNION ALL
      SELECT 'documents.lang', lang FROM documents
    ),
    stats AS (
      SELECT col_name,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT v) AS n_distinct,
             CAST(SUM(length(v)) AS BIGINT) AS plain_bytes
      FROM cols WHERE v IS NOT NULL GROUP BY 1
    ),
    dict_side AS (
      SELECT col_name, CAST(SUM(length(v)) AS BIGINT) AS dict_value_bytes
      FROM (SELECT DISTINCT col_name, v FROM cols WHERE v IS NOT NULL)
      GROUP BY 1
    )
    SELECT s.col_name, s.n_rows, s.n_distinct, s.plain_bytes,
           d.dict_value_bytes
             + s.n_rows * CASE WHEN s.n_distinct <= 256 THEN 1
                               WHEN s.n_distinct <= 65536 THEN 2
                               ELSE 4 END AS dict_bytes,
           CASE WHEN d.dict_value_bytes
                     + s.n_rows * CASE WHEN s.n_distinct <= 256 THEN 1
                                       WHEN s.n_distinct <= 65536 THEN 2
                                       ELSE 4 END < s.plain_bytes
                THEN 'dictionary' ELSE 'plain' END AS recommended
    FROM stats s JOIN dict_side d ON d.col_name = s.col_name
    """,
)
def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-vs-plain encoding advisor over four representative
    string columns: plain cost = total value bytes; dictionary cost =
    distinct values' bytes + one code per row sized by cardinality
    (1/2/4 bytes). Low-cardinality enums (order status, priority,
    source, lang) come out 'dictionary' by an order of magnitude —
    the same per-chunk decision a parquet writer makes, exposed as a
    reviewable census for schema/layout design.

    Scale (100 TB): per column, one partial+final agg for the row
    census and one DISTINCT aggregation bounded by the column's
    cardinality (these are enum-like columns — the advisor is exactly
    for deciding that); no joins beyond the |columns|-row combine. On
    a petabyte table you run it per partition or on a TABLESAMPLE —
    byte RATIOS, not totals, drive the recommendation.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B layout family (catalog_table_stats' encoding
    sibling).
    """
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    # ONE scan per table: stack() pivots the audited columns into
    # (col_name, v) rows scan-side — the unioned-selects form read
    # each table once per column.
    cols = (
        orders.select(
            F.expr(
                "stack(2, 'orders.o_orderstatus', o_orderstatus, "
                "'orders.o_orderpriority', o_orderpriority) AS (col_name, v)"
            )
        )
        .unionByName(
            docs.select(
                F.expr(
                    "stack(2, 'documents.source', source, "
                    "'documents.lang', lang) AS (col_name, v)"
                )
            )
        )
        .where(F.col("v").isNotNull())
    )
    # ONE aggregation pipeline: collapse to (col_name, value, count)
    # first (bounded by enum cardinality), then derive row count,
    # distinct count, plain bytes (count-weighted lengths), and
    # dictionary value bytes (unweighted lengths) from that relation —
    # each table is scanned exactly once, no join, no second pass.
    per_val = cols.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("n"))
    stats = per_val.groupBy("col_name").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("n") * F.length("v")).cast("long").alias("plain_bytes"),
        F.sum(F.length("v")).cast("long").alias("dict_value_bytes"),
    )
    code_w = (
        F.when(F.col("n_distinct") <= 256, 1)
        .when(F.col("n_distinct") <= 65536, 2)
        .otherwise(4)
    )
    dict_bytes = F.col("dict_value_bytes") + F.col("n_rows") * code_w
    return stats.select(
        "col_name", "n_rows", "n_distinct", "plain_bytes",
        dict_bytes.cast("long").alias("dict_bytes"),
        F.when(dict_bytes < F.col("plain_bytes"), "dictionary")
        .otherwise("plain")
        .alias("recommended"),
    )


