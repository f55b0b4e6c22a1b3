"""Pipeline-operator semantics on fixture rows: PII masking behavior
(the synthetic corpus is PII-free, so the registered audit query can't
exercise the masks), sequence-packing determinism against an
independent reimplementation, and decontamination invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from eecs_485___mapreduce_spark.queries.pipeline import (
    PACK_CAPACITY,
    decontaminate_containment,
    pack_sequences_greedy,
    pii_counts,
    scrub_pii,
)

from .conftest import SF_SMALL


def test_scrub_pii_masks_all_classes(spark):
    rows = [
        ("write to alice.smith+spam@example.co.uk today", "[EMAIL]"),
        ("ssn 123-45-6789 on file", "[SSN]"),
        ("call (555) 123-4567 or 555-987-6543 now", "[PHONE]"),
        ("server at 192.168.0.1 responded", "[IPV4]"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], schema="text string")
    out = [r.clean for r in df.select(scrub_pii("text").alias("clean")).collect()]
    for (_, tag), clean in zip(rows, out):
        assert tag in clean, f"{tag} missing in {clean!r}"
    # nothing that isn't PII gets touched
    assert out[0] == "write to [EMAIL] today"
    assert out[1] == "ssn [SSN] on file"
    assert out[3] == "server at [IPV4] responded"


def test_scrub_pii_leaves_clean_text_alone(spark):
    text = "v1.2.3 released on 2024-01-02, cost 1234.56, contact us at the office"
    df = spark.createDataFrame([(text,)], schema="text string")
    assert df.select(scrub_pii("text").alias("c")).collect()[0].c == text


def test_pii_counts_columns(spark):
    df = spark.createDataFrame(
        [("a@b.io and c@d.org but no phone",)], schema="text string"
    )
    r = df.select(*pii_counts("text")).collect()[0]
    assert r.n_email == 2 and r.n_ssn == 0 and r.n_phone == 0 and r.n_ipv4 == 0


def test_pii_counts_match_duckdb_on_nonzero_fixture(spark):
    """Engine-vs-engine count agreement on text that actually CONTAINS
    PII. The registered ``text_pii_audit`` oracle row can't catch a
    Java-regex vs RE2 divergence because the synthetic corpus is
    PII-free (every count is 0); this fixture pins nonzero counts per
    class — multiple matches per row, duplicates, and near-miss
    lookalikes — through BOTH engines with the exact pattern strings
    the audit query uses."""
    import duckdb
    import pandas as pd

    from eecs_485___mapreduce_spark.queries.pipeline import _PII_PATTERNS

    texts = [
        "mail a.long+tag@sub.example.co.uk and b@c.io; ssn 123-45-6789",
        "call (555) 123-4567 or +1 555-987-6543 from 10.0.0.1 today",
        "dup 999-88-7777 999-88-7777 then 172.16.254.3 and 172.16.254.3",
        "near misses: v1.2.3 release, a@b.c (1-char tld), 12-34-5678",
        "no pii in this row at all",
    ]
    df = spark.createDataFrame([(t,) for t in texts], schema="text string")
    got = (
        df.select(
            *[
                F.sum(F.regexp_count("text", F.lit(p))).alias(n)
                for n, p in _PII_PATTERNS.items()
            ]
        )
        .collect()[0]
        .asDict()
    )

    con = duckdb.connect()
    fixture = pd.DataFrame({"text": texts})
    con.register("pii_fixture", fixture)
    for name, pat in _PII_PATTERNS.items():
        want = con.execute(
            "SELECT CAST(SUM(len(regexp_extract_all(text, ?))) AS BIGINT) "
            "FROM pii_fixture",
            [pat],
        ).fetchone()[0]
        assert got[name] == want, f"{name}: spark={got[name]} duckdb={want}"
        if name != "ipv4":  # ipv4 asserted below with its own count
            assert want > 0, f"fixture must exercise {name} with nonzero count"
    assert got["email"] == 2 and got["ssn"] == 3
    assert got["phone"] == 2 and got["ipv4"] == 3


def test_pack_sequences_matches_independent_reimplementation(spark):
    """The packing assignment must be byte-deterministic: recompute the
    greedy concat-and-chunk per shard in plain Python from the same
    (doc_id, n_tokens) inputs and require identical (pack_id, offset)
    for every document."""
    rows = pack_sequences_greedy(spark, SF_SMALL).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        cum = 0
        for r in sorted(shard_rows, key=lambda r: r.doc_id):
            assert r.pack_id == cum // PACK_CAPACITY, r
            assert r.pack_offset == cum % PACK_CAPACITY, r
            cum += r.n_tokens


def test_decontamination_invariants(spark):
    from eecs_485___mapreduce_spark.queries.pipeline import BENCH_SOURCE
    from eecs_485___mapreduce_spark.sources import load_table

    out = decontaminate_containment(spark, SF_SMALL)
    rows = out.collect()
    bench_ids = {
        r.doc_id
        for r in load_table(spark, SF_SMALL, "documents")
        .filter(F.col("source") == BENCH_SOURCE)
        .select("doc_id")
        .collect()
    }
    for r in rows:
        assert 0 < r.containment <= 1.0
        assert r.bench_doc in bench_ids
        assert r.train_doc not in bench_ids


def test_write_packed_shards_roundtrip(spark, tmp_path):
    """Shard writer: every document lands in exactly one pack row, in
    pack_offset order, under its shard's partition directory."""
    from eecs_485___mapreduce_spark.queries.pipeline import pack_sequences_greedy
    from eecs_485___mapreduce_spark.sinks import write_packed_shards
    from eecs_485___mapreduce_spark.sources import load_table

    out = str(tmp_path / "shards")
    packed = pack_sequences_greedy(spark, SF_SMALL)
    docs = load_table(spark, SF_SMALL, "documents")
    write_packed_shards(packed, docs, out)

    back = spark.read.parquet(out)
    rows = back.collect()
    seen = [d for r in rows for d in r.doc_ids]
    assert sorted(seen) == sorted(r.doc_id for r in packed.collect())
    # offset order == ascending doc_id within a (shard, pack): the
    # packer assigns offsets in doc_id order
    for r in rows:
        assert list(r.doc_ids) == sorted(r.doc_ids)
        assert len(r.doc_ids) == len(r.texts)
    # partition layout: one directory per shard
    import os

    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) == len({r.shard for r in packed.collect()})


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on read: parquet parts written with different
    (compatible) schemas merge into the superset schema with nulls for
    the missing columns — the mergeSchema contract a long-lived 100 TB
    dataset depends on."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 3.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 3.5


def test_observation_metrics_ride_the_gate_pass(spark):
    """Pipeline observability: production gates report rows-in /
    rows-kept WITHOUT a second scan by attaching Observation metrics to
    the same action (the streaming-safe replacement for accumulator
    hacks or re-counting). Pins that observed metrics equal a direct
    recount."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.sources import load_table

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    obs_in = Observation("gate_in")
    obs_out = Observation("gate_out")
    gated = (
        docs.observe(obs_in, F.count(F.lit(1)).alias("rows"), F.sum("n_chars").alias("chars"))
        .filter(F.col("n_chars") >= 200)
        .observe(obs_out, F.count(F.lit(1)).alias("rows"))
    )
    kept = gated.count()  # one action populates every attached metric

    assert obs_in.get["rows"] == docs.count()
    assert obs_in.get["chars"] == docs.agg(F.sum("n_chars")).collect()[0][0]
    assert obs_out.get["rows"] == kept
    assert 0 < kept < obs_in.get["rows"]


def test_split_leakage_audit_nonzero_on_duplicated_corpus(spark, tmp_path):
    """The leakage audit must not pass vacuously (the main corpus has
    no exact duplicates, so every count is 0 there — the same
    all-zeros trap the PII counts had): on a corpus WITH duplicate
    content, by_doc_id splitting must show leaked groups and
    by_content_key must show exactly none, with both engines agreeing
    on the nonzero numbers."""
    import duckdb

    from eecs_485___mapreduce_spark.queries.curation import (
        _leakage_oracle,
        split_leakage_audit,
    )

    rows = [
        # 40 duplicate pairs: same text, far-apart doc_ids
        *[(i, f"dup text number {i % 40}", "en", "srcA", 20) for i in range(80)],
        # 20 singletons
        *[(100 + i, f"unique text {i}", "en", "srcB", 15) for i in range(20)],
    ]
    d = str(tmp_path / "dupcorpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    got = {
        r.strategy: (r.n_dup_groups, r.n_leaky_groups, r.n_leaked_docs)
        for r in split_leakage_audit(spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3]) for r in con.execute(_leakage_oracle()).fetchall()
    }
    assert got == want
    assert got["by_doc_id"][0] == 40  # all duplicate groups seen
    assert got["by_doc_id"][1] > 0  # id-hash split leaks
    assert got["by_content_key"] == (40, 0, 0)  # content-key split never leaks


def test_pit_join_matches_every_event_once(spark):
    """The temporal-join conservation law: SCD2 intervals partition
    each user's timeline from their first event, so the point-in-time
    lookup attributes every non-NULL-user event to EXACTLY one state
    version (zero-length intervals from same-ts flips match none)."""
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.queries.curation import pit_join_event_states
    from eecs_485___mapreduce_spark.sources import load_table

    from .conftest import SF_SMALL

    total = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("user_id").isNotNull())
        .count()
    )
    rows = pit_join_event_states(spark, SF_SMALL).collect()
    assert sum(r.n_events for r in rows) == total


def test_gate_ablation_census_partitions_all_eight_cells(spark, tmp_path):
    """Planted fixture hitting every Venn cell: the census must be a
    TRUE partition (cells sum to the corpus; each planted doc lands in
    exactly the predicted cell), unlike sequential funnel counts."""
    from eecs_485___mapreduce_spark.queries.pipeline import (
        gate_ablation_census,
    )

    good = "the quick brown fox jumps over a lazy dog " * 2  # 16 distinct-ish
    bad = "spam " * 40  # 40 tokens, 1 distinct -> fails 5x uniqueness rule
    rows = []
    i = 0
    for q in (0, 1):
        for en in (0, 1):
            for uniq in (0, 1):
                text = (good if q else bad) + f" marker{q}{en}{uniq}"
                lang = "en" if en else "fr"
                rows.append((i, text, lang, "s", len(text)))
                i += 1
                if not uniq:  # plant an exact duplicate
                    rows.append((i, text, lang, "s", len(text)))
                    i += 1
    d = str(tmp_path / "fixture")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        (r.passes_quality, r.is_en, r.is_unique): r.n_docs
        for r in gate_ablation_census(spark, d).collect()
    }
    assert len(out) == 8
    assert sum(out.values()) == len(rows)
    for q in (0, 1):
        for en in (0, 1):
            assert out[(q, en, 1)] == 1  # the unique plant
            assert out[(q, en, 0)] == 2  # the duplicated pair
