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
