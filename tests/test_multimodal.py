"""Multimodal plumbing: the decode stub gates honestly, and the Arrow
batch path computes payload metadata correctly."""

from __future__ import annotations

import pytest

from eecs_485___mapreduce_spark.multimodal import (
    decode_image_meta,
    extract_binary_meta,
    with_binary_payload,
)
from eecs_485___mapreduce_spark.sources import load_table

from .conftest import SF_SMALL


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_meta(b"\x89PNG...")


def test_decode_fake_is_deterministic():
    a = decode_image_meta(b"hello world", fake=True)
    b = decode_image_meta(b"hello world", fake=True)
    assert a == b
    assert a["byte_len"] == 11


def test_frame_sample_fanout_and_edges(spark):
    from eecs_485___mapreduce_spark.multimodal import FRAME_CHARS, FRAME_STRIDE, sample_frames

    df = spark.createDataFrame(
        [(1, "x" * (FRAME_CHARS * 8 + 7)), (2, ""), (3, "short")],
        "doc_id bigint, text string",
    )
    rows = sample_frames(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 9 frames (8 full + 7-char tail), sampled at stride 4 -> idx 0,4,8
    assert sorted(r.frame_idx for r in by_doc[1]) == [0, 4, 8]
    assert {r.frame_len for r in by_doc[1] if r.frame_idx < 8} == {FRAME_CHARS}
    assert next(r.frame_len for r in by_doc[1] if r.frame_idx == 8) == 7
    # empty doc: zero frames; short doc: one partial frame
    assert 2 not in by_doc
    assert [r.frame_len for r in by_doc[3]] == [5]
    assert FRAME_STRIDE == 4


def test_resize_plan_aspect_and_degenerate(spark):
    from eecs_485___mapreduce_spark.multimodal import plan_resize, with_binary_payload

    # byte lengths chosen: 640 -> w=0 (degenerate); 700 -> w=60,h=220
    df = spark.createDataFrame(
        [(1, "a" * 640), (2, "b" * 700)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in plan_resize(with_binary_payload(df)).collect()}
    assert rows[1].dst_w is None and rows[1].dst_h is None
    r = rows[2]
    assert (r.src_w, r.src_h) == (60, 220)
    assert r.dst_h == 128 and r.dst_w == 60 * 128 // 220


def test_extract_binary_meta_roundtrip(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    meta = extract_binary_meta(with_binary_payload(docs))
    rows = {r.doc_id: r for r in meta.collect()}
    for r in docs.collect():
        m = rows[r.doc_id]
        payload = r.text.encode("utf-8")
        assert m.byte_len == len(payload)
        assert m.fake_width == len(payload) % 640
        import hashlib

        assert m.payload_md5 == hashlib.md5(payload).hexdigest()
