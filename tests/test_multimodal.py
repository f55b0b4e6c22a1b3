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
