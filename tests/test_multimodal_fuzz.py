"""Adversarial fuzz harness for the hand-written codecs: every pixel
and PCM decoder must treat ANY byte string as a total function —
return a well-formed tuple or None, never raise, never allocate
beyond what the payload can back. The targeted corruption tests in
test_multimodal.py use hand-picked payloads; this file drives the
same decoders with hypothesis-generated random bytes, random
truncations / byte flips of VALID payloads, and crafted
decompression bombs (the failure class the hand-picked set cannot
cover: tiny wire bytes declaring enormous rasters).

Pure-Python on purpose (no SparkSession): the decoders are the unit
under test; their mapInPandas plumbing is covered in
test_multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eecs_485___mapreduce_spark.multimodal import (
    MAX_DECODE_PIXELS,
    build_aiff_pcm,
    build_bmp_raster,
    build_gif_indexed,
    build_png_rgb,
    build_wav_pcm,
    decode_aiff_pcm_stats,
    decode_bmp_raster_stats,
    decode_gif_pixel_stats,
    decode_jpeg_pixel_stats,
    decode_png_pixel_stats,
    decode_wav_pcm_stats,
    build_jpeg_gray,
    parse_audio_header,
    parse_image_header,
)

DECODERS = [
    decode_bmp_raster_stats,
    decode_png_pixel_stats,
    decode_gif_pixel_stats,
    decode_jpeg_pixel_stats,
    decode_wav_pcm_stats,
    decode_aiff_pcm_stats,
]

BUILDERS = [
    build_bmp_raster,
    build_png_rgb,
    build_gif_indexed,
    build_jpeg_gray,
    build_wav_pcm,
    build_aiff_pcm,
]


def _assert_total(payload: bytes) -> None:
    """Every decoder either returns None or a tuple — never raises."""
    for dec in DECODERS:
        out = dec(payload)
        assert out is None or isinstance(out, tuple)
    assert parse_image_header(payload) is None or isinstance(
        parse_image_header(payload), tuple
    )
    assert parse_audio_header(payload) is None or isinstance(
        parse_audio_header(payload), tuple
    )


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_random_bytes_never_raise(payload):
    _assert_total(payload)


# Random bytes behind each container's magic, so the fuzz reaches the
# chunk walks instead of dying at the signature check.
MAGICS = [
    b"BM",
    b"\x89PNG\r\n\x1a\n",
    b"GIF89a",
    b"\xff\xd8",
    b"RIFF",
    b"FORM",
]


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(MAGICS),
    st.binary(min_size=0, max_size=2048),
)
def test_magic_prefixed_garbage_never_raises(magic, tail):
    _assert_total(magic + tail)


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from(BUILDERS),
    st.integers(min_value=0, max_value=10_000),
    st.data(),
)
def test_truncated_valid_payloads_never_raise(builder, doc_id, data):
    payload = builder(doc_id)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload)))
    _assert_total(payload[:cut])


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from(BUILDERS),
    st.integers(min_value=0, max_value=10_000),
    st.data(),
)
def test_bitflipped_valid_payloads_never_raise(builder, doc_id, data):
    payload = bytearray(builder(doc_id))
    pos = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    bit = data.draw(st.integers(min_value=0, max_value=7))
    payload[pos] ^= 1 << bit
    _assert_total(bytes(payload))


# ---------------------------------------------------------------
# Crafted decompression bombs: small wire payloads whose HEADERS
# declare rasters the data cannot back. Each must come back None
# (fast, bounded memory) — not MemoryError, not a multi-GB inflate.
# ---------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_png_header_bomb_rejected():
    # Valid CRCs throughout; IHDR declares 60000x60000 (3.6G pixels).
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixel_stats(bomb) is None


def test_png_zlib_bomb_stops_at_declared_size():
    # Dims pass the pixel cap (2x2) but the IDAT inflates to 8 MB; the
    # bounded decompress must stop just past the 14 expected bytes.
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 8_000_000))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixel_stats(bomb) is None


def test_png_zero_dims_rejected():
    ihdr = struct.pack(">IIBBBBB", 0, 0, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b""))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png_pixel_stats(bomb) is None


def test_gif_lzw_bomb_stops_at_declared_size():
    # A real GIF for a 256x256 raster, then its logical-screen AND
    # image-descriptor dims rewritten to 1x1: the LZW stream would
    # expand to 65536 bytes against a declared raster of 1. The
    # bounded decoder must bail without materializing the expansion.
    from eecs_485___mapreduce_spark.multimodal import (
        build_gif_from_indices,
        decode_gif_indices,
    )

    ix = (np.arange(256 * 256, dtype=np.int64) % 256).astype(np.uint8)
    real = bytearray(build_gif_from_indices(ix.reshape(256, 256)))
    full = decode_gif_indices(bytes(real))
    assert full is not None  # sanity: the unmodified GIF decodes
    # LSD dims at offset 6, image-descriptor dims at 3*256+13+5
    struct.pack_into("<HH", real, 6, 1, 1)
    id_off = 13 + 3 * 256 + 5
    assert real[13 + 3 * 256] == 0x2C
    struct.pack_into("<HH", real, id_off, 1, 1)
    assert decode_gif_pixel_stats(bytes(real)) is None


def test_gif_header_bomb_rejected():
    real = bytearray(build_gif_indexed(7))
    # Declare a raster over the pixel cap (65000 x 65000 > 1<<24).
    struct.pack_into("<HH", real, 6, 65000, 65000)
    id_off = 13 + 3 * 256 + 5
    struct.pack_into("<HH", real, id_off, 65000, 65000)
    assert decode_gif_pixel_stats(bytes(real)) is None


def test_jpeg_sof_bomb_rejected_without_allocation():
    # Take a real JPEG and rewrite its SOF0 dims to 65535x65535 —
    # 4.3G pixels, i.e. three ~34 GB float64 planes if the decoder
    # allocated before validating. Must return None quickly.
    real = bytearray(build_jpeg_gray(123))
    i = 2
    patched = False
    while i + 4 <= len(real):
        marker = real[i + 1]
        (ln,) = struct.unpack(">H", bytes(real[i + 2 : i + 4]))
        if marker == 0xC0:
            struct.pack_into(">HH", real, i + 5, 65535, 65535)
            patched = True
            break
        if marker == 0xDA:
            break
        i += 2 + ln
    assert patched
    assert decode_jpeg_pixel_stats(bytes(real)) is None


def test_pixel_cap_leaves_real_payloads_untouched():
    # The cap must never reject a legitimate raster: every builder
    # output still round-trips to non-None stats.
    assert decode_bmp_raster_stats(build_bmp_raster(42)) is not None
    assert decode_png_pixel_stats(build_png_rgb(42)) is not None
    assert decode_gif_pixel_stats(build_gif_indexed(42)) is not None
    assert decode_jpeg_pixel_stats(build_jpeg_gray(42)) is not None
    assert decode_wav_pcm_stats(build_wav_pcm(42)) is not None
    assert decode_aiff_pcm_stats(build_aiff_pcm(42)) is not None
    assert MAX_DECODE_PIXELS >= 1 << 24


def test_lzw_decode_max_out_contract():
    from eecs_485___mapreduce_spark.multimodal import lzw_decode, lzw_encode

    xs = bytes(np.arange(1000, dtype=np.uint8) % 256)
    enc = lzw_encode(xs)
    assert lzw_decode(enc, max_out=len(xs)) == xs  # exact bound passes
    try:
        lzw_decode(enc, max_out=len(xs) - 1)
        raise AssertionError("expected ValueError past max_out")
    except ValueError:
        pass
