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


def test_parse_image_header_all_formats_roundtrip():
    from eecs_485___mapreduce_spark.multimodal import (
        build_image_payload,
        parse_image_header,
    )

    for fmt in ("png", "gif", "bmp", "jpeg"):
        for w, h in ((1, 1), (123, 77), (65535, 480)):
            if fmt == "gif" and (w > 65535 or h > 65535):
                continue
            got = parse_image_header(build_image_payload(fmt, w, h, filler=5))
            assert got == (fmt, w, h), (fmt, w, h, got)


def test_parse_image_header_corrupt_and_edge_inputs():
    from eecs_485___mapreduce_spark.multimodal import (
        build_image_payload,
        parse_image_header,
    )

    # corrupt / truncated payloads degrade to None, never raise
    assert parse_image_header(b"") is None
    assert parse_image_header(b"garbage bytes") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") is None  # truncated
    assert parse_image_header(b"\xff\xd8\x00\x00") is None  # bad JPEG marker
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00") is None  # no SOF
    # BMP top-down rows encode height negative; parser normalizes
    import struct

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -32)
    assert parse_image_header(bmp) == ("bmp", 64, 32)
    # JPEG with restart markers before SOF still parses (marker walk)
    jpeg = build_image_payload("jpeg", 10, 20)
    with_rst = jpeg[:2] + b"\xff\xd0" + jpeg[2:]
    assert parse_image_header(with_rst) == ("jpeg", 10, 20)


def test_decode_image_headers_null_on_unparseable(spark):
    from pyspark.sql import functions as F

    from eecs_485___mapreduce_spark.multimodal import decode_image_headers

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, None)], "doc_id bigint, payload binary"
    ).withColumn("payload", F.coalesce("payload", F.lit(b"")))
    rows = {r.doc_id: r for r in decode_image_headers(df).collect()}
    assert rows[1].fmt is None and rows[1].width is None
    assert rows[2].fmt is None and rows[2].byte_len == 0


def test_audio_header_roundtrip_and_corruption(spark):
    """The audio codec round-trips every (fmt, channels, rate, frames)
    combination bit-exactly — including the AIFF 80-bit extended-float
    sample rate — and corrupt payloads decode to fmt=NULL rows instead
    of failing the Arrow batch."""
    from eecs_485___mapreduce_spark.multimodal import (
        AUDIO_RATES,
        build_audio_payload,
        decode_audio_headers,
        parse_audio_header,
    )

    for fmt in ("wav", "aiff"):
        for ch in (1, 2, 6):
            for sr in AUDIO_RATES + (192000,):
                for nf in (1, 12345):
                    got = parse_audio_header(build_audio_payload(fmt, ch, sr, nf))
                    assert got == (fmt, ch, sr, nf)

    wav = build_audio_payload("wav", 2, 44100, 10)
    rows = decode_audio_headers(
        spark.createDataFrame(
            [(1, wav), (2, b"not audio"), (3, b""), (4, wav[:10])],
            "doc_id long, payload binary",
        )
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].fmt == "wav" and by_id[1].n_frames == 10
    assert by_id[2].fmt is None and by_id[3].fmt is None and by_id[4].fmt is None


def test_bmp_raster_roundtrip_and_corruption(spark):
    """The full-raster BMP codec round-trips pixel content exactly —
    channel sums recomputed from the generating function — and
    corrupt/non-BMP payloads decode to width=NULL rows instead of
    failing the Arrow batch. A top-down (negative height) BMP from a
    foreign producer decodes to the same statistics as the bottom-up
    file the builder writes."""
    import struct

    import numpy as np

    from eecs_485___mapreduce_spark.multimodal import (
        bmp_pixel_stats,
        build_bmp_raster,
        decode_bmp_raster_stats,
    )

    for d in (0, 1, 37, 255, 256, 9999):
        w, h = d % 16 + 1, d % 8 + 1
        k = np.arange(w * h, dtype=np.int64)
        want = (
            w,
            h,
            w * h,
            int(((d + k) % 256).sum()),
            int(((d + k + 85) % 256).sum()),
            int(((d + k + 170) % 256).sum()),
        )
        got = decode_bmp_raster_stats(build_bmp_raster(d))
        assert got[:6] == want

    # top-down variant (negative height, rows not flipped) must yield
    # identical statistics: rebuild doc 37's payload top-down
    p = bytearray(build_bmp_raster(37))
    w, h = 37 % 16 + 1, 37 % 8 + 1
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(bytes(p[54:]), np.uint8).reshape(h, stride)
    p[22:26] = struct.pack("<i", -h)
    p[54:] = rows[::-1].tobytes()
    assert decode_bmp_raster_stats(bytes(p)) == decode_bmp_raster_stats(
        build_bmp_raster(37)
    )

    rows = bmp_pixel_stats(
        spark.createDataFrame(
            [
                (1, build_bmp_raster(1)),
                (2, b"not a bmp"),
                (3, b""),
                (4, build_bmp_raster(4)[:40]),
            ],
            "doc_id long, payload binary",
        )
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].width == 2 and by_id[1].n_pixels == 4
    assert by_id[2].width is None
    assert by_id[3].width is None
    assert by_id[4].width is None


def test_wav_pcm_roundtrip_and_corruption(spark):
    """The PCM codec round-trips sample content exactly (sum|x|, peak,
    sum-of-squares recomputed from the generating function) and
    rejects non-PCM/stereo/corrupt payloads as NULL rows."""
    import numpy as np

    from eecs_485___mapreduce_spark.multimodal import (
        build_wav_pcm,
        decode_wav_pcm_stats,
        wav_sample_stats,
    )

    for d in (0, 1, 37, 499, 500, 12345):
        n = d % 500 + 1
        k = np.arange(n, dtype=np.int64)
        x = ((d * 31 + 7 * k) % 65536) - 32768
        got = decode_wav_pcm_stats(build_wav_pcm(d))
        assert got[:3] == (n, int(np.abs(x).sum()), int(np.abs(x).max()))

    rows = wav_sample_stats(
        spark.createDataFrame(
            [
                (1, build_wav_pcm(1)),
                (2, b"RIFFxxxxWAVE"),
                (3, b"not audio"),
                (4, build_wav_pcm(4)[:30]),
            ],
            "doc_id long, payload binary",
        )
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].n_samples == 2 and by_id[1].peak is not None
    assert by_id[2].n_samples is None
    assert by_id[3].n_samples is None
    assert by_id[4].n_samples is None


def test_png_codec_all_filters_crc_and_cross_certification(spark):
    """The PNG codec: every scanline filter type is applied by the
    builder and reversed by the decoder (the cycling covers all five
    across h>=5 docs); a single flipped bit fails CRC and decodes to
    NULL; and the PNG statistics equal the BMP statistics for the same
    doc_id (shared pixel function, independent containers and
    decoders — cross-certification)."""
    from eecs_485___mapreduce_spark.multimodal import (
        build_bmp_raster,
        build_png_rgb,
        decode_bmp_raster_stats,
        decode_png_pixel_stats,
        png_pixel_stats,
    )

    for d in (0, 1, 4, 37, 255, 256, 9999):  # h spans 1..8 -> all filters
        assert decode_png_pixel_stats(build_png_rgb(d)) == decode_bmp_raster_stats(
            build_bmp_raster(d)
        )

    flipped = bytearray(build_png_rgb(37))
    flipped[40] ^= 0x01
    rows = png_pixel_stats(
        spark.createDataFrame(
            [
                (1, build_png_rgb(1)),
                (2, bytes(flipped)),
                (3, b"\x89PNG\r\n\x1a\n"),
                (4, b"not a png"),
            ],
            "doc_id long, payload binary",
        )
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].width == 2
    assert by_id[2].width is None  # CRC caught the bit flip
    assert by_id[3].width is None
    assert by_id[4].width is None


def test_lzw_roundtrip_long_streams_and_width_growth():
    """The LZW codec round-trips streams long enough to exercise
    9->12-bit width growth and 4096-entry clear resets — the cases
    the tiny per-document GIFs never reach."""
    import random

    from eecs_485___mapreduce_spark.multimodal import lzw_decode, lzw_encode

    rng = random.Random(7)
    for _ in range(40):
        n = rng.choice([1, 5, 100, 6000, 20000])
        alphabet = rng.choice([2, 17, 256])
        xs = bytes(rng.randrange(alphabet) for _ in range(n))
        assert lzw_decode(lzw_encode(xs)) == xs
    xs = (b"abc" * 30000)[:80000]  # repetitive: max table growth + clears
    assert lzw_decode(lzw_encode(xs)) == xs
    assert lzw_decode(lzw_encode(b"\x00" * 70000)) == b"\x00" * 70000


def test_gif_codec_cross_certification_and_corruption(spark):
    """GIF statistics equal BMP statistics for the same doc_id (shared
    pixel function through the palette indirection); corrupt payloads
    decode to NULL rows."""
    from eecs_485___mapreduce_spark.multimodal import (
        build_bmp_raster,
        build_gif_indexed,
        decode_bmp_raster_stats,
        decode_gif_pixel_stats,
        gif_pixel_stats,
    )

    for d in (0, 1, 4, 37, 255, 256, 9999):
        assert decode_gif_pixel_stats(build_gif_indexed(d)) == (
            decode_bmp_raster_stats(build_bmp_raster(d))
        )

    rows = gif_pixel_stats(
        spark.createDataFrame(
            [
                (1, build_gif_indexed(1)),
                (2, b"GIF89a"),
                (3, b"not a gif"),
                (4, build_gif_indexed(4)[:30]),
            ],
            "doc_id long, payload binary",
        )
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].width == 2
    assert by_id[2].width is None
    assert by_id[3].width is None
    assert by_id[4].width is None


def test_jpeg_codec_dc_exact_textured_bound_and_corruption(spark):
    """The baseline JPEG codec: DC-exact per-block-constant images
    round-trip bit exactly (closed form recomputed here); textured
    images through the REAL forward DCT + AC run/size Huffman path
    reconstruct within flat-table quantization error; non-baseline
    and corrupt payloads decode to NULL rows."""
    import numpy as np

    from eecs_485___mapreduce_spark.multimodal import (
        build_jpeg_gray,
        build_jpeg_textured,
        decode_jpeg_gray,
        decode_jpeg_pixel_stats,
        jpeg_pixel_stats,
    )

    for d in (0, 1, 5, 37, 63, 64, 255, 9999):
        wb, hb = d % 3 + 1, d % 2 + 1
        want = sum(
            64 * (128 + 2 * (((d + 7 * b) % 64) - 32)) for b in range(wb * hb)
        )
        got = decode_jpeg_pixel_stats(build_jpeg_gray(d))
        assert got[:4] == (8 * wb, 8 * hb, wb * hb, want)

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 24)).astype(np.float64)
    _, _, _, px = decode_jpeg_gray(build_jpeg_textured(img))
    err = np.abs(px - img)
    assert err.max() < 40 and err.mean() < 6  # step-16 quantization bound

    rows = jpeg_pixel_stats(
        spark.createDataFrame(
            [
                (1, build_jpeg_gray(1)),
                (2, b"\xff\xd8truncated"),
                (3, b"not a jpeg"),
                (4, build_jpeg_gray(4)[:25]),
            ],
            "doc_id long, payload binary",
        )
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].width == 16
    assert by_id[2].width is None
    assert by_id[3].width is None
    assert by_id[4].width is None


def test_aiff_pcm_cross_certifies_wav():
    """The big-endian AIFF PCM decoder returns identical statistics
    to the WAV decoder on the shared sample function — two containers,
    two byte orders, one result."""
    from eecs_485___mapreduce_spark.multimodal import (
        build_aiff_pcm,
        build_wav_pcm,
        decode_aiff_pcm_stats,
        decode_wav_pcm_stats,
    )

    for d in (0, 1, 37, 499, 500, 12345):
        assert decode_aiff_pcm_stats(build_aiff_pcm(d)) == decode_wav_pcm_stats(
            build_wav_pcm(d)
        )
    assert decode_aiff_pcm_stats(b"FORMxxxxAIFF") is None
    assert decode_aiff_pcm_stats(b"nope") is None


def test_jpeg_restart_markers_roundtrip_and_resync_guard():
    """DRI/RSTn support: a stream with restart markers reconstructs
    IDENTICALLY to the same coefficients without them (byte-aligned
    padding, DC predictor reset, RST0..7 cycling), and an
    out-of-sequence restart marker is rejected rather than silently
    desynchronizing the Huffman stream."""
    import numpy as np

    from eecs_485___mapreduce_spark.multimodal import (
        build_jpeg_textured,
        decode_jpeg_gray,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 24)).astype(np.float64)
    base = decode_jpeg_gray(build_jpeg_textured(img, restart_interval=0))[3]
    for ri in (1, 2, 5):
        px = decode_jpeg_gray(build_jpeg_textured(img, restart_interval=ri))[3]
        assert np.array_equal(px, base)

    pl = bytearray(build_jpeg_textured(img, restart_interval=2))
    idx = bytes(pl).find(b"\xff\xd0")
    pl[idx + 1] = 0xD5
    assert decode_jpeg_gray(bytes(pl)) is None


def test_jpeg_color_roundtrip_bound_and_type_guards():
    """4:4:4 color JPEG: RGB -> JFIF YCbCr -> per-component DCT +
    interleaved Huffman MCUs -> decode -> RGB reconstructs within the
    quantization+colorspace error bound (with and without restart
    markers); the grayscale and color wrappers refuse each other's
    streams."""
    import numpy as np

    from eecs_485___mapreduce_spark.multimodal import (
        build_jpeg_color_textured,
        build_jpeg_gray,
        decode_jpeg_color,
        decode_jpeg_gray,
    )

    rng = np.random.RandomState(23)
    rgb = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    base = None
    for ri in (0, 3):
        w, h, out = decode_jpeg_color(build_jpeg_color_textured(rgb, ri))
        assert (w, h) == (24, 16)
        err = np.abs(out.astype(np.float64) - rgb.astype(np.float64))
        assert err.max() < 80 and err.mean() < 10
        if base is None:
            base = out
        else:
            assert np.array_equal(out, base)  # restarts change nothing

    assert decode_jpeg_gray(build_jpeg_color_textured(rgb)) is None
    assert decode_jpeg_color(build_jpeg_gray(37)) is None
