"""REAL baseline sequential JPEG codec (8-bit grayscale fully
general decode; gray + 4:4:4 color encoders): marker walk, canonical
Huffman from the stream, 0xFF00 unstuffing, DC DPCM with EXTEND, AC
run/size with EOB/ZRL, dequantization, exact float64 IDCT."""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .raster import MAX_DECODE_PIXELS, _round_half_up

# ---------------------- REAL baseline JPEG decode (Huffman+DCT path)
#
# The last pixel plane: a baseline sequential JPEG codec for 8-bit
# grayscale. The DECODER is fully general for that class — marker
# walk, DQT/DHT parsing (canonical Huffman built from the stream, not
# hard-wired tables), entropy decode with 0xFF00 unstuffing, DC DPCM
# with EXTEND, AC run/size with EOB and ZRL, dequantization, exact
# float64 IDCT, level shift and clamp. The ENCODER writes legal
# streams two ways: per-block-constant images whose DC-only path is
# arithmetically EXACT (quant step 16 divides 16*delta — these carry
# the SQL oracle), and fully textured images through a real forward
# DCT + run-length AC Huffman (lossy by nature, certified by a
# reconstruction-error bound test instead of an oracle).

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
_JPEG_QTABLE = (16,) * 64  # flat, legal; DC step 16 => exact DC path
_JPEG_DC_BITS = (0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
# EOB at length 1 for the DC-only builder; the textured builder uses
# a wider table (EOB len 2, ZRL len 9, all run/size codes len 16).
_JPEG_AC_BITS_EOB = (1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
_JPEG_AC_VALS_EOB = (0x00,)
_JPEG_AC_BITS_FULL = (0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 160)
_JPEG_AC_VALS_FULL = (0x00, 0xF0) + tuple(
    (r << 4) | s for r in range(16) for s in range(1, 11)
)

JPEG_STATS_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, n_blocks bigint, "
    "sum_y bigint, mean_y_milli bigint"
)


def _jpeg_canonical(bits, vals):
    codes = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec
        return bytes(self.buf)

    def restart(self, k: int) -> None:
        """Pad to a byte boundary and emit RSTk (0xFFD0+k) — restart
        markers sit OUTSIDE the entropy stream, so no byte stuffing."""
        while self.n:
            self.put(1, 1)
        self.buf += bytes([0xFF, 0xD0 + (k & 7)])


class _JpegBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.data):
                raise ValueError("truncated entropy stream")
            b = self.data[self.i]
            self.i += 1
            if b == 0xFF:
                if self.i >= len(self.data) or self.data[self.i] != 0x00:
                    raise ValueError("marker inside entropy data")
                self.i += 1  # unstuff
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, k: int) -> None:
        """Byte-align (discarding pad bits) and consume the expected
        RSTk marker; raises on a missing or out-of-sequence marker."""
        self.n = 0
        if (
            self.i + 2 > len(self.data)
            or self.data[self.i] != 0xFF
            or self.data[self.i + 1] != 0xD0 + (k & 7)
        ):
            raise ValueError("missing or out-of-sequence restart marker")
        self.i += 2


def _jpeg_decode_table(bits, vals):
    table = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_read_huff(br: _JpegBitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_cos_basis() -> np.ndarray:
    cu = np.array([1 / math.sqrt(2)] + [1.0] * 7)
    cos = np.array(
        [
            [math.cos((2 * i + 1) * u * math.pi / 16) for u in range(8)]
            for i in range(8)
        ]
    )
    return cos * cu


def _jpeg_idct2(coef: np.ndarray) -> np.ndarray:
    basis = _jpeg_cos_basis()
    return 0.25 * basis @ coef @ basis.T


def _jpeg_dct2(block: np.ndarray) -> np.ndarray:
    basis = _jpeg_cos_basis()
    return 0.25 * basis.T @ block @ basis


def _jpeg_segments(
    h: int, w: int, ac_bits, ac_vals, restart_interval: int = 0
) -> tuple[bytes, bytes]:
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(_JPEG_QTABLE))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(
            0xC4,
            bytes([0x00])
            + bytes(_JPEG_DC_BITS)
            + bytes(_JPEG_DC_VALS)
            + bytes([0x10])
            + bytes(ac_bits)
            + bytes(ac_vals),
        )
        + dri
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    return head, b"\xff\xd9"


def build_jpeg_gray(doc_id: int) -> bytes:
    """Serialize a COMPLETE baseline JPEG whose 8x8 blocks are each a
    constant luma ``128 + 2*(((d + 7b) % 64) - 32)`` — even offsets,
    so the DC path (the only nonzero coefficients) quantizes EXACTLY
    and a SQL oracle can regenerate every pixel. Real DC DPCM Huffman
    coding, real byte stuffing, real markers."""
    d = int(doc_id)
    wb, hb = d % 3 + 1, d % 2 + 1
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS_EOB, _JPEG_AC_VALS_EOB)
    bw = _JpegBitWriter()
    prev_dc = 0
    for b in range(wb * hb):
        dcq = ((d + 7 * b) % 64) - 32  # DC coeff 16*delta / Qstep 16
        diff = dcq - prev_dc
        prev_dc = dcq
        t = abs(diff).bit_length()
        code, ln = dc_codes[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac_codes[0x00]
        bw.put(code, ln)  # EOB: all AC zero
    head, tail = _jpeg_segments(8 * hb, 8 * wb, _JPEG_AC_BITS_EOB, _JPEG_AC_VALS_EOB)
    return head + bw.flush() + tail


def _jpeg_encode_block(
    bw: _JpegBitWriter, block: np.ndarray, prev_dc: int, dc_codes, ac_codes
) -> int:
    """Forward path for ONE level-shifted 8x8 block: float64 DCT, flat
    quantization, DC DPCM + AC run/size Huffman with EOB/ZRL. Returns
    the new DC predictor."""
    coef = _jpeg_dct2(block)
    zz = [
        _round_half_up(coef.flat[_JPEG_ZIGZAG[i]] / _JPEG_QTABLE[i])
        if coef.flat[_JPEG_ZIGZAG[i]] >= 0
        else -_round_half_up(-coef.flat[_JPEG_ZIGZAG[i]] / _JPEG_QTABLE[i])
        for i in range(64)
    ]
    diff = zz[0] - prev_dc
    t = abs(diff).bit_length()
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            code, ln = ac_codes[0x00]
            bw.put(code, ln)
            break
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        v = zz[k]
        size = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << size) - 1, size)
        k += 1
    return zz[0]


def build_jpeg_textured(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Serialize an arbitrary 8-bit grayscale image (dims multiples of
    8) through the REAL forward path: level shift, float64 DCT, flat
    quantization, DC DPCM + AC run/size Huffman with EOB/ZRL, and —
    when ``restart_interval`` is nonzero — DRI/RSTn restart markers
    every that many MCUs (byte-aligned, DC predictor reset, cycling
    RST0..RST7), the resynchronization structure most camera JPEGs
    carry. Lossy like any JPEG; used by the reconstruction-bound
    tests."""
    h, w = img.shape
    wb, hb = w // 8, h // 8
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS_FULL, _JPEG_AC_VALS_FULL)
    bw = _JpegBitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(hb):
        for bx in range(wb):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) % 8
                prev_dc = 0
            mcu += 1
            block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            ) - 128
            prev_dc = _jpeg_encode_block(bw, block, prev_dc, dc_codes, ac_codes)
    head, tail = _jpeg_segments(
        h, w, _JPEG_AC_BITS_FULL, _JPEG_AC_VALS_FULL, restart_interval
    )
    return head + bw.flush() + tail


def decode_jpeg_baseline(payload: bytes) -> tuple | None:
    """REAL baseline JPEG decode for 8-bit images with 1x1 sampling
    (grayscale or 4:4:4 color): returns (width, height,
    n_blocks_per_component, [per-component float planes]) or None for
    anything outside that class (progressive, subsampled chroma,
    16-bit quant, corrupt). DRI/RSTn restart intervals are honored
    (byte-aligned resync, all DC predictors reset, RST0..7 sequence
    check)."""
    try:
        if bytes(payload[:2]) != b"\xff\xd8":
            return None
        i = 2
        qt: dict[int, list[int]] = {}
        dc_tabs: dict[int, dict] = {}
        ac_tabs: dict[int, dict] = {}
        w = h = None
        comp_qs: list[int] = []
        comp_ids: list[int] = []
        sels: dict[int, tuple[int, int]] = {}
        restart_interval = 0
        entropy_start = None
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:
                break
            (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
            body = bytes(payload[i + 4 : i + 2 + ln])
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    if body[j] >> 4 != 0:
                        return None  # 16-bit tables unsupported
                    qt[body[j] & 15] = list(body[j + 1 : j + 65])
                    j += 65
            elif marker == 0xC0:
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nc not in (1, 3):
                    return None
                for c in range(nc):
                    cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                    if sampling != 0x11:
                        return None  # subsampled chroma unsupported
                    comp_ids.append(cid)
                    comp_qs.append(tq)
            elif marker in (0xC1, 0xC2, 0xC3):
                return None  # non-baseline SOF
            elif marker == 0xDD:
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc_th = body[j]
                    bits = list(body[j + 1 : j + 17])
                    nv = sum(bits)
                    vals = list(body[j + 17 : j + 17 + nv])
                    t = _jpeg_decode_table(bits, vals)
                    (dc_tabs if tc_th >> 4 == 0 else ac_tabs)[tc_th & 15] = t
                    j += 17 + nv
            elif marker == 0xDA:
                ns = body[0]
                for c in range(ns):
                    cs, sel = body[1 + 2 * c], body[2 + 2 * c]
                    sels[cs] = (sel >> 4, sel & 15)
                entropy_start = i + 2 + ln
                break
            i += 2 + ln
        if entropy_start is None or w is None or not comp_ids:
            return None
        if w == 0 or h == 0 or w * h > MAX_DECODE_PIXELS:
            # A 2-byte SOF field can declare 65535x65535: three ~34 GB
            # float64 planes. Reject before any allocation.
            return None
        if any(tq not in qt for tq in comp_qs) or any(
            cid not in sels for cid in comp_ids
        ):
            return None
        if any(
            sels[cid][0] not in dc_tabs or sels[cid][1] not in ac_tabs
            for cid in comp_ids
        ):
            # A corrupt SOS can select a huffman table no DHT defined
            # (fuzz-caught: KeyError escaped the except clause).
            return None
        j = entropy_start
        while j + 1 < len(payload) and not (
            payload[j] == 0xFF and payload[j + 1] == 0xD9
        ):
            j += 1
        br = _JpegBitReader(bytes(payload[entropy_start:j]))
        qs = [np.array(qt[tq], dtype=np.float64) for tq in comp_qs]
        wb, hb = (w + 7) // 8, (h + 7) // 8
        planes = [np.zeros((hb * 8, wb * 8)) for _ in comp_ids]
        prev_dc = [0] * len(comp_ids)
        mcu = 0
        rst = 0
        for by in range(hb):
            for bx in range(wb):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    br.sync_restart(rst)
                    rst = (rst + 1) % 8
                    prev_dc = [0] * len(comp_ids)
                mcu += 1
                for c, cid in enumerate(comp_ids):
                    dc_sel, ac_sel = sels[cid]
                    zz = [0] * 64
                    t = _jpeg_read_huff(br, dc_tabs[dc_sel])
                    if t:
                        prev_dc[c] += _jpeg_extend(br.bits(t), t)
                    zz[0] = prev_dc[c]
                    k = 1
                    while k < 64:
                        rs = _jpeg_read_huff(br, ac_tabs[ac_sel])
                        if rs == 0x00:
                            break  # EOB
                        if rs == 0xF0:
                            k += 16
                            continue  # ZRL
                        run, size = rs >> 4, rs & 15
                        k += run
                        if k > 63 or size == 0:
                            raise ValueError("bad AC symbol")
                        zz[k] = _jpeg_extend(br.bits(size), size)
                        k += 1
                    coef = np.zeros(64)
                    for idx in range(64):
                        coef[_JPEG_ZIGZAG[idx]] = zz[idx] * qs[c][idx]
                    planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _jpeg_idct2(coef.reshape(8, 8)) + 128
                    )
        return (w, h, wb * hb, [p[:h, :w] for p in planes])
    except (struct.error, ValueError, IndexError):
        return None


def decode_jpeg_gray(payload: bytes) -> tuple | None:
    """Single-component wrapper over :func:`decode_jpeg_baseline`:
    returns (width, height, n_blocks, int64 pixel ndarray)."""
    r = decode_jpeg_baseline(payload)
    if r is None or len(r[3]) != 1:
        return None
    w, h, nb, planes = r
    px = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.int64)
    return (w, h, nb, px)


def decode_jpeg_color(payload: bytes) -> tuple | None:
    """Three-component wrapper over :func:`decode_jpeg_baseline`:
    JFIF YCbCr -> RGB conversion, returns (width, height, (h, w, 3)
    int64 RGB array)."""
    r = decode_jpeg_baseline(payload)
    if r is None or len(r[3]) != 3:
        return None
    w, h, _, (y, cb, cr) = r
    red = y + 1.402 * (cr - 128)
    green = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    blue = y + 1.772 * (cb - 128)
    rgb = np.stack([red, green, blue], axis=2)
    return (w, h, np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.int64))


def decode_jpeg_pixel_stats(payload: bytes) -> tuple | None:
    """Per-image statistics over :func:`decode_jpeg_gray` output."""
    r = decode_jpeg_gray(payload)
    if r is None:
        return None
    w, h, nb, px = r
    s = int(px.sum())
    return (w, h, nb, s, _round_half_up(1000.0 * float(s) / (w * h)))


def with_jpeg_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic DC-exact baseline JPEG per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[id_col]].copy()
            out["payload"] = [build_jpeg_gray(d) for d in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")


def jpeg_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: baseline JPEG payload -> per-image pixel
    statistics via the full Huffman+IDCT decode path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode_jpeg_pixel_stats(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [s[0] if s else None for s in stats],
                    "height": [s[1] if s else None for s in stats],
                    "n_blocks": [s[2] if s else None for s in stats],
                    "sum_y": [s[3] if s else None for s in stats],
                    "mean_y_milli": [s[4] if s else None for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, JPEG_STATS_SCHEMA)


def build_jpeg_color_textured(
    rgb: np.ndarray, restart_interval: int = 0
) -> bytes:
    """Serialize an arbitrary (h, w, 3) uint8 RGB image (dims
    multiples of 8) as a baseline 4:4:4 COLOR JPEG: JFIF RGB->YCbCr,
    per-component forward DCT + quantization, interleaved Y/Cb/Cr
    MCUs with separate DC predictors (all sharing the flat quant
    table and canonical Huffman tables — legal and simplest), plus
    optional DRI/RSTn restart structure. Lossy; certified by the
    color reconstruction-bound test."""
    h, w, _ = rgb.shape
    wb, hb = w // 8, h // 8
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [y, cb, cr]
    dc_codes = _jpeg_canonical(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical(_JPEG_AC_BITS_FULL, _JPEG_AC_VALS_FULL)
    bw = _JpegBitWriter()
    prev_dc = [0, 0, 0]
    mcu = 0
    rst = 0
    for by in range(hb):
        for bx in range(wb):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) % 8
                prev_dc = [0, 0, 0]
            mcu += 1
            for c, plane in enumerate(planes):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128
                prev_dc[c] = _jpeg_encode_block(
                    bw, block, prev_dc[c], dc_codes, ac_codes
                )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(_JPEG_QTABLE))
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + seg(
            0xC4,
            bytes([0x00])
            + bytes(_JPEG_DC_BITS)
            + bytes(_JPEG_DC_VALS)
            + bytes([0x10])
            + bytes(_JPEG_AC_BITS_FULL)
            + bytes(_JPEG_AC_VALS_FULL),
        )
        + dri
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    )
    return head + bw.flush() + b"\xff\xd9"
