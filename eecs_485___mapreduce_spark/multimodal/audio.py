"""Audio codecs: WAV/AIFF container headers (including the IEEE 754
80-bit extended-float sample rate AIFF mandates) and REAL PCM16 sample
decode for both containers — little-endian RIFF/WAVE and its
big-endian FORM/AIFF twin, cross-certified on the shared deterministic
sample function."""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .raster import _round_half_up

# ---------------------------------------------- audio containers

AUDIO_FORMATS = ("wav", "aiff")
AUDIO_RATES = (8000, 16000, 22050, 44100)

AUDIO_HEADER_SCHEMA = (
    "doc_id bigint, fmt string, channels bigint, sample_rate bigint, "
    "n_frames bigint, byte_len bigint"
)


def _f80_encode(value: int) -> bytes:
    """IEEE 754 80-bit extended float of a positive integer — the
    sample-rate encoding the AIFF COMM chunk mandates."""
    if value <= 0:
        return b"\x00" * 10
    e = value.bit_length() - 1
    mantissa = value << (63 - e)
    return struct.pack(">HQ", 16383 + e, mantissa)


def _f80_decode(raw: bytes) -> int:
    exp, mantissa = struct.unpack(">HQ", raw)
    if exp == 0 and mantissa == 0:
        return 0
    shift = 63 - (exp - 16383)
    return mantissa >> shift if 0 <= shift < 64 else 0


def build_audio_payload(
    fmt: str, channels: int, sample_rate: int, n_frames: int, bits: int = 16
) -> bytes:
    """Serialize a minimal-but-valid audio container (headers only, no
    sample data beyond zero filler) per the published RIFF/WAVE and
    AIFF specs."""
    block_align = channels * bits // 8
    if fmt == "wav":
        data_len = n_frames * block_align
        fmt_chunk = b"fmt " + struct.pack(
            "<IHHIIHH",
            16,
            1,
            channels,
            sample_rate,
            sample_rate * block_align,
            block_align,
            bits,
        )
        data_chunk = b"data" + struct.pack("<I", data_len)
        body = b"WAVE" + fmt_chunk + data_chunk
        return b"RIFF" + struct.pack("<I", len(body) + data_len) + body
    if fmt == "aiff":
        comm = (
            b"COMM"
            + struct.pack(">I", 18)
            + struct.pack(">hIh", channels, n_frames, bits)
            + _f80_encode(sample_rate)
        )
        body = b"AIFF" + comm
        return b"FORM" + struct.pack(">I", len(body)) + body
    raise ValueError(f"unknown audio format {fmt!r}")


def parse_audio_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """Decode (format, channels, sample_rate, n_frames) from a RIFF/
    WAVE or AIFF container — a REAL chunk-walking parser over the
    spec'd layouts (WAV: little-endian fmt/data chunks; AIFF:
    big-endian COMM with an 80-bit extended-float rate). Returns None
    on unrecognized/truncated bytes, never raises."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            i, channels, rate, block_align, data_len = 12, None, None, None, None
            while i + 8 <= len(payload):
                cid = payload[i : i + 4]
                clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
                if cid == b"fmt ":
                    _, channels, rate, _, block_align, _ = struct.unpack(
                        "<HHIIHH", payload[i + 8 : i + 24]
                    )
                elif cid == b"data":
                    data_len = clen
                    # header-only payloads may omit the sample bytes:
                    # the declared length is the contract
                    i += 8
                    continue
                i += 8 + clen
            if channels and rate and data_len is not None and block_align:
                return ("wav", channels, rate, data_len // block_align)
            return None
        if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
            i = 12
            while i + 8 <= len(payload):
                cid = payload[i : i + 4]
                clen = struct.unpack(">I", payload[i + 4 : i + 8])[0]
                if cid == b"COMM" and clen >= 18:
                    channels, n_frames, _bits = struct.unpack(
                        ">hIh", payload[i + 8 : i + 16]
                    )
                    rate = _f80_decode(payload[i + 16 : i + 26])
                    return ("aiff", channels, rate, n_frames)
                i += 8 + clen
    except (struct.error, IndexError):
        return None
    return None


def with_audio_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL audio payload per row (format,
    channels, rate, and frame count are fixed functions of the id) so
    an oracle can recompute expected metadata arithmetically while
    Spark round-trips actual bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                payloads.append(
                    build_audio_payload(
                        AUDIO_FORMATS[d % 2],
                        1 + d % 2,
                        AUDIO_RATES[d % 4],
                        d % 1000 + 1,
                    )
                )
            out = pdf[[id_col]].copy()
            out["payload"] = payloads
            yield out

    return df.select(id_col).mapInPandas(
        batches, f"{id_col} bigint, payload binary"
    )


def decode_audio_headers(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: audio container bytes -> decoded metadata
    via :func:`parse_audio_header`; corrupt payloads yield fmt=NULL
    rows, never batch failures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_audio_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "fmt": [p[0] if p else None for p in parsed],
                    "channels": [p[1] if p else None for p in parsed],
                    "sample_rate": [p[2] if p else None for p in parsed],
                    "n_frames": [p[3] if p else None for p in parsed],
                    "byte_len": [len(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, AUDIO_HEADER_SCHEMA
    )


# Deterministic PCM: sample k of document d is
# ((d*31 + 7k) % 65536) - 32768, mono, 16-bit little-endian.
WAV_N_MOD = 500
WAV_STATS_SCHEMA = (
    "doc_id bigint, n_samples bigint, sum_abs bigint, peak bigint, rms_milli bigint"
)


def build_wav_pcm(doc_id: int) -> bytes:
    """Serialize a COMPLETE RIFF/WAVE file (fmt chunk: PCM, mono,
    16-bit; data chunk: the deterministic samples above)."""
    d = int(doc_id)
    n = d % WAV_N_MOD + 1
    k = np.arange(n, dtype=np.int64)
    data = (((d * 31 + 7 * k) % 65536) - 32768).astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_pcm_stats(payload: bytes) -> tuple | None:
    """REAL numpy PCM decode: RIFF chunk walk to fmt/data, 16-bit
    little-endian sample recovery, then exact integer amplitude
    statistics and the half-up RMS. Returns None for anything that is
    not mono 16-bit PCM."""
    try:
        if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
            return None
        i, fmt_ok, data = 12, False, None
        while i + 8 <= len(payload):
            cid = bytes(payload[i : i + 4])
            size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            body = payload[i + 8 : i + 8 + size]
            if cid == b"fmt " and size >= 16:
                audio_fmt, channels, _, _, _, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                fmt_ok = audio_fmt == 1 and channels == 1 and bits == 16
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if not fmt_ok or data is None or len(data) % 2:
            return None
        x = np.frombuffer(data, dtype="<i2").astype(np.int64)
        n = int(x.size)
        if n == 0:
            return None
        sum_sq = int((x * x).sum())
        rms_milli = _round_half_up(1000.0 * math.sqrt(sum_sq / n))
        return (n, int(np.abs(x).sum()), int(np.abs(x).max()), rms_milli)
    except (struct.error, ValueError):
        return None


def with_wav_pcm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic full PCM WAV payload per row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[id_col]].copy()
            out["payload"] = [build_wav_pcm(d) for d in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, f"{id_col} bigint, payload binary")


def wav_sample_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas operator: full WAV payload -> per-clip amplitude
    statistics via :func:`decode_wav_pcm_stats`."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [decode_wav_pcm_stats(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_samples": [s[0] if s else None for s in stats],
                    "sum_abs": [s[1] if s else None for s in stats],
                    "peak": [s[2] if s else None for s in stats],
                    "rms_milli": [s[3] if s else None for s in stats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, WAV_STATS_SCHEMA)


def build_aiff_pcm(doc_id: int) -> bytes:
    """Serialize a COMPLETE AIFF (FORM/AIFF, COMM with the 80-bit
    extended-float rate, SSND with offset/blocksize prefix) carrying
    the SAME deterministic PCM samples as :func:`build_wav_pcm`,
    big-endian as the AIFF spec mandates."""
    d = int(doc_id)
    n = d % WAV_N_MOD + 1
    k = np.arange(n, dtype=np.int64)
    data = (((d * 31 + 7 * k) % 65536) - 32768).astype(">i2").tobytes()
    comm = struct.pack(">hIh", 1, n, 16) + _f80_encode(8000)
    ssnd = struct.pack(">II", 0, 0) + data
    body = (
        b"AIFF"
        + b"COMM"
        + struct.pack(">I", len(comm))
        + comm
        + b"SSND"
        + struct.pack(">I", len(ssnd))
        + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff_pcm_stats(payload: bytes) -> tuple | None:
    """REAL AIFF PCM decode — the big-endian twin of
    :func:`decode_wav_pcm_stats`: FORM/AIFF chunk walk to COMM/SSND,
    big-endian sample recovery, identical statistics tuple (so the
    two containers cross-certify on the shared sample function)."""
    try:
        if bytes(payload[:4]) != b"FORM" or bytes(payload[8:12]) != b"AIFF":
            return None
        i, comm_ok, data = 12, False, None
        while i + 8 <= len(payload):
            cid = bytes(payload[i : i + 4])
            size = struct.unpack(">I", payload[i + 4 : i + 8])[0]
            body = payload[i + 8 : i + 8 + size]
            if cid == b"COMM" and size >= 18:
                channels, _, bits = struct.unpack(">hIh", body[:8])
                comm_ok = channels == 1 and bits == 16
            elif cid == b"SSND" and size >= 8:
                data = body[8:]
            i += 8 + size + (size & 1)  # IFF chunks are word-aligned
        if not comm_ok or data is None or len(data) % 2:
            return None
        x = np.frombuffer(data, dtype=">i2").astype(np.int64)
        n = int(x.size)
        if n == 0:
            return None
        rms_milli = _round_half_up(1000.0 * math.sqrt(int((x * x).sum()) / n))
        return (n, int(np.abs(x).sum()), int(np.abs(x).max()), rms_milli)
    except (struct.error, ValueError):
        return None
