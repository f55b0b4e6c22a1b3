"""Shared raster-decode guards and statistics helpers used by every
pixel codec (bmp/png/gif/jpeg): the decompression-bomb pixel budget,
half-up rounding (Spark/DuckDB ROUND parity), and the per-image
channel-sum statistics tuple."""

from __future__ import annotations

import math

# Decompression-bomb guard shared by every pixel decoder: a corrupt
# or adversarial payload can DECLARE dimensions (PNG IHDR uint32, JPEG
# SOF uint16, GIF LSD uint16) wildly larger than the data it carries,
# and a crafted compressed stream can expand far beyond its wire size
# (zlib up to ~1032x, GIF LZW up to ~4096 bytes per 12-bit code). At
# crawl scale some payloads WILL be hostile, and the failure mode must
# be a NULL row — never an unbounded allocation (a 65535x65535 JPEG
# SOF would otherwise ask numpy for 3 x 34 GB planes and kill the
# executor with an uncaught MemoryError). Decoders reject any image
# declaring more than this many pixels, and bound every inflate to
# the size the declared dimensions imply.
MAX_DECODE_PIXELS = 1 << 24  # 16.7M px (~4096x4096) >> any test raster


def _round_half_up(x: float) -> int:
    """ROUND() as Spark/DuckDB do it for positive values (half away
    from zero); Python's round() is banker's and must not be used."""
    return int(math.floor(x + 0.5))


def _raster_stats(w: int, h: int, sums: tuple[int, int, int]) -> tuple:
    n = w * h
    mean_gray_milli = _round_half_up(1000.0 * float(sum(sums)) / (3 * n))
    return (w, h, n, sums[0], sums[1], sums[2], mean_gray_milli)
