"""Exhaustive codec fuzz loop: drive every hand-written binary
decoder with heavy random mutations of valid payloads — multi-byte
overwrites, truncations, cross-format splices, insertions, deletions
— and fail on ANY raised exception (decoders are total functions:
tuple or None, never a throw, never an unbounded allocation).

The bounded hypothesis version runs in CI
(tests/test_multimodal_fuzz.py); this tool is the long-haul sweep.

Usage: python tools/fuzz_codecs.py [iterations] [seed]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

from eecs_485___mapreduce_spark.multimodal import (  # noqa: E402
    build_aiff_pcm,
    build_bmp_raster,
    build_gif_indexed,
    build_jpeg_gray,
    build_png_rgb,
    build_wav_pcm,
    decode_aiff_pcm_stats,
    decode_bmp_raster_stats,
    decode_gif_pixel_stats,
    decode_jpeg_pixel_stats,
    decode_png_pixel_stats,
    decode_wav_pcm_stats,
    parse_audio_header,
    parse_image_header,
)

BUILDERS = [
    build_bmp_raster,
    build_png_rgb,
    build_gif_indexed,
    build_jpeg_gray,
    build_wav_pcm,
    build_aiff_pcm,
]
DECODERS = [
    decode_bmp_raster_stats,
    decode_png_pixel_stats,
    decode_gif_pixel_stats,
    decode_jpeg_pixel_stats,
    decode_wav_pcm_stats,
    decode_aiff_pcm_stats,
    parse_image_header,
    parse_audio_header,
]


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260815
    rng = random.Random(seed)
    fails = 0
    for it in range(iters):
        b = bytearray(BUILDERS[rng.randrange(6)](rng.randrange(20_000)))
        mode = rng.randrange(5)
        if mode == 0:  # k random byte overwrites
            for _ in range(rng.randrange(1, 9)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif mode == 1:  # truncate
            b = b[: rng.randrange(len(b) + 1)]
        elif mode == 2:  # splice two payloads
            c = BUILDERS[rng.randrange(6)](rng.randrange(20_000))
            b = b[: rng.randrange(len(b))] + c[rng.randrange(len(c)) :]
        elif mode == 3:  # insert random bytes
            pos = rng.randrange(len(b))
            ins = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 17)))
            b = b[:pos] + ins + b[pos:]
        else:  # delete a slice
            i = rng.randrange(len(b))
            b = b[:i] + b[min(len(b), i + rng.randrange(1, 33)) :]
        payload = bytes(b)
        for dec in DECODERS:
            try:
                out = dec(payload)
                assert out is None or isinstance(out, tuple)
            except Exception as exc:  # noqa: BLE001 — the whole point
                fails += 1
                print(
                    f"FAIL it={it} dec={dec.__name__} mode={mode}: "
                    f"{type(exc).__name__}: {exc}"
                )
                if fails > 10:
                    return 1
        if it and it % 10_000 == 0:
            print(f"... {it}/{iters}", flush=True)
    print(
        f"{iters} iterations x {len(DECODERS)} decoders: "
        + ("clean" if not fails else f"{fails} failures")
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
