"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

One codec per module (the round-5 verdict's split, pure moves):
``core`` (generic meta/frames/resize/features plumbing), ``images``
(container header codecs), ``audio`` (WAV/AIFF headers + PCM),
``raster`` (shared bomb guards + statistics helpers), and the four
real pixel codecs ``bmp``/``png``/``gif``/``jpeg``. This package
module re-exports the public surface so callers keep importing
``eecs_485___mapreduce_spark.multimodal`` directly.

Scale: binary payloads ride parquet as BYTE_ARRAY; mapInPandas
processes them per-partition in Arrow batches, so decode parallelism
equals partition count and no payload ever visits the driver.
``spark.sql.files.maxPartitionBytes`` is the knob that keeps a batch
of blobs inside executor memory at 100 TB.
"""

from __future__ import annotations

from .audio import (  # noqa: F401
    AUDIO_FORMATS,
    AUDIO_HEADER_SCHEMA,
    AUDIO_RATES,
    WAV_N_MOD,
    WAV_STATS_SCHEMA,
    build_aiff_pcm,
    build_audio_payload,
    build_wav_pcm,
    decode_aiff_pcm_stats,
    decode_audio_headers,
    decode_wav_pcm_stats,
    parse_audio_header,
    wav_sample_stats,
    with_audio_payload,
    with_wav_pcm,
)
from .bmp import (  # noqa: F401
    BMP_H_MOD,
    BMP_STATS_SCHEMA,
    BMP_W_MOD,
    bmp_pixel_stats,
    build_bmp_from_pixels,
    build_bmp_raster,
    decode_bmp_pixels,
    decode_bmp_raster_stats,
    with_bmp_raster,
)
from .core import (  # noqa: F401
    BINARY_META_SCHEMA,
    FEATURE_CHUNK,
    FEATURE_SCHEMA,
    FRAME_CHARS,
    FRAME_SCHEMA,
    FRAME_STRIDE,
    N_FEATURES,
    RESIZE_FIT,
    RESIZE_SCHEMA,
    decode_image_meta,
    extract_binary_meta,
    extract_features,
    plan_resize,
    sample_frames,
    with_binary_payload,
)
from .gif import (  # noqa: F401
    GIF_MIN_CODE,
    GIF_STATS_SCHEMA,
    build_gif_from_indices,
    build_gif_indexed,
    decode_gif_indices,
    decode_gif_pixel_stats,
    gif_pixel_stats,
    lzw_decode,
    lzw_encode,
    with_gif_payload,
)
from .images import (  # noqa: F401
    IMAGE_FORMATS,
    IMAGE_HEADER_SCHEMA,
    build_image_payload,
    decode_image_headers,
    parse_image_header,
    with_image_payload,
)
from .jpeg import (  # noqa: F401
    JPEG_STATS_SCHEMA,
    build_jpeg_color_textured,
    build_jpeg_gray,
    build_jpeg_textured,
    decode_jpeg_baseline,
    decode_jpeg_color,
    decode_jpeg_gray,
    decode_jpeg_pixel_stats,
    jpeg_pixel_stats,
    with_jpeg_payload,
)
from .png import (  # noqa: F401
    PNG_STATS_SCHEMA,
    build_png_from_pixels,
    build_png_rgb,
    decode_png_pixel_stats,
    decode_png_pixels,
    png_pixel_stats,
    with_png_payload,
)
from .raster import MAX_DECODE_PIXELS  # noqa: F401
