"""Multimodal query surface: binary-column metadata extraction.

The Spark side genuinely runs the Arrow/mapInPandas decode plumbing
(with the deterministic fake decoder — see ``multimodal`` package);
the oracle reproduces the same metadata arithmetic in SQL, so this is
a full value-hash check of the plumbing's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..multimodal import (
    FEATURE_CHUNK,
    FRAME_CHARS,
    FRAME_STRIDE,
    N_FEATURES,
    RESIZE_FIT,
    extract_binary_meta,
    extract_features,
    plan_resize,
    sample_frames,
    with_binary_payload,
)
from ..registry import register
from ..sources import load_table


@register(
    "multimodal_binary_meta",
    tags=("multimodal", "udf"),
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
           CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload -> typed metadata via
    the stubbed decoder over mapInPandas (Arrow batches).

    Note the md5 parity: DuckDB's md5(text) hashes the UTF-8 bytes,
    which is exactly the payload the Spark side hashes.
    """
    docs = load_table(spark, sf_dir, "documents")
    return extract_binary_meta(with_binary_payload(docs))


@register(
    "multimodal_frame_sample",
    bench=True,
    tags=("multimodal", "udf"),
    oracle=f"""
    WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
    f AS (SELECT doc_id, text, n,
                 unnest(range(0, CAST(ceil(n / {FRAME_CHARS}.0) AS BIGINT),
                              {FRAME_STRIDE})) AS frame_idx
          FROM t)
    SELECT doc_id,
           frame_idx,
           frame_idx * {FRAME_CHARS} + 1 AS frame_start,
           least({FRAME_CHARS}, n - frame_idx * {FRAME_CHARS}) AS frame_len,
           md5(substring(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))
               AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: every {stride}-th fixed-size frame of
    each payload, fingerprinted — a 1→N mapInPandas fan-out (the decode
    itself is the deterministic fake; the row-explosion plumbing is
    real). Empty documents produce zero frames."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(docs)


@register(
    "multimodal_resize_plan",
    tags=("multimodal", "udf"),
    oracle=f"""
    WITH m AS (SELECT doc_id,
                      octet_length(encode(text)) % 640 AS src_w,
                      octet_length(encode(text)) % 480 AS src_h
               FROM documents)
    SELECT doc_id,
           CAST(src_w AS BIGINT) AS src_w,
           CAST(src_h AS BIGINT) AS src_h,
           CAST(CASE WHEN src_w = 0 OR src_h = 0 THEN NULL
                     WHEN src_w >= src_h THEN {RESIZE_FIT}
                     ELSE src_w * {RESIZE_FIT} // src_h END AS BIGINT) AS dst_w,
           CAST(CASE WHEN src_w = 0 OR src_h = 0 THEN NULL
                     WHEN src_w >= src_h THEN src_h * {RESIZE_FIT} // src_w
                     ELSE {RESIZE_FIT} END AS BIGINT) AS dst_h
    FROM m
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan from fake-decoded dimensions
    (integer arithmetic only, so the oracle agrees bit-for-bit);
    degenerate dims yield NULL targets."""
    docs = load_table(spark, sf_dir, "documents")
    return plan_resize(with_binary_payload(docs))


@register(
    "multimodal_feature_extract",
    tags=("multimodal", "udf", "vector"),
    oracle=f"""
    SELECT doc_id, d AS dim,
           CAST(('0x' || substr(md5(substring(text, d * {FEATURE_CHUNK} + 1,
                                              {FEATURE_CHUNK})), 1, 15)) AS BIGINT)
               AS feature
    FROM documents
    CROSS JOIN (SELECT unnest(range(0, {N_FEATURES})) AS d)
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake feature vectors (60-bit hash per payload
    chunk) in the exploded (doc_id, dim, feature) layout the similarity
    and centroid operators consume."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(docs)


@register(
    "multimodal_image_headers",
    tags=("multimodal", "udf"),
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                           WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS fmt,
           CAST(doc_id % 640 + 1 AS BIGINT) AS width,
           CAST(doc_id % 480 + 1 AS BIGINT) AS height,
           CAST(CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 10
                                WHEN 2 THEN 26 ELSE 30 END
                + doc_id % 32 AS BIGINT) AS byte_len
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_image_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-container decode over the Arrow mapInPandas path:
    deterministic PNG/GIF/BMP/JPEG payloads are SERIALIZED per row
    (format spec byte layouts — IHDR, logical screen descriptor,
    BITMAPINFOHEADER, SOF0 marker), then PARSED back by the
    header decoder (``multimodal.parse_image_header`` — magic sniff +
    struct unpack + JPEG marker walk). The oracle recomputes the
    expected metadata arithmetically from doc_id, so the driver
    value-hash certifies the full build->parse byte round-trip.

    This closes the metadata plane of the multimodal stub: container
    dimensions/format need no imaging library; only pixel decode
    remains stubbed (``decode_image_meta``, documented container
    limitation).

    Scale (100 TB): both steps are per-partition Arrow batches —
    decode parallelism = partition count, no shuffle, no driver
    payload transfer; corrupt payloads yield fmt=NULL rows instead of
    failing the batch (required at crawl scale where corruption is
    routine, pinned by tests/test_multimodal.py).
    """
    from ..multimodal import decode_image_headers, with_image_payload

    docs = load_table(spark, sf_dir, "documents")
    return decode_image_headers(with_image_payload(docs)).orderBy("doc_id")


@register(
    "multimodal_audio_headers",
    tags=("multimodal", "udf"),
    oracle="""
    SELECT doc_id,
           CASE doc_id % 2 WHEN 0 THEN 'wav' ELSE 'aiff' END AS fmt,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                                WHEN 2 THEN 22050 ELSE 44100 END
                AS BIGINT) AS sample_rate,
           CAST(doc_id % 1000 + 1 AS BIGINT) AS n_frames,
           CAST(CASE doc_id % 2 WHEN 0 THEN 44 ELSE 38 END AS BIGINT)
             AS byte_len
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_audio_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-container decode over the Arrow mapInPandas path —
    the audio twin of multimodal_image_headers: deterministic RIFF/
    WAVE and AIFF payloads are SERIALIZED per row (fmt/data chunk
    walk, big-endian COMM with the 80-bit extended-float sample rate
    the AIFF spec mandates), then PARSED back by
    ``multimodal.parse_audio_header``. The oracle recomputes expected
    metadata arithmetically from doc_id, so the driver value-hash
    certifies the full build->parse byte round-trip — including the
    float-80 encode/decode.

    Scale (100 TB): per-partition Arrow batches, no shuffle, no
    driver payload transfer; corrupt payloads yield fmt=NULL rows
    (pinned by tests/test_multimodal.py), never batch failures.
    """
    from ..multimodal import decode_audio_headers, with_audio_payload

    docs = load_table(spark, sf_dir, "documents")
    return decode_audio_headers(with_audio_payload(docs)).orderBy("doc_id")


# --------------------------------------- perceptual-hash near-dup

# dHash geometry: a 7x9 fake-grayscale grid gives 7x8 = 56 gradient
# bits — deliberately under 63 so the packed hash stays positive in
# BIGINT on both engines. Docs come in planted families of 4 (same
# base image, variants 1-3 bump ONE pixel), so every family is a
# near-dup cluster the banded join must find.
PHASH_ROWS = 7
PHASH_COLS = 9
PHASH_BANDS = 4
PHASH_BAND_BITS = 14  # 4 x 14 = 56
PHASH_HAM_MAX = 4


@register(
    "multimodal_phash_neardup",
    tags=("multimodal", "udf", "dedup", "hash"),
    oracle=f"""
    WITH g AS (
      SELECT doc_id, doc_id // 4 AS base, doc_id % 4 AS var
      FROM documents
    ),
    px AS (
      SELECT doc_id, r, c,
             (CAST(('0x' || substr(md5('px:' || base || ':' || r || ':' || c),
                                   1, 13)) AS BIGINT) % 256
              + CASE WHEN var > 0 AND r = var - 1 AND c = var
                     THEN 40 ELSE 0 END) % 256 AS p
      FROM g,
           generate_series(0, {PHASH_ROWS - 1}) s1(r),
           generate_series(0, {PHASH_COLS - 1}) s2(c)
    ),
    bits AS (
      SELECT a.doc_id,
             CAST(SUM(CASE WHEN a.p < b.p THEN 1 ELSE 0 END
                      << (a.r * {PHASH_COLS - 1} + a.c)) AS BIGINT) AS dhash
      FROM px a JOIN px b
        ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
      GROUP BY a.doc_id
    ),
    bands AS (
      SELECT doc_id, dhash, s.b AS band_idx,
             (dhash >> (s.b * {PHASH_BAND_BITS}))
               & {(1 << PHASH_BAND_BITS) - 1} AS band_val
      FROM bits, generate_series(0, {PHASH_BANDS - 1}) s(b)
    ),
    cand AS (
      SELECT DISTINCT u.doc_id AS doc_a, v.doc_id AS doc_b,
             u.dhash AS ha, v.dhash AS hb
      FROM bands u JOIN bands v
        ON v.band_idx = u.band_idx AND v.band_val = u.band_val
       AND u.doc_id < v.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= {PHASH_HAM_MAX}
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate image detection, end to end: a
    difference hash (dHash — each bit is the sign of a horizontal
    gradient on a downsampled grayscale grid) computed in PYTHON over
    Arrow batches (the real decode->hash plumbing; the grid itself is
    the deterministic md5 fake, since pixel decode is the documented
    container-limitation stub), then a banded equi-join on
    {bands} x {bits}-bit hash bands (a Hamming-ball LSH: any pair
    within distance {ham} collides on >=1 band by pigeonhole) and an
    exact bit_count(xor) verify. Never all-pairs — the same
    candidates-by-bucket discipline as the SimHash text family.

    The oracle replays the ENTIRE pipeline arithmetically (same md5
    grid, same gradient bits, same bands) so the driver value-hash
    certifies the Python path bit-for-bit — the strongest check a
    Python-side multimodal operator can get. Planted variant families
    (4 docs per base image, one bumped pixel each) guarantee nonzero
    output: a pixel bump flips at most 2 gradient bits, so family
    pairs sit within Hamming {ham}.

    Scale: hashing is per-partition Python with O(batch) memory; the
    join shuffles (band, 14-bit value) ints with candidates
    proportional to bucket occupancy; verify is one integer xor per
    candidate.
    """.format(bands=PHASH_BANDS, bits=PHASH_BAND_BITS, ham=PHASH_HAM_MAX)
    import hashlib

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("dhash", LongType())]
    )

    def dhash_batches(it):  # noqa: ANN001
        def pixel(base: int, var: int, r: int, c: int) -> int:
            h = hashlib.md5(f"px:{base}:{r}:{c}".encode()).hexdigest()
            p = int(h[:13], 16) % 256
            if var > 0 and r == var - 1 and c == var:
                p = (p + 40) % 256
            return p

        for pdf in it:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                base, var = doc_id // 4, doc_id % 4
                grid = [
                    [pixel(base, var, r, c) for c in range(PHASH_COLS)]
                    for r in range(PHASH_ROWS)
                ]
                h = 0
                for r in range(PHASH_ROWS):
                    for c in range(PHASH_COLS - 1):
                        if grid[r][c] < grid[r][c + 1]:
                            h |= 1 << (r * (PHASH_COLS - 1) + c)
                out.append((doc_id, h))
            yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hashes = docs.mapInPandas(dhash_batches, schema=schema)

    band_rows = None
    for b in range(PHASH_BANDS):
        part = hashes.select(
            "doc_id",
            "dhash",
            F.lit(b).alias("band_idx"),
            (
                F.shiftright(F.col("dhash"), b * PHASH_BAND_BITS)
                % F.lit(1 << PHASH_BAND_BITS)
            ).alias("band_val"),
        )
        band_rows = part if band_rows is None else band_rows.unionByName(part)

    u = band_rows.alias("u")
    v = band_rows.alias("v")
    cand = (
        u.join(
            v,
            (F.col("u.band_idx") == F.col("v.band_idx"))
            & (F.col("u.band_val") == F.col("v.band_val"))
            & (F.col("u.doc_id") < F.col("v.doc_id")),
        )
        .select(
            F.col("u.doc_id").alias("doc_a"),
            F.col("v.doc_id").alias("doc_b"),
            F.col("u.dhash").alias("ha"),
            F.col("v.dhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.filter(hamming <= PHASH_HAM_MAX).select(
        "doc_a", "doc_b", hamming.cast("bigint").alias("hamming")
    )


@register(
    "multimodal_bmp_pixel_stats",
    tags=("multimodal", "udf", "stats"),
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 8 + 1 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM d
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(SUM((doc_id + k) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((doc_id + k + 85) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id + k + 170) % 256) AS BIGINT) AS sum_r,
           CAST(ROUND(1000.0 * SUM((doc_id + k) % 256 + (doc_id + k + 85) % 256
                                   + (doc_id + k + 170) % 256)
                      / (3 * w * h)) AS BIGINT) AS mean_gray_milli
    FROM px GROUP BY doc_id, w, h
    """,
)
def multimodal_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode over the Arrow mapInPandas path: a COMPLETE
    24bpp BMP raster (file+info headers, bottom-up 4-byte-padded BGR
    rows) is serialized per document from a deterministic pixel
    function of doc_id, then decoded back by numpy
    (``multimodal.decode_bmp_raster_stats`` — header parse, row
    unflip, padding strip, channel split) into exact per-image channel
    sums and the gray mean. The oracle regenerates every pixel
    arithmetically (unnest over the pixel index), so the driver
    value-hash certifies the full raster round-trip BYTE FOR BYTE —
    this closes the pixel plane of the multimodal stub for
    uncompressed formats; only entropy-coded codecs (PNG inflate,
    JPEG Huffman, GIF LZW) remain behind the documented stub.

    Scale (100 TB): per-partition Arrow batches, no shuffle, no driver
    payload transfer; pixel math is vectorized numpy per batch;
    corrupt payloads yield width=NULL rows instead of failing the
    batch (pinned by tests/test_multimodal.py).

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B multimodal family.
    """
    from ..multimodal import bmp_pixel_stats, with_bmp_raster

    docs = load_table(spark, sf_dir, "documents")
    return bmp_pixel_stats(with_bmp_raster(docs))


@register(
    "multimodal_wav_pcm_stats",
    tags=("multimodal", "udf", "stats"),
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 500 + 1 AS n FROM documents
    ),
    s AS (
      SELECT doc_id, n, unnest(range(0, n)) AS k FROM d
    ),
    v AS (
      SELECT doc_id, n, ((doc_id * 31 + k * 7) % 65536) - 32768 AS x FROM s
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(SUM(ABS(x)) AS BIGINT) AS sum_abs,
           CAST(MAX(ABS(x)) AS BIGINT) AS peak,
           CAST(ROUND(1000.0 * sqrt(CAST(SUM(x * x) AS DOUBLE) / n))
                AS BIGINT) AS rms_milli
    FROM v GROUP BY doc_id, n
    """,
)
def multimodal_wav_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-sample decode — the PCM twin of the BMP raster
    round-trip above: a COMPLETE RIFF/WAVE file (fmt + data chunks,
    mono 16-bit PCM) is serialized per document from a deterministic
    sample function of doc_id, then decoded back by numpy
    (``multimodal.decode_wav_pcm_stats`` — RIFF chunk walk with word
    alignment, little-endian sample recovery) into exact amplitude
    statistics (sum|x|, peak) and the half-up RMS. The oracle
    regenerates every sample arithmetically, certifying the byte
    round-trip end to end.

    Scale (100 TB): per-partition Arrow batches, vectorized sample
    math, no shuffle, no driver payload transfer; non-PCM or corrupt
    payloads yield NULL rows.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B multimodal family.
    """
    from ..multimodal import wav_sample_stats, with_wav_pcm

    docs = load_table(spark, sf_dir, "documents")
    return wav_sample_stats(with_wav_pcm(docs))


@register(
    "multimodal_png_pixel_stats",
    tags=("multimodal", "udf", "stats"),
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 8 + 1 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM d
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(SUM((doc_id + k) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((doc_id + k + 85) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id + k + 170) % 256) AS BIGINT) AS sum_r,
           CAST(ROUND(1000.0 * SUM((doc_id + k) % 256 + (doc_id + k + 85) % 256
                                   + (doc_id + k + 170) % 256)
                      / (3 * w * h)) AS BIGINT) AS mean_gray_milli
    FROM px GROUP BY doc_id, w, h
    """,
)
def multimodal_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pixel decode — the entropy-coded upgrade of the BMP
    raster round-trip: a COMPLETE 8-bit RGB PNG is serialized per
    document (real deflate stream, real CRCs, scanline filter type
    cycling through ALL FIVE spec filters None/Sub/Up/Average/Paeth),
    then decoded back by the stdlib-only codec in
    ``multimodal.decode_png_pixel_stats`` (CRC-verified chunk walk,
    zlib inflate, per-scanline filter REVERSAL including the Paeth
    predictor) into the same exact channel statistics as the BMP
    path. The oracle regenerates every pixel arithmetically; the
    pixel function is shared with ``multimodal_bmp_pixel_stats``, so
    the two containers cross-certify each other's decoders. With this,
    only JPEG (Huffman+DCT) and GIF (LZW) pixel planes remain behind
    the documented stub.

    Scale (100 TB): per-partition Arrow batches, no shuffle, no driver
    payload transfer; the unfilter loop is bounded by the tiny test
    dimensions here and is the textbook sequential recurrence at any
    size (PNG rows cannot be vectorized across the Sub/Paeth
    dependency — a production deployment hands this exact loop to a
    native codec, same plumbing); corrupt or bit-flipped payloads
    fail CRC and surface as width=NULL rows.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B multimodal family.
    """
    from ..multimodal import png_pixel_stats, with_png_payload

    docs = load_table(spark, sf_dir, "documents")
    return png_pixel_stats(with_png_payload(docs))


@register(
    "multimodal_gif_pixel_stats",
    tags=("multimodal", "udf", "stats"),
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 8 + 1 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, unnest(range(0, w * h)) AS k FROM d
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(SUM((doc_id + k) % 256) AS BIGINT) AS sum_b,
           CAST(SUM((doc_id + k + 85) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((doc_id + k + 170) % 256) AS BIGINT) AS sum_r,
           CAST(ROUND(1000.0 * SUM((doc_id + k) % 256 + (doc_id + k + 85) % 256
                                   + (doc_id + k + 170) % 256)
                      / (3 * w * h)) AS BIGINT) AS mean_gray_milli
    FROM px GROUP BY doc_id, w, h
    """,
)
def multimodal_gif_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF pixel decode — the LZW member of the pixel-plane
    trio (BMP raw raster, PNG deflate+filters, GIF LZW+palette): a
    COMPLETE GIF89a is serialized per document (logical screen
    descriptor, 256-entry global color table, real greedy-match LZW
    index stream in 255-byte sub-blocks), then decoded back by the
    pure-Python codec in ``multimodal.decode_gif_pixel_stats``
    (sub-block reassembly, variable-width LZW with clear-code resets
    and the KwKwK case, palette mapping). The palette is built so
    index (d+k)%256 reproduces the SAME pixel function as the BMP/PNG
    rasters — three independent containers and decoders, one oracle,
    cross-certifying each other. The LZW width-growth pairing
    (9->12 bits, 4096-entry resets) is pinned by a long-stream
    property test since these tiny images never leave 9-bit codes.
    With this, only JPEG's Huffman+DCT plane remains behind the
    documented stub.

    Scale (100 TB): per-partition Arrow batches, no shuffle, no
    driver payload transfer; corrupt payloads (bad magic, truncated
    sub-blocks, ill-formed LZW) surface as width=NULL rows.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B multimodal family.
    """
    from ..multimodal import gif_pixel_stats, with_gif_payload

    docs = load_table(spark, sf_dir, "documents")
    return gif_pixel_stats(with_gif_payload(docs))


@register(
    "multimodal_jpeg_pixel_stats",
    tags=("multimodal", "udf", "stats"),
    oracle="""
    WITH d AS (
      SELECT doc_id, doc_id % 3 + 1 AS wb, doc_id % 2 + 1 AS hb
      FROM documents
    ),
    blk AS (
      SELECT doc_id, wb, hb, unnest(range(0, wb * hb)) AS b FROM d
    )
    SELECT doc_id,
           CAST(wb * 8 AS BIGINT) AS width,
           CAST(hb * 8 AS BIGINT) AS height,
           CAST(wb * hb AS BIGINT) AS n_blocks,
           CAST(SUM(64 * (128 + 2 * (((doc_id + 7 * b) % 64) - 32)))
                AS BIGINT) AS sum_y,
           CAST(ROUND(1000.0 * SUM(64 * (128 + 2 * (((doc_id + 7 * b) % 64) - 32)))
                      / (wb * 8 * hb * 8)) AS BIGINT) AS mean_y_milli
    FROM blk GROUP BY doc_id, wb, hb
    """,
)
def multimodal_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode — the Huffman+DCT member that
    completes the pixel-plane quartet (BMP raw, PNG deflate+filters,
    GIF LZW, JPEG entropy-coded transform): a COMPLETE baseline
    sequential JPEG is serialized per document (DQT/SOF0/DHT/SOS
    markers, canonical Huffman DC DPCM, byte stuffing) and decoded
    back by the general-purpose grayscale decoder in
    ``multimodal.decode_jpeg_gray`` — stream-driven Huffman table
    construction, 0xFF00 unstuffing, EXTEND, EOB/ZRL AC machinery,
    dequantization, exact float64 IDCT. The per-document images are
    per-block-constant with even luma offsets, so the DC path
    quantizes EXACTLY (flat table, step 16 divides 16*delta) and the
    SQL oracle regenerates every pixel — a value-hash-certified lossy
    codec round trip. The full lossy AC path (forward DCT, run/size
    Huffman) is certified separately by a reconstruction-error-bound
    test on textured images (tests/test_multimodal.py), since lossy
    output is not SQL-expressible by construction. Nothing in the
    image stub remains: all four reference container pixel planes
    decode for real.

    Scale (100 TB): per-partition Arrow batches, no shuffle, no
    driver payload transfer; DRI/RSTn restart intervals are decoded
    (byte-aligned resync, DC reset, RST0..7 sequence check), and
    4:4:4 YCbCr color decodes through the same core
    (``multimodal.decode_jpeg_color``, reconstruction-bound-tested);
    progressive/subsampled-chroma and corrupt payloads surface as
    width=NULL rows.

    Reference parity: none (wordcount/grep only); SURVEY.md
    section 2.B multimodal family.
    """
    from ..multimodal import jpeg_pixel_stats, with_jpeg_payload

    docs = load_table(spark, sf_dir, "documents")
    return jpeg_pixel_stats(with_jpeg_payload(docs))
