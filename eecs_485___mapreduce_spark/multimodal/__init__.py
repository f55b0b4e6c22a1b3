"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this
container): :func:`decode_image_meta` raises ``NotImplementedError``
unless ``fake=True``, in which case it produces a deterministic fake
(metadata derived from the byte payload) so the Spark-side plumbing —
schema, batch iteration, partitioning — is real and tested end-to-end.

Scale: binary payloads ride parquet as BYTE_ARRAY; mapInPandas
processes them per-partition in Arrow batches, so decode parallelism
equals partition count and no payload ever visits the driver.
``spark.sql.files.maxPartitionBytes`` is the knob that keeps a batch
of blobs inside executor memory at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = (
    "doc_id bigint, byte_len bigint, fake_width bigint, fake_height bigint, "
    "payload_md5 string"
)


def decode_image_meta(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload to (width, height, ...) metadata.

    Real decode needs Pillow/libvips — not present in this container.
    The deterministic fake derives metadata from the payload so tests
    exercise the full Arrow batch path.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    n = len(payload)
    return {"byte_len": n, "fake_width": n % 640, "fake_height": n % 480}


def extract_binary_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas operator: binary payload -> typed metadata row.

    This is the canonical shape for any multimodal feature extractor
    (resize, frame-sample, fingerprint): swap the per-payload function,
    keep the batch plumbing.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            metas = [decode_image_meta(p, fake=True) for p in payloads]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": [m["byte_len"] for m in metas],
                    "fake_width": [m["fake_width"] for m in metas],
                    "fake_height": [m["fake_height"] for m in metas],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(batches, BINARY_META_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text column).

    The test tables carry no real media, so the text bytes stand in as
    the opaque payload — the downstream plumbing is identical.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
