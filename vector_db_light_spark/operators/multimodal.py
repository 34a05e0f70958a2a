"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``BinaryType`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so the
payload bytes never round-trip through the driver. Decode itself is STUBBED
(no image/audio libraries in this container) behind ``decode_image_stub`` —
deterministic fake dimensions derived from the payload hash — while the
Spark-side plumbing (schema, batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Simulate a media column: payload = utf-8 bytes of the text, with a
    media_type derived from the id (documents fixture has no binaries)."""
    media_type = (
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        F.col(id_col),
        media_type.alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB for the real decoder (PIL/ffmpeg not installed): deterministic
    fake dimensions from the payload hash. Replace the body with
    ``PIL.Image.open(io.BytesIO(payload)).size`` when the lib is present."""
    h = hashlib.md5(payload).hexdigest()
    return 16 + int(h[0], 16), 16 + int(h[1], 16)


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata/decode pass over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload)
                width = height = None
                err = None
                try:
                    if mt == "image/png":
                        width, height = decode_image_stub(b)
                except NotImplementedError as ex:
                    err = str(ex)
                rows.append(
                    (
                        int(doc_id),
                        mt,
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        width,
                        height,
                        err,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA)
