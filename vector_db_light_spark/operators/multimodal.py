"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``BinaryType`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so the
payload bytes never round-trip through the driver.

Image decode is REAL for both carried formats: ``functions/png.py`` is a
pure-stdlib PNG codec (zlib + the five filter predictors of the W3C
spec) and ``functions/jpeg.py`` a pure-stdlib baseline JPEG codec
(Annex K tables, Huffman scan, DCT) — the image rows of
:func:`attach_payload` carry genuine container bytes and the
decode/resize stages parse them for real: header dims, CRC/marker
checks, filter/Huffman reconstruction, deterministic integer
nearest-neighbour resampling the DuckDB oracle replays arithmetically
(JPEG fixtures sit on the lossless constant-even-block island, see
functions/jpeg.py). Only the audio/video frontends remain stubbed
(ffmpeg-class demux/resample has no stdlib expression).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.jpeg import JpegError, decode_jpeg, encode_jpeg
from ..functions.png import PngError, decode_png, encode_png, resize_nearest

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


def jpeg_fixture_payload(doc_id: int) -> bytes:
    """REAL baseline-JPEG bytes for the synthetic media corpus: an 8-bit
    grayscale image of CONSTANT 8x8 blocks whose (even) values are
    md5-derived — the lossless island of the lossy codec (constant
    blocks are DC-only; even values quantize exactly under the Annex K
    table), so the DuckDB oracles recompute every DECODED pixel:
    block (bx, by) value = 2 * (byte0(md5('<id>:<bx>:<by>')) % 128);
    width = 8 * (1 + (id // 4) % 2), height = 8 * (1 + (id // 4) % 3)."""
    w0 = 8 * (1 + (doc_id // 4) % 2)
    h0 = 8 * (1 + (doc_id // 4) % 3)
    px = bytearray(w0 * h0)
    for by in range(h0 // 8):
        for bx in range(w0 // 8):
            v = 2 * (
                hashlib.md5(f"{doc_id}:{bx}:{by}".encode()).digest()[0] % 128
            )
            for y in range(8):
                for x in range(8):
                    px[(by * 8 + y) * w0 + bx * 8 + x] = v
    return encode_jpeg(bytes(px), w0, h0)


def png_fixture_payload(doc_id: int) -> bytes:
    """REAL PNG bytes for the synthetic media corpus: an 8-bit greyscale
    image of md5-derived pixels. Dimensions and pixel values are pure
    integer functions of the id so the DuckDB oracles can rebuild every
    DECODED pixel arithmetically (``substr(md5(id || ':' || y), 2x+1, 2)``)
    even though the CONTAINER bytes (zlib stream, CRCs) are not
    SQL-expressible — the same split the ingest fixtures use for zip
    containers. width = 8 + id % 9, height = 8 + id % 7, pixel (x, y) =
    byte x of md5('<id>:<y>'); width <= 16 keeps a row inside one digest.
    The encoder cycles all five PNG filter types across scanlines, so
    every decode is a full filter-reconstruction exercise."""
    w0, h0 = 8 + doc_id % 9, 8 + doc_id % 7
    px = b"".join(
        hashlib.md5(f"{doc_id}:{y}".encode()).digest()[:w0] for y in range(h0)
    )
    return encode_png(px, w0, h0, 1)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesise the media column the documents fixture lacks: image rows
    carry REAL container bytes — PNG for id % 4 == 0
    (:func:`png_fixture_payload`) and baseline JPEG for id % 4 == 3
    (:func:`jpeg_fixture_payload`), both built in Arrow-batched stages;
    audio/video rows carry the utf-8 text bytes their stub frontends
    window/demux."""
    media_type = (
        F.when(F.col(id_col) % 4 == 0, "image/png")
        .when(F.col(id_col) % 4 == 1, "audio/wav")
        .when(F.col(id_col) % 4 == 3, "image/jpeg")
        .otherwise("video/mp4")
    )
    @F.pandas_udf(BinaryType())
    def _png_udf(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: png_fixture_payload(int(i)))

    @F.pandas_udf(BinaryType())
    def _jpeg_udf(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: jpeg_fixture_payload(int(i)))

    base = docs.select(
        F.col(id_col), media_type.alias("media_type"), F.col(text_col)
    )
    # Branch-union instead of a CASE around the udf: a pandas_udf inside
    # when() is evaluated as an eager Arrow stage for EVERY row, which
    # taxed the audio/video-only consumers (sample_frames, audio features)
    # with an image-encode pass; as separate branches, a media_type filter
    # pushes below the Arrow projection and prunes it to zero rows.
    img = base.filter(F.col("media_type") == "image/png").select(
        F.col(id_col), "media_type", _png_udf(F.col(id_col)).alias("payload")
    )
    jpg = base.filter(F.col("media_type") == "image/jpeg").select(
        F.col(id_col), "media_type", _jpeg_udf(F.col(id_col)).alias("payload")
    )
    rest = base.filter(~F.col("media_type").startswith("image/")).select(
        F.col(id_col),
        "media_type",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
    return img.unionByName(jpg).unionByName(rest)




def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata/decode pass over the payload column. PNG
    payloads are REALLY decoded (chunk CRCs verified, IDAT inflated,
    filters reconstructed); malformed ones land their message in
    ``decode_error`` instead of poisoning the batch."""

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
                        width, height, _ch, _px = decode_png(b)
                    elif mt == "image/jpeg":
                        width, height, _px = decode_jpeg(b)
                    elif mt and mt.startswith("image/"):
                        raise NotImplementedError(f"no stdlib decoder: {mt}")
                except (PngError, JpegError, NotImplementedError) as ex:
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resize_error", StringType(), True),
    ]
)




def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pass: ONLY image rows enter the Arrow stage — audio/video
    payloads union back untouched (NULL dims) without ever crossing the
    JVM<->Python boundary. At 100 TB non-image payloads dominate the corpus
    byte count, so a pass-through that still serializes them both ways
    would pay the full Arrow transfer cost for nothing (ADVICE r5). The
    media_type filter is a Catalyst predicate, so parquet sources prune to
    image row groups before any Python worker starts. 1-in/1-out per row —
    the stage is narrow, preserves partitioning, and never moves payload
    bytes through the driver. Per-row failures land in ``resize_error``
    instead of poisoning the batch.

    Both image formats are REALLY resized: stdlib decode (PNG filters +
    CRCs, JPEG Huffman + IDCT) -> deterministic integer nearest-neighbour
    resample -> the output payload is the resampled PACKED BITMAP (the
    tensor a downstream featurizer consumes; re-encoding to a container
    would only burn CPU to be decoded again one stage later)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload)
                err = None
                w = h = None
                try:
                    if mt == "image/png":
                        w0, h0, ch, px = decode_png(b)
                    elif mt == "image/jpeg":
                        w0, h0, px = decode_jpeg(b)
                        ch = 1
                    else:
                        raise NotImplementedError(f"no stdlib decoder: {mt}")
                    b = resize_nearest(px, w0, h0, ch, width, height)
                    w, h = width, height
                except Exception as ex:  # noqa: BLE001 — row-level contract
                    err = f"{type(ex).__name__}: {ex}"
                rows.append((int(doc_id), mt, b, w, h, err))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    is_image = F.col("media_type").startswith("image/")
    resized = media.filter(is_image).mapInPandas(run, schema=RESIZED_SCHEMA)
    passthrough = media.filter(~is_image).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "media_type",
        "payload",
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("string").alias("resize_error"),
    )
    return resized.unionByName(passthrough)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
        StructField("frame_error", StringType(), True),
    ]
)


def sample_frames_stub(payload: bytes, every_n: int) -> list[bytes]:
    """STUB for the real demuxer (ffmpeg not installed): pretend the video
    has ``len(payload) // 64`` frames and emit every ``every_n``-th as a
    64-byte md5-derived chunk. Replace with an ffmpeg/pyav frame iterator
    when the lib is present."""
    n_frames = len(payload) // 64
    out = []
    for i in range(0, n_frames, every_n):
        out.append(hashlib.md5(payload + f"#frame{i}".encode()).digest() * 4)
    return out


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling: one video row fans out to one row per sampled frame
    (the multimodal analogue of chunk-explode). The fan-out happens inside
    ``mapInPandas`` on the executor holding the payload, so the only data
    movement is the sampled frames themselves; non-video rows are pruned
    by a CATALYST predicate before the Arrow stage (the resize pass's
    ADVICE-r5 pattern — at 100 TB image/audio payload bytes must not pay
    the Arrow round-trip just to be skipped in Python; the in-Python
    guard stays as defense for pre-filtered inputs). At 100 TB follow
    this with the usual `spread` if frame featurization is heavier than
    demuxing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "video/mp4":
                    continue
                try:
                    for i, frame in enumerate(
                        sample_frames_stub(bytes(payload), every_n)
                    ):
                        rows.append((int(doc_id), i, frame, None))
                except Exception as ex:  # noqa: BLE001 — row-level contract
                    rows.append(
                        (int(doc_id), -1, None, f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.filter(F.col("media_type") == "video/mp4").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_windows", IntegerType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("energy", LongType(), True),
        StructField("feature_error", StringType(), True),
    ]
)


def audio_energy_stub(payload: bytes, window: int) -> list[int]:
    """STUB for the real frontend (librosa/torchaudio not installed): treat
    every ``window`` bytes as one analysis window and emit a deterministic
    integer "energy" per window (first 6 hex digits of the hash of the
    window's lowercase-hex rendering — hashing the HEX STRING rather than
    the raw bytes keeps the oracle twin expressible in ANSI SQL for any
    payload: DuckDB's md5 only takes VARCHAR, and hex-slicing windows
    BYTE-addresses them regardless of the text's utf-8 widths). Replace
    with an RMS/mel computation when the lib is present. Integer output is
    deliberate: the oracle reproduces it exactly with no float-summation-
    order concerns."""
    out = []
    for i in range(0, len(payload) // window):
        hx = payload[i * window : (i + 1) * window].hex()
        out.append(int(hashlib.md5(hx.encode()).hexdigest()[:6], 16))
    return out


def extract_audio_features(media: DataFrame, window: int = 32) -> DataFrame:
    """Audio feature extraction: one audio row fans out to one row per
    analysis window (long layout rather than array<float> columns — array
    outputs don't survive the driver's canonicalizer, and long layout is
    what the downstream aggregations want anyway). Runs Arrow-batched on
    the executor holding the payload; non-audio rows are pruned by a
    Catalyst predicate before the Arrow stage (see sample_frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio/wav":
                    continue
                try:
                    feats = audio_energy_stub(bytes(payload), window)
                    for i, e in enumerate(feats):
                        rows.append((int(doc_id), len(feats), i, e, None))
                except Exception as ex:  # noqa: BLE001 — row-level contract
                    rows.append(
                        (int(doc_id), 0, -1, None, f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return media.filter(F.col("media_type") == "audio/wav").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )
