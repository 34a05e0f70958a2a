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
functions/jpeg.py). Audio decode is REAL too: ``functions/wav.py`` is a
pure-stdlib RIFF/WAVE PCM codec, and the audio-feature stage computes
exact integer windowed energy over genuinely decoded samples. Video
DEMUX is real as well: ``functions/mp4.py`` walks the ISO BMFF box tree
and reconstructs per-sample byte ranges from the full stts/stsc/stsz/
stco sample tables, so frame sampling extracts genuine container
samples. The only remaining seam is codec-level frame DECODE
(H.264-class entropy coding has no stdlib expression) — the extracted
frame payloads stay opaque bytes.
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
from ..functions.mp4 import Mp4Error, demux_mp4, encode_mp4, mp4_dimensions
from ..functions.png import PngError, decode_png, encode_png, resize_nearest
from ..functions.wav import decode_wav, encode_wav, window_energy

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


def wav_fixture_payload(doc_id: int) -> bytes:
    """REAL RIFF/WAVE PCM bytes for the synthetic media corpus: 16-bit
    mono at 8 kHz, n_samples = 32 * (2 + id % 4), sample i =
    ``('0x' || substr(md5('<id>:<i>'), 1, 4)) - 32768`` — a pure md5
    function of the id, so the DuckDB oracle rebuilds every DECODED
    sample arithmetically (container bytes, like PNG/zip, stay
    sentinel-checked: total size IS arithmetic, 44 + 2 * n_samples)."""
    n = 32 * (2 + doc_id % 4)
    samples = [
        int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:4], 16) - 32768
        for i in range(n)
    ]
    return encode_wav(samples, sample_rate=8000)


def mp4_fixture_payload(doc_id: int, text: str) -> bytes:
    """REAL ISO BMFF bytes for the synthetic media corpus: one video track
    of ``octet_length(text) // 64`` opaque 64-byte frame payloads, frame i
    = md5(text_bytes + '#frame<i>') digest x4 (the pre-container fixture
    formula, kept so the frame-sample oracle is unchanged), track dims
    width = 16 * (1 + id % 3), height = 16 * (1 + id % 5). Container size
    is affine — 587 + 72 * n_frames (pinned by test_mp4) — so the oracles
    check byte counts arithmetically."""
    tb = text.encode("utf-8")
    frames = [
        hashlib.md5(tb + f"#frame{i}".encode()).digest() * 4
        for i in range(len(tb) // 64)
    ]
    return encode_mp4(frames, 16 * (1 + doc_id % 3), 16 * (1 + doc_id % 5))


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesise the media column the documents fixture lacks: every row
    carries REAL container bytes — PNG for id % 4 == 0
    (:func:`png_fixture_payload`), WAV PCM for id % 4 == 1
    (:func:`wav_fixture_payload`), MP4 for id % 4 == 2
    (:func:`mp4_fixture_payload`), baseline JPEG for id % 4 == 3
    (:func:`jpeg_fixture_payload`), all built in Arrow-batched stages."""
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

    @F.pandas_udf(BinaryType())
    def _wav_udf(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: wav_fixture_payload(int(i)))

    @F.pandas_udf(BinaryType())
    def _mp4_udf(ids: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series(
            [mp4_fixture_payload(int(i), t) for i, t in zip(ids, texts)]
        )

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
    wav = base.filter(F.col("media_type") == "audio/wav").select(
        F.col(id_col), "media_type", _wav_udf(F.col(id_col)).alias("payload")
    )
    vid = base.filter(F.col("media_type") == "video/mp4").select(
        F.col(id_col),
        "media_type",
        _mp4_udf(F.col(id_col), F.col(text_col)).alias("payload"),
    )
    return img.unionByName(jpg).unionByName(wav).unionByName(vid)




def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata/decode pass over the payload column. Image
    payloads are REALLY decoded (PNG chunk CRCs verified + IDAT inflated
    + filters reconstructed; JPEG Huffman + IDCT), video dims are REALLY
    parsed from the MP4 track header (tkhd, 16.16 fixed point); malformed
    payloads land their message in ``decode_error`` instead of poisoning
    the batch."""

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
                    elif mt == "video/mp4":
                        width, height = mp4_dimensions(b)
                    elif mt and mt.startswith("image/"):
                        raise NotImplementedError(f"no stdlib decoder: {mt}")
                except (PngError, JpegError, Mp4Error, NotImplementedError) as ex:
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


def sample_every_nth_frame(payload: bytes, every_n: int) -> list[bytes]:
    """REAL ISO BMFF demux (box-tree walk + stts/stsc/stsz/stco sample
    tables, ``functions/mp4.py``), then every ``every_n``-th sample's
    byte range. The extracted payloads stay codec-opaque — a real frame
    DECODER (H.264-class, not stdlib-expressible) would drop in here
    after the demux without touching the plan."""
    _w, _h, frames = demux_mp4(payload)
    return frames[::every_n]


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
                        sample_every_nth_frame(bytes(payload), every_n)
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


def extract_audio_features(media: DataFrame, window: int = 32) -> DataFrame:
    """Audio feature extraction over REALLY decoded PCM: stdlib RIFF/WAVE
    parse (``functions/wav.py``) -> exact integer sum-of-squares energy
    per non-overlapping window of ``window`` SAMPLES. One audio row fans
    out to one row per analysis window (long layout rather than
    array<float> columns — array outputs don't survive the driver's
    canonicalizer, and long layout is what the downstream aggregations
    want anyway). Integer energy is deliberate: no float-summation-order
    exposure, so the oracle reproduces it exactly from the fixture's md5
    sample formula. Runs Arrow-batched on the executor holding the
    payload; non-audio rows are pruned by a Catalyst predicate before the
    Arrow stage (see sample_frames); malformed files land in
    ``feature_error``, never poisoning a batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio/wav":
                    continue
                try:
                    _sr, _ch, _bits, samples = decode_wav(bytes(payload))
                    feats = window_energy(samples, window)
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


def audio_energy_prefix(media: DataFrame, n: int, window: int = 2) -> DataFrame:
    """Fused decode -> window-energy stage emitting ONE row per audio:
    the true window count plus the FIRST ``n`` window energies as an
    array (exact integers, as everywhere in the audio tier). The
    offset-fingerprint tier only reads windows [0, max_offset + 32), so
    producing them fused in the decode's Arrow stage removes both the
    per-window explode and the (doc, window) shuffle the lead() pass
    needed (VERDICT r14 #7 — probe table in SCALE.md). The array is an
    INTERNAL operator layout, never a query output column (driver
    canonicalizer rule); malformed files land in ``feature_error``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio/wav":
                    continue
                try:
                    _sr, _ch, _bits, samples = decode_wav(bytes(payload))
                    feats = window_energy(samples, window)
                    rows.append(
                        (
                            int(doc_id),
                            len(feats),
                            [int(e) for e in feats[:n]],
                            None,
                        )
                    )
                except Exception as ex:  # noqa: BLE001 — row-level contract
                    rows.append(
                        (int(doc_id), 0, None, f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "nw", "earr", "feature_error"]
            )

    return media.filter(F.col("media_type") == "audio/wav").mapInPandas(
        run,
        schema="doc_id bigint, nw bigint, earr array<bigint>,"
        " feature_error string",
    )


def audio_offset_fingerprints(
    media: DataFrame,
    id_col: str = "doc_id",
    offsets: tuple = (0, 16),
    min_nonzero: int = 24,
) -> DataFrame:
    """OFFSET-BANDED energy-delta fingerprints per audio (the r13 tier's
    fingerprint law, factored into an operator in r14 so the batch query,
    its incremental twin, and the streaming admission path share one
    implementation): REAL RIFF/WAVE decode -> exact integer
    sum-of-squares energy per 2-sample window -> for each offset ``o``, a
    31-bit word whose bit j is set iff window o+j+1's energy exceeds
    window o+j's -> three bands (11/10/10 bits — lossless for
    Hamming <= 2 by pigeonhole). r15 shape (VERDICT r14 #7): the decode
    stage emits the needed energy PREFIX as an array per doc
    (:func:`audio_energy_prefix`), and each offset word is ONE unrolled
    codegen expression over array elements — ZERO shuffles end-to-end
    where the r14 lead() form still paid one (doc, window) exchange +
    sort + partial/final aggregate. Drop rules unchanged: fewer than 31
    deltas (true window count < o + 32) drops the fingerprint, and fewer
    than ``min_nonzero`` of its 32 windows nonzero drops it (the silence
    mask rule 13 forced by measurement — silence-prefixed cuts otherwise
    share their low band and the band join goes quadratic).
    Returns (id_col, o, w, b0, b1, b2)."""
    need = max(offsets) + 32
    ev = audio_energy_prefix(media, n=need, window=2).filter(
        F.col("feature_error").isNull()
    )
    # one generic unrolled expression, offset as a column: bit j compares
    # elements o+j+1 / o+j+2 (1-indexed). The filter on the true window
    # count runs BEFORE the projection, so ANSI element_at never sees an
    # out-of-bounds index.
    w_terms = " + ".join(
        f"(CASE WHEN element_at(earr, o + {j + 2}) >"
        f" element_at(earr, o + {j + 1}) THEN {1 << j}L ELSE 0L END)"
        for j in range(31)
    )
    nz_terms = " + ".join(
        f"(CASE WHEN element_at(earr, o + {j + 1}) > 0 THEN 1 ELSE 0 END)"
        for j in range(32)
    )
    return (
        ev.select(
            F.col("doc_id").alias(id_col),
            "nw",
            "earr",
            F.explode(F.array(*[F.lit(o) for o in offsets])).alias("o"),
        )
        .filter(F.col("nw") >= F.col("o") + 32)
        .select(
            id_col,
            "o",
            F.expr(f"cast({w_terms} as bigint)").alias("w"),
            F.expr(f"({nz_terms})").alias("nz"),
        )
        .filter(F.col("nz") >= min_nonzero)
        .select(
            id_col,
            "o",
            "w",
            (F.col("w") % 2048).alias("b0"),
            (F.expr("w div 2048") % 1024).alias("b1"),
            F.expr("w div 2097152").alias("b2"),
        )
    )


def dhash_words_expr(hex_col: str, w: int = 9, h: int = 8) -> list:
    """dHash (difference hash) of a decoded ``w x h`` grayscale thumbnail
    whose pixel bytes arrive as a HEX string column (the resize stage's
    packed bitmap, hex-projected — binary payloads never leave the Arrow
    stage raw; CLAUDE.md binary-output rule): bit (x, y) is set iff
    pixel(x+1, y) > pixel(x, y), giving (w-1) x h bits packed into
    32-bit words held in BIGINT (the overflow-free xor/bit_count form the
    sign-sketch tier established). Each word is ONE F.expr string — 32
    comparisons of conv()-parsed hex pairs — so the whole hash stays
    inside whole-stage codegen. Perceptual contract: the hash depends
    only on the DECODED thumbnail, so any container re-encode or exact
    2x nearest upscale of the source (floor((x*2w)/9)//2 == floor(x*w/9),
    the nested-floor identity) produces the identical hash."""
    from pyspark.sql import functions as F

    nbits = (w - 1) * h

    def px(x: int, y: int) -> str:
        off = 2 * (y * w + x) + 1
        return f"cast(conv(substr({hex_col}, {off}, 2), 16, 10) as bigint)"

    words = []
    for base in range(0, nbits, 32):
        terms = []
        for j in range(min(32, nbits - base)):
            i = base + j
            y, x = divmod(i, w - 1)
            terms.append(
                f"(CASE WHEN {px(x + 1, y)} > {px(x, y)}"
                f" THEN {1 << j}L ELSE 0L END)"
            )
        words.append(F.expr(" + ".join(terms)))
    return words


def dhash_variant_payload(vid: int) -> bytes:
    """PNG payload for dHash-dedup image variant ``vid = doc_id*4 + k``:
    k=0 the fixture image (png_fixture_payload's pixel law), k=1 a 2x
    nearest-upscaled RE-ENCODE of the same pixels (identical 9x8
    thumbnail by the nested-floor identity — the exact perceptual twin),
    k=2 the fixture pixels with px(0,0) shifted +128 mod 256 (flips <= 3
    dHash bits after resampling), k=3 (r14) a SOLID mid-gray image —
    dHash (0,0) for EVERY doc, the planted featureless class that forces
    the image tier's stopword-band mask (rule 13)."""
    from ..functions.png import encode_png

    d, k = divmod(int(vid), 4)
    w0, h0 = 8 + d % 9, 8 + d % 7
    if k == 3:
        return encode_png(b"\x80" * (w0 * h0), w0, h0, 1)
    rows = [
        bytearray(hashlib.md5(f"{d}:{y}".encode()).digest()[:w0])
        for y in range(h0)
    ]
    if k == 2:
        rows[0][0] = (rows[0][0] + 128) % 256
    if k == 1:
        up = [
            bytes(rows[y2 // 2][x2 // 2] for x2 in range(2 * w0))
            for y2 in range(2 * h0)
        ]
        return encode_png(b"".join(up), 2 * w0, 2 * h0, 1)
    return encode_png(b"".join(bytes(r) for r in rows), w0, h0, 1)


def attach_dhash_variants(vids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched payload synthesis for the dHash variant corpus
    (:func:`dhash_variant_payload` per synthetic image id)."""

    @F.pandas_udf(BinaryType())
    def _udf(ids: pd.Series) -> pd.Series:
        return ids.map(lambda v: dhash_variant_payload(int(v)))

    return vids.select(
        F.col(id_col),
        F.lit("image/png").alias("media_type"),
        _udf(F.col(id_col)).alias("payload"),
    )


def audio_variant_payload(vid: int) -> bytes:
    """RIFF/WAVE payload for audio-fingerprint variant ``vid = doc_id*4
    + k``: k=0 the fixture audio (wav_fixture_payload's sample law), k=1
    the same samples with 32 zero samples APPENDED (trailing-content
    change — the leading fingerprint is identical), k=2 sample 0
    replaced by ``abs(s0) % 1000`` (one energy window moves, flipping at
    most 1 delta bit), k=3 (r13) the same samples with 32 zero samples
    PREPENDED — invisible to the leading-window fingerprint, found only
    by the offset-banded tier (its offset-16-window fingerprint equals
    the original's offset-0 one)."""
    from ..functions.wav import encode_wav

    d, k = divmod(int(vid), 4)
    n = 32 * (2 + d % 4)
    samples = [
        int(hashlib.md5(f"{d}:{i}".encode()).hexdigest()[:4], 16) - 32768
        for i in range(n)
    ]
    if k == 2:
        samples[0] = abs(samples[0]) % 1000
    if k == 1:
        samples = samples + [0] * 32
    if k == 3:
        samples = [0] * 32 + samples
    return encode_wav(samples, sample_rate=8000)


def attach_audio_variants(vids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched payload synthesis for the audio-fingerprint variant
    corpus (:func:`audio_variant_payload` per synthetic id)."""

    @F.pandas_udf(BinaryType())
    def _udf(ids: pd.Series) -> pd.Series:
        return ids.map(lambda v: audio_variant_payload(int(v)))

    return vids.select(
        F.col(id_col),
        F.lit("audio/wav").alias("media_type"),
        _udf(F.col(id_col)).alias("payload"),
    )


def video_variant_payload(vid: int, text: str) -> bytes:
    """ISO BMFF payload for video near-dup variant ``vid = doc_id*4 +
    k``: k=0 the fixture video (mp4_fixture_payload's frame law), k=1
    the same frames plus ONE appended frame (digest of '#frame<n>' — a
    re-edit with extra footage), k=2 frame 0 replaced by the '#alt'
    digest (a retitled opening), k=3 (r14) a TITLECARD cut: one frame
    whose payload is the CONSTANT '#titlecard' digest — identical across
    every doc, the planted ubiquitous frame key the stopword mask must
    absorb (rule 13). Frame payloads stay the md5 x4 fixture form, so
    the oracle recomputes every frame hash arithmetically."""
    from ..functions.mp4 import encode_mp4

    d, k = divmod(int(vid), 4)
    tb = text.encode("utf-8")
    n = len(tb) // 64
    if k == 3:
        frames = (
            [hashlib.md5(b"#titlecard").digest() * 4] if n > 0 else []
        )
        return encode_mp4(frames, 16 * (1 + d % 3), 16 * (1 + d % 5))
    frames = [
        hashlib.md5(tb + f"#frame{i}".encode()).digest() * 4
        for i in range(n)
    ]
    if k == 1:
        frames = frames + [hashlib.md5(tb + f"#frame{n}".encode()).digest() * 4]
    if k == 2 and frames:
        frames[0] = hashlib.md5(tb + b"#alt").digest() * 4
    return encode_mp4(frames, 16 * (1 + d % 3), 16 * (1 + d % 5))


def video_dhash_variant_payload(vid: int, text: str) -> bytes:
    """ISO BMFF payload for the PERCEPTUAL video near-dup variant ``vid =
    doc_id*4 + k`` (r13, VERDICT r12 #2): frames are real PNG IMAGES
    (pixel law: frame i row y = md5('{d}:{i}:{y}') bytes, w0 x h0 =
    8+d%9 x 8+d%7 — the image-dHash fixture law with a frame axis), so
    the frame payloads themselves are decodable. k=0 the fixture cut,
    k=1 every frame RE-ENCODED at a 2x nearest upscale (all container
    bytes differ — exact-hash frame matching finds nothing — but each
    frame's 9x8 dHash is bit-identical by the nested-floor identity),
    k=2 frame 0's pixel (0,0) shifted +128 mod 256 (a retitled opening
    whose perceptual key moves), k=3 a TITLECARD cut: every frame a
    solid mid-gray — its dHash is (0,0) for EVERY doc, the planted
    ubiquitous-key class that forces the frame tier's stopword mask
    (CLAUDE.md rule 13 applied to frames, VERDICT r13 watch #1)."""
    from ..functions.mp4 import encode_mp4
    from ..functions.png import encode_png

    d, k = divmod(int(vid), 4)
    w0, h0 = 8 + d % 9, 8 + d % 7
    n = len(text.encode("utf-8")) // 64
    frames = []
    for i in range(n):
        if k == 3:
            frames.append(encode_png(b"\x80" * (w0 * h0), w0, h0, 1))
            continue
        rows = [
            bytearray(hashlib.md5(f"{d}:{i}:{y}".encode()).digest()[:w0])
            for y in range(h0)
        ]
        if k == 2 and i == 0:
            rows[0][0] = (rows[0][0] + 128) % 256
        if k == 1:
            up = [
                bytes(rows[y2 // 2][x2 // 2] for x2 in range(2 * w0))
                for y2 in range(2 * h0)
            ]
            frames.append(encode_png(b"".join(up), 2 * w0, 2 * h0, 1))
        else:
            frames.append(
                encode_png(b"".join(bytes(r) for r in rows), w0, h0, 1)
            )
    return encode_mp4(frames, w0, h0)


def attach_video_dhash_variants(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Arrow-batched payload synthesis for the perceptual video near-dup
    corpus (:func:`video_dhash_variant_payload` per synthetic id + text)."""

    @F.pandas_udf(BinaryType())
    def _udf(ids: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                video_dhash_variant_payload(int(i), t)
                for i, t in zip(ids, texts)
            ]
        )

    return docs.select(
        F.col(id_col),
        F.lit("video/mp4").alias("media_type"),
        _udf(F.col(id_col), F.col(text_col)).alias("payload"),
    )


def attach_video_variants(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Arrow-batched payload synthesis for the video near-dup variant
    corpus (:func:`video_variant_payload` per synthetic id + text)."""

    @F.pandas_udf(BinaryType())
    def _udf(ids: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series(
            [video_variant_payload(int(i), t) for i, t in zip(ids, texts)]
        )

    return docs.select(
        F.col(id_col),
        F.lit("video/mp4").alias("media_type"),
        _udf(F.col(id_col), F.col(text_col)).alias("payload"),
    )
