"""Streaming MEDIA curation: a video stream deduped at the FRAME level
against a persistent frame-hash index, micro-batch by micro-batch.

The multimodal analogue of :mod:`streaming.curation` (text): re-uploads
and re-encodes of the same clip share frame content, so the curation
signal is frame-set overlap, not document hashes. Per micro-batch:

  1. demux every video payload with the REAL ISO BMFF demuxer
     (operators/multimodal.py::sample_frames, every_n=1) and key each
     frame by content hash — the shuffle from here on carries only
     (frame_key, doc_id) pairs, never payload bytes
  2. in-batch dedup: pairwise frame overlap >= ``overlap_threshold``
     (measured against the SMALLER doc's frame count, i.e. containment)
     forms edges; the verified pairs are transitively closed into
     connected components with ONE survivor (the min id) per component —
     the same cluster-canonical policy the text side applies (ADVICE r7:
     per-pair dooming under-deletes star shapes)
  3. vs-corpus dedup: batch frames join the PERSISTED frame index; a doc
     whose overlap-vs-any-single-existing-doc >= threshold is dropped.
     The |corpus|^2 half never runs — only new x existing frames join,
     and only on equal frame keys
  4. append the survivors' frames to the frame index FIRST, then the
     survivors to the media corpus. Bands-first ordering made crash
     recovery work on the text side and the same argument holds here: a
     crash between the writes leaves the replayed docs out of the corpus
     (so they re-run curation; their stale index rows self-pair and are
     filtered by new_id != existing_id) instead of permanently missing
     from the index. Survivors are ``localCheckpoint``-ed before the
     first mutating write — a cached plan that reads a path is
     RE-EXECUTED against the mutated directory on append (the
     recache-by-path hazard found live on the text side).

Zero-frame docs (empty or unparseable videos) have no overlap evidence
and are admitted; parse failures never poison the batch (the demuxer's
per-row error contract). Frame keys carried by more than MAX_FRAME_DF
distinct docs (black frames, title cards) are STOPWORD frames: masked
from every candidate join and overlap denominator (rule 13 — uncapped,
a ubiquitous frame makes the join quadratic in its doc class), while the
persisted index keeps full key sets so the mask re-derives per batch.

At 100 TB the frame index is bucketed by frame_key so step 3 joins
shuffle-free on the big side; batch-derived sides broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import connected_components
from ..operators.multimodal import sample_frames


def _has_parquet(d: str) -> bool:
    return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))


# Stopword-frame document-frequency cap (VERDICT r13 watch #1 — CLAUDE.md
# rule 13 applied to the frame tier): a frame key carried by more than
# MAX_FRAME_DF distinct docs (black frames, title cards, intro logos) has
# no discriminative signal — exactly a stopword — and, uncapped, makes
# every frame-key candidate join AND the per-(new, existing) group
# quadratic in that doc class. Hot keys are dropped from candidate
# generation and from the overlap DENOMINATORS (evidence = discriminative
# frames only; a doc whose frames are ALL stopwords has no overlap
# evidence and is admitted, the zero-frame-doc policy). The persisted
# frame index keeps FULL key sets — the mask recomputes per batch over
# index+batch, so a key crossing the threshold later is masked then.
MAX_FRAME_DF = 8


def hot_frame_keys(
    frames: DataFrame, max_df: int = MAX_FRAME_DF, key_col: str = "frame_key"
) -> DataFrame:
    """Keys of ``frames`` (doc_id, key) carried by more than ``max_df``
    distinct docs. Hot-key count is bounded by distinct-pairs/max_df, so
    the set broadcasts; at extreme corpus scale drop the hint and let the
    anti-join shuffle."""
    return (
        frames.select("doc_id", key_col)
        .distinct()
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select(key_col)
    )


def batch_frame_keys(media: DataFrame) -> DataFrame:
    """(doc_id, frame_key) per demuxed frame — distinct within doc, so
    overlap counts are set semantics even if a clip repeats a frame."""
    return (
        sample_frames(media, every_n=1)
        .filter(F.col("frame_error").isNull())
        .select(
            "doc_id",
            # md5() already returns a lowercase hex STRING — wrapping it
            # in hex() would re-encode those ASCII bytes into a 64-char
            # key, doubling the bytes every shuffle and index row carries
            F.md5("frame_payload").alias("frame_key"),
        )
        .distinct()
    )


def overlap_doomed(
    new_frames: DataFrame,
    existing_frames: DataFrame,
    threshold: float,
    max_df: int = MAX_FRAME_DF,
) -> DataFrame:
    """doc_ids from ``new_frames`` whose DISCRIMINATIVE frame overlap
    with ANY single existing doc reaches ``threshold`` of the new doc's
    discriminative frame count. One equi-join on frame_key + one
    (new, existing) group — never a cross product. Keys carried by more
    than ``max_df`` distinct docs across index+batch are stopword frames
    (rule 13): they are dropped from BOTH join sides and from the
    denominator, so a ubiquitous black frame neither explodes the join
    nor dilutes a doc's threshold; a doc of ONLY stopword frames has no
    evidence and is admitted. ``max_df=None`` disables the mask
    (measurement harness only)."""
    ex = existing_frames.select(
        # distinct: a crash-replayed batch leaves duplicate index rows
        # (frames-first write ordering); they must not inflate overlap
        F.col("doc_id").alias("_existing_id"),
        "frame_key",
    ).distinct()
    newf = new_frames
    if max_df is not None:
        uni = newf.select("doc_id", "frame_key").unionByName(
            ex.select(F.col("_existing_id").alias("doc_id"), "frame_key")
        )
        hot = hot_frame_keys(uni, max_df)
        newf = newf.join(F.broadcast(hot), "frame_key", "left_anti")
        ex = ex.join(F.broadcast(hot), "frame_key", "left_anti")
    n_new = newf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n_frames")
    )
    shared = (
        newf.join(ex, "frame_key")
        .filter(F.col("doc_id") != F.col("_existing_id"))
        .groupBy("doc_id", "_existing_id")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    return (
        shared.join(n_new, "doc_id")
        .filter(F.col("_shared") >= F.lit(threshold) * F.col("_n_frames"))
        .select("doc_id")
        .distinct()
    )


def _curate_media_batch(
    batch_df: DataFrame,
    corpus_dir: str,
    frames_dir: str,
    overlap_threshold: float,
) -> None:
    spark = batch_df.sparkSession
    new = batch_df
    # 0. replay idempotence: a crash AFTER both writes but BEFORE the
    # streaming offset commit replays the whole batch, and the
    # doc_id != _existing_id guard below would wave the replayed docs
    # straight through (their only index hits are their own rows) —
    # duplicating them in the corpus. The id anti-join makes a fully
    # committed batch a no-op, mirroring the text side's content-sha
    # anti-join; docs the crash left half-committed (frames written,
    # corpus append lost) are NOT in the corpus yet, so they still re-run
    # curation and complete. No broadcast hint: at 100 TB the corpus id
    # side is large — bucket the corpus by doc_id and let AQE pick.
    if _has_parquet(corpus_dir):
        new = new.join(
            spark.read.parquet(corpus_dir).select("doc_id"),
            "doc_id",
            "left_anti",
        )
    frames = batch_frame_keys(new).localCheckpoint(eager=True)

    # in-batch near-dup: containment against the SMALLER frame set makes a
    # clip and its re-encode-with-extra-outro mutual duplicates; min-id
    # canonical per connected component. Stopword frames (df > cap within
    # the batch) are masked from the pair join AND the denominators —
    # rule 13; the INDEX still receives survivors' full frame sets below.
    in_hot = hot_frame_keys(frames)
    masked = frames.join(F.broadcast(in_hot), "frame_key", "left_anti")
    n_by_doc = masked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    a = masked.select(F.col("doc_id").alias("id_a"), "frame_key")
    b = masked.select(F.col("doc_id").alias("id_b"), "frame_key")
    pair_shared = (
        a.join(b, "frame_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    na = n_by_doc.select(F.col("doc_id").alias("id_a"), F.col("_n").alias("_na"))
    nb = n_by_doc.select(F.col("doc_id").alias("id_b"), F.col("_n").alias("_nb"))
    in_pairs = (
        pair_shared.join(na, "id_a")
        .join(nb, "id_b")
        .filter(
            F.col("_shared")
            >= F.lit(overlap_threshold) * F.least(F.col("_na"), F.col("_nb"))
        )
        .select("id_a", "id_b")
    )
    in_doomed = (
        connected_components(in_pairs)
        .filter(F.col("id") != F.col("label"))
        .select(F.col("id").alias("doc_id"))
    )
    new = new.join(F.broadcast(in_doomed), "doc_id", "left_anti")
    frames = frames.join(F.broadcast(in_doomed), "doc_id", "left_anti")

    if _has_parquet(frames_dir):
        existing = spark.read.parquet(frames_dir)
        doomed = overlap_doomed(frames, existing, overlap_threshold)
        new = new.join(F.broadcast(doomed), "doc_id", "left_anti")
        frames = frames.join(F.broadcast(doomed), "doc_id", "left_anti")

    # cut lineage from frames_dir before mutating it (recache-by-path)
    survivors = new.localCheckpoint(eager=True)
    surviving_frames = frames.localCheckpoint(eager=True)
    if survivors.isEmpty():
        return
    # frames FIRST, then corpus (crash between the writes -> replayed docs
    # re-run curation; self-overlap rows are filtered by doc_id !=
    # _existing_id, mirroring the text side's new_id != existing_id guard)
    surviving_frames.write.mode("append").parquet(frames_dir)
    survivors.write.mode("append").parquet(corpus_dir)


def stream_media_curate(
    media_stream: DataFrame,
    corpus_dir: str,
    frames_dir: str,
    checkpoint_dir: str,
    overlap_threshold: float = 0.5,
) -> StreamingQuery:
    """Curate ``media_stream`` (doc_id, media_type, payload) into
    ``corpus_dir``; ``frames_dir`` holds the persistent frame-hash index.
    Returns the running query (availableNow trigger — rerun to drain new
    input)."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            _curate_media_batch(
                batch_df, corpus_dir, frames_dir, overlap_threshold
            )

    return (
        media_stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def image_band_rows(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """dHash band rows for a batch of PNG images: decode -> 9x8 thumbnail
    -> two 32-bit dHash words -> four 16-bit bands. The persisted form of
    the perceptual index (image_dhash_incremental's artifact)."""
    from ..operators.multimodal import dhash_words_expr, resize_images

    thumbs = resize_images(media, 9, 8).filter(
        F.col("resize_error").isNull()
    )
    hx = thumbs.select(
        F.col(id_col).alias("img_id"), F.lower(F.hex("payload")).alias("hx")
    )
    w0x, w1x = dhash_words_expr("hx", 9, 8)
    return hx.select("img_id", w0x.alias("w0"), w1x.alias("w1")).select(
        "img_id",
        "w0",
        "w1",
        (F.col("w0") % 65536).alias("b0"),
        F.expr("w0 div 65536").alias("b1"),
        (F.col("w1") % 65536).alias("b2"),
        F.expr("w1 div 65536").alias("b3"),
    )


def stream_audio_admission(
    media_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    max_hamming: int = 2,
) -> StreamingQuery:
    """Streaming OFFSET-FINGERPRINT audio admission (r14, VERDICT r13
    #2): the image-admission recipe over the offset-banded,
    silence-masked fingerprint table. Per micro-batch, arriving audios
    fingerprint at offsets 0 and 16 (operators/multimodal.
    audio_offset_fingerprints — decode once, silence mask inside), their
    bands join the persisted (audio, offset) band index (new x existing
    only), candidates verify with the exact popcount, and only audios
    with NO index neighbor within ``max_hamming`` at ANY offset pair are
    ADMITTED (their band rows appended). A prepended-intro copy is
    caught by its offset-16 fingerprint matching the original's offset-0
    row — the tier's reason to exist.

    Replay posture — the sign-sketch recipe, with one refinement: an
    admitted audio's band rows are its own membership ledger (anti-joined
    before evaluation), the batch performs ONE mutation (a single atomic
    append), and a rejected audio replays to the same rejection because
    the index only grows. An audio whose fingerprints are ALL masked
    (fully silent) appends ZERO rows — it is not ledgered, but its
    replay re-evaluates to the same zero-row admission, so the mutation
    is still idempotent (rule 11's exception: no state, no marker
    needed). In-batch duplicate ids are dropped; in-batch near-dups both
    admit by design (vs-corpus stage dedups against the INDEX)."""
    import os

    from ..operators.multimodal import audio_offset_fingerprints

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        rows = audio_offset_fingerprints(
            batch_df.dropDuplicates([id_col]).withColumnRenamed(
                id_col, "doc_id"
            ),
            id_col="aud_id",
        )
        if not _has_parquet(index_dir):
            # mode=overwrite + committed-file gate (ADVICE r14 #2): a
            # first micro-batch that crashed mid-write leaves a directory
            # with no committed parquet — isdir would then fail schema
            # inference on read (or errorifexists on rewrite) forever;
            # this way the torn bootstrap self-heals on replay.
            rows.write.mode("overwrite").parquet(index_dir)
            return
        idx = spark.read.parquet(index_dir)
        rows = rows.join(
            idx.select("aud_id").distinct(), "aud_id", "left_anti"
        ).localCheckpoint(eager=True)
        if rows.isEmpty():
            return
        # per-band df cap over batch+index (rule 13): the silence mask
        # inside the fingerprint operator cannot see a constant-tone
        # class (nonzero energy, zero deltas, w = 0). r16 (guide §2.4):
        # the three per-band hot-key groupBys + three candidate joins
        # STACK into one (band-position, value) frame — one shuffle and
        # one equi-join on (pos, _b) replace three of each; the final
        # .distinct() makes per-band multiplicity irrelevant, so the
        # candidate set is identical (A/B-verified on the image twin).
        bands = ("b0", "b1", "b2")

        def _stack(df, idc: str, oc: str):
            return df.select(
                F.col("aud_id").alias(idc),
                F.col("o").alias(oc),
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(i).alias("pos"), F.col(b).alias("_b")
                        )
                        for i, b in enumerate(bands)
                    ])
                ).alias("s"),
            ).select(idc, oc, "s.pos", "s._b")

        sb = _stack(rows, "bid", "bo")
        sx = _stack(idx, "xid", "xo")
        hot = (
            sb.select("pos", "_b")
            .unionAll(sx.select("pos", "_b"))
            .groupBy("pos", "_b")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > MAX_FRAME_DF)
            .select("pos", "_b")
        )
        cands = (
            sb.join(F.broadcast(hot), ["pos", "_b"], "left_anti")
            .join(sx, ["pos", "_b"])
            .select("bid", "bo", "xid", "xo")
        )
        wb = rows.select(
            F.col("aud_id").alias("bid"), F.col("o").alias("bo"),
            F.col("w").alias("bw"),
        )
        wx = idx.select(
            F.col("aud_id").alias("xid"), F.col("o").alias("xo"),
            F.col("w").alias("xw"),
        )
        doomed = (
            cands.distinct()
            .join(wb, ["bid", "bo"])
            .join(wx, ["xid", "xo"])
            .filter(
                F.bit_count(F.col("bw").bitwiseXOR(F.col("xw")))
                <= max_hamming
            )
            .select(F.col("bid").alias("aud_id"))
            .distinct()
        )
        admitted = rows.join(doomed, "aud_id", "left_anti").localCheckpoint(
            eager=True
        )
        if admitted.isEmpty():
            return
        admitted.write.mode("append").parquet(index_dir)

    return (
        media_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_image_admission(
    media_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> StreamingQuery:
    """Streaming PERCEPTUAL image admission (r13, completing VERDICT r12
    #9): per micro-batch, arriving images dHash into band rows, their
    bands SEMI-join the persisted band index (new x existing only — the
    dedup_incremental_lsh shape), candidates verify with the exact
    two-word popcount, and only images with NO index neighbor within
    ``max_hamming`` are ADMITTED (appended to the index). The index is
    therefore both the dedup state and the admission record: admitted ==
    member.

    Replay posture — the sign-sketch recipe: every admitted image is
    exactly one index row (its own membership ledger, anti-joined before
    evaluation), the batch performs ONE mutation (a single index append,
    atomic at task-file commit), and a REJECTED image replays to the
    same rejection because the index only grows — an image can lose but
    never gain admissibility on replay, so no separate rejection ledger
    or intent marker is needed. In-batch duplicate ids are dropped;
    in-batch NEAR-dups (two novel near-identical images in one batch)
    both admit by design — the vs-corpus stage dedups against the
    INDEX, and the batch-internal pass is the separate
    dedup-within-batch operator, same split as streaming/curation.
    r14: band values carried by > MAX_FRAME_DF images across batch+index
    are stopword bands (rule 13) — masked from candidate generation, so
    featureless (solid-color) images admit with their rows indexed but
    never explode the band join."""
    import os

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        rows = image_band_rows(
            batch_df.dropDuplicates([id_col]), id_col=id_col
        )
        if not _has_parquet(index_dir):
            # self-healing bootstrap (ADVICE r14 #2) — see the audio twin
            rows.write.mode("overwrite").parquet(index_dir)
            return
        idx = spark.read.parquet(index_dir)
        rows = rows.join(
            idx.select("img_id"), "img_id", "left_anti"
        ).localCheckpoint(eager=True)
        if rows.isEmpty():
            return
        # stopword-band mask over batch+index (rule 13): a band value
        # carried by > MAX_FRAME_DF images (the solid-color class) is
        # featureless evidence — masked from candidate generation, so a
        # featureless image ADMITS (no evidence) instead of the
        # batch x index quadratic. r16 (guide §2.4): the four per-band
        # hot-key groupBys + four candidate joins STACK into one
        # (band-position, value) frame — one shuffle and one equi-join on
        # (pos, _b) replace four of each; the verify stage's
        # cands.distinct() makes per-band multiplicity irrelevant, so the
        # candidate set is identical (A/B-verified: equal pair sets, band
        # pass 0.68 -> 0.35 s on a 400-image batch).
        bands = ("b0", "b1", "b2", "b3")

        def _stack(df, idc: str):
            return df.select(
                F.col("img_id").alias(idc),
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(i).alias("pos"), F.col(b).alias("_b")
                        )
                        for i, b in enumerate(bands)
                    ])
                ).alias("s"),
            ).select(idc, "s.pos", "s._b")

        sb = _stack(rows, "bid")
        sx = _stack(idx, "xid")
        hot = (
            sb.select("pos", "_b")
            .unionAll(sx.select("pos", "_b"))
            .groupBy("pos", "_b")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > MAX_FRAME_DF)
            .select("pos", "_b")
        )
        cands = (
            sb.join(F.broadcast(hot), ["pos", "_b"], "left_anti")
            .join(sx, ["pos", "_b"])
            .select("bid", "xid")
        )
        wb = rows.select(
            F.col("img_id").alias("bid"),
            F.col("w0").alias("bw0"),
            F.col("w1").alias("bw1"),
        )
        wx = idx.select(
            F.col("img_id").alias("xid"),
            F.col("w0").alias("xw0"),
            F.col("w1").alias("xw1"),
        )
        hd = (
            F.bit_count(F.col("bw0").bitwiseXOR(F.col("xw0")))
            + F.bit_count(F.col("bw1").bitwiseXOR(F.col("xw1")))
        )
        doomed = (
            cands.distinct()
            .join(wb, "bid")
            .join(wx, "xid")
            .filter(hd <= max_hamming)
            .select(F.col("bid").alias("img_id"))
            .distinct()
        )
        admitted = rows.join(doomed, "img_id", "left_anti").localCheckpoint(
            eager=True
        )
        if admitted.isEmpty():
            return
        admitted.write.mode("append").parquet(index_dir)

    return (
        media_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
