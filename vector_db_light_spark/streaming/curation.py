"""Streaming corpus curation: a document stream deduped against the
persistent curated corpus, micro-batch by micro-batch.

This wires the batch incremental-dedup artifacts (operators/dedup.py —
the persisted band table whose daily cost scales with the batch, not the
corpus) into Structured Streaming the way the batch side's
`dedup_incremental_lsh` query promises:

  per micro-batch
    0. (optional, ``line_df_dir``) line-level boilerplate removal against
       the CUMULATIVE line-df state: batch counts merge with the persisted
       monoid for the threshold test, and the SURVIVORS' counts are folded
       back in at the end — so a header admitted early starts being
       stripped once its corpus-wide df crosses the threshold
    1. in-batch exact dedup (min-id canonical per sha256)
    2. exact anti-join against the curated corpus' content hashes
    3. minhash band keys of the survivors; candidate pairs BOTH within the
       batch (lsh_candidate_pairs self-join, id_a < id_b) and against the
       PERSISTED band table (incremental_lsh_candidates: the |corpus|^2
       half never runs)
    4. exact-Jaccard verify restricted to candidates; drop new docs with
       jaccard >= threshold against anything already curated; verified
       IN-BATCH pairs are transitively closed into connected components
       with ONE survivor (the min id) per component — the same
       cluster-canonical policy the batch side's dedup_clusters applies
       (ADVICE r6: two near-dup copies in one batch were both admitted;
       ADVICE r7: per-pair larger-id dooming under-deleted star shapes)
    5. append the survivors' band keys to the band table FIRST, then the
       survivors to the corpus. Bands-first makes a crash between the two
       writes recoverable: the replayed docs are not in the corpus yet, so
       they re-run curation (their stale band rows self-pair, filtered by
       new_id != existing_id) and the corpus append completes — whereas
       corpus-first left them permanently absent from the band index
       (ADVICE r6). The only replay residue is duplicate band rows, which
       candidate-generation dedups via .distinct().

Exactly-once: checkpointed source offsets + content-addressed dedup make
replayed batches idempotent (a replayed doc is dropped by step 2).

At 100 TB the corpus and band tables are bucketed by hash/band_key so
steps 2-3 join shuffle-free on the big side; batch sides broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from ..operators.dedup import (
    MAX_BAND_DF,
    connected_components,
    incremental_lsh_candidates,
    jaccard_pairs,
    line_doc_freq,
    lsh_candidate_pairs,
    merge_line_doc_freq,
    minhash_band_keys,
    minhash_signatures,
    remove_boilerplate_lines,
)


def _has_parquet(d: str) -> bool:
    return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))


def _curate_batch(
    batch_df: DataFrame,
    corpus_dir: str,
    bands_dir: str,
    jaccard_threshold: float,
    line_df_dir: str | None = None,
    max_line_doc_freq: int = 5,
    max_band_df: int | None = None,
) -> None:
    spark = batch_df.sparkSession
    if line_df_dir is not None:
        # 0a. collapse exact RAW-text copies before counting line df
        # (review r8: N identical copies in one batch counted as N distinct
        # docs, inflating every one of their lines' df by N — six copies at
        # max_line_doc_freq=5 had every line stripped and the doc vanished
        # from the stream instead of being deduplicated). Step 1 below
        # still dedups on the CLEANED text's sha, catching docs that only
        # become identical once boilerplate is removed.
        wr = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
        batch_df = (
            batch_df.withColumn("_rn", F.row_number().over(wr))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # 0b. line-level boilerplate removal against the CUMULATIVE line-df
        # state (VERDICT r7 #7): the batch's own line counts merge with the
        # persisted monoid, so a header admitted in batch 1 starts being
        # stripped the moment its cumulative document frequency crosses the
        # threshold — without rewriting already-curated docs (that is a
        # compaction job, not a streaming stage). All later stages (sha,
        # minhash) run over the CLEANED text, so the corpus and its band
        # index only ever see post-curation content.
        batch_ldf = line_doc_freq(batch_df)
        cum = (
            merge_line_doc_freq(spark.read.parquet(line_df_dir), batch_ldf)
            if _has_parquet(line_df_dir)
            else batch_ldf
        )
        # detach from line_df_dir before this batch overwrites it below
        cum = cum.localCheckpoint(eager=True)
        cleaned = remove_boilerplate_lines(
            batch_df, max_doc_freq=max_line_doc_freq, line_df=cum
        )
        keep = [c for c in batch_df.columns if c != "text"]
        batch_df = batch_df.select(*keep).join(
            cleaned.filter(F.col("n_lines_kept") > 0).select("doc_id", "text"),
            "doc_id",
        )
    new = batch_df.withColumn("content_sha", F.sha2("text", 256))
    # 1. in-batch exact dedup, min-id canonical
    w = Window.partitionBy("content_sha").orderBy("doc_id")
    new = new.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")

    corpus_exists = os.path.isdir(corpus_dir) and any(
        f.endswith(".parquet") for f in os.listdir(corpus_dir)
    )
    if corpus_exists:
        corpus = spark.read.parquet(corpus_dir)
        # 2. exact vs curated corpus
        new = new.join(
            F.broadcast(corpus.select("content_sha")), "content_sha", "left_anti"
        )
    # shared by steps 3-4 + the final anti-join. r16: eager checkpoint,
    # not persist() — the in-batch verify job reads `new` TWICE (band-key
    # side and text side of jaccard_pairs), and a lazy cache populates
    # racily when both consumers run in one job (CLAUDE.md rule 4); the
    # checkpoint also cuts the gate/corpus-anti lineage so every later
    # consumer scans batch-sized materialized rows instead of re-deriving
    # the upstream plan per job.
    new = new.localCheckpoint(eager=True)
    # 3a. band keys of the batch — used for in-batch AND vs-corpus pairs
    new_bands = minhash_band_keys(minhash_signatures(new))
    # 3b/4a. near-dups WITHIN the batch: verify the self-join candidates,
    # transitively close the verified pairs into components and keep ONE
    # doc per component (the min id) — the exact cluster-canonical policy
    # the batch side's dedup_clusters applies. (ADVICE r7: dooming the
    # larger id of EVERY pair independently matched the policy on chains
    # but UNDER-deleted stars — for edges a~c, b~c only c was doomed while
    # dedup_clusters keeps just a of {a,b,c}.) In-batch duplicate clusters
    # are near-cliques, so the min-label loop closes in 2-3 rounds over
    # batch-sized pair lists.
    in_cands = lsh_candidate_pairs(new_bands, max_band_df=max_band_df)
    in_pairs = jaccard_pairs(
        new.select("doc_id", "text"), candidates=in_cands
    ).filter(F.col("jaccard") >= jaccard_threshold)
    in_doomed = (
        connected_components(in_pairs.select("id_a", "id_b"))
        .filter(F.col("id") != F.col("label"))
        .select(F.col("id").alias("doc_id"))
    )
    new = new.join(F.broadcast(in_doomed), "doc_id", "left_anti")
    if corpus_exists:
        # 3c. near-dup candidates vs the persisted band index. The
        # new_id != existing_id guard drops the self-pairs a crash-replayed
        # batch produces under bands-first write ordering (its band rows
        # are already indexed, the doc itself is not yet in the corpus).
        existing_bands = spark.read.parquet(bands_dir)
        cands = (
            incremental_lsh_candidates(
                existing_bands, new_bands, max_band_df=max_band_df
            )
            .filter(F.col("new_id") != F.col("existing_id"))
            .select(
                F.col("new_id").alias("id_a"), F.col("existing_id").alias("id_b")
            )
        )
        # 4b. verify only the candidate pairs (batch + referenced existing)
        sides = new.select("doc_id", "text").unionByName(
            corpus.join(
                F.broadcast(cands.select(F.col("id_b").alias("doc_id"))),
                "doc_id",
                "left_semi",
            ).select("doc_id", "text")
        )
        doomed = (
            jaccard_pairs(sides, candidates=cands)
            .filter(F.col("jaccard") >= jaccard_threshold)
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
        )
        new = new.join(F.broadcast(doomed), "doc_id", "left_anti")
    # CUT LINEAGE before mutating either table: survivors' plan reads both
    # corpus_dir (anti-join) and bands_dir (candidate join), and a plain
    # persist() is NOT enough — InsertIntoHadoopFsRelation triggers
    # CacheManager.recacheByPath for every cached plan reading the written
    # path, which RE-EXECUTES the cached survivors against the mutated
    # corpus and silently turns it empty (found live: the band append
    # wrote zero rows). localCheckpoint materializes the rows and detaches
    # the plan from both paths; within one foreachBatch the reduced fault
    # tolerance is fine (the checkpointed offsets replay the batch).
    survivors = new.localCheckpoint(eager=True)
    if survivors.isEmpty():
        return
    # 5. bands FIRST, then corpus (see module docstring: a crash between
    # the writes must leave the replayed docs recoverable, not permanently
    # missing from the band index). The band plan reads only the
    # checkpointed survivors, so the corpus append cannot re-execute it.
    minhash_band_keys(minhash_signatures(survivors)).write.mode(
        "append"
    ).parquet(bands_dir)
    survivors.write.mode("append").parquet(corpus_dir)
    if line_df_dir is not None:
        # 6. fold the SURVIVORS' line counts into the persistent line-df
        # state, LAST. Counting survivors (not the raw batch) keeps the
        # state equal to the curated corpus' own line frequencies AND makes
        # replay idempotent: a replayed doc is already in the corpus, so it
        # produces no survivors and no double count. The failure window is
        # a crash between the corpus append and this write — those docs'
        # lines are under-counted by one batch, which a df-threshold test
        # recovers from on the next genuine occurrence (counts only ever
        # need to CROSS max_doc_freq, not be exact).
        counts = line_doc_freq(survivors)
        new_state = (
            merge_line_doc_freq(spark.read.parquet(line_df_dir), counts)
            if _has_parquet(line_df_dir)
            else counts
        )
        # materialize before overwriting the path the plan reads
        new_state = new_state.localCheckpoint(eager=True)
        new_state.write.mode("overwrite").parquet(line_df_dir)


def _admission_gate(batch_df: DataFrame) -> tuple[DataFrame, int, int]:
    """The batch capstone's PRE-DEDUP gate over one micro-batch
    (VERDICT r14 #4): PII scrub -> C4 line rules -> Gopher word rules
    under the FROZEN capstone thresholds
    (operators.textstats.CORPUS_GATE_GOPHER — one shared definition, so
    the streaming path admits exactly what llm_corpus_pipeline's gate
    keeps). Returns (survivors with ``text`` REPLACED by the scrubbed
    text — the capstone's stage order: nothing downstream of the scrub
    may see raw PII), n_c4_dropped, n_gopher_dropped.

    r16 (VERDICT r15 #5, guide §2.4/§5): both rule batteries are pure
    per-doc projections, so they are evaluated in ONE map-side pass over
    the scrubbed checkpoint (``carry`` threads the C4 bit through the
    Gopher projection) into a 3-column flag table, checkpointed once.
    The old shape ran the C4 battery 3x and Gopher 2x per batch: each
    stage count was its own job, and every downstream consumer of
    ``gated`` (decontam probe, dedup engine, funnel join) re-derived the
    semi-join chain including both batteries. All per-stage counts now
    come from one aggregate over the flag table; Gopher bits computed
    for C4-dropped docs are ignored by the counts and the filter, so
    admitted rows and funnel numbers are bit-identical (test-pinned)."""
    from ..operators.textstats import (
        CORPUS_GATE_GOPHER,
        c4_line_rules,
        gopher_rules,
        pii_scrubbed_text,
    )

    keep = [c for c in batch_df.columns if c != "text"]
    scrubbed = batch_df.select(
        *keep, pii_scrubbed_text("text").alias("text")
    ).localCheckpoint(eager=True)
    c4 = c4_line_rules(scrubbed, carry=("text",)).select(
        "doc_id", "text", F.col("keep").alias("_c4")
    )
    flags = (
        gopher_rules(c4, carry=("_c4",), **CORPUS_GATE_GOPHER)
        .select("doc_id", "_c4", F.col("keep").alias("_g"))
        .localCheckpoint(eager=True)
    )
    n_in, n_c4, n_g = flags.agg(
        F.count(F.lit(1)),
        F.coalesce(F.sum("_c4"), F.lit(0)),
        F.coalesce(F.sum(F.col("_c4") * F.col("_g")), F.lit(0)),
    ).first()
    gated = scrubbed.join(
        F.broadcast(
            flags.filter((F.col("_c4") == 1) & (F.col("_g") == 1)).select(
                "doc_id"
            )
        ),
        "doc_id",
        "left_semi",
    )
    return gated, int(n_in - n_c4), int(n_c4 - n_g)


_FUNNEL_SCHEMA = (
    "batch_id bigint, n_input bigint, n_c4_dropped bigint, "
    "n_gopher_dropped bigint, n_contaminated bigint, "
    "n_gate_survivors bigint, n_admitted bigint"
)

# Decontamination-gate artifact geometry (frozen at build time; the
# probe side must use the SAME n/bits/k the artifact was built with).
DECONTAM_NGRAM, DECONTAM_BITS, DECONTAM_K = 8, 65536, 4


def build_decontam_artifact(
    eval_docs: DataFrame,
    artifact_dir: str,
    n: int = DECONTAM_NGRAM,
    n_bits: int = DECONTAM_BITS,
    k: int = DECONTAM_K,
) -> None:
    """Freeze an evaluation set into the admission decontamination
    artifact: ``grams/`` (the exact distinct word-n-gram dictionary) and
    ``words/`` (its Bloom bitset, sketches.bloom_word_table — kilobytes).
    ``words/`` is written LAST as the completeness marker, the same
    torn-write discipline as the LM maintenance artifacts: a crash
    between the writes leaves ``words/`` absent and the gate refuses to
    run rather than screening against a half-built dictionary."""
    from ..operators.decontam import eval_gram_dictionary
    from ..operators.sketches import bloom_word_table

    grams = eval_gram_dictionary(eval_docs, n).localCheckpoint(eager=True)
    grams.write.mode("overwrite").parquet(os.path.join(artifact_dir, "grams"))
    bloom_word_table(grams, "gram", n_bits, k).write.mode("overwrite").parquet(
        os.path.join(artifact_dir, "words")
    )


def _decontam_gate(
    gated: DataFrame, eval_dir: str, threshold: float
) -> tuple[DataFrame, int]:
    """Reject benchmark-contaminated docs from one gated micro-batch:
    distinct 8-gram overlap against the FROZEN eval artifact >= threshold
    (operators.decontam.bloom_screened_overlap — the Bloom bitset screens
    every gram; the exact dictionary join sees only maybe-hits). Returns
    (survivors, n_rejected)."""
    from ..operators.decontam import bloom_screened_overlap

    spark = gated.sparkSession
    words_dir = os.path.join(eval_dir, "words")
    if not _has_parquet(words_dir):
        raise FileNotFoundError(
            f"decontam artifact incomplete: no parquet under {words_dir} "
            "(words/ is written last — rebuild with build_decontam_artifact)"
        )
    words = spark.read.parquet(words_dir)
    dictionary = spark.read.parquet(os.path.join(eval_dir, "grams"))
    bad = (
        bloom_screened_overlap(
            gated,
            words,
            dictionary,
            n=DECONTAM_NGRAM,
            threshold=threshold,
            n_bits=DECONTAM_BITS,
            k=DECONTAM_K,
        )
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
    )
    n_bad = bad.count()
    if n_bad:
        gated = gated.join(F.broadcast(bad), "doc_id", "left_anti")
    return gated, n_bad


def stream_corpus_admission(
    doc_stream: DataFrame,
    corpus_dir: str,
    bands_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.5,
    funnel_dir: str | None = None,
    eval_dir: str | None = None,
    decontam_threshold: float = 0.05,
) -> StreamingQuery:
    """Streaming twin of the batch capstone's ADMISSION POLICY (VERDICT
    r14 #4): per micro-batch, run llm_corpus_pipeline's pre-dedup gate —
    PII scrub -> C4 line rules -> Gopher word rules with the FROZEN
    capstone thresholds — then the standard exact + cluster-canonical
    LSH dedup stages against the persistent corpus (the same
    ``_curate_batch`` engine as :func:`stream_curate`). The corpus only
    ever contains gate-passing, scrubbed, deduplicated documents — what
    the batch pipeline keeps, incrementally. The candidate joins run
    under the band-df cap (``MAX_BAND_DF`` — rule 13; the r15 planted
    disclaimer class measured a false-hot band at 94% of all candidate
    pairs), matching ``corpus_admission_batch``'s oracle-modeled cap.

    Pass ``eval_dir`` (a :func:`build_decontam_artifact` directory) to
    also reject benchmark-contaminated docs: distinct-8-gram overlap
    against the frozen eval dictionary >= ``decontam_threshold``, with
    the Bloom bitset screening every gram so the exact join sees only
    maybe-hits. The rejection runs AT THE GATE, before dedup — a
    deliberate divergence from the batch capstone's stage order
    (decontam after near-dedup): a contaminated document must never
    shadow a clean near-duplicate out of the corpus by winning the
    min-id cluster-canonical choice and then being rejected itself.
    Tested by a planted pair (contaminated doc + its clean lower-overlap
    near-dup: the clean one is admitted).

    Pass ``funnel_dir`` to persist one ledger row per micro-batch
    (batch_id, n_input, n_c4_dropped, n_gopher_dropped, n_contaminated,
    n_gate_survivors, n_admitted — n_contaminated is 0 when no
    ``eval_dir`` is configured). Replay-idempotent BY LEDGER (rule
    11): a replayed batch_id appends no second row, and ``n_admitted``
    is computed as "this batch's gate survivors present in the corpus
    AFTER the dedup stage" — truthful even when a crash landed between
    the corpus append and the ledger write, because the replayed docs
    are found in the corpus rather than re-admitted."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        replayed = False
        if funnel_dir is not None and _has_parquet(funnel_dir):
            replayed = not (
                spark.read.parquet(funnel_dir)
                .filter(F.col("batch_id") == batch_id)
                .limit(1)
                .isEmpty()
            )
        n_input = batch_df.count()
        gated, n_c4_dropped, n_gopher_dropped = _admission_gate(batch_df)
        n_survivors = n_input - n_c4_dropped - n_gopher_dropped
        n_contaminated = 0
        if eval_dir is not None and n_survivors:
            # the gated frame now feeds the overlap probe, the anti-join,
            # the dedup engine, and the funnel's n_admitted join (rule 4)
            gated = gated.localCheckpoint(eager=True)
            gated, n_contaminated = _decontam_gate(
                gated, eval_dir, decontam_threshold
            )
            n_survivors -= n_contaminated
        if n_survivors:
            _curate_batch(
                gated,
                corpus_dir,
                bands_dir,
                jaccard_threshold,
                max_band_df=MAX_BAND_DF,
            )
        if funnel_dir is None or replayed:
            return
        n_admitted = 0
        if n_survivors and _has_parquet(corpus_dir):
            n_admitted = (
                spark.read.parquet(corpus_dir)
                .join(F.broadcast(gated.select("doc_id")), "doc_id", "left_semi")
                .count()
            )
        spark.createDataFrame(
            [
                (
                    batch_id,
                    n_input,
                    n_c4_dropped,
                    n_gopher_dropped,
                    n_contaminated,
                    n_survivors,
                    n_admitted,
                )
            ],
            _FUNNEL_SCHEMA,
        ).write.mode("append").parquet(funnel_dir)

    return (
        doc_stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_curate(
    doc_stream: DataFrame,
    corpus_dir: str,
    bands_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.5,
    line_df_dir: str | None = None,
    max_line_doc_freq: int = 5,
) -> StreamingQuery:
    """Curate ``doc_stream`` (doc_id, text, ...) into ``corpus_dir``;
    ``bands_dir`` holds the persistent minhash band index. Pass
    ``line_df_dir`` to also run line-level boilerplate removal against the
    cumulative line-document-frequency state persisted there (stage 0 of
    the batch capstone pipeline, incrementally). Returns the running query
    (availableNow trigger — rerun to drain new input)."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            _curate_batch(
                batch_df,
                corpus_dir,
                bands_dir,
                jaccard_threshold,
                line_df_dir=line_df_dir,
                max_line_doc_freq=max_line_doc_freq,
            )

    return (
        doc_stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
