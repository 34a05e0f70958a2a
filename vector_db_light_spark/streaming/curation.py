"""Streaming corpus curation: a document stream deduped against the
persistent curated corpus, micro-batch by micro-batch.

This wires the batch incremental-dedup artifacts (operators/dedup.py —
the persisted band table whose daily cost scales with the batch, not the
corpus) into Structured Streaming the way the batch side's
`dedup_incremental_lsh` query promises:

  per micro-batch
    1. in-batch exact dedup (min-id canonical per sha256)
    2. exact anti-join against the curated corpus' content hashes
    3. minhash band keys of the survivors; candidate pairs BOTH within the
       batch (lsh_candidate_pairs self-join, id_a < id_b) and against the
       PERSISTED band table (incremental_lsh_candidates: the |corpus|^2
       half never runs)
    4. exact-Jaccard verify restricted to candidates; drop new docs with
       jaccard >= threshold against anything already curated, and the
       LARGER id of every verified in-batch pair (greedy keep-min policy,
       matching step 1's min-id canonical; ADVICE r6: two near-dup copies
       arriving in one batch were both admitted before)
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
    incremental_lsh_candidates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_band_keys,
    minhash_signatures,
)


def _curate_batch(
    batch_df: DataFrame,
    corpus_dir: str,
    bands_dir: str,
    jaccard_threshold: float,
) -> None:
    spark = batch_df.sparkSession
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
    fresh_p = new = new.persist()  # shared by steps 3-4 + the final anti
    # 3a. band keys of the batch — used for in-batch AND vs-corpus pairs
    new_bands = minhash_band_keys(minhash_signatures(new))
    # 3b/4a. near-dups WITHIN the batch: verify the self-join candidates,
    # doom the larger id of each verified pair (keep-min, like step 1)
    in_cands = lsh_candidate_pairs(new_bands)
    in_doomed = (
        jaccard_pairs(new.select("doc_id", "text"), candidates=in_cands)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    new = new.join(F.broadcast(in_doomed), "doc_id", "left_anti")
    if corpus_exists:
        # 3c. near-dup candidates vs the persisted band index. The
        # new_id != existing_id guard drops the self-pairs a crash-replayed
        # batch produces under bands-first write ordering (its band rows
        # are already indexed, the doc itself is not yet in the corpus).
        existing_bands = spark.read.parquet(bands_dir)
        cands = (
            incremental_lsh_candidates(existing_bands, new_bands)
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
    fresh_p.unpersist()
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


def stream_curate(
    doc_stream: DataFrame,
    corpus_dir: str,
    bands_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.5,
) -> StreamingQuery:
    """Curate ``doc_stream`` (doc_id, text, ...) into ``corpus_dir``;
    ``bands_dir`` holds the persistent minhash band index. Returns the
    running query (availableNow trigger — rerun to drain new input)."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            _curate_batch(batch_df, corpus_dir, bands_dir, jaccard_threshold)

    return (
        doc_stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
