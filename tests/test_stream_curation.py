"""Streaming corpus curation: exact + incremental-LSH dedup against the
persistent corpus/band-index pair, across micro-batches and restarts."""

from __future__ import annotations

from vector_db_light_spark.streaming.curation import stream_curate

_BASE = (
    "the spark engine shuffles data between stages and caches hot "
    "partitions in executor memory for iterative workloads to reuse "
)


def _doc(i: int, text: str):
    return (i, text)


def test_stream_curate_drops_exact_and_near_dups(spark, tmp_path):
    src = str(tmp_path / "incoming")
    corpus = str(tmp_path / "curated")
    bands = str(tmp_path / "bands")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = stream_curate(stream, corpus, bands, ckpt)
        q.awaitTermination(180)

    # batch 1: three distinct docs + one in-batch exact dup of doc 0
    write(
        [
            _doc(0, _BASE * 3 + "alpha section"),
            _doc(1, "completely different text about ducks and databases " * 6),
            _doc(2, "a third unique document mentioning catalyst plans " * 6),
            _doc(3, _BASE * 3 + "alpha section"),  # exact dup of 0, same batch
        ]
    )
    drain()
    ids1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert ids1 == {0, 1, 2}  # min-id canonical kept

    # batch 2 (restart drains from the checkpoint): one new doc, one exact
    # dup of doc 1, one NEAR dup of doc 0 (same long body, tail edited)
    write(
        [
            _doc(10, "entirely fresh content on watermarks and state stores " * 6),
            _doc(11, "completely different text about ducks and databases " * 6),
            _doc(12, _BASE * 3 + "beta section"),
        ]
    )
    drain()
    ids2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert ids2 == {0, 1, 2, 10}

    # the band index covers exactly the curated docs (the next batch's join
    # side), so daily cost keeps scaling with the batch
    band_ids = {r["doc_id"] for r in spark.read.parquet(bands).collect()}
    assert band_ids == ids2


def test_stream_curate_drops_in_batch_near_dups(spark, tmp_path):
    """ADVICE r6: two near-duplicate copies arriving in the SAME micro-batch
    must not both be admitted — the larger id is dropped (keep-min)."""
    src = str(tmp_path / "incoming")
    corpus = str(tmp_path / "curated")
    bands = str(tmp_path / "bands")
    ckpt = str(tmp_path / "ckpt")

    rows = [
        _doc(0, _BASE * 3 + "alpha section"),
        _doc(1, _BASE * 3 + "beta section"),  # near dup of 0, SAME batch
        _doc(2, "completely different text about ducks and databases " * 6),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    stream_curate(stream, corpus, bands, ckpt).awaitTermination(180)
    ids = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert ids == {0, 2}


def test_stream_curate_replay_after_partial_write_recovers(spark, tmp_path):
    """Bands-first write ordering: if a batch crashed AFTER the band append
    but BEFORE the corpus append, replaying it must still admit the doc
    (its stale band rows self-pair, which the new_id != existing_id guard
    ignores) instead of dooming it against its own index entries."""
    from vector_db_light_spark.operators.dedup import (
        minhash_band_keys,
        minhash_signatures,
    )
    from vector_db_light_spark.streaming.curation import _curate_batch

    corpus = str(tmp_path / "curated")
    bands = str(tmp_path / "bands")

    # batch 1 completes normally
    b1 = spark.createDataFrame(
        [_doc(0, "completely different text about ducks and databases " * 6)],
        "doc_id bigint, text string",
    )
    _curate_batch(b1, corpus, bands, 0.5)

    # batch 2 "crashes" between the writes: band rows landed, corpus did not
    b2 = spark.createDataFrame(
        [_doc(5, _BASE * 3 + "gamma section")], "doc_id bigint, text string"
    )
    minhash_band_keys(minhash_signatures(b2)).write.mode("append").parquet(bands)
    # replay of batch 2 (checkpoint re-delivers it)
    _curate_batch(b2, corpus, bands, 0.5)
    ids = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert ids == {0, 5}
