"""Streaming entity resolution (streaming/linkage.py): in-batch and
batch-vs-corpus links over the persisted positional-gram index, across
micro-batches, restarts and the crash-replay window."""

from __future__ import annotations

from vector_db_light_spark.streaming.linkage import _link_batch, stream_link


def _dirs(tmp_path):
    return (
        str(tmp_path / "keys"),
        str(tmp_path / "index"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )


def test_stream_link_finds_in_batch_and_corpus_links(spark, tmp_path):
    keys, index, pairs, ckpt = _dirs(tmp_path)
    src = str(tmp_path / "incoming")

    def write(rows):
        spark.createDataFrame(rows, "id bigint, key string").write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        stream_link(stream, keys, index, pairs, ckpt).awaitTermination(180)

    # batch 1: two in-batch near-matches + one unrelated
    write(
        [
            (1, "the quick brown fox jumps over"),
            (2, "the quick brown fox jumps ove"),   # dist 1 to 1
            (3, "completely unrelated record here"),
        ]
    )
    drain()
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in spark.read.parquet(pairs).distinct().collect()
    }
    assert got == {(1, 2): 1}

    # batch 2: links to the CORPUS (1 and 2), plus a fresh singleton
    write(
        [
            (10, "the quick brown fox jumpz over"),  # dist 1 to 1, 2 to 2
            (11, "nothing like anything seen before"),
        ]
    )
    drain()
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in spark.read.parquet(pairs).distinct().collect()
    }
    assert got == {(1, 2): 1, (1, 10): 1, (2, 10): 2}
    # state covers all records
    assert {r["id"] for r in spark.read.parquet(keys).collect()} == {
        1, 2, 3, 10, 11,
    }

    # draining again with no new data changes nothing
    drain()
    assert (
        spark.read.parquet(pairs).distinct().count() == 3
    )


def test_stream_link_crash_replay_duplicates_but_never_loses(spark, tmp_path):
    """Pairs-first write ordering: a crash AFTER the pairs append but
    BEFORE the state appends re-delivers the batch; its links are found
    again (duplicate identical rows, removed by distinct) instead of
    being lost forever as state-first ordering would."""
    keys, index, pairs, _ = _dirs(tmp_path)

    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over")], "id bigint, key string"
    )
    _link_batch(b1, keys, index, pairs, "key", "id", 2, 3)

    # batch 2 "crashes" after pairs: simulate by running fully, then
    # wiping the state appends back out is awkward — instead run the
    # batch ONLY up to pairs by replaying it with state from before it
    b2 = spark.createDataFrame(
        [(5, "the quick brown fox jumps ove")], "id bigint, key string"
    )
    _link_batch(b2, keys, index, pairs, "key", "id", 2, 3)  # full run
    n_rows = spark.read.parquet(pairs).count()
    # re-delivery of batch 2 (checkpoint replay): id 5 is persisted, so
    # the replay is a no-op — no duplicates, nothing lost
    _link_batch(b2, keys, index, pairs, "key", "id", 2, 3)
    assert spark.read.parquet(pairs).count() == n_rows
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in spark.read.parquet(pairs).distinct().collect()
    }
    assert got == {(1, 5): 1}


def test_stream_link_mid_batch_crash_points(spark, tmp_path):
    """VERDICT r8 #8: drive the batch through each partial-write crash
    point (after pairs; after pairs+index) by snapshotting the state dirs
    and restoring them to the crashed shape, then replaying. Links are
    never lost, replay duplicates are exact (distinct() view unchanged),
    and a LATER batch still finds corpus links against the possibly
    index-duplicated record — duplicate index rows must not perturb the
    candidate join or the prefix filter's rarity ranking."""
    import shutil

    keys, index, pairs, _ = _dirs(tmp_path)

    def snap(d, name):
        shutil.copytree(d, str(tmp_path / name))

    def restore(d, name):
        shutil.rmtree(d)
        shutil.copytree(str(tmp_path / name), d)

    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over")], "id bigint, key string"
    )
    _link_batch(b1, keys, index, pairs, "key", "id", 2, 3)

    # ---- crash point A: after 4a (pairs appended, index+keys not) ----
    snap(keys, "keys_pre2")
    snap(index, "index_pre2")
    b2 = spark.createDataFrame(
        [(5, "the quick brown fox jumps ove")], "id bigint, key string"
    )
    _link_batch(b2, keys, index, pairs, "key", "id", 2, 3)  # full run
    restore(keys, "keys_pre2")   # crash: state appends never landed
    restore(index, "index_pre2")
    _link_batch(b2, keys, index, pairs, "key", "id", 2, 3)  # replay
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in spark.read.parquet(pairs).distinct().collect()
    }
    assert got == {(1, 5): 1}
    assert spark.read.parquet(pairs).count() >= 2  # duplicate rows exist
    assert {r["id"] for r in spark.read.parquet(keys).collect()} == {1, 5}

    # ---- crash point B: after 4b (pairs + index appended, keys not) ----
    snap(keys, "keys_pre3")
    b3 = spark.createDataFrame(
        [(7, "a totally different base string")], "id bigint, key string"
    )
    _link_batch(b3, keys, index, pairs, "key", "id", 2, 3)  # full run
    restore(keys, "keys_pre3")   # crash between index and keys appends
    _link_batch(b3, keys, index, pairs, "key", "id", 2, 3)  # replay
    # id 7's blocking rows are now duplicated in the index
    idx7 = spark.read.parquet(index).filter("_fid = 7")
    assert idx7.count() == 2 * idx7.distinct().count()
    assert {r["id"] for r in spark.read.parquet(keys).collect()} == {1, 5, 7}

    # ---- a later batch still links correctly against the duplicated id --
    b4 = spark.createDataFrame(
        [(9, "a totally different base strin")],  # dist 1 to id 7
        "id bigint, key string",
    )
    _link_batch(b4, keys, index, pairs, "key", "id", 2, 3)
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in spark.read.parquet(pairs).distinct().collect()
    }
    assert got == {(1, 5): 1, (7, 9): 1}
