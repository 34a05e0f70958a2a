"""Streaming SCD2 (streaming/dimensions.py): upsert/tombstone folding,
replay idempotence by merge semantics, per-batch latest-seq dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_db_light_spark.streaming.dimensions import (
    OPEN_VERSION,
    _apply_change_batch,
    stream_scd2,
)

_SCHEMA = "k bigint, bal bigint, seq bigint, is_delete boolean"


def test_stream_scd2_end_to_end(spark, tmp_path):
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "changes")

    def write(rows):
        spark.createDataFrame(rows, _SCHEMA).write.mode("append").parquet(src)

    def drain():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        stream_scd2(stream, dim, ckpt).awaitTermination(180)

    # batch 0: initial load (two seq rows for key 1 — latest wins)
    write([(1, 100, 1, False), (1, 105, 2, False), (2, 200, 1, False)])
    drain()
    rows = {
        (r["k"], r["valid_from"]): (r["bal"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(dim).collect()
    }
    assert rows == {
        (1, 2): (105, OPEN_VERSION, 1),
        (2, 2): (200, OPEN_VERSION, 1),
    }

    # batch 1: key 1 changes, key 2 tombstones, key 3 inserts
    write([(1, 111, 3, False), (2, 0, 3, True), (3, 300, 1, False)])
    drain()
    rows = {
        (r["k"], r["valid_from"]): (r["bal"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(dim).collect()
    }
    assert rows == {
        (1, 2): (105, 3, 0),
        (1, 3): (111, OPEN_VERSION, 1),
        (2, 2): (200, 3, 0),
        (3, 3): (300, OPEN_VERSION, 1),
    }

    # draining again with no new input changes nothing
    drain()
    rows2 = {
        (r["k"], r["valid_from"]): (r["bal"], r["valid_to"], r["is_current"])
        for r in spark.read.parquet(dim).collect()
    }
    assert rows2 == rows


def test_stream_scd2_replay_is_idempotent_by_semantics(spark, tmp_path):
    """Re-applying the SAME batch to the already-merged dimension is a
    no-op: changed keys compare equal, tombstoned keys are not current,
    inserts exist with identical attrs (the module-docstring argument)."""
    dim = str(tmp_path / "dim")

    b0 = spark.createDataFrame(
        [(1, 100, 1, False), (2, 200, 1, False)], _SCHEMA
    )
    _apply_change_batch(b0, dim, "k", ["bal"], "seq", "is_delete", 0)
    b1 = spark.createDataFrame(
        [(1, 111, 2, False), (2, 0, 2, True), (3, 300, 1, False)], _SCHEMA
    )
    _apply_change_batch(b1, dim, "k", ["bal"], "seq", "is_delete", 1)
    want = sorted(
        tuple(r) for r in spark.read.parquet(dim).collect()
    )
    # crash-replay: the same batch id applies again on the merged state
    _apply_change_batch(b1, dim, "k", ["bal"], "seq", "is_delete", 1)
    got = sorted(tuple(r) for r in spark.read.parquet(dim).collect())
    assert got == want
    open_rows = spark.read.parquet(dim).filter(
        F.col("valid_to") == OPEN_VERSION
    )
    assert {r["k"] for r in open_rows.collect()} == {1, 3}


def test_stream_scd2_rejects_cross_batch_late_data(spark, tmp_path):
    """Last-writer-wins by SOURCE seq across batches (module docstring
    rule): a change with a LOWER seq arriving in a LATER batch is late
    data and must be dropped, not applied as if newer — including a stale
    resurrection of a tombstoned key."""
    dim = str(tmp_path / "dim")

    def apply(rows, bid):
        _apply_change_batch(
            spark.createDataFrame(rows, _SCHEMA),
            dim, "k", ["bal"], "seq", "is_delete", bid,
        )

    def snap():
        return {
            (r["k"], r["valid_from"]): (
                r["bal"], r["valid_to"], r["is_current"], r["src_seq"]
            )
            for r in spark.read.parquet(dim).collect()
        }

    # batch 0: initial; batch 1: key 1 updated (seq 5), key 2 tombstoned
    # (seq 5)
    apply([(1, 100, 1, False), (2, 200, 1, False)], 0)
    apply([(1, 150, 5, False), (2, 0, 5, True)], 1)
    want = {
        (1, 2): (100, 3, 0, 1),
        (1, 3): (150, OPEN_VERSION, 1, 5),
        (2, 2): (200, 3, 0, 5),  # tombstone re-stamps the closed row
    }
    assert snap() == want

    # batch 2 is ALL late data: an older update for key 1 (seq 3 < 5), a
    # stale resurrection of tombstoned key 2 (seq 2 < 5) -> no-op,
    # including no version churn
    apply([(1, 120, 3, False), (2, 222, 2, False)], 2)
    assert snap() == want

    # batch 3 mixes late and fresh: key 1 stale (seq 4), key 2 genuinely
    # resurrected (seq 7 > the tombstone's 5)
    apply([(1, 130, 4, False), (2, 250, 7, False)], 3)
    assert snap() == {
        (1, 2): (100, 3, 0, 1),
        (1, 3): (150, OPEN_VERSION, 1, 5),
        (2, 2): (200, 3, 0, 5),
        (2, 5): (250, OPEN_VERSION, 1, 7),
    }


def test_stream_scd2_tombstone_ghost_rows_block_stale_resurrection(
    spark, tmp_path
):
    """A tombstone for a key with NO row yet (first-ever change is a
    delete, or a delete in a non-initial batch for a never-seen key) must
    still advance the applied-seq ledger — via a zero-width closed ghost
    row — so a later batch's STALE resurrection is rejected (ADVICE r10)."""
    dim = str(tmp_path / "dim")

    def apply(rows, bid):
        _apply_change_batch(
            spark.createDataFrame(rows, _SCHEMA),
            dim, "k", ["bal"], "seq", "is_delete", bid,
        )

    def open_rows():
        return {
            r["k"]: (r["bal"], r["src_seq"])
            for r in spark.read.parquet(dim)
            .filter(F.col("valid_to") == OPEN_VERSION)
            .collect()
        }

    # batch 0 (initial load): key 1 inserts; key 2's FIRST-EVER change is
    # a tombstone at seq 5 -> ghost ledger row, nothing open
    apply([(1, 100, 1, False), (2, 0, 5, True)], 0)
    assert open_rows() == {1: (100, 1)}
    ghost = [
        (r["valid_from"], r["valid_to"], r["is_current"], r["src_seq"])
        for r in spark.read.parquet(dim).filter(F.col("k") == 2).collect()
    ]
    assert ghost == [(2, 2, 0, 5)]

    # batch 1: stale resurrection of key 2 (seq 3 < the ghost's 5) is
    # rejected; key 3's first-ever change is a tombstone in a NON-initial
    # batch (seq 9) -> ghost via scd2_upsert
    apply([(2, 333, 3, False), (3, 0, 9, True)], 1)
    assert open_rows() == {1: (100, 1)}

    # batch 2: stale resurrection of key 3 rejected (seq 8 < 9); fresh
    # resurrection of key 2 applied (seq 7 > 5)
    apply([(2, 444, 7, False), (3, 300, 8, False)], 2)
    assert open_rows() == {1: (100, 1), 2: (444, 7)}
