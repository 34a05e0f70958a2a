"""Streaming triangle maintenance: per-node counts stay equal to a full
recount as edge batches land, across restarts and crash replays."""

from __future__ import annotations

from vector_db_light_spark.streaming.graphs import (
    _apply_edge_batch,
    stream_triangle_counts,
)


def _counts(spark, d):
    return {
        r["node"]: r["n_triangles"] for r in spark.read.parquet(d).collect()
    }


def _recount(spark, edges_dir):
    from vector_db_light_spark.operators.graph import count_triangles

    return {
        r["node"]: r["n_triangles"]
        for r in count_triangles(
            spark.read.parquet(edges_dir), src="u", dst="v"
        ).collect()
    }


def test_stream_triangle_counts_match_recount(spark, tmp_path):
    src = str(tmp_path / "incoming")
    edges = str(tmp_path / "edges")
    counts = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "u long, v long").write.mode(
            "append"
        ).parquet(src)

    def drain():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = stream_triangle_counts(stream, edges, counts, ckpt)
        q.awaitTermination(180)

    # batch 1: a K4 — 4 triangles, every node in 3
    write([(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
    drain()
    assert _counts(spark, counts) == {1: 3, 2: 3, 3: 3, 4: 3}

    # batch 2 (restart): close three new triangles through node 5 —
    # (1,2,5), (1,3,5), (2,3,5) — and re-send one duplicate edge
    # (must not change anything)
    write([(1, 5), (2, 5), (3, 5), (1, 2)])
    drain()
    got = _counts(spark, counts)
    assert got == _recount(spark, edges)
    assert got[5] == 3
    assert set(got) == {1, 2, 3, 4, 5}


def test_edge_batch_replay_is_idempotent(spark, tmp_path):
    edges = str(tmp_path / "edges")
    counts = str(tmp_path / "counts")
    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)], "u long, v long"
    )
    _apply_edge_batch(k4, edges, counts, batch_id=0)
    base = _counts(spark, counts)
    # full replay of the same committed batch: new-set is empty -> no-op
    _apply_edge_batch(k4, edges, counts, batch_id=0)
    assert _counts(spark, counts) == base

    # fresh batch applied normally, then replayed: empty new-set no-op
    tri5 = spark.createDataFrame([(1, 5), (2, 5)], "u long, v long")
    _apply_edge_batch(tri5, edges, counts, batch_id=1)
    after_1 = _counts(spark, counts)
    _apply_edge_batch(tri5, edges, counts, batch_id=1)
    assert _counts(spark, counts) == after_1
    assert after_1 == _recount(spark, edges)

    # counts-written-then-crash window: the applied mark for batch 2
    # exists but its edges were never appended — on replay the merge
    # must be SKIPPED (no double count) while the edge append completes
    spark.createDataFrame([(2,)], "batch_id long").write.mode(
        "append"
    ).parquet(counts + "_applied")
    newe = spark.createDataFrame([(4, 5)], "u long, v long")
    _apply_edge_batch(newe, edges, counts, batch_id=2)
    assert _counts(spark, counts) == after_1  # merge skipped by the mark
    stored = {(r["u"], r["v"]) for r in spark.read.parquet(edges).collect()}
    assert (4, 5) in stored  # the append half completed
