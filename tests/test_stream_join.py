"""Stream-stream interval join: streaming result == batch twin."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE

from vector_db_light_spark.registry import load_events
from vector_db_light_spark.streaming.joins import stream_interval_join


def test_stream_interval_join_matches_batch(spark, tmp_path):
    # two disjoint event-type slices of the same stream, as click->purchase
    events = load_events(spark, SF_SMOKE).limit(800)
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    types = [r["event_type"] for r in events.select("event_type").distinct().collect()]
    t_left, t_right = sorted(types)[:2]

    def side(df, t):
        return df.filter(F.col("event_type") == t)

    stream = spark.readStream.schema(schema).parquet(src)
    joined = stream_interval_join(
        side(stream, t_left), side(stream, t_right), max_delay="5 minutes"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM sj_pairs").collect()
    }

    batch = spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    bl = side(batch, t_left).select(
        F.col("user_id").alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    br = side(batch, t_right).select(
        F.col("user_id").alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    want = {
        (r["l_event_id"], r["r_event_id"])
        for r in bl.join(
            br,
            (F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 5 minutes")),
        ).collect()
    }
    assert want, "fixture produced no pairs — widen the interval"
    assert got == want


def test_stream_search_matches_batch(spark, tmp_path):
    """Streaming ANN serving == the batch IVF plan over the same queries:
    two query micro-batches against the static embeddings corpus produce
    exactly the rows batch_ivf_topk computes for the union."""
    from vector_db_light_spark.operators.similarity import (
        batch_ivf_topk,
        ivf_centroids,
    )
    from vector_db_light_spark.registry import load
    from vector_db_light_spark.streaming.serving import stream_search

    emb = load(spark, SF_SMOKE, "embeddings")
    cents = ivf_centroids(emb, dim=64)

    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qsrc = str(tmp_path / "qsrc")
    queries.filter(F.col("query_id") < 3).write.mode("append").parquet(qsrc)

    out_dir = str(tmp_path / "hits")
    stream = spark.readStream.schema(spark.read.parquet(qsrc).schema).parquet(qsrc)
    q = stream_search(
        stream, emb, cents, out_dir, str(tmp_path / "ckpt_srv"), nprobe=2, k=3
    )
    q.awaitTermination(120)
    # second micro-batch (availableNow already stopped; restart picks up
    # the new files from the checkpoint — the serving loop in production
    # runs continuously, the restart here just exercises the offset log)
    queries.filter(F.col("query_id") >= 3).write.mode("append").parquet(qsrc)
    stream2 = spark.readStream.schema(spark.read.parquet(qsrc).schema).parquet(qsrc)
    q2 = stream_search(
        stream2, emb, cents, out_dir, str(tmp_path / "ckpt_srv"), nprobe=2, k=3
    )
    q2.awaitTermination(120)

    got = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in batch_ivf_topk(emb, queries, cents, nprobe=2, k=3).collect()
    }
    assert got == want and len(got) == 6 * 3


def test_stream_lexical_search_matches_single_query_bm25(spark, tmp_path):
    """Streaming lexical serving: two micro-batches of keyword queries
    against the static docs corpus — every query's streamed answer is
    bit-identical to the single-query bm25_topk for its own terms (batch
    amortization must not leak one query's terms into another's df/stats)."""
    from vector_db_light_spark.operators.text_search import bm25_topk
    from vector_db_light_spark.registry import load_docs
    from vector_db_light_spark.streaming.serving import stream_lexical_search

    docs = load_docs(spark, SF_SMOKE)
    qdefs = {
        1: "spark query",
        2: "table scan batch",
        3: "merge sort",
        4: "window",
    }
    qsrc = str(tmp_path / "qsrc")
    out_dir = str(tmp_path / "hits")

    def write(ids):
        spark.createDataFrame(
            [(i, qdefs[i]) for i in ids], "query_id bigint, terms string"
        ).write.mode("append").parquet(qsrc)

    def drain():
        stream = spark.readStream.schema(
            spark.read.parquet(qsrc).schema
        ).parquet(qsrc)
        stream_lexical_search(
            stream, docs, out_dir, str(tmp_path / "ckpt"), k=5
        ).awaitTermination(120)

    write([1, 2])
    drain()
    write([3, 4])
    drain()

    got = {}
    for r in spark.read.parquet(out_dir).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rk"], r["doc_id"], r["bm25"])
        )
    for qid, terms in qdefs.items():
        want = [
            (i + 1, r["doc_id"], r["bm25"])
            for i, r in enumerate(bm25_topk(docs, terms.split(), k=5).collect())
        ]
        assert sorted(got[qid]) == want, qid
