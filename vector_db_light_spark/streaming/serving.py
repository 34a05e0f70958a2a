"""Streaming ANN serving: a continuous stream of query vectors answered
against the static (build-time) IVF index.

The reference serves queries one at a time from the GUI thread
(``/root/reference/vector_db_query.py:142-210``); the Spark re-expression
is the same micro-batch amortization every vector-serving tier applies —
queries arrive as a stream, each micro-batch is answered with the BATCH
IVF plan (``operators/similarity.py::batch_ivf_topk``): broadcast centroid
probe + cluster equi-join + WindowGroupLimit top-k, so a batch of B
queries costs one pruned corpus pass, not B scans.

foreachBatch (not a stream-static join) is deliberate: the top-k needs a
rank window over the joined result, which Structured Streaming cannot run
inside an append-mode continuous plan — inside foreachBatch the micro-batch
is a plain batch DataFrame, so the exact serving plan (and its plan-pinned
shuffle bounds) is reused verbatim. Exactly-once lands on the sink the
usual way: checkpointed offsets + idempotent (query_id, vec_id) output keys.

At 100 TB the corpus side stays partitioned by cluster_id on disk and the
probe list is broadcast per micro-batch — the stream never forces a corpus
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.similarity import batch_ivf_topk


def stream_search(
    query_stream: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    nprobe: int = 2,
    k: int = 5,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> StreamingQuery:
    """Answer ``query_stream`` micro-batches against the static
    ``corpus``/``centroids`` pair; append (query_id, vec_id, distance, rk)
    parquet rows to ``output_dir``. Returns the running query."""

    def answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hits = batch_ivf_topk(
            corpus,
            batch_df,
            centroids,
            nprobe=nprobe,
            k=k,
            cluster_col=cluster_col,
            id_col=id_col,
            vector_col=vector_col,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )
        hits.write.mode("append").parquet(output_dir)

    return (
        query_stream.writeStream.foreachBatch(answer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_lexical_search(
    query_stream: DataFrame,
    docs: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> StreamingQuery:
    """Lexical twin of :func:`stream_search`: a stream of keyword queries
    (``query_id``, space-separated ``terms``) answered against the static
    corpus with the BATCHED BM25 plan
    (operators/text_search.batch_bm25_topk) — a micro-batch of B queries
    costs ONE pass over the union of their posting lists, not B, and each
    query's answer is bit-identical to the single-query ``bm25_topk``
    (per-term df and corpus stats are query-independent; pinned by
    test_stream_serving). Same foreachBatch rationale as the ANN server:
    the per-query rank window needs a plain batch plan. Pass ``index``
    (the (postings, term_meta, stats) trio persisted by
    api.build_text_index) and each batch serves from the ARTIFACT —
    partition-pruned postings read, sidecar df/stats, zero corpus
    tokenization per batch, answers bit-identical to the corpus path
    (pinned by test_text_index). Without it the batch re-derives the
    postings from ``docs`` — acceptable only when the corpus is small or
    the stream is short-lived; per-batch WAND pruning composes per query
    on top when posting lists are long (bm25_wand_topk), but the batch
    amortization is the bigger serving lever."""
    from pyspark.sql import functions as F

    from ..operators.text_search import batch_bm25_topk, batch_bm25_topk_from_index

    def answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        qterms = batch_df.select(
            query_id_col,
            F.explode(F.split(F.col(terms_col), r"\s+")).alias("term"),
        ).filter(F.col("term") != "")
        if index is not None:
            hits = batch_bm25_topk_from_index(
                *index, qterms, k=k, query_id_col=query_id_col
            )
        else:
            hits = batch_bm25_topk(docs, qterms, k=k, query_id_col=query_id_col)
        hits.write.mode("append").parquet(output_dir)

    return (
        query_stream.writeStream.foreachBatch(answer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
