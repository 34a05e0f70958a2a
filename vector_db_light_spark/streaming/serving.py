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
