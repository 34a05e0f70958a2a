"""Training-sequence packing: concat-and-chunk documents into fixed
token-budget bins (the standard LLM-pretraining batch layout).

The core primitive is an EXACT global prefix sum of per-doc token counts
in deterministic doc-id order. A naive `sum() OVER (ORDER BY doc_id)` is
a single-partition window — the one shape that cannot scale. This module
computes the identical numbers with the classic two-level prefix sum:

  1. docs group into deterministic chunks (``doc_id div chunk``) — no
     sampling, no partitioner dependence, so the result is a pure
     function of the data;
  2. intra-chunk running sums use a window PARTITIONED by chunk
     (parallel, bounded partitions);
  3. chunk totals (corpus/chunk rows — thousands at 100 TB) get their own
     running sum in one small single-partition window, broadcast back.

Every value is a BIGINT, so the packing layout — which bin each document
starts and ends in, where bins split documents — is bit-identical on any
engine and any partitioning, and a DuckDB oracle checks it with the
plain window cumsum. At larger scale add levels recursively; two levels
cover ~10^9 docs at chunk=65536 with a <=65536-row top window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prefix_sum_by_id(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    chunk: int = 64,
) -> DataFrame:
    """All input columns + ``tok_start`` = exact sum of ``value_col`` over
    all rows with smaller ``id_col`` (two-level prefix sum, module
    docstring)."""
    chunked = df.withColumn("_chunk", F.expr(f"{id_col} div {chunk}"))
    w_intra = (
        Window.partitionBy("_chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = chunked.withColumn(
        "_intra", F.coalesce(F.sum(value_col).over(w_intra), F.lit(0))
    )
    totals = chunked.groupBy("_chunk").agg(
        F.sum(value_col).cast("long").alias("_tot")
    )
    w_chunks = Window.orderBy("_chunk").rowsBetween(
        Window.unboundedPreceding, -1
    )  # corpus/chunk rows — the small top level
    offsets = totals.select(
        "_chunk",
        F.coalesce(F.sum("_tot").over(w_chunks), F.lit(0))
        .cast("long")
        .alias("_offset"),
    )
    return (
        intra.join(F.broadcast(offsets), "_chunk")
        .withColumn(
            "tok_start", (F.col("_offset") + F.col("_intra")).cast("long")
        )
        .drop("_chunk", "_intra", "_offset")
    )


def pack_spans(
    docs: DataFrame,
    budget: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    chunk: int = 64,
) -> DataFrame:
    """Concat-and-chunk layout: documents concatenate in ``id_col`` order
    into one global token stream cut into ``budget``-token bins. Returns
    per-doc (id, n_tok, tok_start, first_bin, last_bin, n_bins) — the
    write plan a sequence-packing job shuffles by ``first_bin`` to
    materialize training sequences. Zero-token docs land wholly in
    ``first_bin`` (n_bins = 1) rather than producing an inverted span."""
    with_start = prefix_sum_by_id(docs, n_tok_col, id_col, chunk)
    first = F.expr(f"tok_start div {budget}")
    last = F.greatest(
        first, F.expr(f"(tok_start + {n_tok_col} - 1) div {budget}")
    )
    return with_start.select(
        id_col,
        F.col(n_tok_col).cast("long").alias(n_tok_col),
        "tok_start",
        first.cast("long").alias("first_bin"),
        last.cast("long").alias("last_bin"),
        (last - first + 1).cast("long").alias("n_bins"),
    )
