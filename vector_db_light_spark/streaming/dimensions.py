"""Streaming SCD2 dimension maintenance: a CDC change stream (upserts +
tombstones) folded into the versioned dimension table, micro-batch by
micro-batch, via ``operators/incremental.scd2_upsert``.

Idempotence comes from the MERGE SEMANTICS, not a high-water mark: re-
applying a batch to the already-merged dimension is a no-op by
construction — changed keys now compare equal (keep), tombstoned keys are
no longer current (nothing to close), inserted keys exist with identical
attrs (keep). The only protocol obligations are:

  * ``localCheckpoint`` the merged frame BEFORE overwriting the path the
    plan reads (the CLAUDE.md recache-by-path hazard);
  * stamp versions with the micro-batch id — monotone under structured
    streaming, and a replayed batch re-stamps the SAME version, which is
    exactly what keeps the close/open rows identical across replays.

Per-batch shape: dedupe the batch per key (latest ``seq_col`` wins,
deterministically), one key-join of current rows against it, history
passes through as a scan. At 100 TB bucket the dimension by key and the
join co-locates; only current rows join (history is scan-through)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window

from ..operators.incremental import scd2_upsert

OPEN_VERSION = 99_999


def _has_parquet(d: str) -> bool:
    return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))


def _apply_change_batch(
    batch_df: DataFrame,
    dim_dir: str,
    key_col: str,
    attr_cols: list[str],
    seq_col: str,
    delete_col: str,
    batch_id: int,
) -> None:
    spark = batch_df.sparkSession
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    latest = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key_col, *attr_cols, delete_col)
    )
    if _has_parquet(dim_dir):
        dim = spark.read.parquet(dim_dir)
    else:
        empty_cols = (
            [f"{key_col} BIGINT"]
            + [f"{a} BIGINT" for a in attr_cols]  # caller-typed in practice
            + ["valid_from BIGINT", "valid_to BIGINT", "is_current INT"]
        )
        first = latest.filter(~F.coalesce(F.col(delete_col), F.lit(False))).select(
            key_col,
            *attr_cols,
            F.lit(batch_id + 2).cast("long").alias("valid_from"),
            F.lit(OPEN_VERSION).cast("long").alias("valid_to"),
            F.lit(1).cast("int").alias("is_current"),
        )
        first.localCheckpoint(eager=True).write.mode("overwrite").parquet(dim_dir)
        del empty_cols
        return
    merged = scd2_upsert(
        dim,
        latest,
        key_col,
        attr_cols,
        version=batch_id + 2,  # version 1 = initial load, batches from 2+
        open_version=OPEN_VERSION,
        delete_col=delete_col,
    )
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(dim_dir)


def stream_scd2(
    change_stream: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    key_col: str = "k",
    attr_cols: list[str] | None = None,
    seq_col: str = "seq",
    delete_col: str = "is_delete",
) -> StreamingQuery:
    """Fold ``change_stream`` (key, attrs..., seq, is_delete) into the
    versioned dimension at ``dim_dir``. Returns the running query
    (availableNow trigger — rerun to drain new input)."""
    attrs = attr_cols or ["bal"]

    def run(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            _apply_change_batch(
                batch_df, dim_dir, key_col, attrs, seq_col, delete_col, batch_id
            )

    return (
        change_stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
