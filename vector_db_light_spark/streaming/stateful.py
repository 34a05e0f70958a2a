"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8: the escape hatch for operators Spark's built-in streaming
aggregations can't express).

``running_user_stats`` keeps per-user state across micro-batches: total
event count, running value sum, and the last-seen timestamp. Each batch
emits one updated row per user seen in that batch — a continuously
maintained per-entity profile (the streaming analogue of a slowly-updated
feature store row).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("last_seen", TimestampType(), True),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    last_seen = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_seen is None or batch_max > last_seen:
            last_seen = batch_max
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [last_seen],
        }
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last_seen) maintained across batches."""
    from pyspark.sql import functions as F

    from ..registry import _ship_package

    _ship_package(events_stream.sparkSession)  # stateful UDF runs on workers

    stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
