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


# ---------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the successor
# API (SPARK-49564): typed state handles (ValueState), per-processor init/
# close lifecycle, and future-proofing for timers/TTL. Kept alongside the
# applyInPandasWithState variant so both Structured Streaming stateful APIs
# are exercised; results are identical.
# ---------------------------------------------------------------------------

def _tws_available() -> bool:
    """transformWithStateInPandas needs pyspark>=4 AND protobuf (its state
    protocol is protobuf-serialized; google.protobuf is not in this
    container, so the TWS variant is an import-gated seam exactly like the
    heavy-format parsers)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


try:  # pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UserStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            last_seen = None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                if last_seen is None or batch_max > last_seen:
                    last_seen = batch_max
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_seen": [last_seen],
                }
            )

        def close(self) -> None:
            pass

    def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
        """``running_user_stats`` on the transformWithStateInPandas API."""
        from pyspark.sql import functions as F

        from ..registry import _ship_package

        _ship_package(events_stream.sparkSession)
        stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        return stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_UserStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover — pyspark < 4.0
    running_user_stats_tws = None


# ---------------------------------------------------------------------------
# Session-close detection via EVENT-TIME STATE TIMEOUT — the stateful
# pattern the running-stats operator doesn't exercise: output is produced
# when a key goes QUIET (the watermark passes last_event + gap), not when
# data arrives. Spark's built-in session_window can aggregate sessions,
# but emitting a single "session closed" record with custom payload at
# close time is exactly what GroupStateTimeout exists for.
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)
# state carries event-time bounds in epoch MICROS (integers cross the
# Arrow boundary losslessly; timestamps in state invite tz surprises)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("end_us", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def _session_update_factory(gap_ms: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n],
                }
            )
            return
        start_us, end_us, n = (
            state.get if state.exists else (None, None, 0)
        )
        for pdf in pdfs:
            us = pdf["ts"].astype("int64") // 1000  # datetime64[ns] -> epoch us
            lo, hi = int(us.min()), int(us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += len(pdf)
        state.update((start_us, end_us, n))
        # close when the WATERMARK passes last event + gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_ms)
        yield pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "session_start_us": pd.Series(dtype="int64"),
                "session_end_us": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
            }
        )

    return update


def closed_sessions(
    events_stream: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit one record per user session WHEN IT CLOSES (event-time gap
    exceeded, judged by the watermark — deterministic, not wall-clock).
    State per live session is three longs; closed keys are removed, so
    state size tracks concurrently-open sessions only."""
    from pyspark.sql import functions as F

    from ..registry import _ship_package

    _ship_package(events_stream.sparkSession)

    unit_ms = {"minutes": 60_000, "minute": 60_000, "seconds": 1_000}
    qty, unit = gap.split()
    gap_ms = int(qty) * unit_ms[unit]
    stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", watermark)
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_update_factory(gap_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
