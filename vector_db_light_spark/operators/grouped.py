"""Grouped-map transforms (``applyInPandas``) — the §2.9 UDF class for
per-group logic that needs a whole group in memory at once (numpy/pandas
math per key). Each group must fit an executor; keys are the shuffle unit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

INTERARRIVAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("mean_gap_s", DoubleType(), True),
        StructField("max_gap_s", DoubleType(), True),
    ]
)


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-user event inter-arrival statistics via grouped-map pandas:
    sort the group by time, diff, aggregate. (Also expressible with lag()
    windows — this form exists to exercise/document the applyInPandas path
    and as the template for per-group numpy math that SQL can't do.)"""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        gaps = pdf["ts"].diff().dropna().dt.total_seconds()
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "mean_gap_s": [float(gaps.mean()) if len(gaps) else None],
                "max_gap_s": [float(gaps.max()) if len(gaps) else None],
            }
        )

    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return prepared.groupBy("user_id").applyInPandas(
        stats, schema=INTERARRIVAL_SCHEMA
    )
