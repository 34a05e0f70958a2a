"""Stream-stream joins (SURVEY.md §2.8 extension).

The batch engine's interval pairing (`queries/relational.event_pairs_5min`)
re-expressed for two LIVE streams: a watermarked stream-stream inner join
with an equi-key plus a time-range condition. Spark buffers each side's
rows in state only as long as the other side's watermark plus the interval
can still produce a match — the range condition is what lets the state
store evict, so it is REQUIRED at scale (an unconstrained stream-stream
join holds both streams forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Pairs (l, r) with l.key = r.key and r.ts in (l.ts, l.ts + max_delay].

    Both inputs get event-time watermarks (cast to TIMESTAMP first — the
    parquet fixtures carry NTZ wall-clock). State bound: each side buffers
    only rows younger than its watermark + max_delay; eviction follows from
    the range condition referencing both event times, per the Structured
    Streaming stream-stream join contract.

    Output columns are prefixed l_/r_ so downstream sinks see a flat,
    join-ambiguity-free schema.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts_col).cast("timestamp").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("event_type").alias("l_event_type"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts_col).cast("timestamp").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_type").alias("r_event_type"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond).select(
        "l_key",
        "l_event_id",
        "r_event_id",
        "l_event_type",
        "r_event_type",
        "l_ts",
        "r_ts",
    )
