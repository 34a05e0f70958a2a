"""Mergeable frequency sketches for 100 TB profiling passes.

Count-min (Cormode & Muthukrishnan 2005) complements the approximate
cardinality/quantile sketches in queries/analytics.py: a depth x width grid
of counters answers "how often does key k occur?" within eps*N using
O(depth*width) space, where exact per-key counts would shuffle every
distinct key. The grid is built with ONE groupBy over (row, bucket) — the
combiner merges cells map-side, the sketch is trivially mergeable across
partitions/days, and serving is a broadcast join of the kilobyte-sized
cell table against whatever keys need estimates.

Buckets derive from md5 (portable: Spark's xxhash64 and DuckDB's hash()
disagree; md5 is bit-identical on both engines), one hash per (key, row)
with the row index appended — the standard independent-row construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: str, row: int, width: int) -> Column:
    md5 = F.md5(F.concat(F.col(key_col), F.lit(f"#{row}")))
    return F.conv(F.substring(md5, 1, 8), 16, 10).cast("bigint") % width


def count_min_cells(
    items: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: (r, bucket, cell) counts over an item stream —
    ``items`` has one row per OCCURRENCE (not per distinct key). One narrow
    explode (x depth) + one groupBy on (r, bucket): the shuffle carries at
    most depth*width rows per input partition after partial aggregation,
    independent of the key cardinality."""
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), _bucket(key_col, r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    return (
        items.select(F.explode(probes).alias("x"))
        .select("x.r", "x.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )


def count_min_estimates(
    keys: DataFrame,
    cells: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for each key in ``keys``: min over the key's depth
    cells — always >= the true count, and <= true + eps*N with probability
    1-delta (eps = e/width, delta = e^-depth). The cell table broadcasts
    (depth*width rows regardless of data size); per-key work is depth
    lookups."""
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), _bucket(key_col, r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    probed = keys.select(F.col(key_col), F.explode(probes).alias("x")).select(
        key_col, "x.r", "x.bucket"
    )
    return (
        probed.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cell").alias("cm_estimate"))
    )
