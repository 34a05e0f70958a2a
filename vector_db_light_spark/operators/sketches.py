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


# ---------------------------------------------------------------------------
# Bloom filter: set-membership pre-filter with zero false negatives.
# ---------------------------------------------------------------------------

def _bloom_pos(key_col: str, j: int, n_bits: int) -> Column:
    """Bit position j for a key: md5-derived (portable), suffix '#bj' keeps
    the hash family disjoint from count-min's '#j'."""
    md5 = F.md5(F.concat(F.col(key_col), F.lit(f"#b{j}")))
    return F.conv(F.substring(md5, 1, 12), 16, 10).cast("bigint") % n_bits


def bloom_word_table(
    keys: DataFrame, key_col: str, n_bits: int = 65536, k: int = 4
) -> DataFrame:
    """Build the filter as a (word_idx, word) table of 32-bit words —
    32-bit, not 64: a 1<<63 shift overflows signed BIGINT on both engines.
    One narrow explode (x k) + one groupBy(word_idx) with a bit_or
    aggregate; the result is <= n_bits/32 rows (kilobytes), broadcastable,
    and mergeable across builds by word-wise OR — the standard shape for
    shipping a membership test to a 100 TB scan without shuffling it."""
    positions = keys.select(
        F.explode(
            F.array(*[_bloom_pos(key_col, j, n_bits) for j in range(k)])
        ).alias("pos")
    )
    return (
        positions.select(
            F.expr("pos div 32").alias("word_idx"),
            (F.col("pos") % 32).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("word")
        )
    )


def bloom_maybe_contains(
    probes: DataFrame,
    words: DataFrame,
    key_col: str,
    group_cols: list[str],
    n_bits: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Per probe row (identified by ``group_cols``): bloom_maybe = 1 iff
    ALL k bits are set. A missing word row means an all-zero word (left
    join + coalesce). Guarantees bloom_maybe >= true membership (no false
    negatives); false positives are bounded by (1-e^{-kn/m})^k and audited
    by the query's exact twin. The word table broadcasts; the probe side
    is never shuffled — this is the pre-filter that lets an exact
    (expensive) membership join run on the tiny maybe-set only."""
    pp = probes.select(
        *[F.col(c) for c in group_cols],
        F.explode(
            F.array(*[_bloom_pos(key_col, j, n_bits) for j in range(k)])
        ).alias("pos"),
    ).select(
        *group_cols,
        F.expr("pos div 32").alias("word_idx"),
        (F.col("pos") % 32).cast("int").alias("bit"),
    )
    hit = F.expr(
        "CAST(shiftright(coalesce(word, CAST(0 AS BIGINT)), bit) & 1 AS INT)"
    )
    return (
        pp.join(F.broadcast(words), "word_idx", "left")
        .select(*group_cols, hit.alias("_hit"))
        .groupBy(*group_cols)
        .agg(F.min("_hit").alias("bloom_maybe"))
    )
