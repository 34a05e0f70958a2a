"""Incremental aggregate-state maintenance — the no-lakehouse MERGE
pattern: keep a small per-key state table of decomposable aggregates
(count / sum / min / max), fold each new batch into it with one outer
join, and never rescan history.

All four aggregates are commutative monoids, so
``merge(state(A), state(B)) == state(A union B)`` EXACTLY — provided the
sum is associative. Double sums are not (association changes low bits);
integer sums are. Callers who need exact equality across any batch split
sum in integers (e.g. cents — see queries/analytics.incremental_agg_state,
whose oracle computes the single-pass answer and hash-matches the
two-batch merge, proving the invariant end to end).

At 100 TB the state table is keyed and tiny relative to the fact stream;
the merge is one outer join on the key (broadcast when the batch is a
day's delta), and history is never re-read. AVG and friends derive from
(sum, count) at read time; non-decomposable aggregates (exact distinct,
median) need sketches instead (queries/analytics.py's HLL++/GK tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame, key: str, value_cents: str = "v_cents"
) -> DataFrame:
    """Per-key decomposable state over an exact integer value column:
    (key, n, sum_cents, min_cents, max_cents)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_cents).cast("bigint").alias("sum_cents"),
        F.min(value_cents).cast("bigint").alias("min_cents"),
        F.max(value_cents).cast("bigint").alias("max_cents"),
    )


def merge_agg_state(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Fold state ``b`` (a new batch's aggregates) into state ``a``: full
    outer join on the key, monoid-combine each aggregate. Keys absent on
    one side contribute identity values (0 for n/sum, +-inf analogues via
    coalesce for min/max)."""
    an = a.select(
        F.col(key),
        F.col("n").alias("_an"),
        F.col("sum_cents").alias("_as"),
        F.col("min_cents").alias("_amin"),
        F.col("max_cents").alias("_amax"),
    )
    bn = b.select(
        F.col(key),
        F.col("n").alias("_bn"),
        F.col("sum_cents").alias("_bs"),
        F.col("min_cents").alias("_bmin"),
        F.col("max_cents").alias("_bmax"),
    )
    j = an.join(bn, key, "full_outer")
    return j.select(
        F.col(key),
        (F.coalesce("_an", F.lit(0)) + F.coalesce("_bn", F.lit(0))).alias("n"),
        (F.coalesce("_as", F.lit(0)) + F.coalesce("_bs", F.lit(0)))
        .cast("bigint")
        .alias("sum_cents"),
        F.least(
            F.coalesce("_amin", F.col("_bmin")), F.coalesce("_bmin", F.col("_amin"))
        )
        .cast("bigint")
        .alias("min_cents"),
        F.greatest(
            F.coalesce("_amax", F.col("_bmax")), F.coalesce("_bmax", F.col("_amax"))
        )
        .cast("bigint")
        .alias("max_cents"),
    )
