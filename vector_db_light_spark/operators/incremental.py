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


def scd2_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    key_col: str,
    attr_cols: list[str],
    version: int,
    open_version: int = 99_999,
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply ``snapshot`` (key +
    attrs, stamped ``version``) to the versioned ``dim`` table (key +
    attrs + valid_from/valid_to/is_current, ``open_version`` marking open
    rows) and return the new history.

    Semantics per key, derived from ONE full-outer join of the CURRENT
    rows against the snapshot (closed history rows pass through
    untouched):

      * attrs unchanged      -> current row survives as-is;
      * attrs changed        -> old row closes (valid_to = version),
                                a new open row starts at ``version``;
      * key absent from snap -> old row closes (a delete);
      * key new in snap      -> a new open row starts.

    Versions are INTEGER snapshot stamps, not timestamps — exact on every
    engine (the CLAUDE.md timestamp-parity rules never engage), and
    ``is_current`` is an INT 1/0 for the same reason. Attribute equality
    is null-safe (``<=>``). Scale shape: bucket both sides by the key
    and the join is co-located; history pass-through is a pure scan —
    the standard SCD2 shape incremental dimension ETL runs nightly."""
    cur = dim.filter(F.col("valid_to") == open_version)
    closed = dim.filter(F.col("valid_to") != open_version)
    c = cur.alias("c")
    s = snapshot.alias("s")
    j = c.join(s, F.col("c." + key_col) == F.col("s." + key_col), "full_outer")
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col("c." + a).eqNullSafe(F.col("s." + a))
    in_cur = F.col("c." + key_col).isNotNull()
    in_snap = F.col("s." + key_col).isNotNull()

    # surviving current rows (unchanged)
    keep = j.filter(in_cur & in_snap & same).select(
        *[F.col("c." + x) for x in [key_col, *attr_cols]],
        F.col("c.valid_from").alias("valid_from"),
        F.col("c.valid_to").alias("valid_to"),
        F.col("c.is_current").alias("is_current"),
    )
    # closing rows: changed or deleted
    close = j.filter(in_cur & (~in_snap | ~same)).select(
        *[F.col("c." + x) for x in [key_col, *attr_cols]],
        F.col("c.valid_from").alias("valid_from"),
        F.lit(version).cast("long").alias("valid_to"),
        F.lit(0).cast("int").alias("is_current"),
    )
    # opening rows: changed or brand new
    opened = j.filter(in_snap & (~in_cur | ~same)).select(
        *[F.col("s." + x) for x in [key_col, *attr_cols]],
        F.lit(version).cast("long").alias("valid_from"),
        F.lit(open_version).cast("long").alias("valid_to"),
        F.lit(1).cast("int").alias("is_current"),
    )
    return closed.unionByName(keep).unionByName(close).unionByName(opened)


def scd2_upsert(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    version: int,
    open_version: int = 99_999,
    delete_col: str | None = None,
    seq_col: str | None = None,
    seq_state_col: str = "src_seq",
) -> DataFrame:
    """CDC-upsert variant of :func:`scd2_merge` for STREAMING dimension
    maintenance: ``changes`` is a partial batch (upserts, plus optional
    tombstone rows flagged by ``delete_col``), so keys ABSENT from the
    batch survive untouched — absence means "no news", not "deleted"
    (full-snapshot delete detection is :func:`scd2_merge`'s job).

      * key not in batch        -> current row survives;
      * attrs unchanged         -> current row survives;
      * attrs changed           -> old closes at ``version``, new opens;
      * new key                 -> new open row;
      * tombstone               -> old closes, nothing opens.

    When ``seq_col`` is given, the dimension additionally carries
    ``seq_state_col`` — the source sequence of the change each row was
    last written by. Opened/inserted rows stamp the batch row's seq; a
    tombstone close re-stamps the closed row with the TOMBSTONE's seq (so
    the per-key max over the whole table is always the latest applied
    change, even when nothing stays open). The staleness DECISION lives in
    the streaming layer (streaming/dimensions.py pre-filters the batch
    against that per-key max); this function only maintains the ledger.

    Same shape: one key-join of current rows against the batch (LEFT from
    current + anti-joined batch-only inserts), closed history passes
    through as a scan."""
    cur = dim.filter(F.col("valid_to") == open_version)
    closed = dim.filter(F.col("valid_to") != open_version)
    is_del = (
        F.col("s." + delete_col) if delete_col else F.lit(False)
    )
    c = cur.alias("c")
    s = changes.alias("s")
    j = c.join(s, F.col("c." + key_col) == F.col("s." + key_col), "left")
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col("c." + a).eqNullSafe(F.col("s." + a))
    in_batch = F.col("s." + key_col).isNotNull()

    def _seq(*exprs):
        """Optional seq_state_col projections (empty when untracked)."""
        return list(exprs) if seq_col else []

    keep = j.filter(~in_batch | (same & ~F.coalesce(is_del, F.lit(False)))).select(
        *[F.col("c." + x) for x in [key_col, *attr_cols]],
        F.col("c.valid_from").alias("valid_from"),
        F.col("c.valid_to").alias("valid_to"),
        F.col("c.is_current").alias("is_current"),
        *_seq(F.col("c." + seq_state_col) if seq_col else None),
    )
    touched = in_batch & (~same | F.coalesce(is_del, F.lit(False)))
    close = j.filter(touched).select(
        *[F.col("c." + x) for x in [key_col, *attr_cols]],
        F.col("c.valid_from").alias("valid_from"),
        F.lit(version).cast("long").alias("valid_to"),
        F.lit(0).cast("int").alias("is_current"),
        *_seq(
            F.when(
                F.coalesce(is_del, F.lit(False)), F.col("s." + seq_col)
            ).otherwise(F.col("c." + seq_state_col)).alias(seq_state_col)
            if seq_col
            else None
        ),
    )
    reopen = j.filter(touched & ~F.coalesce(is_del, F.lit(False))).select(
        *[F.col("s." + x) for x in [key_col, *attr_cols]],
        F.lit(version).cast("long").alias("valid_from"),
        F.lit(open_version).cast("long").alias("valid_to"),
        F.lit(1).cast("int").alias("is_current"),
        *_seq(
            F.col("s." + seq_col).alias(seq_state_col) if seq_col else None
        ),
    )
    inserts = (
        s.join(c, F.col("s." + key_col) == F.col("c." + key_col), "left_anti")
        .filter(~F.coalesce(is_del, F.lit(False)))
        .select(
            *[F.col("s." + x) for x in [key_col, *attr_cols]],
            F.lit(version).cast("long").alias("valid_from"),
            F.lit(open_version).cast("long").alias("valid_to"),
            F.lit(1).cast("int").alias("is_current"),
            *_seq(F.col(seq_col).alias(seq_state_col) if seq_col else None),
        )
    )
    merged = (
        closed.unionByName(keep)
        .unionByName(close)
        .unionByName(reopen)
        .unionByName(inserts)
    )
    if seq_col and delete_col:
        # Ledger rule (ADVICE r10): a tombstone whose key has NO current
        # row (never seen, or already tombstoned) still advances the
        # per-key applied-seq ledger — otherwise a LATER batch carrying a
        # STALE resurrection (lower source seq) finds no applied seq and
        # is applied as fresh. Record it as a zero-width closed "ghost"
        # row (valid_from == valid_to, never current) carrying the
        # tombstone's seq; the streaming pre-filter then rejects anything
        # at or below it.
        ghosts = (
            s.join(c, F.col("s." + key_col) == F.col("c." + key_col), "left_anti")
            .filter(F.coalesce(F.col("s." + delete_col), F.lit(False)))
            .select(
                *[F.col("s." + x) for x in [key_col, *attr_cols]],
                F.lit(version).cast("long").alias("valid_from"),
                F.lit(version).cast("long").alias("valid_to"),
                F.lit(0).cast("int").alias("is_current"),
                F.col("s." + seq_col).cast("long").alias(seq_state_col),
            )
        )
        merged = merged.unionByName(ghosts)
    return merged
