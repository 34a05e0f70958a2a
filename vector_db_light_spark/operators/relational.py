"""Relational operators the reference implies but never generalizes
(SURVEY.md §2.3 gap row, §2.7): as-of join, range self-join, sessionization.

All three are written for the 100 TB case:
  * ``asof_join`` uses the union+window merge technique — one shuffle on the
    key, no |L|x|R| theta join, no per-key fan-out. This is how you as-of
    join a 10^11-row event table to a 10^9-row dim without melting the
    cluster.
  * ``range_self_join`` bins timestamps so Spark gets an equi-join on
    (key, bucket) instead of a nested-loop theta join; the exact predicate
    is re-applied post-join. Result set is identical to the naive theta
    join; cost is linear in matches instead of quadratic in partition size.
  * ``sessionize`` is a single window pass (lag -> gap flag -> running sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` (inclusive) for the same key.

    Implementation: tag both sides, union, sort each key partition once by
    (ts, side) and carry the last-seen right payload forward with
    ``last(..., ignorenulls=True)``. Left rows with no prior right row are
    dropped (inner as-of semantics, matching DuckDB's ASOF JOIN).

    Right rows that tie on (key, right_ts) are deduplicated to the one with
    the greatest first payload column, making results deterministic (DuckDB
    leaves this unspecified).
    """
    lpre = "_l_"
    first_payload = payload[0]
    right_dedup = (
        right.groupBy(right_key, right_ts)
        .agg(F.max_by(F.struct(*payload), first_payload).alias("_payload"))
    )
    r = right_dedup.select(
        F.col(right_key).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.col("_payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"{lpre}{c}")
            for c in left.columns
        ],
    )
    l = left.select(
        F.col(left_key).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"{lpre}{c}") for c in left.columns],
    )
    # At equal timestamps the right row must sort first iff the bound is
    # inclusive (ts >= right_ts), else after the left row.
    side_order = F.col("_is_right").desc() if inclusive else F.col("_is_right").asc()
    w = (
        Window.partitionBy("_key")
        .orderBy(F.col("_ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        "_matched", F.last("_payload", ignorenulls=True).over(w)
    )
    out = merged.filter((F.col("_is_right") == 0) & F.col("_matched").isNotNull())
    return out.select(
        *[F.col(f"{lpre}{c}").alias(c) for c in left.columns],
        *[F.col("_matched")[c].alias(c) for c in payload],
    )


def range_self_join(
    df: DataFrame,
    key: str,
    ts_col: str,
    max_gap_seconds: float,
    id_col: str,
) -> DataFrame:
    """All ordered pairs (a, b) with the same key and
    ``a.ts < b.ts <= a.ts + max_gap``.

    Scale path: equi-join on (key, time bucket) with each left row probing
    its own bucket and the next one, then the exact range predicate — the
    result is exactly the theta join's, but Catalyst executes a hash join.
    """
    gap_us = int(max_gap_seconds * 1_000_000)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    a = df.select(
        F.col(key).alias("_k"),
        us.alias("_us_a"),
        F.col(id_col).alias("id_a"),
        F.floor(us / gap_us).alias("_bucket"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("_probe"),
    ).withColumn("_bucket", F.col("_bucket") + F.col("_probe"))
    b = df.select(
        F.col(key).alias("_k2"),
        us.alias("_us_b"),
        F.col(id_col).alias("id_b"),
        F.floor(us / gap_us).alias("_bucket2"),
    )
    joined = a.join(
        b,
        (F.col("_k") == F.col("_k2")) & (F.col("_bucket") == F.col("_bucket2")),
    )
    return (
        joined.filter(
            (F.col("_us_a") < F.col("_us_b"))
            & (F.col("_us_b") <= F.col("_us_a") + F.lit(gap_us))
        )
        .select(F.col("_k").alias(key), "id_a", "id_b")
    )


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: salt the big side's key, replicate the
    small side across all salt values, join on (key, salt). Result set is
    identical to the plain join; a single hot key's rows now spread over
    ``n_salts`` tasks instead of one straggler.

    ``salt_from`` names a big-side column to derive the salt from
    (``pmod(xxhash64(col), n)`` — deterministic, partition-independent,
    retry-stable); without it the salt comes from
    ``monotonically_increasing_id`` (fine for distribution, but the salt
    assignment then varies across retries/repartitions — prefer a real
    id column). ``how`` supports inner/left (replicating the small side
    makes right/full outer semantics wrong by construction — rejected).

    (AQE's skew-join split handles oversized shuffle partitions
    automatically, but cannot split ONE key's partition; explicit salting
    is the fix when a single key exceeds an executor, and for
    aggregations-after-join AQE can't rewrite.)
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt_src = (
        F.xxhash64(salt_from)
        if salt_from is not None
        else F.xxhash64(F.monotonically_increasing_id())
    )
    salted_big = big.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)))
    replicated = skewed_small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(
        replicated,
        (salted_big[big_key] == replicated[small_key])
        & (salted_big["_salt"] == replicated["_salt"]),
        how,
    )
    return out.drop("_salt")


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign 1-based session ids per key: a new session starts when the gap
    to the previous event exceeds ``gap_seconds``. One window pass."""
    w = Window.partitionBy(key).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def ewma_per_key(
    df,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.2,
):
    """Per-key exponentially weighted moving average — the recurrence
    e_i = alpha*v_i + (1-alpha)*e_{i-1} (e_0 = v_0) expressed as a
    deterministic left fold over the key's time-ordered values:
    ``sort_array(collect_list(struct(order..., value)))`` then
    ``aggregate`` seeded with the first element.

    Returns (key, n_events, last_value, ewma).

    Recurrences are not window-expressible (no windowed "previous RESULT"
    in SQL), so the honest options are this collect+fold (state = one
    key's history; right whenever per-key cardinality is bounded, as with
    user/session/device series) or applyInPandas for unbounded keys. ONE
    shuffle on the key either way. The fold order is pinned by the struct
    sort (order cols first), so doubles come out bit-identical to an
    oracle running the same left fold — no rounding needed.
    """
    lst = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c) for c in order_cols],
                F.col(value_col).cast("double").alias("v"),
            )
        )
    )
    grouped = df.groupBy(key_col).agg(lst.alias("_lst"))
    vals = F.transform(F.col("_lst"), lambda s: s["v"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return grouped.select(
        F.col(key_col),
        F.size("_lst").cast("bigint").alias("n_events"),
        F.element_at(vals, F.size(vals)).alias("last_value"),
        ewma.alias("ewma"),
    )


def key_skew_stats(df: DataFrame, key_col: str, label: str) -> DataFrame:
    """1-row skew diagnostic for a join/aggregation key — the number that
    decides whether a 100 TB shuffle on this key needs salting or AQE skew
    handling BEFORE the job runs, not after it straggles:

      * ``top1_share_u6`` / ``top10_share_u6`` — integer micro-unit share
        of the hottest key(s): the single-partition ceiling a shuffle on
        this key cannot beat;
      * ``gini_u6`` — Gini coefficient of the key-count distribution in
        micro-units, all-BIGINT: with counts ranked ascending,
        ``gini = (2*Σ rank*c - (K+1)*T) / (K*T)`` — Σ rank*c is invariant
        under permutation of tied counts, so the statistic is
        deterministic with no tie-break subtleties.

    Shape: one (key) count shuffle, then window/aggregate passes over the
    KEY-cardinality table (dictionary-scale; the two rank windows are
    single-partition over keys, acceptable up to ~1e8 distinct keys —
    beyond that, bucket the rank with the two-level prefix-sum pattern
    from operators/packing.py). BIGINT headroom: Σ rank*c <= K*T caps the
    accumulators at keys x rows < 9.2e18; the Gini scaling divides by
    T BEFORE multiplying by 1e6 (nested-floor identity
    ``floor(a/(K*T)) == floor(floor(a/T)/K)``), so the scaled terms stay
    under 2^63 while rows < 9.2e12 regardless of key count. This is the
    profiling pass a pipeline runs once per fact table and caches with
    its stats."""
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    w_rank = Window.orderBy(F.col("_c").asc(), F.col("_k").asc())
    w_desc = Window.orderBy(F.col("_c").desc(), F.col("_k").asc())
    ranked = counts.select(
        "_c",
        F.row_number().over(w_rank).cast("long").alias("_i"),
        F.row_number().over(w_desc).cast("long").alias("_rd"),
    )
    return ranked.agg(
        F.lit(label).alias("key_name"),
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.expr("(max(case when _rd = 1 then _c else 0 end) * 1000000)"
               " div sum(_c)").cast("long").alias("top1_share_u6"),
        F.expr("(sum(case when _rd <= 10 then _c else 0 end) * 1000000)"
               " div sum(_c)").cast("long").alias("top10_share_u6"),
        # num*1e6 div (K*T) rewritten via the nested-floor identity so no
        # intermediate exceeds max(num, rows*1e6): num div T is <= K, and
        # (num % T)*1e6 < rows*1e6.
        F.expr(
            "(((2 * sum(_i * _c) - (count(*) + 1) * sum(_c)) div sum(_c))"
            " * 1000000"
            " + (((2 * sum(_i * _c) - (count(*) + 1) * sum(_c)) % sum(_c))"
            " * 1000000) div sum(_c)) div count(*)"
        ).cast("long").alias("gini_u6"),
    )


def multi_touch_attribution(
    events: DataFrame,
    window_seconds: int = 86_400,
    purchase_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    item_expr: str = "coalesce(cast(get_json_object(props, '$.k') as bigint), -1)",
) -> DataFrame:
    """Multi-touch conversion attribution with EXACT integer credit
    accounting: every ``purchase_type`` event distributes exactly
    1,000,000 credit micro-units over that user's ``touch_types`` events
    in the preceding ``window_seconds``, under two standard models:

      * linear    — equal split, remainder to the LAST touch;
      * U-shaped  — 40% first touch, 40% last, 20% split over the middle
                    (n=1 -> 100%; n=2 -> 50/50), middle remainder to the
                    last touch.

    The remainder rules make every purchase's credits sum to exactly 1e6,
    so the global invariant Σcredit = 1e6 x attributed-purchases holds in
    BIGINTs on any engine and partitioning (pinned by test). Touch order
    is (ts, event_id) with strict precedence over the purchase (ties on
    ts break by event_id), so ranking is total.

    Dataflow: the purchase->touch window join is an equi-join on (user,
    time bucket) with each purchase probing its own bucket and the
    previous one (bucket width == window; the range_self_join pattern),
    then the exact predicate — a hash join at any scale, never a theta
    join. Credit arithmetic is one per-purchase window pass; the output
    aggregate is per touched item. Returns (item, n_touches, linear_u6,
    ushape_u6)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w_us = window_seconds * 1_000_000
    p = events.filter(F.col("event_type") == purchase_type).select(
        F.col("user_id").alias("_u"),
        us.alias("_pus"),
        F.col("event_id").alias("_pid"),
        F.floor(us / w_us).cast("long").alias("_bucket"),
        F.explode(F.array(F.lit(0), F.lit(-1))).alias("_probe"),
    ).withColumn("_bucket", F.col("_bucket") + F.col("_probe"))
    t = events.filter(F.col("event_type").isin(list(touch_types))).select(
        F.col("user_id").alias("_u"),
        us.alias("_tus"),
        F.col("event_id").alias("_tid"),
        F.expr(item_expr).alias("item"),
        F.floor(us / w_us).cast("long").alias("_bucket"),
    )
    pairs = p.join(t, ["_u", "_bucket"]).filter(
        (F.col("_tus") >= F.col("_pus") - w_us)
        & (
            (F.col("_tus") < F.col("_pus"))
            | ((F.col("_tus") == F.col("_pus")) & (F.col("_tid") < F.col("_pid")))
        )
    )
    w = Window.partitionBy("_pid").orderBy(F.col("_tus").asc(), F.col("_tid").asc())
    ranked = pairs.select(
        "item",
        F.col("_pid"),
        F.row_number().over(w).cast("long").alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy("_pid")).cast("long").alias("_n"),
    )
    linear = F.expr(
        "case when _rk < _n then 1000000 div _n"
        " else 1000000 - (1000000 div _n) * (_n - 1) end"
    )
    ushape = F.expr(
        """case
             when _n = 1 then 1000000
             when _n = 2 then 500000
             when _rk = 1 then 400000
             when _rk = _n then 400000 + 200000 - (200000 div (_n - 2)) * (_n - 2)
             else 200000 div (_n - 2)
           end"""
    )
    return ranked.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(linear).cast("long").alias("linear_u6"),
        F.sum(ushape).cast("long").alias("ushape_u6"),
    )


def cusum_per_key(
    df,
    key_col: str,
    order_cols: list[str],
    dev_col: str,
):
    """One-sided CUSUM drift statistic per key, WINDOW-expressible via
    the prefix-sum closed form: with x_t the (already mean/slack-shifted)
    integer deviations in time order, the recurrence
    S_t = max(0, S_{t-1} + x_t) equals P_t - min(0, min_{j<=t} P_j) for
    prefix sums P — so the whole scan is two running windows + one
    group-agg, no collect_list fold, no per-key state bound (unlike
    ewma_per_key's genuine recurrence, CUSUM's max(0, .) clamp has this
    closed form). All-BIGINT, so both engines agree bit-for-bit under
    any partitioning. Returns (key, n_events, s_final, s_max)."""
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two projections: a running min OF a running sum is a window over a
    # window expression, which neither engine accepts in one SELECT
    scanned = df.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        F.sum(F.col(dev_col)).over(w).cast("long").alias("_p"),
    )
    s = (
        F.col("_p")
        - F.least(F.lit(0).cast("long"), F.min("_p").over(w).cast("long"))
    ).cast("long")
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    return (
        scanned.select(
            F.col(key_col), ord_struct.alias("_ord"), s.alias("_s")
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max_by("_s", F.col("_ord")).cast("long").alias("s_final"),
            F.max("_s").cast("long").alias("s_max"),
        )
    )
