"""Reshaping + ranking + fuzzy-string queries: pivot, unpivot, ntile,
edit-distance blocking (rounding out §2.4/§2.7 and the dedup toolbox)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .._registry_core import load, register


# ---------------------------------------------------------------------------
# PIVOT: order counts per segment x status (oracle: conditional aggregation).
# ---------------------------------------------------------------------------

_STATUSES = ("F", "O", "P")


@register(
    "pivot_status_by_segment",
    f"""
SELECT c.c_mktsegment AS segment,
       {", ".join(f"count(CASE WHEN o.o_orderstatus = '{s}' THEN 1 END) AS n_{s}" for s in _STATUSES)}
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1
ORDER BY segment
""",
)
def pivot_status_by_segment(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), cust["c_custkey"] == orders["o_custkey"])
    pivoted = (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", list(_STATUSES))
        .count()
    )
    # pivot leaves null for empty cells; count-style semantics want 0
    return pivoted.select(
        "segment",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _STATUSES],
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# UNPIVOT (melt): lineitem measures to long form + per-measure stats.
# ---------------------------------------------------------------------------

@register(
    "unpivot_lineitem_measures",
    """
WITH long AS (
  SELECT 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT 'discount', l_discount FROM lineitem
)
SELECT measure, count(*) AS n, round(sum(val), 2) AS total,
       round(min(val), 4) AS min_val, round(max(val), 4) AS max_val
FROM long
GROUP BY measure
ORDER BY measure
""",
)
def unpivot_lineitem_measures(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure_raw",
        "val",
    ).withColumn(
        "measure",
        F.expr("substring(measure_raw, 3)"),  # strip 'l_' prefix
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("val"), 2).alias("total"),
            F.round(F.min("val"), 4).alias("min_val"),
            F.round(F.max("val"), 4).alias("max_val"),
        )
        .orderBy("measure")
    )


# ---------------------------------------------------------------------------
# NTILE + PERCENT_RANK: decile assignment over order values.
# ---------------------------------------------------------------------------

@register(
    "order_value_deciles",
    """
WITH ranked AS (
  SELECT o_orderkey, o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
         percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
  FROM orders
)
SELECT decile, count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi,
       round(max(pr), 6) AS max_pr
FROM ranked
GROUP BY decile
ORDER BY decile
""",
)
def order_value_deciles(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pr"),
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.max("pr"), 6).alias("max_pr"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching: near-identical source labels via levenshtein
# (the string-similarity tier of the dedup toolbox; blocked by first char to
# show the blocking pattern).
# ---------------------------------------------------------------------------

@register(
    "fuzzy_source_pairs",
    """
WITH s AS (SELECT DISTINCT source FROM documents)
SELECT a.source AS src_a, b.source AS src_b,
       levenshtein(a.source, b.source) AS dist
FROM s a JOIN s b
  ON substr(a.source, 1, 3) = substr(b.source, 1, 3) AND a.source < b.source
WHERE levenshtein(a.source, b.source) <= 2
ORDER BY src_a, src_b
""",
)
def fuzzy_source_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    s = docs.select("source").distinct()
    a = s.select(F.col("source").alias("src_a"))
    b = s.select(F.col("source").alias("src_b"))
    joined = a.join(
        b,
        (F.substring("src_a", 1, 3) == F.substring("src_b", 1, 3))
        & (F.col("src_a") < F.col("src_b")),
    )
    return (
        joined.select(
            "src_a", "src_b", F.levenshtein("src_a", "src_b").alias("dist")
        )
        .filter(F.col("dist") <= 2)
        .orderBy("src_a", "src_b")
    )



# ---------------------------------------------------------------------------
# Snapshot diff (CDC-style): old vs new table states compared by content
# hash through ONE full-outer join on the key — the added/removed/changed
# report every incremental pipeline needs before publishing a new corpus
# snapshot. The "new" snapshot is derived in-query (deterministic edits:
# drop doc_id%13, rewrite text for doc_id%11, append shifted ids) so the
# oracle replays both sides arithmetically.
# ---------------------------------------------------------------------------

@register(
    "table_snapshot_diff",
    """
WITH old_s AS (
  SELECT doc_id, md5(text) AS h FROM documents
),
new_s AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS h
  FROM documents WHERE doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, md5(text) AS h
  FROM documents WHERE doc_id % 17 = 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM old_s o FULL OUTER JOIN new_s n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h != n.h
ORDER BY doc_id
""",
)
def table_snapshot_diff(spark, sf_dir):
    """One key-partitioned full-outer join, hash compare in the join
    output — no row ever crosses the wire twice. At 100 TB both snapshots
    bucket by the key so the join is co-located; the content hash rides
    the scan (or is a stored column, as api.create_database stores it)."""
    docs = load(spark, sf_dir, "documents")
    old_s = docs.select("doc_id", F.md5("text").alias("h"))
    new_s = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
                ).otherwise(F.col("text"))
            ).alias("h"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 500000).alias("doc_id"), F.md5("text").alias("h")
            )
        )
    )
    o = old_s.alias("o")
    n = new_s.alias("n")
    j = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
    change = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .otherwise(F.lit("changed"))
    )
    return (
        j.filter(
            F.col("o.doc_id").isNull()
            | F.col("n.doc_id").isNull()
            | (F.col("o.h") != F.col("n.h"))
        )
        .select(
            F.coalesce(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc_id"),
            change.alias("change"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Data-quality constraint suite (the expectations/dbt-test pattern): each
# constraint is one aggregate over its table; the report is a UNION of
# single-row summaries — null checks, domain ranges, key uniqueness and
# referential integrity (orphan FK anti-join), each with checked/violation
# counts and a pass flag.
# ---------------------------------------------------------------------------

@register(
    "dq_constraint_report",
    """
WITH checks AS (
  SELECT 'orders_custkey_not_null' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations
  FROM orders
  UNION ALL
  SELECT 'lineitem_discount_in_0_1',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'orders_orderkey_unique',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem_orderkey_fk',
         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
         CAST((SELECT COUNT(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
)
SELECT check_name, n_checked, n_violations,
       CAST(n_violations = 0 AS INT) AS passed
FROM checks
ORDER BY check_name
""",
)
def dq_constraint_report(spark, sf_dir):
    """Constraint suite as one plan: aggregates union'd into a report.
    The FK check is a broadcast-able anti-join count; every check is a
    single pass over its table and they run concurrently under AQE."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    c1 = orders.agg(
        F.lit("orders_custkey_not_null").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
    )
    c2 = lineitem.agg(
        F.lit("lineitem_discount_in_0_1").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
    )
    c3 = orders.agg(
        F.lit("orders_orderkey_unique").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("n_violations"),
    )
    orphans = lineitem.join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    c4 = lineitem.agg(F.count(F.lit(1)).cast("long").alias("n_checked")).crossJoin(
        orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    ).select(
        F.lit("lineitem_orderkey_fk").alias("check_name"),
        "n_checked",
        "n_violations",
    )
    report = c1.unionByName(c2).unionByName(c3).unionByName(c4)
    return report.select(
        "check_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    ).orderBy("check_name")


# ---------------------------------------------------------------------------
# SCD2 dimension versioning (operators/incremental.scd2_merge): apply a
# deterministic "day 2" customer snapshot (balance bump for key%7,
# segment flip for key%11, delete key%31, insert key%53 clones) to the
# version-1 dimension and emit the full history. Integer version stamps
# and BIGINT cents keep every value engine-exact; the oracle replays the
# same full-outer CASE split.
# ---------------------------------------------------------------------------

_SCD2_OPEN = 99_999


@register(
    "scd2_customer_history",
    f"""
WITH v1 AS (
  SELECT c_custkey AS k,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
         c_mktsegment AS segment,
         CAST(1 AS BIGINT) AS valid_from,
         CAST({_SCD2_OPEN} AS BIGINT) AS valid_to,
         CAST(1 AS INT) AS is_current
  FROM customer
),
snap AS (
  SELECT c_custkey AS k,
         CAST(round(c_acctbal * 100) AS BIGINT)
           + CASE WHEN c_custkey % 7 = 0 THEN 12345 ELSE 0 END AS acctbal_cents,
         CASE WHEN c_custkey % 11 = 0 THEN 'SEGX' ELSE c_mktsegment END
           AS segment
  FROM customer WHERE c_custkey % 31 != 0
  UNION ALL
  SELECT c_custkey + 900000 AS k,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
         c_mktsegment AS segment
  FROM customer WHERE c_custkey % 53 = 0
),
j AS (
  SELECT v.k AS ck, v.acctbal_cents AS cb, v.segment AS cs,
         v.valid_from AS cvf,
         s.k AS sk, s.acctbal_cents AS sb, s.segment AS ss,
         (v.acctbal_cents IS NOT DISTINCT FROM s.acctbal_cents
          AND v.segment IS NOT DISTINCT FROM s.segment) AS same
  FROM v1 v FULL OUTER JOIN snap s ON v.k = s.k
),
merged AS (
  SELECT ck AS k, cb AS acctbal_cents, cs AS segment,
         cvf AS valid_from, CAST({_SCD2_OPEN} AS BIGINT) AS valid_to,
         CAST(1 AS INT) AS is_current
  FROM j WHERE ck IS NOT NULL AND sk IS NOT NULL AND same
  UNION ALL
  SELECT ck, cb, cs, cvf, CAST(2 AS BIGINT), CAST(0 AS INT)
  FROM j WHERE ck IS NOT NULL AND (sk IS NULL OR NOT same)
  UNION ALL
  SELECT sk, sb, ss, CAST(2 AS BIGINT), CAST({_SCD2_OPEN} AS BIGINT),
         CAST(1 AS INT)
  FROM j WHERE sk IS NOT NULL AND (ck IS NULL OR NOT same)
)
SELECT k, acctbal_cents, segment, valid_from, valid_to, is_current
FROM merged
ORDER BY k, valid_from
""",
)
def scd2_customer_history(spark, sf_dir):
    """Nightly dimension maintenance: one co-partitionable full-outer join
    turns (current rows x snapshot) into survive/close/open row sets;
    closed history passes through as a pure scan. Integer versions, INT
    flags and BIGINT cents — no timestamp or float parity exposure."""
    from ..operators.incremental import scd2_merge

    cust = load(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    v1 = cust.select(
        F.col("c_custkey").alias("k"),
        cents.alias("acctbal_cents"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(1).cast("long").alias("valid_from"),
        F.lit(_SCD2_OPEN).cast("long").alias("valid_to"),
        F.lit(1).cast("int").alias("is_current"),
    )
    snap = (
        cust.filter(F.col("c_custkey") % 31 != 0)
        .select(
            F.col("c_custkey").alias("k"),
            (
                cents
                + F.when(F.col("c_custkey") % 7 == 0, 12345).otherwise(0)
            ).alias("acctbal_cents"),
            F.when(F.col("c_custkey") % 11 == 0, "SEGX")
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 53 == 0).select(
                (F.col("c_custkey") + 900000).alias("k"),
                cents.alias("acctbal_cents"),
                F.col("c_mktsegment").alias("segment"),
            )
        )
    )
    out = scd2_merge(
        v1, snap, "k", ["acctbal_cents", "segment"], version=2,
        open_version=_SCD2_OPEN,
    )
    return out.select(
        "k", "acctbal_cents", "segment", "valid_from", "valid_to",
        "is_current",
    ).orderBy("k", "valid_from")
