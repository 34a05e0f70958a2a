"""Reshaping + ranking + fuzzy-string queries: pivot, unpivot, ntile,
edit-distance blocking (rounding out §2.4/§2.7 and the dedup toolbox)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import load, register


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
