"""Correlated subqueries, null semantics, and exact decimal arithmetic —
operator classes Catalyst de-correlates/handles natively (SURVEY.md §2.3/
§2.4 gap rows; the reference has none of these)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import load, register


# ---------------------------------------------------------------------------
# Correlated EXISTS (TPC-H Q4 shape): orders with at least one late lineitem.
# ---------------------------------------------------------------------------

@register(
    "orders_with_late_lineitems",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_with_late_lineitems(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_sq_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM _sq_orders o
        WHERE EXISTS (
          SELECT 1 FROM _sq_lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q2/Q17 shape): lineitems whose quantity
# is below 20% of their part's average quantity.
# ---------------------------------------------------------------------------

@register(
    "small_quantity_orders",
    """
SELECT l.l_partkey AS partkey, count(*) AS n_small,
       round(sum(l.l_extendedprice), 2) AS total_price
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
ORDER BY partkey
""",
)
def small_quantity_orders(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_sq_li2")
    return spark.sql(
        """
        SELECT l.l_partkey AS partkey, count(*) AS n_small,
               round(sum(l.l_extendedprice), 2) AS total_price
        FROM _sq_li2 l
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM _sq_li2 l2
          WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        ORDER BY partkey
        """
    )


# ---------------------------------------------------------------------------
# NULL semantics: count(*) vs count(col), null-skipping aggregates,
# coalesce, NULL-safe equality buckets.
# ---------------------------------------------------------------------------

@register(
    "null_semantics_agg",
    """
WITH e AS (
  SELECT event_type,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_type,
       count(*) AS n_rows,
       count(v) AS n_nonnull,
       round(sum(v), 2) AS sum_v,
       round(avg(v), 4) AS avg_v,
       round(sum(coalesce(v, 0.0)), 2) AS sum_coalesced,
       count(CASE WHEN v IS NULL THEN 1 END) AS n_null
FROM e
GROUP BY event_type
ORDER BY event_type
""",
)
def null_semantics_agg(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("value"))
    e = events.select("event_type", v.alias("v"))
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_nonnull"),
            F.round(F.sum("v"), 2).alias("sum_v"),
            F.round(F.avg("v"), 4).alias("avg_v"),
            F.round(F.sum(F.coalesce(F.col("v"), F.lit(0.0))), 2).alias("sum_coalesced"),
            F.count(F.when(F.col("v").isNull(), 1)).alias("n_null"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Exact decimal aggregation: DECIMAL(18,2) sums are associative-exact, so no
# rounding is needed for cross-engine parity (contrast: double sums).
# The final cast to DOUBLE is presentation-only (pandas bridges disagree on
# Decimal objects); the aggregation itself is exact.
# ---------------------------------------------------------------------------

@register(
    "decimal_exact_totals",
    """
SELECT o_orderstatus,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS total_exact,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def decimal_exact_totals(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_exact"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar AVG subquery threshold + NOT EXISTS anti-join,
# bucketed by a name suffix (the fixture has no phone column).
# ---------------------------------------------------------------------------

@register(
    "idle_customer_balance",
    """
SELECT right(c.c_name, 1) AS name_bucket,
       count(*) AS n_custs,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c
WHERE c.c_acctbal > (
  SELECT round(avg(c2.c_acctbal), 6)
  FROM customer c2 WHERE c2.c_acctbal > 0.0
)
AND NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY 1
ORDER BY 1
""",
)
def idle_customer_balance(spark, sf_dir):
    """TPC-H Q22: above-average-balance customers with no URGENT orders
    (every fixture customer has some order, so the classic no-orders
    predicate is vacuous here; the anti-join shape is identical); the AVG
    threshold is rounded identically on both sides — an unrounded
    order-dependent double avg is an unpinned cross-engine compare. Catalyst
    plans the scalar subquery as a 1-row broadcast and the NOT EXISTS as a
    left-anti hash join — the anti side never shuffles the big table when
    the order-key list broadcasts."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_sq_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders22")
    return spark.sql(
        """
        SELECT right(c.c_name, 1) AS name_bucket,
               count(*) AS n_custs,
               round(sum(c.c_acctbal), 2) AS total_bal
        FROM _sq_customer c
        WHERE c.c_acctbal > (
          SELECT round(avg(c2.c_acctbal), 6)
          FROM _sq_customer c2 WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM _sq_orders22 o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        GROUP BY 1
        ORDER BY 1
        """
    )
