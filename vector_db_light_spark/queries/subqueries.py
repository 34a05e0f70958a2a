"""Correlated subqueries, null semantics, and exact decimal arithmetic —
operator classes Catalyst de-correlates/handles natively (SURVEY.md §2.3/
§2.4 gap rows; the reference has none of these)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .._registry_core import load, register


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


# ---------------------------------------------------------------------------
# TPC-H Q4: EXISTS-per-order WITH an outer date window — the decorrelation
# must compose with partition-prunable pushdown on the probe side (the
# window lands in the orders scan's PushedFilters; the EXISTS becomes a
# left-semi hash join). The fixture has no commitdate/receiptdate, so
# "late" is l_shipdate > o_orderdate, as in orders_with_late_lineitems.
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM {orders} o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM {lineitem} l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_priority_count", _Q4_SQL.format(orders="orders", lineitem="lineitem"))
def q4_priority_count(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("_q4_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_q4_lineitem")
    return spark.sql(_Q4_SQL.format(orders="_q4_orders", lineitem="_q4_lineitem"))


# ---------------------------------------------------------------------------
# TPC-H Q17: correlated scalar AVG per part, filtered by a part-dim
# predicate — Catalyst decorrelates the scalar subquery into an aggregate
# + join on partkey. Money is exact BIGINT cents (per-row round, integer
# sum); the weekly average uses integer division (Spark `div` == DuckDB
# `//`) so no double summation order leaks. The avg(l_quantity) threshold
# is safe unrounded: quantities are small integers stored as doubles, so
# their sum (and thus avg) is exact in any order.
# ---------------------------------------------------------------------------

_Q17_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) {div} 7
         AS BIGINT) AS avg_weekly_cents
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM {lineitem} l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@register(
    "q17_small_quantity_revenue",
    _Q17_SQL.format(lineitem="lineitem", part="part", div="//"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_q17_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("_q17_part")
    return spark.sql(
        _Q17_SQL.format(lineitem="_q17_lineitem", part="_q17_part", div="div")
    )


# ---------------------------------------------------------------------------
# TPC-H Q20: the nested semi-join chain — suppliers IN (heavy shippers of
# parts IN (a part-type slice)) AND nation IN (a nation slice). Catalyst
# turns both IN-subqueries into left-semi joins; the inner GROUP BY/HAVING
# aggregates BEFORE the semi-join so the supplier table never explodes.
# sum(l_quantity) is exact (integer-valued doubles).
# ---------------------------------------------------------------------------

_Q20_SQL = """
SELECT s.s_suppkey, s.s_name,
       CAST(round(s.s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
FROM {supplier} s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey FROM {lineitem} l
  WHERE l.l_partkey IN (
    SELECT p_partkey FROM {part} WHERE p_type = 'PROMO'
  )
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 60
)
AND s.s_nationkey IN (
  SELECT n_nationkey FROM {nation}
  WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
)
ORDER BY s.s_suppkey
"""


@register(
    "q20_excess_suppliers",
    _Q20_SQL.format(
        supplier="supplier", lineitem="lineitem", part="part", nation="nation"
    ),
)
def q20_excess_suppliers(spark, sf_dir):
    for t in ("supplier", "lineitem", "part", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"_q20_{t}")
    return spark.sql(
        _Q20_SQL.format(
            supplier="_q20_supplier",
            lineitem="_q20_lineitem",
            part="_q20_part",
            nation="_q20_nation",
        )
    )
