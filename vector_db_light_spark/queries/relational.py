"""General relational surface over the TPC-H-ish tables: joins (broadcast /
semi / anti / as-of / range), hash aggregation, rollup/cube, window
functions, set ops, sessionization, time-bucketed aggregation
(SURVEY.md §2.3 gap row, §2.4 gap row, §2.7, §2.8).

Float-parity note: SUM/AVG over doubles are summation-order-dependent, so
every such aggregate is rounded identically on both sides (round-2 for sums,
round-4 for averages); counts and min/max are exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import relational as R
from .._registry_core import load, register


# ---------------------------------------------------------------------------
# Hash aggregation with computed measures (TPC-H Q1 shape). Partial
# aggregation (map-side combine) is automatic; the only shuffle carries
# 4 groups.
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Multi-way join + top-k by aggregate (TPC-H Q3 shape): two big-table
# shuffle joins + one broadcast, then TakeOrderedAndProject.
# ---------------------------------------------------------------------------

@register(
    "shipping_priority",
    """
SELECT l.l_orderkey AS orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate AS orderdate, o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01'
  AND l.l_shipdate > TIMESTAMP '1997-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
""",
)
def shipping_priority(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Broadcast dim-chain join + ROLLUP (region -> nation -> customer).
# ---------------------------------------------------------------------------

@register(
    "acctbal_rollup",
    """
SELECT r.r_name AS region, n.n_name AS nation,
       grouping(r.r_name) + 2 * grouping(n.n_name) AS gid,
       count(*) AS n_customers,
       round(sum(c.c_acctbal), 2) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY region NULLS FIRST, nation NULLS FIRST
""",
)
def acctbal_rollup(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "c_acctbal",
        )
    )
    return (
        joined.rollup("region", "nation")
        .agg(
            (F.grouping("region") + 2 * F.grouping("nation")).alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy(F.col("region").asc_nulls_first(), F.col("nation").asc_nulls_first())
    )


@register(
    "segment_status_cube",
    """
SELECT c.c_mktsegment AS segment, o.o_orderstatus AS status,
       grouping(c.c_mktsegment) + 2 * grouping(o.o_orderstatus) AS gid,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY CUBE (c.c_mktsegment, o.o_orderstatus)
ORDER BY segment NULLS FIRST, status NULLS FIRST
""",
)
def segment_status_cube(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), cust["c_custkey"] == orders["o_custkey"]
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderstatus").alias("status"),
        "o_totalprice",
    )
    return (
        joined.cube("segment", "status")
        .agg(
            (F.grouping("segment") + 2 * F.grouping("status")).alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(F.col("segment").asc_nulls_first(), F.col("status").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Window functions: per-group top-k and running totals (§2.7 — the reference
# has none; row_number/lag/running sum are the §7 extension surface).
# ---------------------------------------------------------------------------

@register(
    "top_customers_per_segment",
    """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rk
FROM (
  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
)
WHERE rk <= 3
ORDER BY c_mktsegment, rk
""",
)
def top_customers_per_segment(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rk")
        .orderBy("c_mktsegment", "rk")
    )


@register(
    "running_order_total",
    """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def running_order_total(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        ).orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (reference J-gap): customers with vs without orders.
# ---------------------------------------------------------------------------

@register(
    "customers_without_big_orders",
    """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
ORDER BY c_custkey
""",
)
def customers_without_big_orders(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, cust["c_custkey"] == big["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "customers_with_open_orders",
    """
SELECT c_custkey, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
ORDER BY c_custkey
""",
)
def customers_with_open_orders(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    open_orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust["c_custkey"] == open_orders["o_custkey"], "left_semi")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "nations_with_both",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
""",
)
def nations_with_both(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp).orderBy("nationkey")


@register(
    "customers_never_f_status",
    """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
""",
)
def customers_never_f_status(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    all_cust = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    f_cust = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    # subtract == SQL EXCEPT (distinct semantics); exceptAll would keep
    # unmatched duplicate copies, which EXCEPT does not.
    return all_cust.subtract(f_cust).orderBy("custkey")


# ---------------------------------------------------------------------------
# As-of join: each event -> the latest order of the same customer at-or-
# before the event (union+window merge; oracle uses DuckDB's native ASOF).
# Right side deduped on (key, ts) by max orderkey for determinism.
# ---------------------------------------------------------------------------

@register(
    "asof_event_order",
    """
WITH orders_d AS (
  SELECT o_custkey, o_orderdate,
         max_by(o_orderkey, o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
FROM events e
ASOF JOIN orders_d o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
""",
)
def asof_event_order(spark, sf_dir):
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = R.asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
    )
    return out.select("event_id", "user_id", "o_orderkey", "o_totalprice").orderBy(
        "event_id"
    )


# ---------------------------------------------------------------------------
# Range self-join: ordered event pairs of the same user within 5 minutes
# (binned equi-join on Spark; plain theta join as the oracle).
# ---------------------------------------------------------------------------

@register(
    "event_pairs_5min",
    """
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
ORDER BY a.user_id, id_a, id_b
""",
)
def event_pairs_5min(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    pairs = R.range_self_join(
        events, key="user_id", ts_col="ts", max_gap_seconds=300, id_col="event_id"
    )
    return pairs.orderBy("user_id", "id_a", "id_b")


# ---------------------------------------------------------------------------
# Sessionization: 30-minute-gap sessions per user (batch equivalent of a
# session window; §2.8).
# ---------------------------------------------------------------------------

@register(
    "sessionize_events",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       epoch_us(CAST(min(ts) AS TIMESTAMP)) AS session_start_us,
       epoch_us(CAST(max(ts) AS TIMESTAMP)) AS session_end_us
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def sessionize_events(spark, sf_dir):
    # Parity note: session bounds are emitted as epoch-microsecond BIGINTs —
    # raw timestamp outputs hash dtype-sensitively under the driver (DuckDB's
    # physical ts type has varied across fixture generations; Spark reads
    # TIMESTAMP_NTZ micros via registry.load_events).
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    new_session = F.when(prev.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sessions = events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("session_start_us"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("session_end_us"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Tumbling-window aggregation (batch twin of the streaming windowed agg,
# §2.8): 1-hour windows x event_type.
# ---------------------------------------------------------------------------

@register(
    "tumbling_hourly_events",
    """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def tumbling_hourly_events(spark, sf_dir):
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Date bucketing + distinct counts (X4 timestamps; exact distinct).
# ---------------------------------------------------------------------------

@register(
    "orders_by_month",
    """
SELECT date_trunc('month', o_orderdate) AS order_month,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY 1
ORDER BY order_month
""",
)
def orders_by_month(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# Sequential funnel: per user, the first view -> first click AFTER it ->
# first purchase AFTER that. Three chained conditional window-mins over ONE
# user partitioning (single shuffle; each stage's predicate references the
# previous stage's column). The stage a user reached is the conversion
# metric every event pipeline wants.
# ---------------------------------------------------------------------------

@register(
    "user_funnel_stages",
    """
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
),
a AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS a_us
  FROM e GROUP BY 1
),
b AS (
  SELECT e.user_id, min(e.ts_us) AS b_us
  FROM e JOIN a ON a.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts_us > a.a_us
  GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts_us) AS c_us
  FROM e JOIN b ON b.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts_us > b.b_us
  GROUP BY 1
)
SELECT a.user_id,
       coalesce(a.a_us, -1) AS view_us,
       coalesce(b.b_us, -1) AS click_us,
       coalesce(c.c_us, -1) AS purchase_us,
       CASE WHEN a.a_us IS NULL THEN 0
            WHEN b.b_us IS NULL THEN 1
            WHEN c.c_us IS NULL THEN 2
            ELSE 3 END AS funnel_stage
FROM a
LEFT JOIN b USING (user_id)
LEFT JOIN c USING (user_id)
ORDER BY a.user_id
""",
)
def user_funnel_stages(spark, sf_dir):
    """view -> click -> purchase funnel per user, timestamps as epoch-us
    BIGINTs (driver-hasher parity), missing stages coalesced to -1."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    e = events.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    e = e.withColumn(
        "a_us", F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    )
    e = e.withColumn(
        "b_us",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts_us") > F.col("a_us")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "c_us",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("b_us")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.min("a_us").alias("_a"),
            F.min("b_us").alias("_b"),
            F.min("c_us").alias("_c"),
        )
        .select(
            "user_id",
            F.coalesce(F.col("_a"), F.lit(-1)).alias("view_us"),
            F.coalesce(F.col("_b"), F.lit(-1)).alias("click_us"),
            F.coalesce(F.col("_c"), F.lit(-1)).alias("purchase_us"),
            F.when(F.col("_a").isNull(), 0)
            .when(F.col("_b").isNull(), 1)
            .when(F.col("_c").isNull(), 2)
            .otherwise(3)
            .alias("funnel_stage"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join with
# a JOIN-SIDE predicate (customers with zero qualifying orders must survive
# with count 0 — pushing the filter to WHERE would silently drop them), then
# a second aggregation over the first's results. Two shuffles by necessity
# (different keys); the histogram side is tiny after the first agg.
# ---------------------------------------------------------------------------

@register(
    "customer_order_histogram",
    """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def customer_order_histogram(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(
            F.col("c_count").cast("bigint").alias("c_count"),
            F.col("custdist").cast("bigint").alias("custdist"),
        )
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape (shipmode adapted to this fixture's columns): fact-fact
# join + two-way conditional count by priority class.
# ---------------------------------------------------------------------------

@register(
    "urgent_lines_by_flag",
    """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
)
def urgent_lines_by_flag(spark, sf_dir):
    """TPC-H Q12 shape: late-shipped lines split urgent/non-urgent per
    return flag. Integer conditional counts — zero float-parity surface;
    the join is fact-fact on the order key (shuffle on both sides; with
    both tables bucketed by orderkey the Exchange disappears — proven by
    tests/test_stateful_and_bucketing.py for this key)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders — grouped HAVING pre-aggregate
# joined back to orders + customer dim.
# ---------------------------------------------------------------------------

@register(
    "large_volume_orders",
    """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 6) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING round(sum(l_quantity), 6) > 150
)
SELECT c.c_name, o.o_orderkey, o.o_totalprice, b.total_qty
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN big b ON b.l_orderkey = o.o_orderkey
ORDER BY b.total_qty DESC, o.o_orderkey ASC
LIMIT 20
""",
)
def large_volume_orders(spark, sf_dir):
    """TPC-H Q18: the HAVING aggregate runs FIRST and shrinks the fact
    side to the qualifying orders (~2% of them), so the dim join handles
    thousands of rows, not millions; per-order double sums are rounded
    identically on both sides before the threshold compare (order-dependent
    summation, CLAUDE.md float rules)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(big, big["l_orderkey"] == orders["o_orderkey"])
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive brand/size/quantity predicates over the
# part dim join — the OR-of-ANDs Catalyst must push through the join.
# ---------------------------------------------------------------------------

@register(
    "disjunctive_revenue",
    """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 50
       AND l.l_quantity BETWEEN 20 AND 35)
""",
)
def disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: one broadcast dim join; the disjunction's common
    sub-predicates (brand IN (...), quantity range hull) are derivable by
    Catalyst's constraint propagation and land in PushedFilters for the
    part scan — rows failing every branch die before the join."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(20, 35)
    )
    return (
        li.join(F.broadcast(part), part["p_partkey"] == li["l_partkey"])
        .filter(b1 | b2 | b3)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: cross-nation shipping volume — two independent dim
# chains (supplier->nation, customer->nation) hanging off the fact join.
# ---------------------------------------------------------------------------

@register(
    "cross_nation_volume",
    """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(date_part('year', l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS volume_cents
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def cross_nation_volume(spark, sf_dir):
    """TPC-H Q7: every dim in both chains broadcasts (supplier, customer,
    nation x2); the only shuffles are the lineitem-orders fact join and
    the final group — the 100 TB plan is two broadcast chains over one
    fact-fact exchange."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("volume_cents"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue per customer, top 20.
# ---------------------------------------------------------------------------

@register(
    "returned_item_customers",
    """
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_return_lines
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
""",
)
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10: the returnflag filter lands in the lineitem scan's
    PushedFilters (only 'R' rows leave the files), the customer dim
    broadcasts, and the top-20 ranks on exact BIGINT-cents revenue
    (custkey tiebreak) — a rounded double sum near the rank-20 cut could
    flip a cent cross-engine and change LIMIT membership."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_return_lines"),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who were the ONLY late supplier of a
# multi-supplier order — EXISTS + NOT EXISTS over a grouped self-join.
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
  FROM {lineitem} l JOIN {orders} o ON l.l_orderkey = o.o_orderkey
),
per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM li GROUP BY 1, 2
),
cand AS (
  SELECT p.l_orderkey, p.l_suppkey FROM per p
  WHERE p.late = 1
    AND EXISTS (SELECT 1 FROM per p2
                WHERE p2.l_orderkey = p.l_orderkey
                  AND p2.l_suppkey <> p.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM per p3
                    WHERE p3.l_orderkey = p.l_orderkey
                      AND p3.l_suppkey <> p.l_suppkey AND p3.late = 1)
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM cand c JOIN {supplier} s ON s.s_suppkey = c.l_suppkey
GROUP BY 1
ORDER BY numwait DESC, s_name ASC
LIMIT 25
"""


@register(
    "lonely_late_suppliers",
    _Q21_SQL.format(lineitem="lineitem", orders="orders", supplier="supplier"),
)
def lonely_late_suppliers(spark, sf_dir):
    """TPC-H Q21 (lateness = shipped >60 days after order; the fixture has
    no commit/receipt dates): the per-(order, supplier) lateness aggregate
    is computed ONCE and both correlated subqueries run against it —
    Catalyst de-correlates them into one semi- and one anti-join on the
    order key, all reusing the same exchange."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_sq_li21")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_sq_ord21")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("_sq_sup21")
    return spark.sql(
        _Q21_SQL.format(
            lineitem="_sq_li21", orders="_sq_ord21", supplier="_sq_sup21"
        )
    )


# ---------------------------------------------------------------------------
# Gap-filled time-series resample: the dense (hour x event_type) grid with
# zero rows for empty cells — the resample/fill operator every time-series
# pipeline needs before windowed models (missing hours must be zeros, not
# absent rows). Spine = sequence(min_hour, max_hour); value sums in exact
# BIGINT cents (per-row round then integer sum — no float agg).
# ---------------------------------------------------------------------------

@register(
    "events_resample_hourly",
    """
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS window_start
  FROM b
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n,
         SUM(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT s.window_start, t.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       CAST(COALESCE(c.cents, 0) AS BIGINT) AS total_cents
FROM spine s
CROSS JOIN types t
LEFT JOIN counts c
  ON c.window_start = s.window_start AND c.event_type = t.event_type
ORDER BY s.window_start, t.event_type
""",
)
def events_resample_hourly(spark, sf_dir):
    """Dense resample: spine x types is tiny (hours x cardinality) and
    broadcast; the one real aggregation partial-aggregates map-side. At
    100 TB the spine stays driver-free — min/max are an aggregate row,
    sequence+explode fans it out distributed."""
    events = load(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("window_start")
    )
    types = events.select("event_type").distinct()
    counts = events.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    return (
        spine.crossJoin(types)
        .join(counts, ["window_start", "event_type"], "left")
        .select(
            "window_start",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("cents", F.lit(0)).cast("long").alias("total_cents"),
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# BAG-semantics set ops: INTERSECT ALL / EXCEPT ALL keep multiplicity —
# a genuinely different operator from the distinct variants
# (set_ops_labeled): a value occurring 3x on the left and 2x on the right
# intersects 2x and excepts 1x.
# ---------------------------------------------------------------------------

@register(
    "set_ops_all_labeled",
    """
WITH l AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
r AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
i AS (SELECT 'intersect_all' AS op, k FROM (SELECT k FROM l INTERSECT ALL SELECT k FROM r)),
e AS (SELECT 'except_all' AS op, k FROM (SELECT k FROM l EXCEPT ALL SELECT k FROM r))
SELECT op, k, CAST(count(*) AS BIGINT) AS n
FROM (SELECT * FROM i UNION ALL SELECT * FROM e)
GROUP BY 1, 2
ORDER BY op, k
""",
)
def set_ops_all_labeled(spark, sf_dir):
    """intersectAll/exceptAll multiplicity semantics, aggregated to
    per-key counts so the multiplicities themselves are hash-checked."""
    orders = load(spark, sf_dir, "orders")
    l = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    r = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    i = l.intersectAll(r).select(F.lit("intersect_all").alias("op"), "k")
    e = l.exceptAll(r).select(F.lit("except_all").alias("op"), "k")
    return (
        i.unionByName(e)
        .groupBy("op", "k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("op", "k")
    )


# ---------------------------------------------------------------------------
# Schema-evolution union: two snapshots with DIFFERENT columns combined by
# name, absent columns null-filled — unionByName(allowMissingColumns) vs
# DuckDB's UNION ALL BY NAME. The operation every long-lived table needs
# the day a column is added.
# ---------------------------------------------------------------------------

@register(
    "union_schema_evolution",
    """
WITH v1 AS (
  SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
),
v2 AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 1
),
u AS (SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(n_chars) AS BIGINT) AS n_with_chars,
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_total
FROM u GROUP BY 1
ORDER BY lang
""",
)
def union_schema_evolution(spark, sf_dir):
    """v1 rows lack n_chars entirely; the by-name union null-fills it, and
    the aggregate proves exactly the v2 half carries values."""
    docs = load(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars")
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count("n_chars").cast("long").alias("n_with_chars"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("chars_total"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: the forecast-revenue-change scan — a pure filter +
# scalar aggregate, the canonical predicate-pushdown benchmark. Revenue in
# exact BIGINT cents (per-row round of one double product, then integer
# sum) per the repo's wide-aggregate rule.
# ---------------------------------------------------------------------------

@register(
    "forecast_revenue_q6",
    """
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN '0.05'::DOUBLE AND '0.07'::DOUBLE
  AND l_quantity < 24
""",
)
def forecast_revenue_q6(spark, sf_dir):
    """Every predicate reaches the parquet scan (PushedFilters); the
    aggregate is a map-side partial over the surviving rows — the plan is
    scan-bound by construction."""
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= F.lit(0.05))
        & (F.col("l_discount") <= F.lit(0.07))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0).cast(
                "long"
            )
        )
        .cast("long")
        .alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape (adapted: the schema has no partsupp, so profit reduces
# to discounted revenue): per (supplier nation, order year) totals through
# the lineitem -> supplier -> nation + lineitem -> orders join web, the
# multi-dimension join-aggregate Q9 exercises.
# ---------------------------------------------------------------------------

@register(
    "revenue_by_supplier_nation_year",
    """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year
""",
)
def revenue_by_supplier_nation_year(spark, sf_dir):
    """supplier/nation broadcast (tiny dims); the only real shuffle is the
    fact-fact join on orderkey + the final group — Q9's shape with exact
    integer cents."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(cents).cast("long").alias("revenue_cents"))
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# NULL-safe equi-join: <=> (eqNullSafe) matches NULL with NULL — standard
# equality drops those rows silently. The semantics gap shows up the first
# time a join key is an optional attribute; counted per key with the NULL
# key coalesced to a sentinel per the repo's nullable-group-key rule.
# ---------------------------------------------------------------------------

@register(
    "null_safe_join_counts",
    """
WITH a AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN NULL ELSE lang END AS k
  FROM documents WHERE doc_id % 2 = 0
),
b AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN NULL ELSE lang END AS k
  FROM documents WHERE doc_id % 2 = 1
)
SELECT coalesce(a.k, '<null>') AS join_key,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
ORDER BY join_key
""",
)
def null_safe_join_counts(spark, sf_dir):
    """eqNullSafe pair counts per key: the '<null>' row exists ONLY under
    null-safe semantics (plain == would drop every NULL pair), so its
    presence is the semantic the oracle checks."""
    docs = load(spark, sf_dir, "documents")
    key = F.when(F.col("lang") == "en", F.lit(None)).otherwise(F.col("lang"))
    a = docs.filter(F.col("doc_id") % 2 == 0).select(key.alias("ka"))
    b = docs.filter(F.col("doc_id") % 2 == 1).select(key.alias("kb"))
    return (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
        .groupBy(F.coalesce(F.col("ka"), F.lit("<null>")).alias("join_key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("join_key")
    )


# ---------------------------------------------------------------------------
# Cohort retention (round 8): users cohorted by first-active day, matrix of
# (cohort_day, day_offset) -> active users + retention rate. Day indices
# are integer epoch-microsecond divisions (ANSI div / DuckDB //), so the
# bucketing is bit-identical across engines; retention is one BIGINT/BIGINT
# double division with identical operands on both sides.
# ---------------------------------------------------------------------------

@register(
    "cohort_retention_daily",
    """
WITH wk AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS wk
  FROM events
),
cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM wk GROUP BY 1
),
sizes AS (
  SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
  FROM cohort GROUP BY 1
)
SELECT c.cohort_wk AS cohort_day,
       CAST(w.wk - c.cohort_wk AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       s.cohort_size,
       CAST(count(*) AS DOUBLE) / s.cohort_size AS retention
FROM wk w
JOIN cohort c USING (user_id)
JOIN sizes s ON s.cohort_wk = c.cohort_wk
GROUP BY 1, 2, s.cohort_size
ORDER BY cohort_day, day_offset
""",
)
def cohort_retention_daily(spark, sf_dir):
    """Classic warehouse retention matrix. Scale shape: one user-day
    distinct + one per-user min (both user-keyed shuffles with map-side
    partial agg), then the matrix agg; the per-cohort size table is
    #days rows and broadcasts back. No window functions, no skew hot key
    (users spread the shuffles)."""
    events = load(spark, sf_dir, "events")
    wk = events.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "wk"
        ),
    ).distinct()
    cohort = wk.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sizes = cohort.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        wk.join(cohort, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_wk")
        .select(
            F.col("cohort_wk").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (round 8): per-user ordered event sequences
# reduced to global (prev -> next) transition counts + probabilities — the
# first-order Markov model of user behavior. Ordering ties broken by
# event_id (CLAUDE.md: tie-break every ordering with an id); the
# probability is one BIGINT/BIGINT double division, identical operands on
# both engines.
# ---------------------------------------------------------------------------

@register(
    "event_transition_matrix",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
SELECT c.prev_type, c.next_type, c.n, t.row_total,
       CAST(c.n AS DOUBLE) / t.row_total AS p
FROM c JOIN t USING (prev_type)
ORDER BY prev_type, next_type
""",
)
def event_transition_matrix(spark, sf_dir):
    """Scale shape: one user-keyed shuffle for the lag window (users
    spread it, no hot key), one (prev, next) count agg with map-side
    partials, and a broadcast of the #event_types^2-row totals."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_total"))
    return (
        c.join(F.broadcast(t), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            "row_total",
            (F.col("n").cast("double") / F.col("row_total")).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )
