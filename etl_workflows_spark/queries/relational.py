"""The delegated-SQL relational surface (SURVEY.md §2.4), Spark-first.

The reference reaches its entire relational surface by passing arbitrary SQL
to BigQuery (reference functions/load_query/main.py:47-57); this module is
that surface re-expressed as Catalyst plans: joins of every flavor,
aggregations, grouping sets/rollup/cube, window functions, set ops, scalar
functions, subqueries, pivot, sessionization, and an as-of join.

Scale notes are inline per query: what shuffles, what broadcasts, what the
plan must look like at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_workflows_spark.queries.base import davg, dec, dsum, ntz_micros, register_views, table


# --- aggregation -----------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg, the map-side-combine workhorse.

    Scale: single shuffle on (returnflag, linestatus) — 6 groups, partial
    aggregation does all the work; the filter is pushed to parquet.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1) - dec("l_discount"))
                * (F.lit(1) + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.

    Scale: customer is the small side (broadcast); orders⋈lineitem is the
    big shuffle on orderkey. Top-k plans as TakeOrderedAndProject — no full
    sort of the aggregate.
    """
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    # Dimension-first reduction: the broadcast customer join lands BEFORE
    # the orderkey shuffle, so the shuffled orders side is pre-shrunk by
    # mktsegment selectivity (~5×) instead of filtering after the big join.
    orders_red = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    return (
        li.join(orders_red, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table snowflake join, local-supplier condition.

    Scale: region/nation/supplier/customer all broadcast (dims); the one
    real shuffle is orders⋈lineitem on orderkey — and BOTH its inputs are
    pre-reduced by broadcast dimension joins before the exchange:
    lineitem by ASIA suppliers (~5×), orders by ASIA customers (~5×,
    valid because c_nationkey = s_nationkey forces the customer into the
    same region). Dimension-first reduction is the difference between
    shuffling 100 TB and shuffling 20 TB. The c_nationkey = s_nationkey
    predicate rides the orderkey join, not a post-filter.
    """
    asia_nations = (
        table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    # Pre-shuffle reductions (both map-side broadcast joins):
    # lineitem → only ASIA suppliers' lines (carries n_name for the agg);
    # orders → only ASIA customers' orders (carries c_nationkey for the
    # local-supplier condition).
    asia_supp = supp.join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    li_red = li.join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    cust_asia = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(asia_nations.select(F.col("n_nationkey").alias("cn_key"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "c_nationkey")
    )
    orders_red = orders.join(
        F.broadcast(cust_asia), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "c_nationkey")
    return (
        li_red.join(
            orders_red,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- joins -----------------------------------------------------------------


def join_left_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + null-aware aggregation per segment."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    joined = cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        F.countDistinct(
            F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
        ).alias("n_customers_no_orders"),
    )


_JOIN_LEFT_ORACLE = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(o_orderkey) AS n_orders,
       COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_customers_no_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers that have at least one 'F' order (EXISTS)."""
    cust = table(spark, sf_dir, "customer")
    f_orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


_JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders at all (NOT EXISTS)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


_JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (region × orderstatus domain)."""
    region = table(spark, sf_dir, "region")
    status = (
        table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    )
    return region.crossJoin(status).select("r_name", "o_orderstatus")


_JOIN_CROSS_ORACLE = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
"""


# --- grouping sets / rollup / cube / pivot ---------------------------------


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): hierarchical subtotals + grand total."""
    orders = table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


_AGG_ROLLUP_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


_AGG_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst plan as cube)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_AGG_GSETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: priorities × status columns."""
    orders = table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
    )


_AGG_PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders GROUP BY o_orderpriority
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + conditional distinct per priority."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_buyers"),
        F.countDistinct(
            F.when(F.col("o_totalprice") > 300000, F.col("o_custkey"))
        ).alias("n_big_buyers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_AGG_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_buyers,
       COUNT(DISTINCT CASE WHEN o_totalprice > 300000 THEN o_custkey END) AS n_big_buyers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


# --- window functions ------------------------------------------------------


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (ROW_NUMBER, deterministic ties).

    Scale: one shuffle on custkey; rank-filter pushes nothing to the driver.
    """
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_WINDOW_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders
) t WHERE rn <= 3
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order history (cumulative frame)."""
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


_WINDOW_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: per-user change in event value between consecutive events."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


_WINDOW_LAG_ORACLE = """
SELECT event_id, user_id,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
"""


# --- sort / limit / set ops ------------------------------------------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (TakeOrderedAndProject — no full sort)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT: segment buyers vs finished-order buyers.

    buyers(BUILDING ∪ MACHINERY custkeys) ∩ buyers-with-F-orders,
    minus buyers with any 'P' order.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    seg = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
        .union(
            cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
                F.col("c_custkey").alias("custkey")
            )
        )
    )
    f_buyers = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
    )
    p_buyers = (
        orders.filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return seg.intersect(f_buyers).exceptAll(p_buyers.distinct())


_SET_OPS_ORACLE = """
(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 UNION
 SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


# --- scalar functions / expressions ----------------------------------------


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/date scalar battery (the engine's public fn surface).

    Per-row IEEE ops only — bitwise deterministic, no rounding needed.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.abs(F.col("o_totalprice") - 250000.0).alias("price_dist"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_k"),
    )


_SCALAR_ORACLE = """
SELECT o_orderkey,
       UPPER(o_orderpriority) AS prio_upper,
       SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
       CAST(LENGTH(o_orderpriority) AS INTEGER) AS prio_len,
       o_orderstatus || '-' || o_orderpriority AS status_prio,
       CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(MONTH(o_orderdate) AS INTEGER) AS o_month,
       CAST(DAY(o_orderdate) AS INTEGER) AS o_day,
       ABS(o_totalprice - 250000.0) AS price_dist,
       SQRT(o_totalprice) AS price_sqrt,
       o_orderkey % 7 AS key_mod,
       CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k
FROM orders
"""


def case_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + per-bucket aggregation."""
    part = table(spark, sf_dir, "part")
    bucket = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
    )
    return (
        part.withColumn("size_bucket", bucket)
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            davg("p_retailprice").alias("avg_price"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


_CASE_ORACLE = """
SELECT CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium' ELSE 'large' END AS size_bucket,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(p_retailprice) AS avg_price,
       MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price
FROM part GROUP BY 1
"""


# --- subqueries ------------------------------------------------------------


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN <subquery>: orders from customers in deficit."""
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        """
    )


_SUBQ_IN_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold (deterministic exact-sum average)."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
          FROM customer
        )
        """
    )


_SUBQ_SCALAR_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
  FROM customer
)
"""


# --- event-time operators --------------------------------------------------


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch form).

    The streaming twin (streaming/incremental.py) uses the same logical
    plan with a watermark; date_trunc keeps the group key a plain column
    so the oracle matches.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


_EVENTS_HOURLY_ORACLE = """
SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions per user (gaps-and-islands).

    Scale: two window passes over one shuffle on user_id; no join, no
    state explosion. The streaming twin is session_window /
    applyInPandasWithState.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    with_flag = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            ntz_micros(F.col("ts")) - ntz_micros(F.lag("ts").over(w))
            > F.lit(gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_id = with_flag.withColumn("session_id", F.sum("new_session").over(w2))
    return with_id.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (ntz_micros(F.max("ts")) - ntz_micros(F.min("ts"))).alias("span_us"),
        dsum("value").alias("session_value"),
    )


_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS span_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM numbered GROUP BY user_id, session_id
"""


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's last click at-or-before it.

    Implemented the scalable way — NOT a range join: one window pass over a
    single shuffle on user_id (running MAX of click-time over the unioned
    event stream). A naive join-then-filter explodes quadratically per user;
    this stays O(n log n) and survives 100×.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    enriched = ev.withColumn("last_click_ts", F.max(click_ts).over(w))
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        "last_click_ts",
        (ntz_micros("ts") - ntz_micros("last_click_ts")).alias(
            "us_since_click"
        ),
    )


_ASOF_ORACLE = """
SELECT event_id, user_id, ts, last_click_ts,
       EPOCH_US(ts) - EPOCH_US(last_click_ts) AS us_since_click
FROM (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
  FROM events
) t WHERE event_type = 'purchase'
"""


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events props column."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


_JSON_ORACLE = """
SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
"""


def events_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over the VARIANT type (Spark 4): props
    parses ONCE into variant's shredded binary encoding, typed paths
    extract without re-tokenizing the JSON string per access — the
    at-scale shape for repeated extraction from wide semi-structured
    columns (``get_json_object`` re-parses the string every call; see
    ``json_extract_events`` for that baseline form)."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'long')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("k").alias("n_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


_VARIANT_AGG_ORACLE = """
SELECT event_type,
       COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_k,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def q5_all_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q5 snowflake without the region filter: revenue per
    (region, nation) — the flagship ``entry()`` query (same plan shape,
    wider output)."""
    nations = (
        table(spark, sf_dir, "nation")
        .join(
            F.broadcast(table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name", "r_name")
    )
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q5_ALL_ORACLE = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q5_all_regions": q5_all_regions,
    "join_left_fill": join_left_fill,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_cross_small": join_cross_small,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_pivot": agg_pivot,
    "agg_distinct": agg_distinct,
    "window_topk_per_group": window_topk_per_group,
    "window_running_sum": window_running_sum,
    "window_lag_delta": window_lag_delta,
    "topk_orders": topk_orders,
    "set_ops": set_ops,
    "scalar_functions": scalar_functions,
    "case_bucketize": case_bucketize,
    "subquery_in": subquery_in,
    "subquery_scalar": subquery_scalar,
    "events_hourly": events_hourly,
    "sessionize": sessionize,
    "asof_last_click": asof_last_click,
    "json_extract_events": json_extract_events,
    "events_variant_agg": events_variant_agg,
}

ORACLE_SQL = {
    "q1_pricing_summary": _Q1_ORACLE,
    "q3_shipping_priority": _Q3_ORACLE,
    "q5_region_revenue": _Q5_ORACLE,
    "q5_all_regions": _Q5_ALL_ORACLE,
    "join_left_fill": _JOIN_LEFT_ORACLE,
    "join_semi": _JOIN_SEMI_ORACLE,
    "join_anti": _JOIN_ANTI_ORACLE,
    "join_cross_small": _JOIN_CROSS_ORACLE,
    "agg_rollup": _AGG_ROLLUP_ORACLE,
    "agg_cube": _AGG_CUBE_ORACLE,
    "agg_grouping_sets": _AGG_GSETS_ORACLE,
    "agg_pivot": _AGG_PIVOT_ORACLE,
    "agg_distinct": _AGG_DISTINCT_ORACLE,
    "window_topk_per_group": _WINDOW_TOPK_ORACLE,
    "window_running_sum": _WINDOW_RUNNING_ORACLE,
    "window_lag_delta": _WINDOW_LAG_ORACLE,
    "topk_orders": _TOPK_ORACLE,
    "set_ops": _SET_OPS_ORACLE,
    "scalar_functions": _SCALAR_ORACLE,
    "case_bucketize": _CASE_ORACLE,
    "subquery_in": _SUBQ_IN_ORACLE,
    "subquery_scalar": _SUBQ_SCALAR_ORACLE,
    "events_hourly": _EVENTS_HOURLY_ORACLE,
    "sessionize": _SESSIONIZE_ORACLE,
    "asof_last_click": _ASOF_ORACLE,
    "json_extract_events": _JSON_ORACLE,
    "events_variant_agg": _VARIANT_AGG_ORACLE,
}
