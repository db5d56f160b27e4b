"""Deeper TPC-H-shaped coverage: the query shapes (correlated aggregates,
count distributions, volume pairs, existence anti-patterns) that stress
the planner differently from the q1/q3/q5 trio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_workflows_spark.queries.base import dec, register_views, table


def q7_volume_by_nation_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between (supplier nation, customer nation)
    pairs per year — two independent dim paths out of the same fact row.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nation_c = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("volume")
        )
    )


_Q7_ORACLE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY ns.n_name, nc.n_name, YEAR(l_shipdate)
"""


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by order count — left join so
    zero-order customers land in bucket 0, then a second aggregation over
    the first's output."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS n_customers FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total line quantity exceeds a threshold —
    aggregate-then-semijoin back to the detail."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty")
    )


_Q18_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate, total_qty
FROM orders JOIN (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150
) b ON o_orderkey = b.l_orderkey
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders, counted
    by a key prefix — scalar subquery + anti join + substring grouping."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT SUBSTRING(c_name, 1, 9) AS name_prefix,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
            FROM customer WHERE c_acctbal > 0
        )
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        GROUP BY SUBSTRING(c_name, 1, 9)
        """
    )


_Q22_ORACLE = """
SELECT SUBSTRING(c_name, 1, 9) AS name_prefix,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0
)
AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY SUBSTRING(c_name, 1, 9)
"""


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning battery on genuinely dirty strings (the JSON props
    column): tag/symbol stripping, lowercasing, whitespace squeeze."""
    ev = table(spark, sf_dir, "events")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("props")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return ev.select(
        "event_id",
        cleaned.alias("props_clean"),
        F.length(cleaned).alias("clean_len"),
    )


_TEXT_NORMALIZE_ORACLE = """
SELECT event_id,
       TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(props), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS props_clean,
       CAST(LENGTH(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(props), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS INTEGER) AS clean_len
FROM events
"""


def numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals via pure floor arithmetic
    (engine-agnostic; no width_bucket dialect differences)."""
    orders = table(spark, sf_dir, "orders")
    lo, hi, nbins = 0.0, 500000.0, 20
    width = (hi - lo) / nbins
    bucket = F.least(
        F.floor((F.col("o_totalprice") - lo) / width).cast("int"), F.lit(nbins - 1)
    )
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo_price"),
        F.max("o_totalprice").alias("hi_price"),
    )


_HISTOGRAM_ORACLE = """
SELECT CAST(LEAST(FLOOR((o_totalprice - 0.0) / 25000.0), 19) AS INTEGER) AS bucket,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo_price,
       MAX(o_totalprice) AS hi_price
FROM orders GROUP BY 1
"""


QUERIES = {
    "q7_volume_by_nation_pair": q7_volume_by_nation_pair,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q18_large_orders": q18_large_orders,
    "q22_inactive_customers": q22_inactive_customers,
    "text_normalize": text_normalize,
    "numeric_histogram": numeric_histogram,
}

ORACLE_SQL = {
    "q7_volume_by_nation_pair": _Q7_ORACLE,
    "q13_order_count_distribution": _Q13_ORACLE,
    "q18_large_orders": _Q18_ORACLE,
    "q22_inactive_customers": _Q22_ORACLE,
    "text_normalize": _TEXT_NORMALIZE_ORACLE,
    "numeric_histogram": _HISTOGRAM_ORACLE,
}
