"""Remaining TPC-H query shapes, adapted to the testdata's reduced schema
(no partsupp table; lineitem has a single date column).

Each keeps the *planner shape* of its namesake — the join topology,
subquery style, and aggregation pattern — with predicates rewritten onto
the columns that exist. Determinism rules from queries/base.py apply:
decimal sums for money, unique-key tie-breaks for every top-k.

Reference parity note: the reference (devoteam-g-cloud/etl-workflows)
delegates its whole relational surface to the warehouse's SQL engine
(SURVEY.md §2.4, load_query/main.py:47-57); these shapes demonstrate the
delegated surface is fully served by Spark SQL / Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_workflows_spark.queries.base import dec, dsum, register_views, table


def q2_min_cost_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated scalar subquery — each part joined against the
    minimum retail price *of its own type* (partsupp's min-cost-supplier
    pattern, re-targeted at part since the testdata has no partsupp)."""
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_type, p_retailprice
        FROM part p
        WHERE p_retailprice = (
            SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
        )
        """
    )


_Q2_ORACLE = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part p
WHERE p_retailprice = (
    SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
"""


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority checking — count orders per priority that
    have at least one late-shipping lineitem (EXISTS ⇒ left-semi join;
    the commitdate<receiptdate predicate becomes shipdate>orderdate+60d)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    late = table(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    )
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: single-table scan-filter-agg with a tight selective range
    predicate — the canonical pushdown/codegen microbenchmark."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — one nation's revenue as a fraction
    of regional revenue per year. Conditional aggregation over a 7-table
    join (ratio of two decimal sums ⇒ deterministic double)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation_c = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation_s = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


_Q8_ORACLE = """
SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN ns.n_name = 'NATION_7'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN region   ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
GROUP BY YEAR(o_orderdate)
"""


def q9_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and year — fact
    joined through part (name filter) and supplier-nation, profit =
    revenue − cost proxy (p_retailprice stands in for ps_supplycost)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    amount = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


_Q9_ORACLE = """
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY n_name, YEAR(o_orderdate)
"""


def q10_returned_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by lost revenue on returned items in a
    quarter — join-agg-topk with a unique-key tie-break."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_by_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: two-bucket conditional counts per category (shipmode is
    absent — lateness buckets play its role): per lateness bucket, how
    many high- vs low-priority orders."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), "LATE"
    ).otherwise("ON_TIME")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(late.alias("lateness"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q12_ORACLE = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 'LATE' ELSE 'ON_TIME' END AS lateness,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promotion revenue share — conditional numerator over an
    unconditional denominator in one aggregation pass."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-02-01")
    )
    part = table(spark, sf_dir, "part")
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


_Q14_ORACLE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
           THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
           ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-02-01'
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute group, with
    an anti-join exclusion list (low-balance suppliers play the role of
    the complaint suppliers)."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = table(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 7, 14, 21, 28))
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) li
JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 7, 14, 21, 28)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated aggregate threshold — revenue from lineitems
    whose quantity is below 20% of *that part's* average quantity."""
    register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
            SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(l2.l_quantity))
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        """
    )


_Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR of conjunctive brand/size/quantity clauses — stresses
    disjunction pushdown and join-predicate extraction (Catalyst extracts
    the common l_partkey=p_partkey equi-condition from the OR)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    clause1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    clause2 = (
        (F.col("p_brand") == "Brand#9")
        & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(10, 20))
    )
    clause3 = (
        (F.col("p_brand") == "Brand#20")
        & (F.col("p_size").between(20, 50))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(clause1 | clause2 | clause3).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#9'  AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT EXISTS against the same fact on the same
    key — suppliers with a late line on a multi-supplier order where no
    co-supplier was late (shipdate>orderdate+90 stands in for
    receipt>commit)."""
    register_views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s_name
        """
    )


_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: important stock identification — per-group value sums
    kept only when they exceed a *global-scalar-subquery* fraction of the
    total (HAVING against an uncorrelated scalar subquery; partsupp's
    supplycost*availqty becomes lineitem extendedprice as the value proxy,
    scoped to one supplier nation)."""
    register_views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(
        """
        WITH filtered AS (
          SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_7'
        )
        SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS stock_value
        FROM filtered
        GROUP BY l_partkey
        HAVING SUM(v) > (SELECT 0.001 * SUM(v) FROM filtered)
        """
    )


_Q11_ORACLE = """
WITH filtered AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS stock_value
FROM filtered
GROUP BY l_partkey
HAVING SUM(v) > (SELECT 0.001 * SUM(v) FROM filtered)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: top-revenue supplier via a reused CTE ("view") — the
    revenue relation appears twice (join side + MAX scalar subquery);
    exact-decimal revenue makes the equality comparison deterministic."""
    register_views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
          FROM lineitem
          WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE rev = (SELECT MAX(rev) FROM revenue)
        """
    )


_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE rev = (SELECT MAX(rev) FROM revenue)
"""


def q20_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN subqueries (supplier ∈ heavy-shippers of
    name-filtered parts, nation ∈ list) with a grouped HAVING threshold —
    the availqty > half-of-shipped correlated test becomes a per
    (supplier, part) shipped-quantity floor."""
    register_views(spark, sf_dir, "supplier", "lineitem", "part", "nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt')
            AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 40
        )
        AND s_nationkey IN (
          SELECT n_nationkey FROM nation
          WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        )
        """
    )


_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt')
    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 40
)
AND s_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
)
"""


QUERIES = {
    "q2_min_cost_per_type": q2_min_cost_per_type,
    "q4_priority_exists": q4_priority_exists,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q9_profit_proxy": q9_profit_proxy,
    "q10_returned_top20": q10_returned_top20,
    "q11_important_stock": q11_important_stock,
    "q12_priority_by_lateness": q12_priority_by_lateness,
    "q15_top_supplier": q15_top_supplier,
    "q20_part_shippers": q20_part_shippers,
    "q14_promo_share": q14_promo_share,
    "q16_supplier_count": q16_supplier_count,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLE_SQL = {
    "q2_min_cost_per_type": _Q2_ORACLE,
    "q4_priority_exists": _Q4_ORACLE,
    "q6_forecast_revenue": _Q6_ORACLE,
    "q8_market_share": _Q8_ORACLE,
    "q9_profit_proxy": _Q9_ORACLE,
    "q10_returned_top20": _Q10_ORACLE,
    "q11_important_stock": _Q11_ORACLE,
    "q12_priority_by_lateness": _Q12_ORACLE,
    "q15_top_supplier": _Q15_ORACLE,
    "q20_part_shippers": _Q20_ORACLE,
    "q14_promo_share": _Q14_ORACLE,
    "q16_supplier_count": _Q16_ORACLE,
    "q17_small_quantity_revenue": _Q17_ORACLE,
    "q19_disjunctive_predicates": _Q19_ORACLE,
    "q21_waiting_suppliers": _Q21_ORACLE,
}
