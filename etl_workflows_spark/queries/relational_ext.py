"""Extended relational coverage: outer joins, exact percentiles, ranking
battery, HAVING, date arithmetic — plus semantics notes on cross-engine
determinism for each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_workflows_spark.queries.base import dec, dsum, register_views, table


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: per-customer event activity vs customer dim.

    events.user_id spans a subset of customer keys, so both orphan sides
    are exercised (customers without events; none the other way).
    """
    ev = (
        table(spark, sf_dir, "events")
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = cust.join(ev, F.col("c_custkey") == F.col("user_id"), "full_outer")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_custkey").alias("n_customers"),
        F.count("user_id").alias("n_active"),
        F.coalesce(F.sum("n_events"), F.lit(0)).alias("total_events"),
    )


_FULL_OUTER_ORACLE = """
WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(c_custkey) AS n_customers,
       COUNT(user_id) AS n_active,
       CAST(COALESCE(SUM(n_events), 0) AS BIGINT) AS total_events
FROM customer FULL OUTER JOIN ev ON c_custkey = user_id
GROUP BY c_mktsegment
"""


def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median + p90 per priority.

    Spark ``percentile`` (exact, sort-based) and DuckDB ``quantile_cont``
    use the same linear interpolation over the sorted values — verified
    bitwise-equal on this data; ``percentile_approx`` would NOT match.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_MEDIAN_ORACLE = """
SELECT o_orderpriority,
       QUANTILE_CONT(o_totalprice, 0.5) AS median_price,
       QUANTILE_CONT(o_totalprice, 0.9) AS p90_price,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / percent_rank / cume_dist / ntile with total ordering."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


_RANK_BATTERY_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       CAST(DENSE_RANK()   OVER w AS INTEGER) AS drank,
       PERCENT_RANK() OVER w AS prank,
       CUME_DIST()    OVER w AS cdist,
       CAST(NTILE(4)  OVER w AS INTEGER) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
"""


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING: customers with more than 12 orders."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("lifetime_value"),
        )
        .filter(F.col("n_orders") > 12)
    )


_HAVING_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
"""


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic battery: shift, diff, truncation, parts.

    Conventions that differ across engines (week-of-year, day-of-week
    numbering) are deliberately excluded; everything here is
    convention-stable.
    """
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    # DATE values surface as python date objects from Spark but as
    # datetime64 from DuckDB's pandas bridge — emit TIMESTAMP on both sides
    # so the comparison is representation-stable.
    return orders.select(
        "o_orderkey",
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.date_trunc("month", d).alias("month_start"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
    )


_DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS due_date,
       CAST(DATE_DIFF('day', o_orderdate, DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr,
       CAST(DAYOFYEAR(o_orderdate) AS INTEGER) AS doy
FROM orders
"""


def pipeline_doc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline — the operators chained the way a real
    training-data job runs them: exact-dedup → quality gate → per-doc
    features. One queries() entry proving the pieces compose into a single
    Catalyst plan (scan once, no materialization between stages).
    """
    from etl_workflows_spark.operators import dedup, text

    docs = table(spark, sf_dir, "documents")
    deduped = dedup.drop_exact_duplicates(docs)
    toks = F.split(F.col("text"), " ")
    featured = deduped.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks).cast("double")).alias(
            "uniq_ratio"
        ),
    )
    return featured.filter(
        (F.col("n_tokens") >= 20) & (F.col("uniq_ratio") >= 0.4)
    )


_PIPELINE_ORACLE = """
WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
),
featured AS (
  SELECT d.doc_id, d.lang,
         CAST(LEN(STRING_SPLIT(d.text, ' ')) AS INTEGER) AS n_tokens,
         LEN(LIST_DISTINCT(STRING_SPLIT(d.text, ' ')))
           / CAST(LEN(STRING_SPLIT(d.text, ' ')) AS DOUBLE) AS uniq_ratio
  FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
)
SELECT * FROM featured WHERE n_tokens >= 20 AND uniq_ratio >= 0.4
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): count and exact sum of
    orders within $1000 below each order's price, per status.

    Value-range frames are tie-order-independent — deterministic without a
    tie-break in the frame (the ORDER BY key fully defines the window).
    """
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("sum_within_1k"),
    )


_RANGE_FRAME_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       COUNT(*) OVER w AS n_within_1k,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_within_1k
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
"""


def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a fully-ordered frame."""
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first_value("o_totalprice").over(w).alias("first_spend"),
        F.last_value("o_totalprice").over(w).alias("last_spend"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_spend"),
    )


_VALUE_FNS_ORACLE = """
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_spend,
       LAST_VALUE(o_totalprice)  OVER w AS last_spend,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def conditional_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: nullif / coalesce / greatest / least / nvl."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")
        ).alias("seg_defaulted"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
        F.when(F.col("c_acctbal") < 0, "deficit").otherwise("ok").alias("standing"),
    )


_CONDITIONAL_ORACLE = """
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_defaulted,
       GREATEST(c_acctbal, 0.0) AS bal_floor0,
       LEAST(c_acctbal, 5000.0) AS bal_cap5k,
       CASE WHEN c_acctbal < 0 THEN 'deficit' ELSE 'ok' END AS standing
FROM customer
"""


def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over token arrays: size/slice/sort/contains/
    position/distinct/reverse — the §2.4 'array scalar functions' category.
    Restricted to operations with exact DuckDB list equivalents (same
    1-based indexing convention on both sides via explicit slicing)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.concat_ws("|", F.slice(toks, 1, 3)).alias("first3"),
        F.concat_ws("|", F.slice(F.reverse(toks), 1, 2)).alias("last2_rev"),
        F.concat_ws("|", F.sort_array(F.slice(toks, 1, 4))).alias("first4_sorted"),
        F.array_contains(toks, "data").cast("int").alias("has_data"),
        F.array_position(toks, "table").cast("int").alias("first_table_pos"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.array_intersect(toks, F.array(F.lit("a"), F.lit("the"), F.lit("of"))))
        .alias("n_stop_kinds"),
    )


_ARRAY_FUNCTIONS_ORACLE = """
WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(LEN(toks) AS INTEGER) AS n,
       ARRAY_TO_STRING(LIST_SLICE(toks, 1, 3), '|') AS first3,
       ARRAY_TO_STRING(LIST_SLICE(LIST_REVERSE(toks), 1, 2), '|') AS last2_rev,
       ARRAY_TO_STRING(LIST_SORT(LIST_SLICE(toks, 1, 4)), '|') AS first4_sorted,
       CAST(LIST_CONTAINS(toks, 'data') AS INTEGER) AS has_data,
       CAST(COALESCE(LIST_POSITION(toks, 'table'), 0) AS INTEGER) AS first_table_pos,
       CAST(LEN(LIST_DISTINCT(toks)) AS INTEGER) AS n_uniq,
       CAST(LEN(LIST_INTERSECT(toks, ['a', 'the', 'of'])) AS INTEGER) AS n_stop_kinds
FROM t
"""


def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join: per-nation top-2 customers by balance — a correlated
    subquery with ORDER BY + LIMIT in the FROM clause (Catalyst
    decorrelates it; DecorrelateInnerQuery). Ties broken by c_custkey."""
    from etl_workflows_spark.queries.base import register_views

    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n_name, c_name, c_acctbal
        FROM nation, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        )
        """
    )


_LATERAL_ORACLE = """
SELECT n_name, c_name, c_acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
"""


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): per-nation customer/supplier balance columns
    melted into (n_name, side, bal) — the inverse of agg_pivot.

    NULL cells are EXCLUDED, pinning SQL-standard UNPIVOT semantics
    (DuckDB/BigQuery default). Spark's ``unpivot`` KEEPS NULL cells, so
    the explicit filter is the contract, not decoration — at sf0.001
    some nations have customers but no suppliers and the two engines
    would otherwise disagree 50 vs 35 rows (found by the sf0.001 sweep;
    sf0.01 has no NULL cells, which masked it)."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    cb = (
        cust.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum("c_acctbal").alias("cust_bal"))
    )
    sb = (
        supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum("s_acctbal").alias("supp_bal"))
    )
    wide = cb.join(sb, "n_name", "full_outer")
    return wide.unpivot(["n_name"], ["cust_bal", "supp_bal"], "side", "bal").filter(
        F.col("bal").isNotNull()
    )


_UNPIVOT_ORACLE = """
WITH cb AS (
  SELECT n_name, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
),
sb AS (
  SELECT n_name, CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_bal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
),
wide AS (SELECT COALESCE(cb.n_name, sb.n_name) AS n_name, cust_bal, supp_bal
         FROM cb FULL OUTER JOIN sb ON cb.n_name = sb.n_name)
SELECT n_name, side, bal
FROM wide UNPIVOT (bal FOR side IN (cust_bal, supp_bal))
"""


def agg_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance/correlation per group via EXACT decimal sums.

    Spark's covar_pop/corr accumulate doubles in partition order — not
    reproducible across engines (or even across runs with different
    partitioning). The 2-decimal money columns make Σx, Σy, Σxy exact in
    DECIMAL; the final covariance/correlation is then a deterministic
    double expression of exact integers. Same single-pass shape as the
    built-in (one shuffle, map-side partials)."""
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).alias("sx"),
        F.sum(dec("l_extendedprice")).alias("sy"),
        F.sum(dec("l_quantity") * dec("l_extendedprice")).alias("sxy"),
        F.sum(dec("l_quantity") * dec("l_quantity")).alias("sxx"),
        F.sum(dec("l_extendedprice") * dec("l_extendedprice")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = (sxy - sx * sy / n) / n
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return g.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        cov.alias("covar_qty_price"),
        corr.alias("corr_qty_price"),
    )


_COVARIANCE_ORACLE = """
WITH g AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
  FROM lineitem GROUP BY l_returnflag
),
-- decimal → double goes THROUGH VARCHAR: DuckDB's direct cast of an
-- int128-backed DECIMAL divides component-wise (two roundings) and can
-- land one ulp off the correctly-rounded double (seen at sf0.001:
-- syy 7096786968835.8685 → .869 direct, .868 correct). The string of a
-- decimal is exact and string→double parsing is correctly rounded, so
-- the varchar route always agrees with Spark's BigDecimal.doubleValue.
gd AS (
  SELECT l_returnflag, CAST(n AS DOUBLE) AS nd,
         CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
         CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
         CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
         CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
         CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd
  FROM g
)
SELECT l_returnflag,
       CAST(nd AS BIGINT) AS n_rows,
       (sxyd - sxd * syd / nd) / nd AS covar_qty_price,
       (nd * sxyd - sxd * syd)
       / (SQRT(nd * sxxd - sxd * sxd) * SQRT(nd * syyd - syd * syd))
         AS corr_qty_price
FROM gd
"""


_RCTE_SQL = """
WITH RECURSIVE chain(part, node, depth) AS (
  SELECT p_partkey AS part, p_partkey AS node, 0 AS depth
  FROM part WHERE p_partkey <= 500
  UNION ALL
  SELECT part, CAST(FLOOR(node / 2) AS BIGINT) AS node, depth + 1 AS depth
  FROM chain WHERE node > 1
)
SELECT part, CAST(MAX(depth) AS INTEGER) AS depth_to_root,
       CAST(COUNT(*) AS BIGINT) AS n_ancestors
FROM chain GROUP BY part
"""


def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): ancestor-chain walk over a
    synthetic binary-tree part hierarchy (parent = key div 2) — the
    BOM-explosion / org-chart shape. Each part's depth to the root and
    ancestor count; identical SQL runs on both engines."""
    register_views(spark, sf_dir, "part")
    return spark.sql(_RCTE_SQL)


QUERIES = {
    "window_range_frame": window_range_frame,
    "window_value_functions": window_value_functions,
    "conditional_expressions": conditional_expressions,
    "join_full_outer": join_full_outer,
    "agg_median": agg_median,
    "window_rank_battery": window_rank_battery,
    "agg_having": agg_having,
    "date_arithmetic": date_arithmetic,
    "pipeline_doc_curation": pipeline_doc_curation,
    "array_functions": array_functions,
    "join_lateral_topn": join_lateral_topn,
    "agg_unpivot": agg_unpivot,
    "agg_covariance": agg_covariance,
    "recursive_hierarchy": recursive_hierarchy,
}

ORACLE_SQL = {
    "window_range_frame": _RANGE_FRAME_ORACLE,
    "window_value_functions": _VALUE_FNS_ORACLE,
    "conditional_expressions": _CONDITIONAL_ORACLE,
    "join_full_outer": _FULL_OUTER_ORACLE,
    "agg_median": _MEDIAN_ORACLE,
    "window_rank_battery": _RANK_BATTERY_ORACLE,
    "agg_having": _HAVING_ORACLE,
    "date_arithmetic": _DATE_ARITH_ORACLE,
    "pipeline_doc_curation": _PIPELINE_ORACLE,
    "array_functions": _ARRAY_FUNCTIONS_ORACLE,
    "join_lateral_topn": _LATERAL_ORACLE,
    "agg_unpivot": _UNPIVOT_ORACLE,
    "agg_covariance": _COVARIANCE_ORACLE,
    "recursive_hierarchy": _RCTE_SQL,
}
