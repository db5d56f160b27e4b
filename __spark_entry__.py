"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``etl_workflows_spark/queries/`` — this module
is just the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-table snowflake join
    with exact-decimal revenue aggregation (TPC-H Q5 shape, all regions)."""
    from etl_workflows_spark.queries.relational import q5_all_regions

    return q5_all_regions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-pipeline operators). Each callable takes (spark, sf_dir) and
    returns a DataFrame with columns aliased to match ``oracle_sql``."""
    from etl_workflows_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every exactly-reproducible query.
    Approximate operators (MinHash-LSH, hyperplane-LSH ANN) are omitted →
    rows-only check; their exact twins are oracle-checked."""
    from etl_workflows_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
