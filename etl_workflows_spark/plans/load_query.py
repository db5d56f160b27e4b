"""The ``load_query`` pipeline — the reference's second cloud function.

Fetch a ``.sql`` file, run it, materialize the result into a destination
table with append/overwrite disposition (reference functions/load_query/
main.py:20-60). The whole relational surface rides on ``spark.sql`` —
Catalyst plans and optimizes; no engine code interprets the query.

``use_legacy_sql`` is part of the reference API (load_query/main.py:51,
default False) but BigQuery's legacy dialect is an explicit non-goal
(SURVEY.md §2.4): accepted and warned on, rejected if True.
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import SparkSession

from etl_workflows_spark.exceptions import CreationFailed, QueryInvalid
from etl_workflows_spark.sinks.writer import write_table
from etl_workflows_spark.sources.query_source import read_query_file

logger = logging.getLogger(__name__)


def load_query(
    spark: SparkSession,
    query: str,
    destination_table: str,
    use_legacy_sql: bool = False,
    append: bool = False,
) -> str:
    """Run the query file and write its result; returns the table written."""
    if use_legacy_sql:
        logger.warning("useLegacySql=True requested; legacy SQL is not supported")
        raise QueryInvalid("Legacy SQL dialect is not supported")
    sql_text = read_query_file(query, spark)
    # The reference maps ANY failed query job to CreationFailed / "Error
    # during table creation" (load_query/main.py:58-65) — a different
    # taxonomy than load_csv's LoadJobError. The description strings are a
    # public contract the workflow DAG can branch on, so re-map here.
    # spark.sql is INSIDE the try: analysis failures (missing table/column)
    # surface at job time in BigQuery, i.e. inside the reference's
    # remapped path.
    try:
        result = spark.sql(sql_text)
        return write_table(result, destination_table, append=append)
    except CreationFailed:
        raise
    except Exception as e:
        raise CreationFailed() from e


def execute_job_from_config(spark: SparkSession, config: dict[str, Any]) -> str:
    """HTTP-body-shaped entry point (camelCase keys, reference
    load_query/main.py:72-75)."""
    return load_query(
        spark,
        query=config.get("query"),
        destination_table=config.get("destinationTable"),
        use_legacy_sql=config.get("useLegacySql", False),
        append=config.get("append", False),
    )
