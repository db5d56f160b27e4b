"""The engine's public scalar-function surface.

The reference's function surface is BigQuery Standard SQL in toto
(SURVEY.md §2.4) — on Spark that surface is ``pyspark.sql.functions`` /
Spark SQL built-ins, available unmodified. This package adds the
BigQuery-dialect helpers whose semantics differ from Spark's spelling
(bq_compat) and the blessed vectorized-UDF patterns for custom logic
(udfs).
"""

from etl_workflows_spark.functions.bq_compat import (
    safe_cast,
    safe_divide,
    regexp_contains,
    parse_timestamp,
    timestamp_trunc,
)

__all__ = [
    "safe_cast",
    "safe_divide",
    "regexp_contains",
    "parse_timestamp",
    "timestamp_trunc",
]
