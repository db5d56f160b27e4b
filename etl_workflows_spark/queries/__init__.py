"""Query catalog: every operator from SURVEY.md §2 as a (Spark, oracle-SQL)
pair, used by ``__spark_entry__.py`` for the driver's DuckDB correctness gate.

``QUERIES`` maps name → callable(spark, sf_dir) → DataFrame.
``ORACLE_SQL`` maps name → equivalent ANSI SQL for DuckDB (absent for
non-SQL-expressible ops, which get a weaker rows-only check).
"""

from etl_workflows_spark.queries import (
    analytics,
    llm,
    relational,
    relational_ext,
    tpch_shapes,
    tpch_shapes2,
)

QUERIES = {
    **relational.QUERIES,
    **relational_ext.QUERIES,
    **tpch_shapes.QUERIES,
    **tpch_shapes2.QUERIES,
    **analytics.QUERIES,
    **llm.QUERIES,
}
ORACLE_SQL = {
    **relational.ORACLE_SQL,
    **relational_ext.ORACLE_SQL,
    **tpch_shapes.ORACLE_SQL,
    **tpch_shapes2.ORACLE_SQL,
    **analytics.ORACLE_SQL,
    **llm.ORACLE_SQL,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
