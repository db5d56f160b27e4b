"""etl_workflows_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference system
``devoteam-g-cloud/etl-workflows`` (a GCS→BigQuery serverless ETL pipeline)
on Apache Spark, plus the large-scale training-data-pipeline operators a
100 TB corpus needs (dedup, similarity search, text analysis, multimodal
columns).

Public API (mirrors the reference's two cloud functions — see
reference functions/load_csv/main.py:40 and functions/load_query/main.py:20):

    from etl_workflows_spark import get_spark, load_csv, load_query

    spark = get_spark()
    load_csv(spark, bucket_dir, prefix, schema_path, "db.cars")
    load_query(spark, "big_US_cars.sql", "db.big_US_cars", append=True)

Everything else (dedup/similarity/text/multimodal operators, the workflow
orchestrator, streaming incremental ingest) lives in submodules.
"""

from etl_workflows_spark.session import get_spark
from etl_workflows_spark.plans.load_csv import load_csv
from etl_workflows_spark.plans.load_query import load_query
from etl_workflows_spark.exceptions import (
    EngineError,
    CsvNotFound,
    CsvInvalid,
    SchemaNotFound,
    SchemaInvalid,
    QueryNotFound,
    QueryInvalid,
    LoadJobError,
    CreationFailed,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "load_csv",
    "load_query",
    "EngineError",
    "CsvNotFound",
    "CsvInvalid",
    "SchemaNotFound",
    "SchemaInvalid",
    "QueryNotFound",
    "QueryInvalid",
    "LoadJobError",
    "CreationFailed",
]
