from etl_workflows_spark.plans.load_csv import load_csv
from etl_workflows_spark.plans.load_query import load_query

__all__ = ["load_csv", "load_query"]
