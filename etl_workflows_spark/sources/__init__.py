from etl_workflows_spark.sources.files import find_most_recent_csv, archive_processed
from etl_workflows_spark.sources.csv_source import read_raw_csv
from etl_workflows_spark.sources.query_source import read_query_file

__all__ = [
    "find_most_recent_csv",
    "archive_processed",
    "read_raw_csv",
    "read_query_file",
]
