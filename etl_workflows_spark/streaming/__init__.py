from etl_workflows_spark.streaming.incremental import (
    incremental_csv_load,
    streaming_hourly_rollup,
)

__all__ = ["incremental_csv_load", "streaming_hourly_rollup"]
