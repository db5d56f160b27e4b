from etl_workflows_spark.orchestrate.workflow import (
    WorkflowRunner,
    WorkflowError,
    build_engine_registry,
)

__all__ = ["WorkflowRunner", "WorkflowError", "build_engine_registry"]
