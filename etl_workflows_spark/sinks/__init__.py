from etl_workflows_spark.sinks.writer import write_table, template_destination

__all__ = ["write_table", "template_destination"]
