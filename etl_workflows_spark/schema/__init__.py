from etl_workflows_spark.schema.registry import (
    load_schema_file,
    parse_schema_doc,
    to_struct_type,
    field_names,
)

__all__ = ["load_schema_file", "parse_schema_doc", "to_struct_type", "field_names"]
