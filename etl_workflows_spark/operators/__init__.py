from etl_workflows_spark.operators.coerce import coerce_columns, coercion_expr

__all__ = ["coerce_columns", "coercion_expr"]
