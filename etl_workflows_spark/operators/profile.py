"""Data profiling: per-column statistics in one pass over the table.

The ETL counterpart of a warehouse's column-stats collection: null
fractions and distinct counts feed curation gates (a column that went 40%
null between corpus drops is a pipeline bug), min/max feed partition-layout
decisions.

Scale: ONE aggregation job regardless of column count — every per-column
statistic is an expression in the same agg (Spark evaluates them in a
single scan + single-row reduce). countDistinct over many columns expands
to an Expand node (one pass per distinct column over the scan's output,
still one shuffle); swap in approx_count_distinct for trillion-row tables
where exact distinct counts aren't worth the expand factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct, min_str,
    max_str). min/max are cast to string so the output schema is uniform
    across column types."""
    cols = cols or df.columns
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    # index-based aliases + df[c] references: column names containing
    # dots or other F.col-special characters must profile fine — this
    # operator's whole contract is "runs over any table"
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        # map columns support neither countDistinct nor min/max — profile
        # their JSON rendering instead of failing the WHOLE table
        # (nullability is preserved: to_json(NULL map) is NULL)
        v = F.to_json(df[c]) if dtypes[c].startswith("map") else df[c]
        aggs += [
            F.count(v).alias(f"__nn_{i}"),
            distinct(v).alias(f"__nd_{i}"),
            F.min(v).cast("string").alias(f"__min_{i}"),
            F.max(v).cast("string").alias(f"__max_{i}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{i}")).alias("n_nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_str"),
                F.col(f"__max_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
