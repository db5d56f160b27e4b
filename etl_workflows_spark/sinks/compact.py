"""Small-file compaction for managed parquet tables.

Long-running ingest (daily loads, streaming micro-batches) accretes many
small files; at 100 TB the scan-planning and open() overhead of millions
of tiny files dominates query latency. Compaction rewrites a table into
~target-sized files, optionally sorted so min/max row-group stats become
selective (clustering for data skipping).

Parquet managed tables have no transaction log, so the rewrite uses a
staging table + atomic-ish catalog swap rather than overwrite-in-place
(a reader mid-overwrite would see a truncated table; the swap window is
the two metastore renames). With Delta/Iceberg this operation becomes
OPTIMIZE/rewrite_data_files.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def table_bytes(spark: SparkSession, table: str) -> int:
    """Physical size of a managed table from the catalog's file listing."""
    # [-1]: the metadata section follows the column list, so a data column
    # literally named "Location" can't shadow the table-location row
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter("col_name = 'Location'")
        .collect()[-1]["data_type"]
    )
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(loc)
    fs = path.getFileSystem(conf)
    return fs.getContentSummary(path).getLength()


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``table`` into ceil(size/target) files; returns file count.

    ``sort_by`` clusters rows so parquet row-group min/max prune scans on
    those columns (the poor man's Z-order for a single sort axis).
    """
    size = table_bytes(spark, table)
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.table(table)
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    staging = f"{table}__compact_staging"
    out.write.mode("overwrite").format("parquet").option(
        "compression", "zstd"
    ).saveAsTable(staging)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    return n_files
