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


def table_layout(
    spark: SparkSession, table: str
) -> tuple[list[str], tuple[int, list[str]] | None]:
    """(partition columns, bucket spec) of a managed table, from the
    catalog — what a compaction rewrite must preserve."""
    part_cols, bucket, _, _ = table_layout_full(spark, table)
    return part_cols, bucket


def table_layout_full(
    spark: SparkSession, table: str
) -> tuple[list[str], tuple[int, list[str]] | None, str, list[str] | None]:
    """(partition columns, bucket spec, file format, bucket sort columns)
    — EVERYTHING a staging rewrite must carry over; dropping any of them
    silently converts the table (e.g. ORC → session-default parquet, or a
    (k, ts) sort spec collapsing to (k))."""
    part_cols = [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
    # dict is last-wins: the metadata section follows the column list, so
    # a data column named 'Num Buckets' cannot shadow the real spec
    meta = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }

    def _collist(s: str) -> list[str]:
        return [c.strip(" `") for c in s.strip("[]").split(",") if c.strip(" `")]

    bucket = None
    sort_cols = None
    if meta.get("Num Buckets"):
        bucket = (int(meta["Num Buckets"]), _collist(meta["Bucket Columns"]))
        if meta.get("Sort Columns"):
            sort_cols = _collist(meta["Sort Columns"]) or None
    fmt = (meta.get("Provider") or "parquet").lower()
    if fmt not in ("parquet", "orc"):
        # hive-serde and exotic providers can't round-trip through the
        # datasource writer — the rewrite normalizes them to parquet
        # (the pre-existing behavior, now deliberate instead of silent)
        fmt = "parquet"
    return part_cols, bucket, fmt, sort_cols


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``table`` into ~ceil(size/target) files; returns the task
    count used. Partitioning and bucketing survive the rewrite — losing
    them would silently forfeit partition pruning and shuffle-free
    bucketed joins on the first compaction.

    ``sort_by`` clusters rows so parquet row-group min/max prune scans on
    those columns (the poor man's Z-order for a single sort axis);
    ignored for bucketed tables (the bucket spec's own sortBy governs).
    """
    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks.writer import write_table

    size = table_bytes(spark, table)
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    part_cols, bucket, fmt, bucket_sort = table_layout_full(spark, table)
    df = spark.table(table)
    if bucket:
        # repartition by the bucket hash into exactly n buckets: each
        # task holds one bucket's rows, so bucketBy writes ONE file per
        # bucket (repartition(n) round-robin would give every task every
        # bucket → n_files × n_buckets files, MORE than before)
        out = df.repartition(bucket[0], *[F.col(c) for c in bucket[1]])
    elif part_cols:
        # cap tasks at n_files, but spread a giant partition value over
        # several tasks — hashing on part_cols alone funnels each value
        # into ONE task/file regardless of its size
        n_parts = max(1, spark.sql(f"SHOW PARTITIONS {table}").count())
        files_per_part = max(1, math.ceil(n_files / n_parts))
        keys = [F.col(c) for c in part_cols]
        if files_per_part > 1:
            # salt over HASHABLE columns only — xxhash64 on MapType is
            # disallowed in Spark at ANY nesting depth, and a table
            # carrying a map column would otherwise fail to compact at
            # all. If EVERY column contains a map, hash the rows' JSON
            # rendering instead (to_json accepts any type) — falling back
            # to part_cols would reintroduce the very AnalysisException
            # this branch exists to avoid.
            from etl_workflows_spark.schema.types import is_hashable

            hashable = [
                f.name for f in df.schema.fields if is_hashable(f.dataType)
            ]
            if hashable:
                salt_src = F.xxhash64(*[F.col(c) for c in hashable])
            else:
                salt_src = F.xxhash64(F.to_json(F.struct(*df.columns)))
            keys.append(F.pmod(salt_src, F.lit(files_per_part)))
        out = df.repartition(n_files, *keys)
    else:
        out = df.repartition(n_files)
    if sort_by and not bucket:
        out = out.sortWithinPartitions(*sort_by)
    staging = f"{table}__compact_staging"
    write_table(
        out,
        staging,
        partition_by=part_cols or None,
        bucket_by=bucket,
        file_format=fmt,
        bucket_sort_cols=bucket_sort,
    )
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    if part_cols:
        # renaming a managed partitioned table moves its root but leaves
        # per-partition locations pointing at the staging path — re-derive
        # them from the moved directory layout
        spark.sql(f"MSCK REPAIR TABLE {table}")
    return n_files
