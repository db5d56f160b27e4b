"""Table sink: write dispositions + destination-name templating.

Disposition mapping (SURVEY.md W2/W3):

  * reference ``WRITE_TRUNCATE``  → ``mode("overwrite")``
  * reference ``WRITE_APPEND``    → ``mode("append")``
  * reference ``CREATE_IF_NEEDED``→ implicit in ``saveAsTable`` (and we
    ``CREATE DATABASE IF NOT EXISTS`` for the namespace)

Reference: LoadJobConfig at functions/load_csv/main.py:158-169 and
QueryJobConfig at functions/load_query/main.py:50-55.

Destination-name templating (functions/load_csv/main.py:26,45-47;
README.md:31-32): every ``{start:end}`` group in the destination name is
replaced by that character slice of the source file name, e.g. destination
``ds.cars_{5:11}`` + file ``cars_202109.csv`` → table ``ds.cars_202109`` —
this is how the reference date-partitions table names.

Storage format: Parquet managed tables. At cluster scale the same writer
accepts ``partition_by`` so big facts land partitioned (e.g. by date), which
turns downstream date filters into partition pruning.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from etl_workflows_spark.exceptions import CreationFailed, LoadJobError

# Same pattern as the reference's DESTINATION_TABLE_REGEX (main.py:26).
DESTINATION_TABLE_REGEX = r"\{([0-9]+:[0-9]+)\}"


def template_destination(destination_table: str, source_file_name: str) -> str:
    """Replace ``{start:end}`` groups with slices of the source file name."""
    for g in re.findall(DESTINATION_TABLE_REGEX, destination_table):
        start, end = g.split(":")
        destination_table = destination_table.replace(
            "{" + g + "}", source_file_name[int(start) : int(end)]
        )
    return destination_table


def normalize_table_name(destination_table: str) -> str:
    """Map the reference's ``project.dataset.table`` onto the Spark catalog's
    ``database.table`` (the project component is a GCP billing concept with
    no Spark equivalent — dropped; 1-part names go to the current database).
    """
    parts = destination_table.split(".")
    if len(parts) >= 2:
        return ".".join(parts[-2:])
    return parts[0]


# Columnar formats the sink speaks; both support zstd in Spark 4. (Avro
# needs the spark-avro package — not bundled; declared out of scope.)
SUPPORTED_FORMATS = ("parquet", "orc")


def write_table(
    df: DataFrame,
    destination_table: str,
    append: bool = False,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    file_format: str = "parquet",
    bloom_filter_cols: list[str] | None = None,
    bucket_sort_cols: list[str] | None = None,
) -> str:
    """Write ``df`` to a managed table with the requested disposition.

    Returns the fully-qualified table name written. Errors during the write
    map to the reference's taxonomy: namespace/table creation failures →
    CreationFailed, anything else → LoadJobError (main.py:173-179).

    Scale knobs: ``partition_by`` prunes scans on the partition column
    (give big fact tables a date partition); ``bucket_by=(n, cols)``
    pre-shuffles data into n buckets on cols so downstream equi-joins and
    aggregations on those keys skip their shuffle entirely (both sides
    bucketed the same way ⇒ sort-merge join with zero Exchange);
    ``file_format`` picks the columnar layout (parquet default, orc for
    ORC-standardized lakes — readers get the same pushdown/pruning);
    ``bloom_filter_cols`` writes parquet column bloom filters for
    point-lookup skipping on HIGH-CARDINALITY keys (ids, hashes) where
    min-max stats are useless — a row group whose bloom filter rejects
    the probed value is skipped without decoding. Complements, not
    replaces, Z-order + min-max manifests (those serve range predicates).
    """
    if file_format not in SUPPORTED_FORMATS:
        raise ValueError(
            f"file_format must be one of {SUPPORTED_FORMATS}, got {file_format!r}"
        )
    table = normalize_table_name(destination_table)
    spark = df.sparkSession
    if "." in table:
        db = table.split(".")[0]
        try:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        except Exception as e:  # pragma: no cover - filesystem/catalog faults
            raise CreationFailed() from e
    writer = (
        df.write.mode("append" if append else "overwrite")
        .format(file_format)
        # zstd: ~30-50% smaller than snappy at comparable read speed —
        # at 100 TB the scan-time win from smaller files dominates.
        .option("compression", "zstd")
    )
    if bloom_filter_cols:
        if file_format != "parquet":
            raise ValueError("bloom_filter_cols requires file_format='parquet'")
        for c in bloom_filter_cols:
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        # default in-bucket sort = the bucket key (what bucketed_pair_join
        # relies on); bucket_sort_cols overrides for wider sort specs —
        # a rewrite (compaction, merge staging) passes the original
        # table's spec through so it survives
        writer = writer.bucketBy(n, *cols).sortBy(*(bucket_sort_cols or cols))
    try:
        writer.saveAsTable(table)
    except Exception as e:
        raise LoadJobError() from e
    return table


def append_if_absent(
    df: DataFrame, destination_table: str, keys: list[str]
) -> str:
    """Idempotent append: insert only rows whose ``keys`` are not already
    present — the batch-mode MERGE-style fix for the reference's
    at-least-once hazard (SURVEY.md §2.6: a crash between load and archive
    re-appends the same file on rerun). A retried append with this sink is
    a no-op instead of a duplicate.

    Scale: the anti join shuffles on ``keys``; on a key-bucketed
    destination (``bucket_by``) the existing side reads shuffle-free.
    (With a transactional table format — Delta/Iceberg — this becomes a
    real MERGE; parquet tables get the anti-join form.)
    """
    table = normalize_table_name(destination_table)
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        return write_table(df, destination_table, append=False)
    existing = spark.table(table).select(*keys)
    # eqNullSafe: a plain equi anti-join never matches NULL = NULL, so a
    # NULL-keyed row would be re-appended on EVERY retry — the exact
    # at-least-once duplicate this sink exists to prevent
    cond = None
    for k in keys:
        c = df[k].eqNullSafe(existing[k])
        cond = c if cond is None else (cond & c)
    fresh = df.join(existing, cond, "left_anti")
    return write_table(fresh, destination_table, append=True)


def collect_stats(spark, table: str, columns: list[str] | None = None) -> None:
    """ANALYZE the table so Catalyst's cost-based optimizer has real
    row counts and NDVs (join reordering, broadcast decisions beyond the
    static size threshold). Run after large loads/compactions; cheap
    relative to the queries it improves at 100 TB."""
    from etl_workflows_spark.sinks.stats import analyze

    # one implementation: stats.analyze (which quotes column names —
    # this wrapper exists for the writer-module call sites)
    analyze(spark, normalize_table_name(table), columns)
