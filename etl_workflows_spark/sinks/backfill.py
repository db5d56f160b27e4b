"""Scoped partition backfill: recompute exactly the named partitions of
a partitioned table from a rebuild function, touching nothing else.

The recurring operational incident: one day's load was wrong (bad
upstream file, a coercion bug since fixed), the table is N years of
date partitions, and the fix must (a) rewrite ONLY the affected
partitions, (b) be idempotent under retry, and (c) be impossible to
fat-finger into clobbering unrelated data.

Mechanics: the rebuild function produces the replacement rows; a
guard rejects any row whose partition value is outside the requested
set (under dynamic partition overwrite a stray row would silently
rewrite an unrequested partition — the exact fat-finger this module
exists to prevent); the write lands with dynamic partition overwrite
so untouched partitions' files are not even opened.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL


def backfill_partitions(
    spark: SparkSession,
    table: str,
    partition_col: str,
    values: Sequence,
    rebuild: Callable[[SparkSession, Sequence], DataFrame],
) -> dict:
    """Recompute partitions ``values`` of ``table`` via ``rebuild`` and
    land them with dynamic partition overwrite. Returns per-partition
    row counts. Idempotent: re-running with the same rebuild output
    replaces the partitions with identical content.

    A rebuild that produces rows OUTSIDE the requested partitions —
    or produces NO rows for a requested partition (dynamic overwrite
    would silently keep the old, wrong data there) — fails before any
    write happens.
    """
    if not values:
        raise ValueError("values must name at least one partition")
    df = rebuild(spark, values).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    # isNull first: ~isin(...) is NULL (not true) for NULL partition
    # values, which would slip past the guard and land in the Hive
    # default partition under dynamic overwrite
    stray = df.filter(
        F.col(partition_col).isNull()
        | ~F.col(partition_col).isin(list(values))
    ).limit(1).collect()
    if stray:
        raise ValueError(
            f"rebuild produced rows outside the requested partitions "
            f"(e.g. {partition_col}={stray[0][partition_col]!r}) — refusing "
            "to write; a stray row under dynamic overwrite would clobber "
            "an unrequested partition"
        )
    got = {
        r[partition_col]: r["n"]
        for r in df.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = [v for v in values if v not in got]
    if missing:
        raise ValueError(
            f"rebuild produced no rows for requested partition(s) "
            f"{missing} — dynamic overwrite would keep their old data; "
            "use delete_from/ALTER TABLE DROP PARTITION to empty a "
            "partition intentionally"
        )
    target_cols = spark.table(table).columns
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.select(*target_cols).write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshTable(table)
    return {"partitions": got}
