"""MERGE INTO (upsert) for managed parquet tables, partition-pruned.

The warehouse op the reference's append/truncate dispositions can't
express: "update matched rows, insert new ones, leave the rest alone".
Plain parquet has no transaction log, so MERGE must rewrite data — the
scale question is *how much*. Two paths:

* **Partitioned target** (the 100 TB path): only partitions that contain
  a source key are rewritten. Affected partition values come from the
  (small) source side; the target scan is partition-pruned to them; the
  write uses dynamic partition overwrite so untouched partitions are
  never read or written. Cost scales with the touched slice, not the
  table.
* **Unpartitioned target**: full rewrite through a staging table + the
  same catalog swap compaction uses (overwrite-in-place would fail —
  Spark refuses to overwrite a table from a plan that reads it).

With Delta/Iceberg this operation becomes the native ``MERGE INTO``; the
semantics here (update-all-matched-columns, insert-unmatched) match that
statement's most common form, so pipelines written against this operator
port directly.

Reference parity: none — net-new (SURVEY.md §2.3 covers only W2/W3
dispositions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL


def _partition_spec(p, part_cols: list[str]) -> str:
    """ALTER TABLE ... PARTITION spec for a row of partition values —
    single quotes escaped (a value like O'Brien would otherwise break the
    statement AFTER the data overwrite already ran), NULL rendered as the
    Hive default-partition token (str(None) would silently match
    nothing and leave the stale partition alive)."""
    out = []
    for c in part_cols:
        v = p[c]
        if v is None:
            v = "__HIVE_DEFAULT_PARTITION__"
        out.append("{} = '{}'".format(c, str(v).replace("'", "''")))
    return ", ".join(out)


def merge_into(
    spark: SparkSession,
    target_table: str,
    source: DataFrame,
    key_cols: list[str],
) -> dict[str, int]:
    """Upsert ``source`` into ``target_table`` on ``key_cols``.

    Matched target rows are replaced by their source row; unmatched
    source rows are inserted; unmatched target rows are untouched. If the
    source has several rows per key, the statement is ambiguous — raises
    ValueError (same contract as SQL MERGE's cardinality check).

    Returns ``{"matched": n, "inserted": n, "partitions_rewritten": n}``
    (partitions_rewritten = -1 for the unpartitioned full rewrite).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    target = spark.table(target_table)
    if set(source.columns) != set(target.columns):
        raise ValueError(
            f"source columns {sorted(source.columns)} must match target "
            f"{sorted(target.columns)}"
        )
    dupes = (
        source.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
    )
    if dupes.limit(1).count():
        raise ValueError("source has multiple rows per merge key (ambiguous MERGE)")

    part_cols = [
        c.name for c in spark.catalog.listColumns(target_table) if c.isPartition
    ]
    src = source.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)  # cut lineage; it's read 3×
    keys = src.select(*key_cols)
    # matched counts SOURCE keys present in the target (not target rows:
    # a target holding duplicate rows per key — e.g. after a crashed
    # earlier merge — would inflate matched and drive inserted negative)
    matched = keys.join(target, key_cols, "leftsemi").count()
    inserted = src.count() - matched

    # align column order with the target for the union/write
    src_aligned = src.select(*target.columns)

    if part_cols:
        # The partitions MERGE must touch: the source's own partition
        # values PLUS the partitions holding the OLD row of any matched
        # key whose partition value changed in the source (source values
        # alone would strand that row as a duplicate key). The target-side
        # lookup is the same broadcast semi-join scan `matched` already
        # paid for — no new asymptotic cost.
        src_pvals = src.select(*part_cols).distinct()
        tgt_pvals = (
            target.join(F.broadcast(keys), key_cols, "leftsemi")
            .select(*part_cols)
            .distinct()
        )
        pvals = (
            src_pvals.unionByName(tgt_pvals).distinct().localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
        )
        affected = target.join(F.broadcast(pvals), part_cols, "leftsemi")
        survivors = affected.join(F.broadcast(keys), key_cols, "leftanti")
        merged = survivors.select(*target.columns).unionByName(src_aligned)
        # survivors reads the target; materialize before overwriting it
        merged = merged.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").insertInto(target_table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # a partition whose every row moved away writes no files under
        # dynamic overwrite and would silently keep its old data — drop it
        for p in pvals.join(
            merged.select(*part_cols).distinct(), part_cols, "leftanti"
        ).collect():
            spec = _partition_spec(p, part_cols)
            spark.sql(f"ALTER TABLE {target_table} DROP IF EXISTS PARTITION ({spec})")
        return {
            "matched": matched,
            "inserted": inserted,
            "partitions_rewritten": pvals.count(),
        }

    survivors = target.join(F.broadcast(keys), key_cols, "leftanti")
    merged = survivors.select(*target.columns).unionByName(src_aligned)
    merged = merged.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    _staging_swap(spark, target_table, merged, "merge")
    return {"matched": matched, "inserted": inserted, "partitions_rewritten": -1}


def _staging_swap(spark: SparkSession, target_table: str, df, op: str) -> None:
    """Rewrite ``target_table`` from ``df`` via staging + catalog swap,
    PRESERVING the table's layout — a bare saveAsTable would silently
    convert an ORC table to the session default and drop any bucket spec
    (compare compact_table, which carries the full layout through)."""
    from etl_workflows_spark.sinks.compact import table_layout_full
    from etl_workflows_spark.sinks.writer import write_table

    _, bucket, fmt, bucket_sort = table_layout_full(spark, target_table)
    staging = f"{target_table}__{op}_staging"
    write_table(
        df,
        staging,
        bucket_by=bucket,
        file_format=fmt,
        bucket_sort_cols=bucket_sort,
    )
    spark.sql(f"DROP TABLE {target_table}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {target_table}")


def delete_from(
    spark: SparkSession,
    target_table: str,
    keys: DataFrame,
    key_cols: list[str],
) -> dict[str, int]:
    """DELETE FROM target WHERE key IN keys — the DML twin of
    ``merge_into`` (TPC-H RF2's shape), with the same scale posture:

    * partitioned target → only partitions containing a doomed key are
      rewritten (dynamic partition overwrite; the doomed-key partition
      values come from the small side);
    * unpartitioned target → staging rewrite + catalog swap.

    Returns ``{"deleted": n, "partitions_rewritten": n | -1}``. Idempotent:
    re-deleting the same keys is a no-op.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    target = spark.table(target_table)
    part_cols = [
        c.name for c in spark.catalog.listColumns(target_table) if c.isPartition
    ]
    k = keys.select(*key_cols).distinct().localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    deleted = target.join(F.broadcast(k), key_cols, "leftsemi").count()

    if part_cols:
        doomed_parts = (
            target.join(F.broadcast(k), key_cols, "leftsemi")
            .select(*part_cols)
            .distinct()
            .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
        )
        n_parts = doomed_parts.count()
        if n_parts == 0:
            return {"deleted": 0, "partitions_rewritten": 0}
        affected = target.join(F.broadcast(doomed_parts), part_cols, "leftsemi")
        survivors = affected.join(F.broadcast(k), key_cols, "leftanti").select(
            *target.columns
        )
        survivors = survivors.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            survivors.write.mode("overwrite").insertInto(target_table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # a partition whose every row was doomed writes no files under
        # dynamic overwrite and silently keeps its old data — rewrite it
        # empty is impossible in this mode, so drop it via the catalog
        for p in doomed_parts.join(
            survivors.select(*part_cols).distinct(), part_cols, "leftanti"
        ).collect():
            spec = _partition_spec(p, part_cols)
            spark.sql(f"ALTER TABLE {target_table} DROP IF EXISTS PARTITION ({spec})")
        return {"deleted": deleted, "partitions_rewritten": n_parts}

    survivors = target.join(F.broadcast(k), key_cols, "leftanti").select(
        *target.columns
    )
    survivors = survivors.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    _staging_swap(spark, target_table, survivors, "delete")
    return {"deleted": deleted, "partitions_rewritten": -1}
