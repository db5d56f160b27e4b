"""Incremental materialized-rollup maintenance (batch IVM).

A materialized aggregate over an append-only fact table doesn't need
recomputation when new rows arrive: additive aggregates (count, sum, and
anything derived from them) merge. This module maintains an hourly rollup
by processing ONLY the new slice and merging group-wise — the batch
counterpart of the streaming rollup (streaming/incremental.py), for shops
that run cron-style batches over an append-only lake.

Merge strategy on plain parquet: read current rollup, union the delta's
partial aggregate, re-aggregate the (tiny) union, overwrite. The
re-aggregated frame is small (one row per group), so the overwrite cost is
bounded by the rollup's own size, never the fact table's. (On a
transactional format this becomes a MERGE on the group key.)

High-water-mark discipline: the caller passes the new slice (e.g. rows
with ts > last watermark); tracking the watermark is one value per table —
store it beside the rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_rollup_delta(events_delta: DataFrame) -> DataFrame:
    """Partial (mergeable) hourly aggregate of an event slice."""
    return events_delta.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


def merge_rollup(
    spark: SparkSession,
    rollup_table: str,
    delta: DataFrame,
) -> None:
    """Merge a partial aggregate into the materialized rollup table.

    Creates the table on first call. Counts/sums add; groups only present
    on one side pass through.
    """
    if not spark.catalog.tableExists(rollup_table):
        delta.write.format("parquet").saveAsTable(rollup_table)
        return
    current = spark.table(rollup_table)
    merged = (
        current.unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    # Staging + catalog swap (the merge/compact discipline), NOT
    # checkpoint-then-overwrite: localCheckpoint blocks are executor-local
    # with severed lineage, so losing an executor mid-overwrite would
    # leave the rollup dropped/partial with no way to recompute — the
    # swap keeps the old table intact until the new one is fully written.
    from etl_workflows_spark.sinks.merge import _staging_swap

    _staging_swap(spark, rollup_table, merged, "rollup")


def rollup_apply_changes(
    spark: SparkSession,
    rollup_table: str,
    changes: DataFrame,
    op_col: str = "op",
) -> None:
    """IVM with RETRACTIONS: maintain the rollup from a change feed
    (op ∈ {I, D} rows of the fact schema — the ``sinks/cdc.py`` feed
    shape) instead of an append-only slice. Deletes SUBTRACT: each
    change aggregates with sign ±1, merges like any partial, and groups
    whose count reaches zero drop out of the materialization.

    Only invertible aggregates survive retraction (count, sum, avg =
    sum/count — anything a signed partial can express). min/max are NOT
    maintainable this way (deleting the current minimum needs the full
    group history) — that is a property of IVM, not this module; keep
    non-invertible aggregates on full-recompute or sketch paths.

    An update travels as (D old-row, I new-row) — exactly what a CDC
    decoder emits.
    """
    # isNull explicitly: ~isin is NULL (filtered out) for NULL ops, which
    # would bypass validation and then count as +1 inserts via otherwise()
    bad = changes.filter(
        F.col(op_col).isNull() | ~F.col(op_col).isin("I", "D")
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"unknown change op {bad[0][op_col]!r}: rollup changes must "
            "be I (insert) or D (delete); updates travel as D+I"
        )
    sign = F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
    signed = changes.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.col("event_type"),
    ).agg(
        F.sum(sign).alias("n_events"),
        F.sum(
            sign.cast("decimal(18,2)") * F.col("value").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("sum_value"),
    )
    merge_rollup(spark, rollup_table, signed)
    # groups fully retracted: count 0 ⇒ no remaining fact rows back them
    zero = spark.table(rollup_table).filter(F.col("n_events") == 0)
    if zero.limit(1).collect():
        from etl_workflows_spark.sinks.merge import _staging_swap

        # the staging write reads the live table (still intact), so no
        # checkpoint is needed before the swap
        kept = spark.table(rollup_table).filter(F.col("n_events") != 0)
        _staging_swap(spark, rollup_table, kept, "purge")
