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
    # Materialize (executor-side) before overwriting the table being read —
    # localCheckpoint severs the plan's dependency on the files the
    # overwrite is about to replace, without pulling rows to the driver.
    merged.localCheckpoint(eager=True).write.mode("overwrite").format(
        "parquet"
    ).saveAsTable(rollup_table)
