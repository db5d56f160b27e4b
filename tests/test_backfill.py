"""Scoped partition backfill (sinks/backfill.py): only the named
partitions are rewritten (untouched partitions' files bit-identical),
guards fire before any write, reruns are idempotent."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.sinks.backfill import backfill_partitions
from etl_workflows_spark.sinks.writer import write_table


def _files_with_mtimes(spark, table, part):
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter("col_name = 'Location'")
        .first()["data_type"]
    ).replace("file:", "")
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{loc}/day={part}/*.parquet")
    }


@pytest.fixture()
def daily(spark):
    spark.sql("DROP TABLE IF EXISTS bf_t")
    rows = [(d, i, float(i)) for d in (1, 2, 3) for i in range(d * 10)]
    write_table(
        spark.createDataFrame(rows, "day int, k int, v double"),
        "bf_t",
        partition_by=["day"],
    )
    yield "bf_t"
    spark.sql("DROP TABLE IF EXISTS bf_t")


def test_backfill_rewrites_only_requested_partition(spark, daily):
    before_d1 = _files_with_mtimes(spark, daily, 1)
    before_d3 = _files_with_mtimes(spark, daily, 3)

    def rebuild(s, vals):
        return s.createDataFrame(
            [(2, i, 99.0) for i in range(5)], "day int, k int, v double"
        )

    out = backfill_partitions(spark, daily, "day", [2], rebuild)
    assert out == {"partitions": {2: 5}}
    got = spark.table(daily)
    assert got.filter("day = 2").count() == 5
    assert {r["v"] for r in got.filter("day = 2").collect()} == {99.0}
    # untouched partitions: same files, same mtimes
    assert _files_with_mtimes(spark, daily, 1) == before_d1
    assert _files_with_mtimes(spark, daily, 3) == before_d3
    # idempotent rerun
    out2 = backfill_partitions(spark, daily, "day", [2], rebuild)
    assert out2 == out
    assert spark.table(daily).filter("day = 2").count() == 5


def test_stray_rows_refused_before_write(spark, daily):
    def bad_rebuild(s, vals):
        return s.createDataFrame(
            [(2, 1, 0.0), (3, 1, 0.0)], "day int, k int, v double"
        )

    before = spark.table(daily).filter("day = 3").count()
    with pytest.raises(ValueError, match="outside the requested"):
        backfill_partitions(spark, daily, "day", [2], bad_rebuild)
    assert spark.table(daily).filter("day = 3").count() == before


def test_empty_requested_partition_refused(spark, daily):
    def partial_rebuild(s, vals):
        return s.createDataFrame([(2, 1, 0.0)], "day int, k int, v double")

    with pytest.raises(ValueError, match="no rows for requested"):
        backfill_partitions(spark, daily, "day", [2, 3], partial_rebuild)
    with pytest.raises(ValueError, match="at least one"):
        backfill_partitions(spark, daily, "day", [], partial_rebuild)
