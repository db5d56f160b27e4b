"""Stream-static enrichment (streaming/joins.py:enrich_stream): dim
updates between AvailableNow runs are visible, unmatched facts survive
with NULL dim columns, and the dim side broadcasts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_workflows_spark.sinks.merge import merge_into
from etl_workflows_spark.sinks.writer import write_table
from etl_workflows_spark.streaming.joins import enrich_stream

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("cust_id", T.LongType()),
    ]
)


@pytest.fixture()
def dim(spark):
    spark.sql("DROP TABLE IF EXISTS enr_dim")
    write_table(
        spark.createDataFrame(
            [(1, "bronze"), (2, "silver")], ["cust_id", "tier"]
        ),
        "enr_dim",
    )
    yield "enr_dim"
    spark.sql("DROP TABLE IF EXISTS enr_dim")


def _run(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    enriched = enrich_stream(stream, "enr_dim", ["cust_id"])
    (
        enriched.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", out)
        .start()
        .awaitTermination()
    )


def test_dim_updates_visible_across_runs(spark, dim, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame([(100, 1), (101, 3)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, ckpt, out)
    got = {r["event_id"]: r["tier"] for r in spark.read.parquet(out).collect()}
    # matched fact enriched; unmatched fact KEPT with NULL tier
    assert got == {100: "bronze", 101: None}

    # dimension evolves between runs (upsert tier + add the missing key)
    merge_into(
        spark,
        "enr_dim",
        spark.createDataFrame([(1, "gold"), (3, "silver")], ["cust_id", "tier"]),
        ["cust_id"],
    )
    spark.createDataFrame([(102, 1), (103, 3)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, ckpt, out)  # same checkpoint: only the new file
    got = {r["event_id"]: r["tier"] for r in spark.read.parquet(out).collect()}
    assert got == {100: "bronze", 101: None, 102: "gold", 103: "silver"}


def test_dim_side_broadcasts(spark, dim):
    # the same operator body runs in batch — where the physical plan is
    # inspectable without starting a streaming query
    events = spark.createDataFrame([(100, 1)], SCHEMA)
    plan = (
        enrich_stream(events, "enr_dim", ["cust_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
