"""Regression battery for the round-4 hardening sweep: every fix that
turned a silent corruption into a loud error (or a conservative route)
is pinned here so it cannot quietly regress."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_cdc_null_op_fails_fast(spark, tmp_path):
    from etl_workflows_spark.sinks.cdc import apply_cdc

    spark.sql("CREATE DATABASE IF NOT EXISTS hard")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.mode(
        "overwrite"
    ).saveAsTable("hard.cdc_t")
    changes = spark.createDataFrame(
        [(1, "b", 2, None)], "k long, v string, version long, op string"
    )
    with pytest.raises(ValueError, match="unknown CDC op"):
        apply_cdc(spark, changes, "hard.cdc_t", ["k"])


def test_scd2_null_key_fails_fast(spark):
    from etl_workflows_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, "x", "2024-01-01 00:00:00", None)],
        "id long, attr string, valid_from string, valid_to string",
    ).select(
        "id", "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [(None, "y", "2024-02-01 00:00:00")], "id long, attr string, ts string"
    ).select("id", "attr", F.col("ts").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError, match="NULL id"):
        scd2_apply(dim, upd, key="id", ts_col="ts", tracked=["attr"])


def test_backfill_null_partition_fails_fast(spark):
    from etl_workflows_spark.sinks.backfill import backfill_partitions

    spark.sql("CREATE DATABASE IF NOT EXISTS hard")
    spark.createDataFrame([(1, "p1")], ["v", "p"]).write.mode(
        "overwrite"
    ).partitionBy("p").saveAsTable("hard.bf_t")

    def rebuild(s, values):
        return s.createDataFrame([(2, None)], "v long, p string")

    with pytest.raises(ValueError, match="outside the requested"):
        backfill_partitions(spark, "hard.bf_t", "p", ["p1"], rebuild)


def test_zorder_rejects_non_numeric_column(spark):
    from etl_workflows_spark.sinks.layout import zorder_key

    df = spark.createDataFrame([("host", 1)], ["h", "x"])
    with pytest.raises(ValueError, match="numeric"):
        zorder_key(df, ["h", "x"])


def test_schema_mode_typo_rejected():
    from etl_workflows_spark.exceptions import SchemaInvalid
    from etl_workflows_spark.schema.registry import parse_schema_doc

    with pytest.raises(SchemaInvalid):
        parse_schema_doc(
            {"fields": [{"name": "a", "type": "STRING", "mode": "REQIRED"}]}
        )


def test_bloom_null_key_routes_to_maybe(spark):
    from etl_workflows_spark.operators.bloom import bloom_build, bloom_probe

    keys = spark.createDataFrame([("k1",), ("k2",)], ["key"])
    bloom = bloom_build(keys, "key")
    probe = spark.createDataFrame([("k1",), (None,), ("zz",)], ["key"])
    got = {
        r["key"]: r["bloom_maybe"]
        for r in bloom_probe(probe, bloom, "key").collect()
    }
    assert got["k1"] is True
    assert got[None] is True  # NULL can't certify absence → exact path
    assert got["zz"] is False


def test_lsh_bands_rejects_non_divisible_k(spark):
    from etl_workflows_spark.operators.dedup import near_dup_pairs_lsh

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="multiple of bands"):
        near_dup_pairs_lsh(docs, k=16, bands=5)


def test_canary_scan_is_single_scan(spark, sf_dir):
    from etl_workflows_spark.operators.decontam import canary_scan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        canary_scan(docs, ["alpha marker", "beta marker", "gamma marker"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1  # not one FileScan per canary


def test_merge_metrics_with_duplicate_target_rows(spark):
    from etl_workflows_spark.sinks.merge import merge_into

    spark.sql("CREATE DATABASE IF NOT EXISTS hard")
    # duplicate rows for key 1 (e.g. aftermath of a crashed earlier merge)
    spark.createDataFrame(
        [(1, "old"), (1, "old2")], ["k", "v"]
    ).write.mode("overwrite").saveAsTable("hard.mm_t")
    src = spark.createDataFrame([(1, "new"), (2, "ins")], ["k", "v"])
    out = merge_into(spark, "hard.mm_t", src, ["k"])
    # matched counts SOURCE keys, so inserted can never go negative
    assert out["matched"] == 1 and out["inserted"] == 1
    got = {r["k"]: r["v"] for r in spark.table("hard.mm_t").collect()}
    assert got == {1: "new", 2: "ins"}


def test_append_if_absent_null_key_idempotent(spark):
    from etl_workflows_spark.sinks.writer import append_if_absent

    spark.sql("CREATE DATABASE IF NOT EXISTS hard")
    spark.sql("DROP TABLE IF EXISTS hard.aia_t")
    batch = spark.createDataFrame([(None, "x"), (1, "y")], "k long, v string")
    append_if_absent(batch, "hard.aia_t", ["k"])
    append_if_absent(batch, "hard.aia_t", ["k"])  # retried batch
    assert spark.table("hard.aia_t").count() == 2  # NULL row not re-added


def test_profile_table_handles_map_columns(spark):
    from etl_workflows_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, {"a": "1"}), (2, None)], "id long, props map<string,string>"
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["props"]["n_nulls"] == 1 and got["props"]["n_distinct"] == 1


def test_ewma_streaming_skips_null_rows(spark, tmp_path):
    from etl_workflows_spark.streaming.stateful import streaming_ewma

    src = tmp_path / "ewma_in"
    src.mkdir()
    rows = [
        ("u1", 1_600_000_000_000, 10.0),
        ("u1", None, 99.0),            # NULL ts: would crash int(NaN)
        ("u1", 1_600_000_060_000, None),  # NULL value: would poison NaN
        ("u1", 1_600_000_120_000, 20.0),
    ]
    spark.createDataFrame(
        rows, "user_id string, ms long, value double"
    ).select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("ts"), "value"
    ).coalesce(1).write.parquet(str(src / "p0"))
    stream = spark.readStream.schema(
        "user_id string, ts timestamp, value double"
    ).parquet(str(src / "*"))
    q = (
        streaming_ewma(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("hard_ewma")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["ts_ms"]: r["ewma"] for r in spark.table("hard_ewma").collect()}
    # NULL rows skipped; recursion continues cleanly: 10 → 0.5·20+0.5·10
    assert got == {1_600_000_000_000: 10.0, 1_600_000_120_000: 15.0}
