"""Streaming incremental ingest: exactly-once per file, archive, coercion
parity with batch; event-time rollup twin."""

import os

from etl_workflows_spark.streaming.incremental import (
    incremental_csv_load,
    streaming_hourly_rollup,
)


def test_incremental_exactly_once_and_archive(spark, fixtures_dir, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    arch = tmp_path / "archived"
    ckpt = str(tmp_path / "ckpt")
    (src / "d1.csv").write_text("s;i;f;t\nx;1;1.5;2021-06-12\n", encoding="ISO-8859-1")

    schema = str(fixtures_dir / "assets")
    # reuse dirty schema: write a 4-field schema yaml
    sp = tmp_path / "s.yaml"
    sp.write_text(
        "fields:\n"
        "  - {name: s, type: STRING, mode: NULLABLE}\n"
        "  - {name: i, type: INTEGER, mode: NULLABLE}\n"
        "  - {name: f, type: FLOAT, mode: NULLABLE}\n"
        "  - {name: t, type: TIMESTAMP, mode: NULLABLE}\n"
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS stream")
    spark.sql("DROP TABLE IF EXISTS stream.inc")

    incremental_csv_load(
        spark, str(src), str(sp), ckpt, "stream.inc", archive_dir=str(arch)
    )
    assert spark.table("stream.inc").count() == 1

    # rerun with no new file: no duplicates (checkpointed exactly-once)
    incremental_csv_load(
        spark, str(src), str(sp), ckpt, "stream.inc", archive_dir=str(arch)
    )
    assert spark.table("stream.inc").count() == 1

    # new file arrives: only it is processed; coercion identical to batch
    (src / "d2.csv").write_text(
        "s;i;f;t\ny;12.5;2.5;junk\nz;3;bad\n", encoding="ISO-8859-1"
    )
    incremental_csv_load(
        spark, str(src), str(sp), ckpt, "stream.inc", archive_dir=str(arch)
    )
    rows = {r["s"]: r for r in spark.table("stream.inc").collect()}
    assert len(rows) == 2  # arity-3 row dropped
    assert rows["y"]["i"] is None  # int("12.5") fails -> cell NULL
    assert rows["y"]["f"] == 2.5


def test_streaming_hourly_rollup_plan(spark, sf_dir):
    """The streaming twin builds a valid watermarked streaming plan and its
    aggregation matches batch semantics when run on the same data in batch
    mode (except approx_count_distinct vs exact)."""
    from etl_workflows_spark.queries.base import table

    ev = table(spark, sf_dir, "events")
    batch_result = streaming_hourly_rollup(ev)  # watermark no-ops in batch
    out = {
        (r["hour"], r["event_type"]): r["n_events"] for r in batch_result.collect()
    }
    from etl_workflows_spark.queries.relational import events_hourly

    expected = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in events_hourly(spark, sf_dir).collect()
    }
    assert out == expected

    # and it is genuinely streamable: build a readStream plan and check it
    import tempfile

    src = tempfile.mkdtemp()
    ev.limit(10).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = streaming_hourly_rollup(stream)
    assert q.isStreaming


def test_streaming_rollup_executes_and_matches_batch(spark, sf_dir, tmp_path):
    """Actually run the watermarked streaming aggregation (not just build
    the plan): AvailableNow over a parquet snapshot, complete-mode memory
    sink, output equal to the batch twin."""
    from etl_workflows_spark.queries.base import table

    ev = table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("rollup_test").collect()
    }
    expected = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streaming_hourly_rollup(ev).collect()
    }
    assert got == expected
