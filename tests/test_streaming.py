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


def _drive_sessionize(spark, tmp_path, op, name):
    """Run a stateful sessionize op over three sequential micro-batches."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / f"{name}_src")
    ckpt = str(tmp_path / f"{name}_ckpt")

    def write_batch(i, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    # batch 1: A has 2 events 10:00/10:05; B one at 10:00
    write_batch(1, [(1, t(10, 0)), (1, t(10, 5)), (2, t(10, 0))])
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: A again at 12:00 — exceeds the 30 min gap, closes A's
        # first session in-function; advances watermark to 12:00
        write_batch(2, [(1, t(12, 0))])
        q.processAllAvailable()
        # batch 3: C at 13:00 — watermark (12:00) now past B's timeout
        # (10:00 + gap), B's session closes by timeout
        write_batch(3, [(3, t(13, 0))])
        q.processAllAvailable()
        return spark.table(name).collect()
    finally:
        q.stop()


def test_streaming_sessionize_custom_state(spark, tmp_path):
    """applyInPandasWithState sessionizer: gap-close and timeout-close both
    emit, still-open sessions are withheld."""
    import datetime as dt

    from etl_workflows_spark.streaming.stateful import streaming_sessionize

    rows = _drive_sessionize(
        spark,
        tmp_path,
        lambda s: streaming_sessionize(s, gap="30 minutes", watermark="0 seconds"),
        "sess_custom",
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["closed_by"])
        for r in rows
    }
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    assert (1, t(10, 0), t(10, 5), 2, "gap") in got
    assert (2, t(10, 0), t(10, 0), 1, "timeout") in got
    # C's 13:00 session is still open (watermark never passes 13:30)
    users_emitted = {k[0] for k in got}
    assert 3 not in users_emitted
    # A's first session emitted exactly once (no duplicate on timeout)
    assert len([k for k in got if k[0] == 1 and k[1] == t(10, 0)]) == 1


def test_streaming_sessionize_max_events_cap(spark, tmp_path):
    """The max_events policy (inexpressible with session_window) closes a
    session the moment it reaches the cap."""
    from etl_workflows_spark.streaming.stateful import streaming_sessionize

    rows = _drive_sessionize(
        spark,
        tmp_path,
        lambda s: streaming_sessionize(
            s, gap="30 minutes", watermark="0 seconds", max_events=2
        ),
        "sess_cap",
    )
    capped = [r for r in rows if r["closed_by"] == "cap"]
    assert len(capped) == 1 and capped[0]["user_id"] == 1 and capped[0]["n_events"] == 2


def test_streaming_sessionize_native_twin(spark, tmp_path):
    """Built-in session_window twin emits the same closed sessions (no
    closed_by provenance; emission requires watermark passage)."""
    import datetime as dt

    from etl_workflows_spark.streaming.stateful import streaming_sessionize_native

    rows = _drive_sessionize(
        spark,
        tmp_path,
        lambda s: streaming_sessionize_native(s, gap="30 minutes", watermark="0 seconds"),
        "sess_native",
    )
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    got = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in rows
    }
    # session_window end = last_event + gap (not last event itself)
    assert (1, t(10, 0), 2) in got
    assert (2, t(10, 0), 1) in got


def test_streaming_dedup_drops_within_watermark(spark, tmp_path):
    """Duplicated event_ids across micro-batches are emitted once."""
    from etl_workflows_spark.streaming.incremental import streaming_dedup

    src = tmp_path / "dups_src"
    chk = str(tmp_path / "dups_chk")
    rows = [
        (1, "2024-01-01 10:00:00", 10.0),
        (2, "2024-01-01 10:00:00", 20.0),
        (2, "2024-01-01 10:05:00", 20.0),
        (3, "2024-01-01 10:05:00", 30.0),
        (1, "2024-01-01 10:05:00", 10.0),
    ]
    spark.createDataFrame(rows, ["event_id", "ts_s", "value"]).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value"
    ).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, value double"
    ).parquet(str(src))
    deduped = streaming_dedup(stream, ["event_id"], watermark="10 minutes")
    q = (
        deduped.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", chk)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT event_id FROM dedup_sink ORDER BY event_id").collect()
    assert [r["event_id"] for r in out] == [1, 2, 3]


def test_compact_table_reduces_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks.compact import compact_table, table_bytes

    spark.sql("CREATE DATABASE IF NOT EXISTS cmp")
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.rand(7).alias("v")
    )
    # fragment: 64 tiny files
    df.repartition(64).write.mode("overwrite").saveAsTable("cmp.frag")
    loc_before = spark.table("cmp.frag")
    n_before = loc_before.rdd.getNumPartitions()
    before_rows = sorted(r["id"] for r in loc_before.collect())
    assert table_bytes(spark, "cmp.frag") > 0
    n_files = compact_table(spark, "cmp.frag", target_file_mb=128, sort_by=["k"])
    assert n_files == 1
    after = spark.table("cmp.frag")
    assert sorted(r["id"] for r in after.collect()) == before_rows
    assert after.rdd.getNumPartitions() <= n_before


def test_compact_table_preserves_layout(spark):
    """Compaction must not forfeit bucketing or partitioning — the specs
    survive the staging-swap rewrite."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks.compact import compact_table, table_layout
    from etl_workflows_spark.sinks.writer import write_table

    spark.sql("CREATE DATABASE IF NOT EXISTS cmp")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 13).alias("k"), (F.col("id") % 3).alias("p")
    )
    write_table(df.repartition(16), "cmp.bkt", bucket_by=(4, ["k"]))
    compact_table(spark, "cmp.bkt", target_file_mb=256)
    parts, bucket = table_layout(spark, "cmp.bkt")
    assert bucket == (4, ["k"]) and parts == []
    assert spark.table("cmp.bkt").count() == 2000

    write_table(df.repartition(16), "cmp.part", partition_by=["p"])
    compact_table(spark, "cmp.part", target_file_mb=256)
    parts, bucket = table_layout(spark, "cmp.part")
    assert parts == ["p"] and bucket is None
    assert spark.table("cmp.part").filter("p = 1").count() > 0


def test_stream_to_table_idempotent(spark, tmp_path):
    """Micro-batches land via keyed anti-join: a second run over new files
    carrying already-seen keys appends only the genuinely new rows."""
    from etl_workflows_spark.streaming.incremental import stream_to_table_idempotent

    src = tmp_path / "stream_src"
    src.mkdir()
    chk = str(tmp_path / "stream_chk")
    spark.sql("CREATE DATABASE IF NOT EXISTS sidem")
    spark.sql("DROP TABLE IF EXISTS sidem.events_t")

    def run():
        stream = spark.readStream.schema("k bigint, v string").parquet(str(src))
        stream_to_table_idempotent(stream, "sidem.events_t", ["k"], chk)

    spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()
    assert spark.table("sidem.events_t").count() == 2

    # new file: one overlapping key (2), one new key (3) delivered TWICE
    # within the same batch — the table anti-join can't catch that case,
    # so the sink's own dropDuplicates must
    spark.createDataFrame(
        [(2, "b2"), (3, "c"), (3, "c")], ["k", "v"]
    ).coalesce(1).write.mode("append").parquet(str(src))
    run()
    rows = spark.table("sidem.events_t").collect()
    assert len(rows) == 3  # no within-batch duplicate landed
    out = {r["k"]: r["v"] for r in rows}
    assert set(out) == {1, 2, 3}
    assert out[2] == "b"  # original kept; overlapping re-delivery ignored


def test_collect_stats_populates_catalog(spark):
    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks.writer import collect_stats, write_table

    spark.sql("CREATE DATABASE IF NOT EXISTS stats")
    df = spark.range(5000).select(F.col("id"), (F.col("id") % 7).alias("g"))
    write_table(df, "stats.t1")
    collect_stats(spark, "stats.t1", ["id", "g"])
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED stats.t1").collect()
    }
    assert "Statistics" in desc  # table-level stats recorded
