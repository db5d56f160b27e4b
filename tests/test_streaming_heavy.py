"""Streaming heavy hitters: the persistent state table must stay ≤ k
rows, contain every true heavy hitter of the whole stream, and bound the
count error by n/k — across multiple micro-batches with exactly-once
file accounting."""

from pyspark.sql import functions as F

from etl_workflows_spark.operators.frequency import (
    read_mg_state,
    streaming_heavy_hitters,
)


def test_streaming_heavy_hitters_multi_batch(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    k = 10
    # skewed values: v appears ~ 1200/v times, split across 3 files so
    # maxFilesPerTrigger=1 forces 3 separate micro-batch merges
    rows = [(j, v) for v in range(1, 30) for j in range(1200 // v)]
    df = spark.createDataFrame(rows, "j long, v long").select("v", "j")
    for i in range(3):
        # rows (not values) partitioned across batches: each value's count
        # accumulates across merges — the interesting case
        df.filter((F.hash("v", "j") % 3 + 3) % 3 == i).coalesce(1).drop(
            "j"
        ).write.parquet(str(src / f"part{i}"))
    df = df.drop("j")
    spark.sql("CREATE DATABASE IF NOT EXISTS hhdb")
    spark.sql("DROP TABLE IF EXISTS hhdb.state")

    stream = spark.readStream.schema("v long").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "part*"))
    q = streaming_heavy_hitters(stream, "v", k, "hhdb.state", str(tmp_path / "ck"))
    q.awaitTermination(180)

    state = {r["v"]: r["freq"] for r in read_mg_state(spark, "hhdb.state").collect()}
    assert 0 < len(state) <= k

    n = df.count()
    exact = {
        r["v"]: r["n"]
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    heavy = {v for v, c in exact.items() if c * k > n}
    # every true heavy hitter survives in the summary
    assert heavy <= set(state)
    # count error bounded by n/k, stored never overcounts
    for v, stored in state.items():
        assert stored <= exact[v]
        assert exact[v] - stored <= n / k

    # rerun with no new files: checkpoint → no state change
    before = dict(state)
    q2 = streaming_heavy_hitters(
        spark.readStream.schema("v long").option("maxFilesPerTrigger", 1).parquet(
            str(src / "part*")
        ),
        "v",
        k,
        "hhdb.state",
        str(tmp_path / "ck"),
    )
    q2.awaitTermination(120)
    after = {r["v"]: r["freq"] for r in read_mg_state(spark, "hhdb.state").collect()}
    assert after == before

    # at-least-once replay: a FRESH checkpoint re-delivers the same
    # files under already-merged batch ids — the state sentinel makes
    # the re-merge a no-op instead of double-counting
    q3 = streaming_heavy_hitters(
        spark.readStream.schema("v long").option("maxFilesPerTrigger", 1).parquet(
            str(src / "part*")
        ),
        "v",
        k,
        "hhdb.state",
        str(tmp_path / "ck_replay"),
    )
    q3.awaitTermination(120)
    replayed = {
        r["v"]: r["freq"] for r in read_mg_state(spark, "hhdb.state").collect()
    }
    assert replayed == before


def test_streaming_ewma_matches_batch_across_microbatches(spark, tmp_path):
    """Per-key EWMA state must survive micro-batch boundaries: streaming
    the series as two ordered files must reproduce the batch EWMA
    exactly at every point."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators.timeseries import ewma
    from etl_workflows_spark.streaming.stateful import streaming_ewma

    rows = [(u, 1_600_000_000_000 + i * 60_000, float((i * 7 + u) % 11))
            for u in (1, 2) for i in range(40)]
    df = spark.createDataFrame(rows, "user_id long, ms long, value double").select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("ts"), "value"
    )
    src = tmp_path / "ewma_in"
    src.mkdir()
    # two time-ordered halves → two micro-batches
    df.filter(F.col("ts") < F.timestamp_millis(F.lit(1_600_000_000_000 + 20 * 60_000))
              ).coalesce(1).write.parquet(str(src / "a"))
    df.filter(F.col("ts") >= F.timestamp_millis(F.lit(1_600_000_000_000 + 20 * 60_000))
              ).coalesce(1).write.parquet(str(src / "b"))

    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*"))
    out = streaming_ewma(stream, alpha=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["ts_ms"]): r["ewma"]
        for r in spark.table("ewma_out").collect()
    }
    batch = {
        (r["user_id"], int(r["ts"].timestamp() * 1000)): r["ewma"]
        for r in ewma(df, ["user_id"], "ts", "value", alpha=0.3).collect()
    }
    assert set(streamed) == set(batch)
    for k, v in batch.items():
        assert abs(streamed[k] - v) < 1e-9, k


def test_streaming_cms_equals_batch(spark, tmp_path):
    """The maintained CMS after N micro-batches is IDENTICAL to a
    from-scratch batch sketch over all the data (merge is exact
    counter addition), so estimates agree exactly too."""
    from etl_workflows_spark.operators.frequency import (
        cms_build,
        cms_estimate,
        read_cms_state,
        streaming_cms,
    )

    src = tmp_path / "cms_in"
    src.mkdir()
    rows = [(f"tok{j % 17}",) for j in range(900)]
    df = spark.createDataFrame(rows, "tok string")
    for i in range(3):
        df.filter((F.hash("tok") % 3 + 3) % 3 == i).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
    spark.sql("CREATE DATABASE IF NOT EXISTS hhdb")
    spark.sql("DROP TABLE IF EXISTS hhdb.cms_state")

    stream = spark.readStream.schema("tok string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "part*"))
    q = streaming_cms(stream, "tok", "hhdb.cms_state", str(tmp_path / "cms_ck"),
                      w=256, d=3)
    q.awaitTermination(180)

    maintained = sorted(map(tuple, read_cms_state(spark, "hhdb.cms_state").collect()))
    scratch = sorted(map(tuple, cms_build(df, "tok", w=256, d=3).collect()))
    assert maintained == scratch

    est = {
        r["tok"]: r["est_freq"]
        for r in cms_estimate(
            df.distinct(), spark.table("hhdb.cms_state"), "tok", w=256, d=3
        ).collect()
    }
    exact = {
        r["tok"]: r["n"]
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(est[t] >= c for t, c in exact.items())

    # rerun with no new files: checkpoint makes the sink a no-op
    q2 = streaming_cms(stream, "tok", "hhdb.cms_state", str(tmp_path / "cms_ck"),
                       w=256, d=3)
    q2.awaitTermination(180)
    assert (
        sorted(map(tuple, read_cms_state(spark, "hhdb.cms_state").collect()))
        == scratch
    )

    # at-least-once replay with a FRESH checkpoint: same files arrive
    # under already-merged batch ids — the sentinel skips the re-merge
    q3 = streaming_cms(stream, "tok", "hhdb.cms_state",
                       str(tmp_path / "cms_ck_replay"), w=256, d=3)
    q3.awaitTermination(180)
    assert (
        sorted(map(tuple, read_cms_state(spark, "hhdb.cms_state").collect()))
        == scratch
    )


def test_streaming_state_intervals_matches_batch_closed_runs(spark, tmp_path):
    """The stateful SCD2 maintainer must emit, across two micro-batches,
    exactly the CLOSED intervals the batch rebuild produces on the same
    events (the open run stays in state), and flag cross-batch late rows
    instead of folding them."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators.scd import state_intervals
    from etl_workflows_spark.streaming.stateful import streaming_state_intervals

    base = 1_600_000_000_000
    states = ["A", "A", "B", "B", "B", "C", "A", "A", "C", "C"]
    rows = [
        (u, base + i * 60_000, states[(i + u) % len(states)], u * 100 + i)
        for u in (1, 2)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ms long, event_type string, event_id long"
    )
    as_events = lambda d: d.select(  # noqa: E731
        "user_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "event_type",
        "event_id",
    )
    src = tmp_path / "scd_in"
    src.mkdir()
    cut = base + 15 * 60_000
    as_events(df.filter(F.col("ms") < F.lit(cut))).coalesce(1).write.parquet(
        str(src / "a")
    )
    # second half PLUS one late straggler (event time inside the first half)
    late = spark.createDataFrame(
        [(1, base + 3 * 60_000 + 1, "Z", 999)],
        "user_id long, ms long, event_type string, event_id long",
    )
    as_events(df.filter(F.col("ms") >= F.lit(cut)).unionByName(late)).coalesce(
        1
    ).write.parquet(str(src / "b"))

    stream_schema = "user_id long, ts timestamp, event_type string, event_id long"
    stream = spark.readStream.schema(stream_schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "*"))
    out = streaming_state_intervals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("scd_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_scd"))
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table("scd_out").collect()
    late_rows = [r for r in emitted if r["late"]]
    closed = {
        (r["user_id"], r["version"]): (
            r["state"],
            r["valid_from_ms"],
            r["valid_to_ms"],
            r["n_events"],
        )
        for r in emitted
        if not r["late"]
    }
    # the straggler is flagged, not folded
    assert [(r["user_id"], r["state"]) for r in late_rows] == [(1, "Z")]
    assert all(r["version"] is None for r in late_rows)
    # batch rebuild on the same events (straggler excluded: the batch twin
    # would legitimately fold it — streaming declares it late by contract)
    batch = state_intervals(
        as_events(df), "user_id", "event_type", "ts", "event_id"
    ).collect()
    batch_closed = {
        (r["user_id"], r["version"]): (
            r["state"],
            int(r["valid_from"].timestamp() * 1000),
            int(r["valid_to"].timestamp() * 1000),
            r["n_events"],
        )
        for r in batch
        if r["valid_to"] is not None
    }
    assert closed == batch_closed


def test_streaming_state_intervals_null_states_cross_batch(spark, tmp_path):
    """NULL states are legal runs in the streaming maintainer too: a NULL
    run persisted in state across a micro-batch boundary must continue
    (not restart) when more NULL-state events arrive, and close with the
    right count when a non-NULL state lands."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.streaming.stateful import streaming_state_intervals

    base = 1_600_000_000_000
    # batch a: two NULL-state events; batch b: one more NULL then 'A'
    a_rows = [(1, base, None, 1), (1, base + 60_000, None, 2)]
    b_rows = [(1, base + 120_000, None, 3), (1, base + 180_000, "A", 4)]
    schema = "user_id long, ms long, event_type string, event_id long"
    src = tmp_path / "scd_null_in"
    src.mkdir()
    for name, rows in (("a", a_rows), ("b", b_rows)):
        spark.createDataFrame(rows, schema).select(
            "user_id",
            F.timestamp_millis(F.col("ms")).alias("ts"),
            "event_type",
            "event_id",
        ).coalesce(1).write.parquet(str(src / name))

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string, event_id long"
    ).option("maxFilesPerTrigger", 1).parquet(str(src / "*"))
    q = (
        streaming_state_intervals(stream)
        .writeStream.format("memory")
        .queryName("scd_null_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_scd_null"))
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table("scd_null_out").collect()
    assert len(emitted) == 1
    r = emitted[0]
    # ONE closed NULL run spanning both batches: 3 events, version 1,
    # closed at the 'A' event's time
    assert not r["late"]
    assert r["version"] == 1 and r["state"] is None
    assert r["n_events"] == 3
    assert r["valid_from_ms"] == base
    assert r["valid_to_ms"] == base + 180_000
