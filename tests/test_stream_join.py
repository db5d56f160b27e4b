"""Stream-stream attribution join: genuine streaming execution (two
readStream sides, watermarked, AvailableNow → memory sink) must produce
exactly the batch result on the same data — semantic parity is the
contract that makes the oracle-checked batch entry stand in for the
streaming path."""

from pyspark.sql import functions as F

from etl_workflows_spark.queries.base import table
from etl_workflows_spark.streaming.joins import attribution_join


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    views_b = ev.filter(F.col("event_type") == "view")
    purch_b = ev.filter(F.col("event_type") == "purchase")

    batch = {
        (r["trigger_id"], r["conversion_id"])
        for r in attribution_join(views_b, purch_b).collect()
    }
    assert batch  # non-degenerate fixture

    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purchases")
    views_b.write.parquet(vdir)
    purch_b.write.parquet(pdir)
    vs = spark.readStream.schema(views_b.schema).parquet(vdir)
    ps = spark.readStream.schema(purch_b.schema).parquet(pdir)

    out = attribution_join(vs, ps)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["trigger_id"], r["conversion_id"])
        for r in spark.table("attr_out").collect()
    }
    assert streamed == batch


def test_attribution_join_state_is_bounded(spark, sf_dir, tmp_path):
    """The physical streaming plan must contain a stream-stream join with
    watermarks on both sides — the condition under which Spark evicts
    buffered rows instead of keeping the whole stream."""
    ev = table(spark, sf_dir, "events")
    d = str(tmp_path / "ev")
    ev.limit(100).write.parquet(d)
    s = spark.readStream.schema(ev.schema).parquet(d)
    out = attribution_join(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "purchase"),
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
