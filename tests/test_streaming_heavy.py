"""Streaming heavy hitters: the persistent state table must stay ≤ k
rows, contain every true heavy hitter of the whole stream, and bound the
count error by n/k — across multiple micro-batches with exactly-once
file accounting."""

from pyspark.sql import functions as F

from etl_workflows_spark.operators.frequency import streaming_heavy_hitters


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

    state = {r["v"]: r["freq"] for r in spark.table("hhdb.state").collect()}
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
    after = {r["v"]: r["freq"] for r in spark.table("hhdb.state").collect()}
    assert after == before
