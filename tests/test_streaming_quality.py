"""Streaming quality firewall: pass/fail routing across micro-batches,
audit column contents, exactly-once on rerun, rule-kind validation."""

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.expectations import Expectation
from etl_workflows_spark.streaming.quality import quarantine_stream


def _rules():
    return [
        Expectation(name="value_not_null", kind="not_null", column="value"),
        Expectation(name="value_range", kind="between", column="value",
                    lo=0.0, hi=100.0),
        Expectation(name="kind_known", kind="isin", column="event_type",
                    values=("view", "click", "purchase")),
    ]


def _write_batch(spark, src, rows, mode):
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode(mode).parquet(src)


def test_quarantine_routing_and_rerun(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (1, "view", 10.0),          # clean
        (2, "click", None),         # null value
        (3, "bogus", 5.0),          # unknown kind
        (4, "purchase", 500.0),     # out of range
        (5, "view", 0.0),           # clean (boundary)
    ]
    _write_batch(spark, src, rows, "overwrite")
    schema = "event_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(src)

    quarantine_stream(
        stream, _rules(), "sq.dest", "sq.quar", ["event_id"], ckpt
    )
    dest = {r["event_id"] for r in spark.table("sq.dest").collect()}
    quar = {
        r["event_id"]: r["failed_rules"]
        for r in spark.table("sq.quar").collect()
    }
    assert dest == {1, 5}
    assert set(quar) == {2, 3, 4}
    assert quar[2] == "value_not_null"
    assert quar[3] == "kind_known"
    assert quar[4] == "value_range"

    # second batch: new files only; rerun must not duplicate old rows
    _write_batch(spark, src, [(6, "view", 1.0), (7, "x", 1.0)], "append")
    stream2 = spark.readStream.schema(schema).parquet(src)
    quarantine_stream(
        stream2, _rules(), "sq.dest", "sq.quar", ["event_id"], ckpt
    )
    assert spark.table("sq.dest").count() == 3  # 1, 5, 6 — no dupes
    assert spark.table("sq.quar").count() == 4  # 2, 3, 4, 7


def test_quarantine_rejects_aggregate_rules(spark, tmp_path):
    src = str(tmp_path / "s2")
    _write_batch(spark, src, [(1, "view", 1.0)], "overwrite")
    stream = spark.readStream.schema(
        "event_id long, event_type string, value double"
    ).parquet(src)
    with pytest.raises(ValueError, match="row-scoped"):
        quarantine_stream(
            stream,
            [Expectation(name="u", kind="unique", column="event_id")],
            "sq.d2",
            "sq.q2",
            ["event_id"],
            str(tmp_path / "c2"),
        )
