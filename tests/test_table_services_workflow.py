"""The WAP maintenance DAG (orchestrate/table_services.py) run through the
reference-dialect workflow interpreter: good batches publish and refresh
the view, bad batches take the except branch and vanish."""

from __future__ import annotations

from etl_workflows_spark.operators.expectations import Expectation
from etl_workflows_spark.orchestrate.table_services import (
    WAP_WORKFLOW_YAML,
    build_table_services_registry,
)
from etl_workflows_spark.orchestrate.workflow import WorkflowRunner
from etl_workflows_spark.sinks import snapshots as S

RULES = [
    Expectation(name="ids_ok", kind="between", column="user_id", lo=0),
    Expectation(name="v_not_null", kind="not_null", column="v"),
]


def _land(spark, tmp_path, name, rows):
    p = str(tmp_path / name)
    spark.createDataFrame(rows, ["user_id", "v"]).coalesce(1).write.parquet(p)
    return p


def test_wap_workflow_publishes_and_refreshes(spark, tmp_path):
    table, view = str(tmp_path / "t"), str(tmp_path / "v")
    reg = build_table_services_registry(
        spark, table, view, RULES, ["user_id"],
        {"n": "count", "total": "sum:v"},
    )
    runner = WorkflowRunner(WAP_WORKFLOW_YAML, reg)

    p1 = _land(spark, tmp_path, "b1", [(1, 10), (2, 20)])
    out = runner.run(params={"sourcePath": p1, "batch": "b1"})
    assert out == "published b1"
    assert S.read_snapshot(spark, table).count() == 2
    got = {
        r["user_id"]: (r["n"], r["total"])
        for r in S.read_snapshot(spark, view).collect()
    }
    assert got == {1: (1, 10), 2: (1, 20)}

    # second good batch folds into the view incrementally
    p2 = _land(spark, tmp_path, "b2", [(1, 5)])
    assert runner.run(params={"sourcePath": p2, "batch": "b2"}) == "published b2"
    got = {
        r["user_id"]: (r["n"], r["total"])
        for r in S.read_snapshot(spark, view).collect()
    }
    assert got == {1: (2, 15), 2: (1, 20)}


def test_wap_workflow_rejects_bad_batch(spark, tmp_path):
    table, view = str(tmp_path / "t"), str(tmp_path / "v")
    reg = build_table_services_registry(
        spark, table, view, RULES, ["user_id"],
        {"n": "count", "total": "sum:v"},
    )
    runner = WorkflowRunner(WAP_WORKFLOW_YAML, reg)
    p1 = _land(spark, tmp_path, "good", [(1, 10)])
    runner.run(params={"sourcePath": p1, "batch": "good"})

    bad = _land(spark, tmp_path, "bad", [(-5, 1), (3, 3)])
    out = runner.run(params={"sourcePath": bad, "batch": "bad"})
    assert out == "rejected bad"
    # table and view untouched; staged marker gone; files sweepable
    assert S.read_snapshot(spark, table).count() == 1
    assert S.read_snapshot(spark, view).count() == 1
    assert len(S.vacuum(table, keep_last=1, min_age_seconds=0)) >= 1  # the dropped batch's files
    # and the same batch name is reusable after the drop
    good2 = _land(spark, tmp_path, "bad2", [(7, 70)])
    assert runner.run(params={"sourcePath": good2, "batch": "bad"}) == (
        "published bad"
    )
    assert S.read_snapshot(spark, table).count() == 2
