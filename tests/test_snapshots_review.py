"""Regression tests for the round-4 self-review findings on the snapshot
layer and inference batching — each test pins a bug that review caught."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.sinks import snapshots as S


def _b(spark, rows, cols=("id", "tag")):
    return spark.createDataFrame(rows, list(cols)).coalesce(1)


def test_mixed_bloom_geometries_probe_per_file(spark, tmp_path):
    """Files bloomed under different bloom_bits each get probes under
    their own modulus — a lookup into the later geometry must not be
    pruned by positions computed for the earlier one."""
    d = str(tmp_path / "t")
    S.commit(
        _b(spark, [(1, "alpha"), (2, "beta")]), d, bloom_cols=["tag"],
        bloom_bits=1024,
    )
    S.commit(
        _b(spark, [(3, "gamma"), (4, "delta")]), d, mode="append",
        bloom_cols=["tag"], bloom_bits=4096,
    )
    out = S.read_snapshot(spark, d, equals={"tag": "delta"})
    assert [r["id"] for r in out.collect()] == [4]
    assert S.read_snapshot(spark, d, equals={"tag": "alpha"}).count() == 1


def test_integer_typed_bloom_column(spark, tmp_path):
    """IntegerType bloom columns are widened to bigint at build time so
    the driver-side probe's 8-byte hash matches (Spark's 4-byte int fold
    would never line up)."""
    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 100), (2, 200)], "id long, cat int"
    ).coalesce(1)
    S.commit(df, d, bloom_cols=["cat"])
    assert S.read_snapshot(spark, d, equals={"cat": 200}).count() == 1
    assert S.read_snapshot(spark, d, equals={"cat": 999}).count() == 0
    # unsupported bloom column types are rejected loudly
    bad = spark.createDataFrame([(1, 0.5)], "id long, x double").coalesce(1)
    with pytest.raises(ValueError, match="integral/string"):
        S.commit(bad, str(tmp_path / "t2"), bloom_cols=["x"])


def test_publish_staged_retry_is_idempotent(spark, tmp_path):
    """A retry after the marker is already consumed (crash between
    publish and remove) resolves to the published version instead of
    appending the same files twice."""
    d = str(tmp_path / "t")
    S.commit(_b(spark, [(1, "a")]), d)
    S.stage(_b(spark, [(2, "b")]), d, "batch1")
    v = S.publish_staged(d, "batch1")
    # crash-retry: marker is gone, key is published → same version back
    assert S.publish_staged(d, "batch1") == v
    assert S.read_snapshot(spark, d).count() == 2
    # re-staging a once-published name is refused (silent no-op would
    # drop the second batch's data)
    S.stage(_b(spark, [(3, "c")]), d, "batch1")
    with pytest.raises(ValueError, match="already published"):
        S.publish_staged(d, "batch1")


def test_append_schema_drift_rejected(spark, tmp_path):
    d = str(tmp_path / "t")
    S.commit(_b(spark, [(1, "a")]), d)
    renamed = spark.createDataFrame([(2, "b")], ["id", "label"]).coalesce(1)
    with pytest.raises(ValueError, match="drops column"):
        S.commit(renamed, d, mode="append")
    retyped = spark.createDataFrame([(2, 3)], "id long, tag long").coalesce(1)
    with pytest.raises(ValueError, match="changes column"):
        S.commit(retyped, d, mode="append")
    # overwrite may reshape freely
    S.commit(renamed, d, mode="overwrite")
    assert S.read_snapshot(spark, d).columns == ["id", "label"]


def test_null_merge_keys_rejected(spark, tmp_path):
    d = str(tmp_path / "t")
    S.commit(_b(spark, [(1, "a")]), d, stat_cols=["id"])
    src = spark.createDataFrame([(None, "x")], "id long, tag string")
    with pytest.raises(ValueError, match="non-null"):
        S.merge_into_snapshot(spark, src, d, ["id"])
    with pytest.raises(ValueError, match="non-null"):
        S.delete_from_snapshot(spark, src.select("id"), d, ["id"])


def test_sum_fold_survives_all_null_delta(spark, tmp_path):
    """A delta whose measure values are all NULL must not poison the
    accumulated total (recompute semantics: SUM skips nulls)."""
    from etl_workflows_spark.operators.incremental_view import refresh_view

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    S.commit(
        spark.createDataFrame([(1, 17)], "user_id long, v long").coalesce(1),
        src,
    )
    refresh_view(spark, src, view, ["user_id"], {"total": "sum:v"})
    S.commit(
        spark.createDataFrame([(1, None)], "user_id long, v long").coalesce(1),
        src,
    )
    refresh_view(spark, src, view, ["user_id"], {"total": "sum:v"})
    rows = {r["user_id"]: r["total"] for r in S.read_snapshot(spark, view).collect()}
    assert rows == {1: 17}


def test_score_documents_null_text(spark):
    from etl_workflows_spark.operators.inference import (
        score_documents,
        stub_model,
    )

    d = spark.createDataFrame(
        [(1, "real text"), (2, None)], "doc_id long, text string"
    ).coalesce(1)
    out = {r["doc_id"]: r for r in score_documents(d, max_batch_tokens=8).collect()}
    assert len(out) == 2  # the null row scores (as empty), no crash
    assert out[2]["score"] == pytest.approx(stub_model([""])[0])


def test_vacuum_grace_protects_young_files(spark, tmp_path):
    """An unreferenced file younger than min_age_seconds survives vacuum
    — it may belong to an in-flight commit racing the vacuum."""
    import os

    d = str(tmp_path / "t")
    S.commit(_b(spark, [(1, "a")]), d)
    orphan = os.path.join(d, "data", "deadbeef-inflight.parquet")
    open(orphan, "wb").close()
    assert S.vacuum(d, keep_last=1) == []  # default grace: left alone
    assert os.path.exists(orphan)
    swept = S.vacuum(d, keep_last=1, min_age_seconds=0)
    assert swept == ["data/deadbeef-inflight.parquet"]
