"""Right-to-be-forgotten across corpus + derived dedup state
(sinks/forget.py): after forgetting, re-submissions of the same or
near-same content must be ACCEPTED again, the shared-text guard must
keep fingerprints alive for surviving duplicates, and bucket specs must
survive the index rewrites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators import dedup
from etl_workflows_spark.sinks.forget import forget_documents
from etl_workflows_spark.sinks.writer import write_table

T1 = "the first document talks at length about rivers and the slow seasonal flooding of the wide northern plains every spring"
T2 = "a second completely different text describes the assembly process for small wooden furniture in a home workshop setting"
T3 = "the third document reviews several recent books about navigation and the history of lighthouse construction on rocky coasts"

TABLES = ("fgt_corpus", "fgt_fp", "fgt_nd_bands", "fgt_nd_sh")


@pytest.fixture()
def env(spark):
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    seed = spark.createDataFrame(
        [(1, T1), (2, T2), (3, T3)], ["doc_id", "text"]
    )
    write_table(seed, "fgt_corpus")
    dedup.build_fingerprint_index(seed, "fgt_fp", n_buckets=4)
    dedup.build_near_dup_index(seed, "fgt_nd", n_buckets=4)
    yield seed
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _ids(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], ["doc_id"])


def test_forget_reaches_every_surface(spark, env):
    out = forget_documents(
        spark, _ids(spark, 2), "fgt_corpus",
        fingerprint_index="fgt_fp", near_dup_index="fgt_nd",
    )
    assert out["corpus"] == 1
    assert out["fingerprints"] == 1
    assert out["near_dup_bands"] > 0
    assert out["near_dup_shingles"] == 1
    assert {r["doc_id"] for r in spark.table("fgt_corpus").collect()} == {1, 3}

    # the same text must be ACCEPTED on re-arrival now — both exact...
    resub = spark.createDataFrame([(20, T2)], ["doc_id", "text"])
    accepted = dedup.dedup_incremental(resub, "fgt_fp")
    assert accepted.count() == 1
    # ...and near-dup
    near = spark.createDataFrame([(21, T2 + " tonight")], ["doc_id", "text"])
    assert dedup.near_dup_incremental(near, "fgt_nd", threshold=0.5).count() == 1
    # while un-forgotten content is still rejected
    dup1 = spark.createDataFrame([(22, T1)], ["doc_id", "text"])
    assert dedup.dedup_incremental(dup1, "fgt_fp").count() == 0

    # idempotent
    again = forget_documents(
        spark, _ids(spark, 2), "fgt_corpus",
        fingerprint_index="fgt_fp", near_dup_index="fgt_nd",
    )
    assert again == {
        "corpus": 0, "fingerprints": 0,
        "near_dup_bands": 0, "near_dup_shingles": 0,
    }


def test_shared_text_guard(spark):
    for t in ("sg_corpus", "sg_fp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    seed = spark.createDataFrame(
        [(1, T1), (2, T1), (3, T3)], ["doc_id", "text"]  # 1 and 2 identical
    )
    write_table(seed, "sg_corpus")
    dedup.build_fingerprint_index(seed, "sg_fp", n_buckets=4)
    out = forget_documents(
        spark, _ids(spark, 1), "sg_corpus", fingerprint_index="sg_fp"
    )
    assert out["corpus"] == 1
    assert out["fingerprints"] == 0  # doc 2 still owns that fp
    resub = spark.createDataFrame([(30, T1)], ["doc_id", "text"])
    assert dedup.dedup_incremental(resub, "sg_fp").count() == 0
    for t in ("sg_corpus", "sg_fp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_spec_survives_rewrite(spark, env):
    forget_documents(
        spark, _ids(spark, 2), "fgt_corpus",
        fingerprint_index="fgt_fp", near_dup_index="fgt_nd",
    )
    ddl = spark.sql("SHOW CREATE TABLE fgt_fp").first()[0]
    assert "CLUSTERED BY" in ddl and "4 BUCKETS" in ddl
    ddl2 = spark.sql("SHOW CREATE TABLE fgt_nd_bands").first()[0]
    assert "CLUSTERED BY" in ddl2
