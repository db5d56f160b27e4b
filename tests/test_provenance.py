"""Row-level file provenance (sources/provenance.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.sources.provenance import (
    file_audit,
    read_with_provenance,
    with_provenance,
)


@pytest.fixture(scope="module")
def two_files(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prov"))
    spark.range(0, 100).withColumnRenamed("id", "doc_id").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    spark.range(100, 150).withColumnRenamed("id", "doc_id").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    return d


def test_rows_trace_to_their_files(spark, two_files):
    df = read_with_provenance(spark, two_files)
    assert df.count() == 150
    per_file = {
        r["src_file"]: r["n"]
        for r in df.groupBy("src_file").agg(F.count("*").alias("n")).collect()
    }
    assert sorted(per_file.values()) == [50, 100]
    # row_index restarts per file and is dense from 0
    firsts = df.groupBy("src_file").agg(
        F.min("src_row_index").alias("lo"), F.max("src_row_index").alias("hi"),
        F.count("*").alias("n"),
    )
    for r in firsts.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_file_audit_contiguity(spark, two_files):
    audit = file_audit(read_with_provenance(spark, two_files))
    rows = audit.collect()
    assert len(rows) == 2
    assert all(r["contiguous"] for r in rows)
    assert all(r["file_bytes"] > 0 for r in rows)


def test_filters_still_push_down_around_provenance(spark, two_files):
    df = read_with_provenance(spark, two_files).filter(F.col("doc_id") < 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)" in plan
    assert df.count() == 10


def test_non_scan_relation_raises_clearly(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="file-source"):
        with_provenance(df)
