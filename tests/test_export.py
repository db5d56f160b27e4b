"""Shard export with checksummed manifest (sinks/export.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.sinks.export import export_shards, verify_export


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 5000).selectExpr(
        "id AS doc_id", "md5(CAST(id AS STRING)) AS text"
    )


def test_export_is_deterministic_and_balanced(spark, corpus, tmp_path):
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    m1 = export_shards(spark, corpus, p1, n_shards=8)
    # re-export the same corpus with a different partitioning/row order
    shuffled = corpus.repartition(13).sortWithinPartitions(F.desc("text"))
    m2 = export_shards(spark, shuffled, p2, n_shards=8)
    r1 = {(r["shard"], r["n_rows"], r["checksum"]) for r in m1.collect()}
    r2 = {(r["shard"], r["n_rows"], r["checksum"]) for r in m2.collect()}
    assert r1 == r2  # identical membership AND checksums
    assert len(r1) == 8
    counts = [n for _, n, _ in r1]
    assert sum(counts) == 5000
    assert min(counts) > 400  # hash balance: no starved shard at 5000/8


def test_verify_detects_tampering(spark, corpus, tmp_path):
    p = str(tmp_path / "exp")
    export_shards(spark, corpus, p, n_shards=4)
    assert verify_export(spark, p).count() == 0  # intact

    # tamper: drop one shard's files entirely
    import glob
    import shutil

    victim = glob.glob(f"{p}/data/shard=2")[0]
    shutil.rmtree(victim)
    bad = verify_export(spark, p).collect()
    assert len(bad) == 1 and bad[0]["shard"] == 2
    assert bad[0]["actual_rows"] is None


def test_round_trip_reads_back_complete(spark, corpus, tmp_path):
    p = str(tmp_path / "rt")
    export_shards(spark, corpus, p, n_shards=4)
    back = spark.read.parquet(f"{p}/data")
    assert back.count() == 5000
    assert back.select("doc_id").distinct().count() == 5000


def test_validates_shard_count(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="n_shards"):
        export_shards(spark, corpus, str(tmp_path / "x"), n_shards=0)
