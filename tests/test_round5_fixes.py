"""Regression battery pinning the round-5 hardening fixes (ADVICE r4):

1. token_balanced_shards: NULL text counts 0 tokens, not size(NULL)=-1
   (which corrupted the global cumulative sum and every shard_id);
2. quarantine_stream: streams carrying a map column no longer fail the
   deterministic-survivor ordering (maps are not orderable in Spark);
3. compact_table: partitioned tables with a map column no longer fail
   the xxhash64 salt (maps are not hashable in Spark);
4. near_dup_incremental: a caller-supplied checkpoint-backed input is
   NOT unpersisted by the function's internal checkpoint sweep;
5. vocab_coverage: the internal persist is released before returning
   (CacheManager entries are never reaped by the ContextCleaner).
"""

import os

from pyspark.sql import functions as F

from etl_workflows_spark.operators.expectations import Expectation
from etl_workflows_spark.streaming.quality import quarantine_stream


def test_token_shards_null_text_counts_zero(spark):
    from etl_workflows_spark.operators.packing import token_balanced_shards

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e"), (4, "f g h i")],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in token_balanced_shards(docs, budget=5).collect()
    }
    assert rows[2]["n_tokens"] == 0
    # cumulative intervals in doc_id order: [0,3) [3,3) [3,5) [5,9) —
    # the NULL doc inherits the running position, nothing goes negative
    assert rows[1]["shard_id"] == 0
    assert rows[2]["shard_id"] == 0
    assert rows[3]["shard_id"] == 0
    assert rows[4]["shard_id"] == 1


def test_quarantine_stream_tolerates_map_column(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, 10.0, {"k": "v"}), (2, None, {"x": "y"}), (2, 5.0, {"a": "b"})],
        "event_id long, value double, attrs map<string,string>",
    ).write.mode("overwrite").parquet(src)
    schema = "event_id long, value double, attrs map<string,string>"
    stream = spark.readStream.schema(schema).parquet(src)
    rules = [
        Expectation(name="value_not_null", kind="not_null", column="value")
    ]
    quarantine_stream(
        stream, rules, "r5.map_dest", "r5.map_quar", ["event_id"], ckpt
    )
    dest = {r["event_id"] for r in spark.table("r5.map_dest").collect()}
    quar = {r["event_id"] for r in spark.table("r5.map_quar").collect()}
    assert 1 in dest
    # key 2 has one clean and one dirty row: the deterministic survivor
    # lands in exactly one table, never both
    assert (2 in dest) != (2 in quar)


def test_compact_partitioned_table_with_map_column(spark, tmp_path):
    from etl_workflows_spark.sinks.compact import compact_table

    spark.sql("CREATE DATABASE IF NOT EXISTS r5")
    df = spark.createDataFrame(
        [(i, i % 2, {"k": str(i)}) for i in range(200)],
        "id int, pt int, attrs map<string,string>",
    )
    df.write.mode("overwrite").partitionBy("pt").saveAsTable("r5.map_part")
    n = compact_table(spark, "r5.map_part", target_file_mb=1)
    assert n >= 1
    got = spark.table("r5.map_part")
    assert got.count() == 200
    assert got.filter(F.col("attrs")["k"] == "7").count() == 1


def test_near_dup_incremental_keeps_callers_checkpoint(spark, tmp_path):
    from etl_workflows_spark.operators.dedup import (
        build_near_dup_index,
        near_dup_incremental,
    )

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(20)],
        "doc_id int, text string",
    )
    build_near_dup_index(corpus, "r5.ndidx")
    new_docs = spark.createDataFrame(
        [
            (100, "one two three four five six seven eight"),
            (101, "totally different words nine ten eleven twelve"),
        ],
        "doc_id int, text string",
    ).localCheckpoint(eager=True)
    out = near_dup_incremental(new_docs, "r5.ndidx")
    assert out.count() == 2
    # the caller's checkpoint-backed input must survive the internal
    # sweep: its lineage was severed, so an unpersist here would be an
    # unrecoverable missing-block failure on this recount
    assert new_docs.count() == 2


def test_vocab_coverage_releases_its_cache(spark, sf_dir):
    from etl_workflows_spark.operators.text import vocab_coverage

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    before = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    out = vocab_coverage(docs.limit(500))
    assert out.count() == 3
    if before:
        # no CacheManager entry may outlive the call — persists are not
        # reaped by the ContextCleaner
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
