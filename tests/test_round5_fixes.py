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


def _snap_batch(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v").coalesce(1)


def test_merge_wide_key_source_never_collects_key_set(
    spark, tmp_path, monkeypatch
):
    """Backfill-scale MERGE: above the exact-prune threshold, pruning
    runs off <= _PRUNE_BUCKETS in-plan covering intervals and the
    semi/anti joins drop the forced broadcast — the full distinct key
    set never lands on the driver. Forced here by shrinking the
    thresholds; results must stay exact and pruning must still skip the
    non-overlapping file."""
    from etl_workflows_spark.sinks import snapshots as S

    monkeypatch.setattr(S, "_EXACT_PRUNE_MAX_KEYS", 10)
    monkeypatch.setattr(S, "_BROADCAST_MAX_KEYS", 10)
    # intercept every DataFrame.collect: nothing may collect more rows
    # than the interval budget while the thresholds force the wide path
    # (patch the CONCRETE class — pyspark 4's instances don't resolve
    # collect through the pyspark.sql.DataFrame base)
    DataFrame = type(spark.range(1))

    real_collect = DataFrame.collect
    sizes = []

    def spy(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    d = str(tmp_path / "t")
    for lo in (0, 1000, 2000):
        S.commit(_snap_batch(spark, lo, lo + 1000), d, stat_cols=["id"])
    # 600 distinct keys confined to the middle file's range + inserts
    src = spark.createDataFrame(
        [(i, -1) for i in range(1200, 1800)] + [(9000 + i, -1) for i in range(5)],
        ["id", "v"],
    )
    res = S.merge_into_snapshot(spark, src, d, ["id"])
    assert res["files_rewritten"] == 1, res
    assert res["matched"] == 600 and res["inserted"] == 5
    assert max(sizes) <= S._PRUNE_BUCKETS + 1, sizes
    out = S.read_snapshot(spark, d)
    assert out.count() == 3005
    assert out.filter("id = 1500").collect()[0]["v"] == -1
    assert out.filter("id = 500").collect()[0]["v"] == 1000


def test_delete_wide_key_interval_pruning(spark, tmp_path, monkeypatch):
    from etl_workflows_spark.sinks import snapshots as S

    monkeypatch.setattr(S, "_EXACT_PRUNE_MAX_KEYS", 10)
    monkeypatch.setattr(S, "_BROADCAST_MAX_KEYS", 10)
    d = str(tmp_path / "t")
    for lo in (0, 1000, 2000):
        S.commit(_snap_batch(spark, lo, lo + 1000), d, stat_cols=["id"])
    doomed = spark.range(2100, 2400).selectExpr("id")
    res = S.delete_from_snapshot(spark, doomed, d, ["id"])
    assert res["deleted"] == 300
    assert res["files_rewritten"] == 1, res
    assert S.read_snapshot(spark, d).count() == 2700


def test_source_prune_intervals_cover_all_keys(spark, monkeypatch):
    """The interval path is conservative by construction: every source
    key lies inside some returned interval, and the interval count is
    bounded. Strings above the threshold fall back to one global range."""
    from etl_workflows_spark.sinks import snapshots as S

    monkeypatch.setattr(S, "_EXACT_PRUNE_MAX_KEYS", 10)
    keys = spark.range(0, 5000).selectExpr("id * 7 AS k")
    ivs = S._source_prune_intervals(keys, "k")
    assert 1 < len(ivs) <= S._PRUNE_BUCKETS
    assert ivs == sorted(ivs)
    vals = [r["k"] for r in keys.collect()]
    assert all(any(lo <= v <= hi for lo, hi in ivs) for v in vals)
    skeys = spark.range(0, 200).selectExpr("concat('k', id) AS k")
    sivs = S._source_prune_intervals(skeys, "k")
    assert sivs == [("k0", "k99")]
