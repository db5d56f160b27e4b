"""Streaming near-dup corpus firewall (streaming/incremental.py +
operators/dedup.py near-dup index): every micro-batch is near-dedup'd
within itself and against all previously accepted documents, survivors
land exactly-once and register in the index for later batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from etl_workflows_spark.operators import dedup
from etl_workflows_spark.streaming.incremental import (
    streaming_near_dup_firewall,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BASE_A = "the quick brown fox jumps over the lazy dog while rain falls on the quiet green valley beneath tall mountains at dawn"
BASE_B = "stock markets rallied sharply today as investors digested upbeat earnings reports from major technology firms across several sectors"
BASE_C = "researchers announced a breakthrough in battery chemistry that could double electric vehicle range within the coming decade of development"
FRESH_D = "the committee voted to approve new zoning rules for riverfront development after months of contentious public hearings downtown"
FRESH_E = "volunteers planted thousands of native trees along the eroded hillside hoping to restore habitat lost to last summer wildfires"


def _near(text: str) -> str:
    # appending one token flips ~2 of ~20 3-shingles → Jaccard ≈ 0.9,
    # comfortably above threshold=0.5 and inside LSH recall
    return text + " tonight"


@pytest.fixture()
def corpus_env(spark, tmp_path):
    prev_wh = None
    seed = spark.createDataFrame(
        [(1, BASE_A), (2, BASE_B), (3, BASE_C)], SCHEMA
    )
    for t in ("ndfw_idx_bands", "ndfw_idx_sh", "ndfw_corpus"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    dedup.build_near_dup_index(seed, "ndfw_idx", n_buckets=4)
    from etl_workflows_spark.sinks.writer import write_table

    write_table(seed, "ndfw_corpus")
    yield seed
    for t in ("ndfw_idx_bands", "ndfw_idx_sh", "ndfw_corpus"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    del prev_wh


def _write_batch(spark, d: str, rows) -> None:
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)


def _run(spark, src: str, ckpt: str) -> None:
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    streaming_near_dup_firewall(
        stream, "ndfw_idx", "ndfw_corpus", ckpt, threshold=0.5
    )


def _corpus_ids(spark) -> set[int]:
    return {r["doc_id"] for r in spark.table("ndfw_corpus").collect()}


def test_firewall_filters_within_and_across_batches(
    spark, corpus_env, tmp_path
):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark,
        src,
        [
            (10, _near(BASE_A)),  # near-dup of corpus doc 1 → dropped
            (11, FRESH_D),        # fresh → accepted
            (12, FRESH_E),        # fresh → accepted
            (13, _near(FRESH_E)),  # near-dup of 12 within batch → dropped
        ],
    )
    _run(spark, src, ckpt)
    assert _corpus_ids(spark) == {1, 2, 3, 11, 12}

    # batch 2: near-dup of a doc accepted in batch 1 (not the seed) →
    # proves survivors were registered in the index between batches
    _write_batch(
        spark,
        src,
        [
            (14, _near(FRESH_D) + " again"),  # near-dup of 11 → dropped
            (15, "completely different words about sailing across the cold northern sea under bright auroras with seasoned crews"),
        ],
    )
    _run(spark, src, ckpt)
    assert _corpus_ids(spark) == {1, 2, 3, 11, 12, 15}


def test_firewall_rerun_is_exactly_once(spark, corpus_env, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(11, FRESH_D), (10, _near(BASE_A))])
    _run(spark, src, str(tmp_path / "ckpt1"))
    assert _corpus_ids(spark) == {1, 2, 3, 11}
    before_bands = spark.table("ndfw_idx_bands").count()
    # a FRESH checkpoint re-delivers the same files — the keyed corpus
    # append and the doc_id-guarded index append must both no-op
    _run(spark, src, str(tmp_path / "ckpt2"))
    assert _corpus_ids(spark) == {1, 2, 3, 11}
    assert spark.table("ndfw_idx_bands").count() == before_bands


def test_firewall_matches_batch_dedup(spark, corpus_env, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    arriving = [
        (10, _near(BASE_A)),
        (11, FRESH_D),
        (12, FRESH_E),
        (13, _near(FRESH_E)),
    ]
    _write_batch(spark, src, arriving)
    _run(spark, src, ckpt)
    everything = corpus_env.unionByName(
        spark.createDataFrame(arriving, SCHEMA)
    )
    batch_ids = {
        r["doc_id"]
        for r in dedup.dedup_near_duplicates(everything, 0.5).collect()
    }
    assert _corpus_ids(spark) == batch_ids


def test_streaming_exact_dedup_firewall_with_bloom(spark, tmp_path):
    """Multi-batch exact-dup firewall with the Bloom fast path: cross-
    batch duplicates blocked, within-batch duplicates collapsed, final
    corpus equals a from-scratch batch dedup, sidecar stays current."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators import dedup
    from etl_workflows_spark.streaming.incremental import (
        streaming_exact_dedup_firewall,
    )

    src = tmp_path / "fw_in"
    src.mkdir()
    batches = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],      # in-batch dup
        [(4, "alpha"), (5, "gamma")],                   # cross-batch dup
        [(6, "beta"), (7, "delta"), (8, "gamma")],      # two cross-batch dups
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))

    spark.sql("CREATE DATABASE IF NOT EXISTS fwdb")
    for t in ("fwdb.fp_idx", "fwdb.fp_bloom", "fwdb.corpus"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    empty = spark.createDataFrame([], "doc_id long, text string")
    dedup.build_fingerprint_index(empty, "fwdb.fp_idx")
    dedup.build_bloom_sidecar(empty, "fwdb.fp_bloom", m_bits=1 << 12, k=4)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "b*"))
    streaming_exact_dedup_firewall(
        stream, "fwdb.fp_idx", "fwdb.corpus", str(tmp_path / "fw_ck"),
        bloom_table="fwdb.fp_bloom",
    )

    corpus = {(r["doc_id"], r["text"]) for r in spark.table("fwdb.corpus").collect()}
    assert {t for _, t in corpus} == {"alpha", "beta", "gamma", "delta"}
    assert len(corpus) == 4  # one row per distinct text, ever
    # index and sidecar both know every accepted text
    assert spark.table("fwdb.fp_idx").count() == 4
    probe = dedup.dedup_incremental(
        spark.createDataFrame([(99, "delta"), (100, "epsilon")],
                              "doc_id long, text string"),
        "fwdb.fp_idx", bloom_table="fwdb.fp_bloom",
    )
    assert [r["text"] for r in probe.collect()] == ["epsilon"]
    # replay with no new files: nothing changes
    streaming_exact_dedup_firewall(
        stream, "fwdb.fp_idx", "fwdb.corpus", str(tmp_path / "fw_ck"),
        bloom_table="fwdb.fp_bloom",
    )
    assert spark.table("fwdb.corpus").count() == 4
