"""Unit tests for sequence packing and repetition signals."""

from pyspark.sql import functions as F

from etl_workflows_spark.operators import packing, text


def _docs(spark):
    rows = [
        (1, "a b a b a b a b", "s1"),          # fully repetitive
        (2, "a b c d e f g h", "s1"),          # fully diverse
        (3, "x y x z x y x z x y", "s2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_repetition_signals_extremes(spark):
    out = {r["doc_id"]: r for r in text.repetition_signals(_docs(spark)).collect()}
    # doc 1: bigrams = [ab, ba, ab, ba, ab, ba, ab] -> top ratio 4/7
    assert abs(out[1]["top_2gram_ratio"] - 4 / 7) < 1e-12
    # doc 2: all 7 bigrams distinct -> 1/7
    assert abs(out[2]["top_2gram_ratio"] - 1 / 7) < 1e-12
    assert out[1]["top_3gram_ratio"] > out[2]["top_3gram_ratio"]


def test_pack_sequences_invariants(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), (F.col("id") % 7 + 1).cast("int"))).alias("text"),
        (F.col("id") % 3).cast("string").alias("source"),
    )
    out = packing.pack_sequences(docs, budget=10)
    rows = out.collect()
    assert len(rows) == 100
    for r in rows:
        assert 0 <= r["pack_offset"] < 10
        assert r["pack_id"] >= 0
    # deterministic: rerun gives the identical assignment
    again = packing.pack_sequences(docs, budget=10)
    assert out.exceptAll(again).count() == 0
    # per (source, pack): first-token offsets never exceed the budget and
    # every pack except the last in its source stream is "full" in the
    # sense that the next doc started a new pack only past the budget
    assert out.filter(F.col("pack_offset") >= 10).count() == 0


def test_pack_sequences_stable_under_growth(spark):
    """Packing order is by content hash: truncating the corpus to a hash
    prefix keeps relative order of survivors (same cumsum prefix)."""
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("t t t").alias("text"),
        F.lit("s").alias("source"),
    )
    full = packing.pack_sequences(docs, budget=7).collect()
    order_full = [r["doc_id"] for r in sorted(full, key=lambda r: (r["pack_id"], r["pack_offset"]))]
    # growing the corpus (here: the full set vs its first-half hash order)
    # never reorders existing docs relative to each other
    half_ids = set(order_full[:25])
    half = packing.pack_sequences(
        docs.filter(F.col("doc_id").isin(list(half_ids))), budget=7
    ).collect()
    order_half = [r["doc_id"] for r in sorted(half, key=lambda r: (r["pack_id"], r["pack_offset"]))]
    assert order_half == order_full[:25]


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's defining property: documents sharing a substring of
    length >= k + window - 1 (here 11) share at least one fingerprint;
    unrelated text shares none (md5 collisions at these set sizes are
    negligible)."""
    shared = "the quick brown fox jumps over"
    docs = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "other beginning " + shared + " tail"),
            (3, "completely unrelated words without overlap"),
        ],
        ["doc_id", "text"],
    )
    fps = text.winnow_fingerprints(docs)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must yield common fingerprints"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_token_balanced_shards_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 500
    out = packing.token_balanced_shards(docs, budget).collect()
    assert len(out) == docs.count()
    # shard of each doc = interval containing its first token, in doc_id order
    cum = 0
    by_id = sorted(out, key=lambda r: r["doc_id"])
    max_doc = max(r["n_tokens"] for r in by_id)
    totals = {}
    for r in by_id:
        assert r["shard_id"] == cum // budget, r
        cum += r["n_tokens"]
        totals[r["shard_id"]] = totals.get(r["shard_id"], 0) + r["n_tokens"]
    # every shard except the last deviates from budget by < one document
    last = max(totals)
    for sid, tot in totals.items():
        if sid != last:
            assert budget - max_doc < tot < budget + max_doc, (sid, tot)


def test_write_token_balanced_shards_roundtrip(spark, tmp_path):
    rows = [(i, "tok " * (i % 7 + 1) + "end") for i in range(1, 101)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    manifest = {
        r["shard_id"]: (r["n_docs"], r["n_tokens"])
        for r in packing.write_token_balanced_shards(
            docs, str(tmp_path / "shards"), budget=40
        ).collect()
    }
    total_docs = sum(n for n, _ in manifest.values())
    assert total_docs == 100
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert back.count() == 100
    # a dataloader worker reads one shard directory: verify partition dirs
    import os
    dirs = [d for d in os.listdir(tmp_path / "shards") if d.startswith("shard_id=")]
    assert len(dirs) == len(manifest)
