"""Pins for the round-8 continuation operators:

1. Generalized pigeonhole SimHash banding — ``near_dup_pairs_simhash``
   at radius r must equal the brute-force ``bit_count(xor) <= r`` pair
   set for every radius (r+1 banded equi-joins, exact verify), and must
   reject out-of-range radii.
2. ``sampling.token_budget_plan`` — hand-computed epoch/fraction/repeat
   arithmetic on a fixture mixture, weight defaulting, and validation.
3. ``text.compression_ratio`` — Arrow-batched zlib kernel: planted
   repetition compresses below natural text, empty text is ratio 1.0,
   output is deterministic across runs (rows-only entry's pytest twin).
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from etl_workflows_spark.operators import dedup, sampling, text


def _docs(spark, n=40, seed=88):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(10, 40))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_pairs(spark, docs, radius):
    fp = dedup.simhash_fingerprints(docs)
    a, b = fp.alias("a"), fp.alias("b")
    return sorted(
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "a.doc_id",
            "b.doc_id",
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("h"),
        )
        .filter(F.col("h") <= radius)
        .toPandas()
        .itertuples(index=False, name=None)
    )


@pytest.mark.parametrize("radius", [0, 1, 2, 3])
def test_simhash_banding_exact_at_every_radius(spark, radius):
    docs = _docs(spark)
    got = sorted(
        dedup.near_dup_pairs_simhash(docs, max_hamming=radius)
        .toPandas()
        .itertuples(index=False, name=None)
    )
    assert got == _brute_pairs(spark, docs, radius)
    # radius-2 must strictly widen radius-1 on this fixture, else the
    # test proves nothing about the extra band
    if radius == 2:
        assert len(got) > len(_brute_pairs(spark, docs, 1))


def test_simhash_radius_validation(spark):
    docs = _docs(spark, n=4)
    for bad in (-1, 16, 99):
        with pytest.raises(ValueError, match="max_hamming"):
            dedup.near_dup_pairs_simhash(docs, max_hamming=bad)


def test_token_budget_plan_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d", "s0"),  # 4 tokens
            (1, "a b c d e f", "s0"),  # 6 -> s0: 10
            (2, "a b c d e", "s1"),  # 5 -> s1: 5
            (3, "a b c d e f g h i j k l m n o p q r s t", "s2"),  # 20
        ],
        "doc_id long, text string, source string",
    )
    plan = {
        r["source"]: r
        for r in sampling.token_budget_plan(
            docs, budget=70, weights={"s0": 2.0}, default_weight=1.0
        ).collect()
    }
    # total weight = 2 + 1 + 1 = 4; targets: s0=35, s1=17.5, s2=17.5
    assert plan["s0"]["available_tokens"] == 10
    assert plan["s0"]["target_tokens"] == 35.0
    assert plan["s0"]["epochs"] == 3.5
    assert plan["s0"]["sample_fraction"] == 1.0
    assert plan["s0"]["repeat_epochs"] == 4
    assert plan["s1"]["available_tokens"] == 5
    assert plan["s1"]["target_tokens"] == 17.5
    assert plan["s1"]["epochs"] == 3.5
    assert plan["s2"]["available_tokens"] == 20
    assert plan["s2"]["epochs"] == 0.875
    assert plan["s2"]["sample_fraction"] == 0.875
    assert plan["s2"]["repeat_epochs"] == 1
    with pytest.raises(ValueError, match="budget"):
        sampling.token_budget_plan(docs, budget=-1)


def test_token_budget_plan_default_weights_uniform(spark):
    docs = spark.createDataFrame(
        [(0, "a b", "x"), (1, "a b", "y")],
        "doc_id long, text string, source string",
    )
    rows = sampling.token_budget_plan(docs, budget=8).collect()
    assert {r["source"]: r["target_tokens"] for r in rows} == {
        "x": 4.0,
        "y": 4.0,
    }
    assert all(r["weight"] == 1.0 for r in rows)


def test_compression_ratio_separates_repetition(spark):
    rng = random.Random(7)
    natural = " ".join(
        "".join(rng.choice("abcdefghijklmnop") for _ in range(6))
        for _ in range(60)
    )
    docs = spark.createDataFrame(
        [(0, "spam " * 200), (1, natural), (2, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.compression_ratio(docs, repetitive_below=0.3).collect()
    }
    assert out[0]["is_repetitive"] is True
    assert out[1]["is_repetitive"] is False
    assert out[0]["compression_ratio"] < out[1]["compression_ratio"]
    assert out[2]["compression_ratio"] == 1.0  # empty text: defined, not NaN
    assert out[1]["n_bytes"] == len(natural.encode("utf-8"))
    # deterministic across runs (the rows-only entry's pytest contract)
    again = {
        r["doc_id"]: r["compression_ratio"]
        for r in text.compression_ratio(docs, repetitive_below=0.3).collect()
    }
    assert again == {
        k: v["compression_ratio"] for k, v in out.items()
    }
    with pytest.raises(ValueError, match="level"):
        text.compression_ratio(docs, level=0)


def test_simhash_wide_fingerprint_exact_and_sparser(spark):
    """Width generalization (simhash_bits): at 48 bits the radius-2
    banded join must still equal brute force, and must be strictly
    MORE discriminative than 16 bits (fewer radius-2 collisions —
    the reason the fingerprint widens with the corpus)."""
    docs = _docs(spark, n=40)
    fp = dedup.simhash_fingerprints(docs, bits=48)
    a, b = fp.alias("a"), fp.alias("b")
    brute = sorted(
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "a.doc_id",
            "b.doc_id",
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("h"),
        )
        .filter(F.col("h") <= 2)
        .toPandas()
        .itertuples(index=False, name=None)
    )
    got = sorted(
        dedup.near_dup_pairs_simhash(docs, max_hamming=2, bits=48)
        .toPandas()
        .itertuples(index=False, name=None)
    )
    assert got == brute
    narrow = dedup.near_dup_pairs_simhash(docs, max_hamming=2, bits=16)
    assert len(got) <= narrow.count()


def test_simhash_bits_validation(spark):
    docs = _docs(spark, n=4)
    with pytest.raises(ValueError, match="bits"):
        dedup.simhash_fingerprints(docs, bits=63)
    with pytest.raises(ValueError, match="bits"):
        dedup.simhash_fingerprints(docs, bits=0)
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.near_dup_pairs_simhash(docs, max_hamming=48, bits=48)


def test_materialize_token_budget_semantics(spark):
    """The manifest materializer: per-source running totals never exceed
    the target, every kept row's tokens are counted, epochs stay below
    the plan's repeat factor, and the output is a deterministic pure
    function of content + salt."""
    docs = spark.createDataFrame(
        [
            (0, "a b c d", "s0"),
            (1, "a b c d e f", "s0"),  # s0 avail 10
            (2, "a b c d e", "s1"),  # s1 avail 5
        ],
        "doc_id long, text string, source string",
    )
    # budget 30, uniform weights -> 15 tokens per source; s0 needs 1.5
    # epochs (repeat 2), s1 needs 3 epochs
    out = sampling.materialize_token_budget(docs, budget=30).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"s0", "s1"}
    from itertools import accumulate

    for src, rows in by_src.items():
        total = sum(r["n_tokens"] for r in rows)
        assert total <= 15
        assert max(r["cum_tokens"] for r in rows) == total
        # prefix property: in cum_tokens order, each cum is the running
        # sum of the kept rows' token counts — no gaps, no overlaps
        ordered = sorted(rows, key=lambda r: r["cum_tokens"])
        assert [r["cum_tokens"] for r in ordered] == list(
            accumulate(r["n_tokens"] for r in ordered)
        )
    # s1 is one 5-token doc: exactly 3 epochs of it fill the 15 target
    assert sorted(r["epoch"] for r in by_src["s1"]) == [0, 1, 2]
    assert all(r["n_tokens"] == 5 for r in by_src["s1"])
    # determinism
    again = sampling.materialize_token_budget(docs, budget=30).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
