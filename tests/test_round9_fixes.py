"""Regression battery pinning the round-9 fixes (VERDICT r8 'next round'
items #1 and ADVICE r8):

1. ``materialize_token_budget`` computes its per-source running total
   with the bucketed ``ordering.global_cumsum`` (partition_cols=[source])
   instead of an unbounded per-source window — and keeps bit-exact
   results (long addition is associative), pinned here against the naive
   window form.
2. The prefix filter compares against the UNROUNDED target share
   (ADVICE r8: a target within 5e-5 below an integer must not flip a
   boundary document's membership via display rounding).
3. ``global_cumsum(partition_cols=...)`` is a general per-group exact
   running total; pinned against a naive per-group window on random
   data, plus the non-null contracts.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_workflows_spark.operators import ordering, sampling


def _grouped_vals(spark, n=400, seed=909):
    rng = random.Random(seed)
    rows = [
        (i, f"g{rng.randrange(3)}", rng.randrange(1, 100)) for i in range(n)
    ]
    return spark.createDataFrame(rows, "k long, g string, v long")


def test_global_cumsum_partition_cols_matches_naive_window(spark):
    df = _grouped_vals(spark).withColumn(
        "h", sampling.salted_hash(F.col("k"), "r9")
    )
    got = ordering.global_cumsum(
        df,
        sort_cols=["h", "k"],
        val_col="v",
        bucket=ordering.hash_prefix_bucket(F.col("h")),
        out_col="cum",
        partition_cols=["g"],
    )
    w = Window.partitionBy("g").orderBy("h", "k")
    want = df.withColumn("cum", F.sum("v").over(w))
    a = sorted(map(tuple, got.select("k", "g", "cum").collect()))
    b = sorted(map(tuple, want.select("k", "g", "cum").collect()))
    assert a == b


def test_global_cumsum_partition_cols_rejects_null_group(spark):
    df = spark.createDataFrame(
        [(1, "g0", 5), (2, None, 7)], "k long, g string, v long"
    ).withColumn("h", sampling.salted_hash(F.col("k"), "r9"))
    with pytest.raises(ValueError, match="non-null"):
        ordering.global_cumsum(
            df,
            sort_cols=["h", "k"],
            val_col="v",
            bucket=ordering.hash_prefix_bucket(F.col("h")),
            partition_cols=["g"],
        )


def test_materialize_bucketed_matches_naive_window(spark):
    """The bucketed rewrite must reproduce the pre-rewrite per-source
    window manifest row-for-row (n_tokens is a long: bucket split never
    changes the sum)."""
    rng = random.Random(910)
    rows = [
        (i, " ".join(f"w{rng.randrange(40)}" for _ in range(rng.randrange(3, 12))),
         f"s{rng.randrange(4)}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    budget = 600
    got = sampling.materialize_token_budget(docs, budget=budget)

    # naive reference: the exact formulation the rewrite replaced
    plan = sampling._token_budget_frame(
        docs, budget, None, 1.0, "source", "text"
    ).select("source", "__target_exact", "repeat_epochs")
    d = (
        docs.join(F.broadcast(plan), "source")
        .filter(F.col("repeat_epochs") > 0)
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
            "__target_exact",
            F.explode(
                F.sequence(F.lit(0), F.col("repeat_epochs") - 1)
            ).alias("epoch"),
        )
    )
    h = sampling.salted_hash(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("epoch").cast("string"),
        ),
        "mix",
    )
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"), F.col("epoch"))
    want = (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= F.col("__target_exact"))
        .select("doc_id", "source", "epoch", "n_tokens", "cum_tokens")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_materialize_filters_on_unrounded_target(spark):
    """ADVICE r8: target 9.99997 displays as 10.0 after ROUND(.,4); a
    10-token document's cum_tokens == 10 must still be DROPPED (the
    unrounded share is the semantic boundary, rounding is display-only).
    """
    docs = spark.createDataFrame(
        [(0, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "a"), (1, "u1 u2 u3 u4 u5", "b")],
        "doc_id long, text string, source string",
    )
    weights = {"a": 1.0, "b": 3e-6}
    # target_a = 10 * 1/(1+3e-6) = 9.99997... < 10, but ROUND(.,4) = 10.0
    plan = sampling.token_budget_plan(docs, budget=10, weights=weights)
    target_a = {r["source"]: r["target_tokens"] for r in plan.collect()}["a"]
    assert target_a == 10.0  # the display column DOES round up
    out = sampling.materialize_token_budget(docs, budget=10, weights=weights)
    assert [r for r in out.collect() if r["source"] == "a"] == []
    # sanity: with headroom the same doc IS kept
    out2 = sampling.materialize_token_budget(docs, budget=21, weights=weights)
    kept_a = [r for r in out2.collect() if r["source"] == "a"]
    assert kept_a and all(r["cum_tokens"] <= 20 for r in kept_a)
