"""Deterministic sampling: reproducibility, growth stability, independence
of salted draws, split completeness."""

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators import sampling


def _docs(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 (F.col("id") % 3).cast("string").alias("source"))


def test_sample_fraction_and_determinism(spark):
    d = _docs(spark)
    s1 = sampling.deterministic_sample(d, 0.3)
    s2 = sampling.deterministic_sample(d, 0.3)
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2  # same rows every run
    assert 0.25 < len(ids1) / 2000 < 0.35  # ~fraction


def test_sample_stable_under_growth(spark):
    small = sampling.deterministic_sample(_docs(spark, 1000), 0.3)
    big = sampling.deterministic_sample(_docs(spark, 2000), 0.3)
    small_ids = {r["doc_id"] for r in small.collect()}
    big_ids = {r["doc_id"] for r in big.collect()}
    assert small_ids <= big_ids  # appending docs never evicts old members


def test_sample_nested_fractions(spark):
    d = _docs(spark)
    s10 = {r["doc_id"] for r in sampling.deterministic_sample(d, 0.1).collect()}
    s50 = {r["doc_id"] for r in sampling.deterministic_sample(d, 0.5).collect()}
    assert s10 <= s50  # thresholds nest: smaller mix is a subset


def test_salts_give_independent_draws(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in sampling.deterministic_sample(d, 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in sampling.deterministic_sample(d, 0.5, salt="b").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.3 < overlap < 0.7  # ~independent, not identical/disjoint


def test_stratified_rates(spark):
    d = _docs(spark)
    s = sampling.stratified_sample(
        d, {"0": 1.0, "1": 0.0}, strata_col="source", default_fraction=0.5
    )
    by_src = {r["source"]: r["n"] for r in
              s.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src["0"] == 667          # every stratum-0 row kept
    assert "1" not in by_src           # stratum-1 fully dropped
    assert 233 < by_src.get("2", 0) < 433  # default ~50%


def test_assign_split_partition_and_stability(spark):
    d = _docs(spark)
    out = sampling.assign_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == 2000  # total preserved
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 1400
    # pure function of key: same assignment on recompute
    again = sampling.assign_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0


def test_split_shares_must_sum_to_one(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.assign_split(_docs(spark), {"train": 0.5})
    with pytest.raises(ValueError, match="fraction"):
        sampling.deterministic_sample(_docs(spark), 1.5)


def test_fraction_one_keeps_all_and_zero_keeps_none(spark):
    """fraction=1.0 is exactly keep-everything (no strict-< edge where a
    hash prefix of ffffffff is dropped); 0.0 is exactly keep-nothing."""
    docs = _docs(spark)
    n = docs.count()
    assert sampling.deterministic_sample(docs, 1.0).count() == n
    assert sampling.deterministic_sample(docs, 0.0).count() == 0
    mixed = sampling.stratified_sample(
        docs, {"0": 1.0}, strata_col="source", default_fraction=0.0
    )
    per_src = dict(mixed.groupBy("source").count().collect())
    all_src = dict(docs.groupBy("source").count().collect())
    assert per_src == {"0": all_src["0"]}
