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


def test_weighted_sample_k_deterministic_and_weight_monotone(spark):
    """Efraimidis-Spirakis sampling: reruns are identical; across many
    salts, a 5x-weighted stratum is included ~5x as often as the 1x
    stratum (binomial slack)."""
    from etl_workflows_spark.operators.sampling import weighted_sample_k
    from pyspark.sql import functions as F

    rows = [(i, 5.0 if i < 100 else 1.0) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    a = {r["doc_id"] for r in weighted_sample_k(df, 60, "w").collect()}
    b = {r["doc_id"] for r in weighted_sample_k(df, 60, "w").collect()}
    assert a == b and len(a) == 60

    heavy_rate, light_rate, trials = 0, 0, 12
    for s in range(trials):
        got = {
            r["doc_id"]
            for r in weighted_sample_k(df, 60, "w", salt=f"s{s}").collect()
        }
        heavy_rate += len([d for d in got if d < 100])
        light_rate += len([d for d in got if d >= 100])
    # expected inclusion ~ w-proportional: heavy 100*5 / (100*5+500*1) = 0.5
    # of each sample of 60 → ~30 heavy vs ~30 light per trial
    assert heavy_rate / trials > 20, heavy_rate / trials
    assert abs((heavy_rate + light_rate) / trials - 60) < 1e-9

    # zero/negative weights never sampled
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, 2.0)], "doc_id long, w double"
    )
    got = {r["doc_id"] for r in weighted_sample_k(df2, 3, "w").collect()}
    assert got == {3}


# --- blend_sources ----------------------------------------------------------


def test_blend_sources_proportions_and_binding_source(spark):
    from etl_workflows_spark.operators.sampling import blend_sources

    rows = (
        [(i, "a") for i in range(1000)]
        + [(i + 1000, "b") for i in range(1000)]
        + [(i + 2000, "c") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # c is binding: T = min(1000/.4, 1000/.4, 200/.2) = 1000 → keep all of c,
    # a and b each keep ~0.4·1000/1000 = 40%
    out = blend_sources(df, {"a": 0.4, "b": 0.4, "c": 0.2})
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["c"] == 200  # binding source keeps everything
    assert 330 <= counts["a"] <= 470, counts  # ~400 ± hash noise
    assert 330 <= counts["b"] <= 470, counts
    # deterministic: identical rerun
    again = {r["source"]: r["n"] for r in
             blend_sources(df, {"a": 0.4, "b": 0.4, "c": 0.2})
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_blend_sources_drops_unlisted_and_nests(spark):
    from etl_workflows_spark.operators.sampling import blend_sources

    rows = [(i, ["a", "b", "x"][i % 3]) for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = blend_sources(df, {"a": 0.5, "b": 0.5})
    assert out.filter(F.col("source") == "x").count() == 0
    # nested thresholds: raising a source's target only grows its kept set
    small = {r["doc_id"] for r in
             blend_sources(df, {"a": 0.2, "b": 0.8}).filter(
                 F.col("source") == "a").collect()}
    big = {r["doc_id"] for r in
           blend_sources(df, {"a": 0.5, "b": 0.5}).filter(
               F.col("source") == "a").collect()}
    assert small <= big


def test_blend_sources_validates_weights(spark):
    from etl_workflows_spark.operators.sampling import blend_sources

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="non-empty"):
        blend_sources(df, {})
    with pytest.raises(ValueError, match="> 0"):
        blend_sources(df, {"a": 0.0})


def test_blend_sources_plan_is_broadcast_only(spark):
    from etl_workflows_spark.operators.sampling import blend_sources

    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(100)],
        "doc_id long, source string",
    )
    out = blend_sources(df, {"a": 0.5, "b": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# --- split_by_group / budget_select ----------------------------------------


def test_split_by_group_keeps_duplicates_together(spark):
    from etl_workflows_spark.operators.sampling import split_by_group

    # three distinct texts, each duplicated across many doc_ids
    rows = [(i, f"text {i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "fp", F.md5("text")
    )
    out = split_by_group(df, {"train": 0.8, "val": 0.1, "test": 0.1}, "fp")
    per_fp = (
        out.groupBy("fp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_fp)  # no group straddles


def test_budget_select_matches_window_semantics(spark):
    from etl_workflows_spark.operators.sampling import budget_select
    from pyspark.sql.window import Window as W2

    rows = [(i, float((i * 37) % 50), (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, q double, cost long")
    got = budget_select(df, 200, "q", "cost", n_buckets=8)
    w = W2.orderBy(F.col("q").desc(), F.col("doc_id")).rowsBetween(
        W2.unboundedPreceding, W2.currentRow
    )
    expect = (
        df.withColumn("cum", F.sum("cost").over(w))
        .filter(F.col("cum") <= 200)
        .collect()
    )
    g = {r["doc_id"]: r["cum_cost"] for r in got.collect()}
    e = {r["doc_id"]: r["cum"] for r in expect}
    assert g == e
    # plan: no single-partition exchange on the selection path
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_budget_select_zero_budget_and_validation(spark):
    from etl_workflows_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [(1, 1.0, 5)], "doc_id long, q double, cost long"
    )
    assert budget_select(df, 0, "q", "cost").count() == 0
    with pytest.raises(ValueError, match="budget"):
        budget_select(df, -1, "q", "cost")


def test_global_cumsum_exact_on_skewed_values(spark):
    from etl_workflows_spark.operators.ordering import (
        global_cumsum,
        numeric_cut_buckets,
    )
    from pyspark.sql.window import Window as W2

    rows = [(i, float(5 if i % 2 else i % 11), int(i % 13)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v double, c long").repartition(8)
    out = global_cumsum(
        df, ["v", "k"], "c", numeric_cut_buckets(df, "v", 8)
    )
    w = W2.orderBy("v", "k").rowsBetween(W2.unboundedPreceding, W2.currentRow)
    expect = df.withColumn("e", F.sum("c").over(w))
    joined = out.join(expect, ["k", "v", "c"])
    assert joined.filter(F.col("cumsum") != F.col("e")).count() == 0


def test_negative_samples_deterministic_and_collision_free(spark):
    from etl_workflows_spark.operators.sampling import negative_samples

    pairs = spark.createDataFrame(
        [(q, (q * 3) % 20) for q in range(50)], "query_id long, pos_id long"
    )
    out = negative_samples(pairs, n_corpus=20, k=4)
    rows = out.collect()
    assert len(rows) == 200  # k per pair
    assert all(0 <= r["neg_id"] < 20 for r in rows)
    assert all(r["neg_id"] != r["pos_id"] for r in rows)  # collision bump
    again = {(r["query_id"], r["neg_rank"]): r["neg_id"]
             for r in negative_samples(pairs, n_corpus=20, k=4).collect()}
    first = {(r["query_id"], r["neg_rank"]): r["neg_id"] for r in rows}
    assert first == again
    # negatives are roughly uniform over the corpus
    distinct = len({r["neg_id"] for r in rows})
    assert distinct >= 15
    with pytest.raises(ValueError, match="k must"):
        negative_samples(pairs, n_corpus=20, k=0)
    with pytest.raises(ValueError, match="n_corpus"):
        negative_samples(pairs, n_corpus=1, k=2)


# --- temperature_mix --------------------------------------------------------


def test_temperature_mix_alpha1_keeps_everything(spark):
    from etl_workflows_spark.operators.sampling import temperature_mix

    rows = [(i, "a") for i in range(800)] + [(i + 800, "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # alpha=1 → weights proportional to sizes → natural mixture → no-op
    assert temperature_mix(df, alpha=1.0).count() == 1000


def test_temperature_mix_flattens_toward_uniform(spark):
    from etl_workflows_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(3600)] + [
        (i + 10000, "small") for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, alpha=0.5)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # sqrt weights: 60:20 → small is binding (keeps all 400); big keeps
    # 400·(60/20) = 1200 in expectation
    assert counts["small"] == 400
    assert 1000 <= counts["big"] <= 1400, counts
    # deterministic rerun
    again = {
        r["source"]: r["n"]
        for r in temperature_mix(df, alpha=0.5)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == again


def test_temperature_mix_validates_alpha(spark):
    from etl_workflows_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(df, alpha=1.5)


def test_aqp_sum_estimate_covers_truth_and_is_deterministic(spark, sf_dir):
    """The HT estimate from the 5% deterministic sample must land within
    its own ±1.96σ band of the exact per-group total on the test corpus
    (deterministic data + deterministic sample ⇒ a stable assertion, not
    a flaky statistical one), and re-running reproduces it bit-for-bit."""
    import pyspark.sql.functions as F

    from etl_workflows_spark.operators.sampling import aqp_sum_estimate
    from etl_workflows_spark.queries.base import dec, table

    li = table(spark, sf_dir, "lineitem")
    v = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    key = F.concat_ws(
        "|", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    est = {
        r["l_returnflag"]: r
        for r in aqp_sum_estimate(
            li, v, key, 0.05, group_cols=["l_returnflag"]
        ).collect()
    }
    exact = {
        r["l_returnflag"]: float(r["t"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(v).alias("t"))
        .collect()
    }
    n_total = li.count()
    n_sampled = sum(r["n_sampled"] for r in est.values())
    assert 0.02 * n_total < n_sampled < 0.09 * n_total
    for rf, truth in exact.items():
        r = est[rf]
        assert r["ci_half"] is not None
        assert abs(r["est_total"] - truth) <= r["ci_half"], (
            rf, r["est_total"], truth, r["ci_half"]
        )
        # the band is informative, not vacuous: within ±35% of truth
        assert r["ci_half"] < 0.35 * truth
    again = {
        r["l_returnflag"]: (r["n_sampled"], r["est_total"], r["ci_half"])
        for r in aqp_sum_estimate(
            li.repartition(16), v, key, 0.05, group_cols=["l_returnflag"]
        ).collect()
    }
    assert again == {
        rf: (r["n_sampled"], r["est_total"], r["ci_half"])
        for rf, r in est.items()
    }


def test_aqp_sum_estimate_validates_fraction_and_small_groups(spark):
    import pyspark.sql.functions as F
    import pytest as _pytest

    from etl_workflows_spark.operators.sampling import aqp_sum_estimate

    df = spark.createDataFrame(
        [(i, i * 1.0) for i in range(40)], "k long, val double"
    ).select("k", F.col("val").cast("decimal(18,4)").alias("val"))
    with _pytest.raises(ValueError, match="fraction"):
        aqp_sum_estimate(df, F.col("val"), F.col("k"), 1.0)
    # tiny fraction → 0- or 1-row sample: ci_half must be NULL, not a
    # fabricated zero-variance band
    out = aqp_sum_estimate(df, F.col("val"), F.col("k"), 0.03).collect()
    if out and out[0]["n_sampled"] < 2:
        assert out[0]["ci_half"] is None


def test_aqp_sum_estimate_requires_decimal_values(spark):
    import pyspark.sql.functions as F
    import pytest as _pytest

    from etl_workflows_spark.operators.sampling import aqp_sum_estimate

    df = spark.createDataFrame([(1, 2.0)], "k long, val double")
    with _pytest.raises(ValueError, match="decimal"):
        aqp_sum_estimate(df, F.col("val"), F.col("k"), 0.05)


def test_aqp_count_estimate_covers_truth(spark, sf_dir):
    """The COUNT leg (HT with v≡1) must band the exact per-group row
    counts on the deterministic corpus."""
    import pyspark.sql.functions as F

    from etl_workflows_spark.operators.sampling import aqp_sum_estimate
    from etl_workflows_spark.queries.base import dec, table

    li = table(spark, sf_dir, "lineitem")
    v = dec("l_quantity").cast("decimal(18,4)")
    key = F.concat_ws(
        "|", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    est = {
        r["l_returnflag"]: r
        for r in aqp_sum_estimate(
            li, v, key, 0.05, group_cols=["l_returnflag"]
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for rf, truth in exact.items():
        r = est[rf]
        assert abs(r["est_count"] - truth) <= r["count_ci_half"], (
            rf, r["est_count"], truth, r["count_ci_half"]
        )
