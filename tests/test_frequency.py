"""Heavy hitters: Misra-Gries candidate guarantee + exact final set.

The operator's contract is exactness-despite-sketch: the candidate pass
may overshoot but never undershoot, and the final output equals a plain
GROUP BY ... HAVING freq*k > n on any input. Verified here against a
skewed synthetic distribution and the documents corpus.
"""

from pyspark.sql import functions as F

from etl_workflows_spark.operators.frequency import (
    heavy_hitters,
    misra_gries_candidates,
)
from etl_workflows_spark.queries.base import table


def _exact_heavy(df, col, k):
    n = df.count()
    rows = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * k > F.lit(n))
        .collect()
    )
    return {(r[col], r["freq"]) for r in rows}


def test_heavy_hitters_matches_exact_on_skewed_data(spark):
    # zipf-ish: value v appears ~ 3000/v times; many singletons as noise
    rows = [(v,) for v in range(1, 60) for _ in range(3000 // v)]
    rows += [(1000 + i,) for i in range(2000)]  # long tail of uniques
    df = spark.createDataFrame(rows, "v long").repartition(8)
    for k in (5, 20, 100):
        got = {(r["v"], r["freq"]) for r in heavy_hitters(df, "v", k).collect()}
        assert got == _exact_heavy(df, "v", k), f"k={k}"


def test_candidate_superset_guarantee(spark):
    rows = [(v,) for v in range(1, 40) for _ in range(2000 // v)]
    df = spark.createDataFrame(rows, "v long").repartition(16)
    k = 10
    n = df.count()
    true_heavy = {
        r["v"]
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") * k > F.lit(n))
        .collect()
    }
    cands = {r["v"] for r in misra_gries_candidates(df, "v", k).collect()}
    assert true_heavy <= cands
    # the whole point: candidate set is bounded, not the full key space
    assert len(cands) <= k * df.rdd.getNumPartitions()


def test_heavy_hitters_excludes_nulls_and_empty_result(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",), ("c",), ("d",)], "v string"
    )
    # every non-null value has freq 1; with k=2, n=5, need freq*2 > 5 → none
    assert heavy_hitters(df, "v", 2).count() == 0


def test_heavy_hitter_tokens_on_documents(spark, sf_dir):
    from etl_workflows_spark.queries.llm import heavy_hitter_tokens

    out = heavy_hitter_tokens(spark, sf_dir)
    assert out.columns == ["token", "freq"]
    toks = table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    assert {(r["token"], r["freq"]) for r in out.collect()} == _exact_heavy(
        toks, "token", 200
    )


def test_heavy_hitters_tags_via_broadcast_join_not_isin_literal(spark):
    """Scale contract: candidate tagging must be a broadcast join, never a
    driver-built isin literal list (k × num_partitions literals at 100 TB
    is a multi-million-node expression tree on the driver)."""
    from etl_workflows_spark.operators.frequency import _candidate_tag_counts

    rows = [(v % 7,) for v in range(5000)]
    df = spark.createDataFrame(rows, "v long").repartition(8)
    # inspect the tagging stage directly — heavy_hitters checkpoints it,
    # which truncates the lineage its own plan would show
    counts = _candidate_tag_counts(df, "v", 10)
    plan = counts._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # no unbounded literal IN-list over the tag column
    assert "__cand IN (" not in plan and "v IN (" not in plan
    got = {r["v"] for r in heavy_hitters(df, "v", 10).collect()}
    assert got == {i for i in range(7)}


def test_cms_estimates_are_one_sided_and_tight(spark):
    """est >= true always (CMS never undercounts); with w much larger
    than the key space, collisions are rare so most estimates are exact."""
    import random

    from etl_workflows_spark.operators import frequency

    rng = random.Random(3)
    vals = [f"k{rng.randrange(50)}" for _ in range(5000)]
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    df = spark.createDataFrame([(v,) for v in vals], ["key"])
    sketch = frequency.cms_build(df, "key", w=2048, d=4)
    est = {
        r["key"]: r["est_freq"]
        for r in frequency.cms_estimate(
            df.distinct(), sketch, "key", w=2048, d=4
        ).collect()
    }
    assert all(est[k] >= c for k, c in true.items())
    # total overcount bounded well inside eps*n at this geometry
    assert sum(est[k] - c for k, c in true.items()) <= 0.01 * len(vals)


def test_cms_merge_equals_build_on_union(spark):
    from etl_workflows_spark.operators import frequency

    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(100)], ["key"])
    b = spark.createDataFrame([(f"b{i % 5}",) for i in range(80)], ["key"])
    merged = sorted(
        map(
            tuple,
            frequency.cms_merge(
                frequency.cms_build(a, "key", w=64, d=3),
                frequency.cms_build(b, "key", w=64, d=3),
            ).collect(),
        )
    )
    direct = sorted(
        map(tuple, frequency.cms_build(a.unionByName(b), "key", w=64, d=3).collect())
    )
    assert merged == direct


def test_cms_unseen_key_and_probe_plan(spark):
    from etl_workflows_spark.operators import frequency

    df = spark.createDataFrame([("x",), ("y",)], ["key"])
    sketch = frequency.cms_build(df, "key", w=1024, d=4).localCheckpoint()
    probe = spark.createDataFrame([("never-seen",)], ["key"])
    est_df = frequency.cms_estimate(probe, sketch, "key", w=1024, d=4)
    assert est_df.collect()[0]["est_freq"] in (0, 1, 2)  # almost surely 0
    plan = est_df._jdf.queryExecution().executedPlan().toString()
    # 4 joins (AQE may render initial+final plan, so count >= 4)
    assert plan.count("BroadcastHashJoin") >= 4  # probe side never shuffles
    assert "SortMergeJoin" not in plan


def test_cms_validation(spark):
    import pytest

    from etl_workflows_spark.operators import frequency

    df = spark.createDataFrame([("x",)], ["key"])
    with pytest.raises(ValueError):
        frequency.cms_build(df, "key", w=1)
    with pytest.raises(ValueError):
        frequency.cms_build(df, "key", d=0)
