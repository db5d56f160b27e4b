"""Bucketed-storage joins (operators/bucketed.py): the shuffle is paid at
write time, so the recurring fact⋈fact join runs with ZERO Exchange — the
claim is about the PHYSICAL PLAN, so these tests assert on it directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.bucketed import (
    bucketed_pair_join,
    ensure_bucketed,
    write_bucketed,
)
from etl_workflows_spark.queries.base import table


@pytest.fixture(scope="module")
def bucketed_join(spark, sf_dir, tmp_path_factory):
    """The orders⋈lineitem join through a bucketed round-trip, built once."""
    path = str(tmp_path_factory.mktemp("bkt"))
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ln = ensure_bucketed(spark, o, "t_orders", "o_orderkey", 8, path=path)
        rn = ensure_bucketed(
            spark, li, "t_lineitem", "l_orderkey", 8, path=path
        )
        lt, rt = spark.table(ln), spark.table(rn)
        yield lt.join(rt, lt["o_orderkey"] == rt["l_orderkey"]), o, li
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_join_plan_has_no_exchange_and_no_sort(spark, bucketed_join):
    """Both sides bucketed+sorted on the join key with equal bucket counts
    and one file per bucket → SortMergeJoin with neither Exchange nor Sort
    anywhere in the executed plan."""
    joined, _, _ = bucketed_join
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    assert "Sort " not in plan.replace("SortMergeJoin", ""), plan


def test_scan_reports_bucketed(spark, bucketed_join):
    joined, _, _ = bucketed_join
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    formatted = joined._jdf.queryExecution().explainString(mode)
    assert formatted.count("Bucketed: true") == 2, formatted


def test_results_match_plain_join(spark, bucketed_join):
    """Layout must never change answers: bucketed join == plain join."""
    joined, o, li = bucketed_join
    got = (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    )
    want = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    )
    key = lambda r: r["o_orderpriority"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_one_file_per_bucket(spark, sf_dir, tmp_path):
    """repartition(n, key) before the bucketed write must leave exactly one
    file per bucket — many files per bucket would re-introduce a read-side
    merge-sort and break the no-Sort plan."""
    import glob
    import os

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(o, "t_onefile", "o_orderkey", 4, path=str(tmp_path))
    files = glob.glob(os.path.join(str(tmp_path), "t_onefile", "*.parquet"))
    assert len(files) == 4, files
    spark.sql("DROP TABLE IF EXISTS t_onefile")


def test_ensure_is_idempotent(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders").select("o_orderkey").limit(10)
    n1 = ensure_bucketed(
        spark, o, "t_idem", "o_orderkey", 2, path=str(tmp_path)
    )
    # second call must reuse, not rewrite: poison the input to prove the
    # existing table is served as-is
    poisoned = o.withColumn("o_orderkey", F.lit(-1))
    n2 = ensure_bucketed(
        spark, poisoned, "t_idem", "o_orderkey", 2, path=str(tmp_path)
    )
    assert n1 == n2
    assert spark.table(n1).filter(F.col("o_orderkey") == -1).count() == 0
    spark.sql(f"DROP TABLE IF EXISTS {n1}")


def test_catalog_entry_matches_oracle(spark, sf_dir):
    """bucketed_join_revenue through the real catalog path vs its oracle
    aggregation computed directly — layout independence end-to-end."""
    from etl_workflows_spark.queries.analytics import bucketed_join_revenue

    got = {
        r["o_orderpriority"]: (r["n_items"], round(r["revenue"], 2))
        for r in bucketed_join_revenue(spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    want = {
        r["o_orderpriority"]: (r["n_items"], round(r["revenue"], 2))
        for r in (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        )
    }
    assert got == want
