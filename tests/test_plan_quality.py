"""Plan-shape assertions: the properties that keep these queries fast at
1000× the data. A green correctness suite with a bad plan is a failure at
100 TB — these tests pin the plan features that matter:

* filters reach the parquet scan (PushedFilters)
* scans are column-pruned (ReadSchema subset)
* dim joins broadcast (no shuffle of the big side for small dims)
* global top-k plans as TakeOrderedAndProject (no full sort)
* no accidental CartesianProduct anywhere in the catalog
"""

import pytest

from etl_workflows_spark.queries import QUERIES
from etl_workflows_spark.queries.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_region_revenue,
    topk_orders,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # column pruning: the untouched wide columns never leave the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema


def test_q3_broadcasts_dims(spark, sf_dir):
    plan = _plan(q3_shipping_priority(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2  # customer AND orders side
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-10 without full sort
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed to scan


def test_q5_no_shuffle_join_on_dims(spark, sf_dir):
    plan = _plan(q5_region_revenue(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_topk_plans_as_take_ordered(spark, sf_dir):
    plan = _plan(topk_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_products_anywhere(spark, sf_dir, name):
    """Only the deliberate 1-row-broadcast cross joins may appear, and they
    must be broadcast nested loop, never CartesianProduct."""
    plan = _plan(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, name


def test_partitioned_write_prunes_scan(spark, sf_dir):
    """Date-partitioned fact table + year filter ⇒ partition pruning (the
    scan's PartitionFilters carries the predicate; only matching partition
    directories are read)."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks.writer import write_table

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS pp")
    write_table(li, "pp.lineitem_p", partition_by=["ship_year"])
    q = spark.table("pp.lineitem_p").filter(F.col("ship_year") == 1997)
    plan = _plan(q)
    assert "PartitionFilters" in plan
    assert "ship_year" in plan.split("PartitionFilters", 1)[1][:200]
    n_direct = li.filter(F.col("ship_year") == 1997).count()
    assert q.count() == n_direct


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """Two tables bucketed+sorted on the join key sort-merge-join with NO
    Exchange on either side — the co-located-join contract write_table's
    bucket_by exists for (at 100 TB this removes the dominant shuffle of
    repeated fact-fact joins)."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.sinks.writer import write_table

    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    a = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_table(a, "bkt.a", bucket_by=(8, ["k"]))
    write_table(b, "bkt.b", bucket_by=(8, ["k"]))
    # Force the non-broadcast path: at real scale neither fact side fits
    # in a broadcast; the point is the SMJ runs without Exchange.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt.a").join(spark.table("bkt.b"), "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_equidepth_approx_no_global_sort_and_bounded_error(spark, sf_dir):
    """The approx equi-depth twin must plan with no Sort/Window at all
    (the exact NTILE form is a single-reducer total order), and its
    bucket populations must track the exact twin within the GK sketch's
    rank-error bound."""
    from etl_workflows_spark.queries.analytics import (
        equidepth_histogram,
        equidepth_histogram_approx,
    )

    approx = equidepth_histogram_approx(spark, sf_dir)
    plan = _plan(approx)
    assert "Sort" not in plan and "Window" not in plan
    got = {r["bucket"]: r for r in approx.collect()}
    want = {r["bucket"]: r for r in equidepth_histogram(spark, sf_dir).collect()}
    n = sum(r["n_rows"] for r in want.values())
    assert sum(r["n_rows"] for r in got.values()) == n  # partition of the rows
    # rank error <= n/accuracy per cut; allow ties + both adjacent cuts
    tol = max(5, 2 * n // 100_000 + 2)
    for b, w in want.items():
        assert b in got
        assert abs(got[b]["n_rows"] - w["n_rows"]) <= tol, (b, got[b], w)
    # bucket bounds are monotone and non-overlapping
    ordered = [got[b] for b in sorted(got)]
    for lo_r, hi_r in zip(ordered, ordered[1:]):
        assert lo_r["hi"] <= hi_r["lo"]


def test_sft_render_is_shuffle_free(spark, sf_dir):
    """Prompt rendering must be scan → project only: any Exchange in a
    row-wise string assembly is a plan regression."""
    from etl_workflows_spark.queries.llm import sft_render_docs

    plan = _plan(sft_render_docs(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "codegen id" in plan  # pure Catalyst, no Python


def test_rerank_touches_corpus_via_semi_join(spark, sf_dir):
    """Stage-2 rerank must reach document text through a broadcast join
    driven by the candidate ids — never a second full-corpus shuffle."""
    from etl_workflows_spark.queries.llm import rerank_bm25_topk

    plan = _plan(rerank_bm25_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_simhash_r2_bands_are_equi_joins(spark, sf_dir):
    """Radius-2 pigeonhole banding must plan as per-band EQUI-joins — an
    OR of block equalities would fall to BroadcastNestedLoopJoin and
    O(n²) comparisons."""
    from etl_workflows_spark.queries.llm import near_dup_simhash_r2

    plan = _plan(near_dup_simhash_r2(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_token_budget_plan_single_corpus_shuffle(spark, sf_dir):
    """The mixture planner's only corpus-sized shuffle is the
    groupBy(source) agg; the total-weight window runs on the post-agg
    frame (one row per source)."""
    from etl_workflows_spark.queries.llm import token_budget_plan_docs

    plan = _plan(token_budget_plan_docs(spark, sf_dir))
    # formatted mode: partitionings live on the Arguments lines
    assert plan.count("hashpartitioning(source") == 1, plan
    assert plan.count("SinglePartition") == 1, plan  # post-agg window only
    assert "partial" in plan.lower()  # map-side combine before the shuffle


def test_mixture_materialize_window_is_bucketed(spark, sf_dir):
    """The manifest's corpus-sized running total must be partitioned by
    (source, hash-bucket) — a window partitioned by source alone makes
    one multi-TB sort task per source at 100 TB (VERDICT r8's one weak
    item). The offsets map keeps the result bit-exact."""
    import re

    from etl_workflows_spark.queries.llm import mixture_materialize_docs

    plan = _plan(mixture_materialize_docs(spark, sf_dir))
    # the data-sized exchange hashes on (source, __bucket), never source
    # alone; the only SinglePartition is the post-agg total-weight window
    # (one row per source — same allowance as token_budget_plan's test)
    assert re.search(r"hashpartitioning\(source#\d+, __bucket", plan), plan[:2000]
    assert plan.count("SinglePartition") <= 1, plan
    # every window spec over the corpus includes the bucket key
    specs = re.findall(r"windowspecdefinition\(source#\d+, (\w+)", plan)
    assert specs and all(s.startswith("__bucket") for s in specs), specs


def test_compression_ratio_is_one_arrow_projection(spark, sf_dir):
    """The zlib gate must be scan → Arrow-batched eval → project: no
    shuffle, no row-at-a-time Python."""
    from etl_workflows_spark.queries.llm import compression_ratio_docs

    plan = _plan(compression_ratio_docs(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # the row-at-a-time slow path


def test_knn_fast_single_scan_broadcast_rescore(spark, sf_dir):
    """knn_join_fast's round-9 exact re-score must keep the one-corpus-
    scan shape: a single MapInPandas candidate pass, the query matrix
    broadcast onto the tiny candidate set (never a second corpus read
    for re-scoring), and rank-limited WindowGroupLimit top-k pruning."""
    from etl_workflows_spark.queries.llm import knn_join_bench_fast

    plan = _plan(knn_join_bench_fast(spark, sf_dir))
    # formatted mode lists each node twice (tree line + detail block)
    assert plan.count("MapInPandas") == 2, plan
    # two scan NODES total: the corpus side feeding the kernel and the
    # query-matrix side — re-scoring adds NO third scan
    assert plan.count("Scan parquet") == 4, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # top-k pruned before the shuffle


def test_per_source_positions_window_is_bucketed(spark, sf_dir):
    """The per-source numbering must partition its window by (source,
    hash-bucket) — never source alone (one multi-TB sort task per source
    at 100 TB) and never a single partition."""
    import re

    from etl_workflows_spark.queries.llm import per_source_positions_docs

    plan = _plan(per_source_positions_docs(spark, sf_dir))
    assert re.search(r"hashpartitioning\(source#\d+, __bucket", plan), plan[:2000]
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(source#\d+, (\w+)", plan)
    assert specs and all(s.startswith("__bucket") for s in specs), specs
