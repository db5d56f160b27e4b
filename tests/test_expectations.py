"""Expectations framework: every kind evaluates correctly from one scan,
thresholds bound violation fractions, and the plan contains exactly one
aggregation over the input."""

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.expectations import (
    Expectation,
    check_expectations,
    violations,
)
from etl_workflows_spark.queries.base import table


def test_all_kinds_on_documents(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    report = check_expectations(
        docs,
        [
            Expectation("ids_present", "not_null", "doc_id"),
            Expectation("ids_unique", "unique", "doc_id"),
            Expectation("chars_positive", "between", "n_chars", lo=1),
            Expectation("known_langs", "isin", "lang",
                        values=("en", "de", "fr", "es", "xx")),
            Expectation("src_format", "matches", "source", pattern="^src[0-9]+$"),
            Expectation("volume", "row_count_between", None, lo=10, hi=10_000_000),
        ],
    )
    rows = {r["rule"]: r for r in report.collect()}
    assert rows["ids_present"]["ok"] and rows["ids_present"]["observed"] == 0.0
    assert rows["ids_unique"]["ok"]
    assert rows["chars_positive"]["ok"]
    assert rows["src_format"]["ok"]
    assert rows["volume"]["ok"] and rows["volume"]["observed"] == docs.count()
    # lang values in the fixture may exceed the list — just consistency:
    exact_bad = docs.filter(~F.col("lang").isin("en", "de", "fr", "es", "xx")).count()
    assert rows["known_langs"]["observed"] == exact_bad / docs.count()


def test_thresholds_and_violations(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (3, "d")], "id long, s string"
    )
    report = check_expectations(
        df,
        [
            Expectation("s_mostly_present", "not_null", "s", threshold=0.30),
            Expectation("s_strictly_present", "not_null", "s"),
            Expectation("id_unique", "unique", "id"),
            Expectation("id_small", "between", "id", hi=2),
        ],
    )
    rows = {r["rule"]: r for r in report.collect()}
    assert rows["s_mostly_present"]["ok"]  # 1/4 = 0.25 <= 0.30
    assert not rows["s_strictly_present"]["ok"]
    assert not rows["id_unique"]["ok"] and rows["id_unique"]["observed"] == 0.25
    assert not rows["id_small"]["ok"] and rows["id_small"]["observed"] == 0.5
    assert set(violations(report)) == {"s_strictly_present", "id_unique", "id_small"}


def test_single_scan_plan(spark, sf_dir):
    """All row-level rules must compile into one aggregation job — count
    the scans in the executed plan's lineage via the query's own shape."""
    docs = table(spark, sf_dir, "documents")
    exps = [
        Expectation("a", "not_null", "doc_id"),
        Expectation("b", "between", "n_chars", lo=0),
        Expectation("c", "matches", "source", pattern="^src"),
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    from etl_workflows_spark.operators.expectations import _violation_expr

    for e in exps:
        aggs.append(F.sum(_violation_expr(e)).alias(e.name))
    plan = docs.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_unknown_kind_rejected(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        check_expectations(df, [Expectation("x", "nope", "id")])
