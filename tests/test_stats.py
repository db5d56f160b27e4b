"""Optimizer statistics (sinks/stats.py): ANALYZE must land row/byte
counts and column NDV in the catalog, and plans must actually use them
(stats-driven broadcast of a filtered branch CBO cannot size from
files alone)."""

from __future__ import annotations

import pytest

from etl_workflows_spark.sinks.stats import analyze
from etl_workflows_spark.sinks.writer import write_table


@pytest.fixture()
def stat_tables(spark):
    for t in ("st_fact", "st_dim"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_table(
        spark.range(0, 50000).selectExpr("id AS k", "id % 100 AS grp"),
        "st_fact",
    )
    write_table(
        spark.range(0, 2000).selectExpr(
            "id AS k", "CAST(id AS STRING) AS name"
        ),
        "st_dim",
    )
    yield
    for t in ("st_fact", "st_dim"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_analyze_returns_catalog_stats(spark, stat_tables):
    out = analyze(spark, "st_fact", columns=["k", "grp"])
    assert out["rows"] == 50000
    assert out["bytes"] > 0
    # NDV sketches are approximate (HLL) — accept 2% error
    ndv_k = int(out["columns"]["k"]["distinct_count"])
    assert abs(ndv_k - 50000) <= 1000
    ndv_grp = int(out["columns"]["grp"]["distinct_count"])
    assert abs(ndv_grp - 100) <= 5  # HLL sketch ~5% error
    assert int(out["columns"]["k"]["num_nulls"]) == 0


def test_plan_row_count_comes_from_stats(spark, stat_tables):
    analyze(spark, "st_fact", columns=["k"])
    prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        stats = (
            spark.table("st_fact")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().get() == 50000
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
