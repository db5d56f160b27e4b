"""Accuracy bounds for the approximate sketch aggregations — the sketches
have no SQL oracle (approximate by construction), so this test pins them
against their exact twins instead."""

from pyspark.sql import functions as F

from etl_workflows_spark.queries.analytics import approx_event_sketches
from etl_workflows_spark.queries.base import table


def test_approx_sketches_within_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r for r in approx_event_sketches(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        ap = approx[et]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(ap["approx_users"] - ex["users"]) <= max(3, 0.06 * ex["users"])
        # GK percentile with accuracy=10000 on ~2k rows/group: near-exact;
        # allow a generous relative band (values are uniform-ish > 0)
        assert abs(ap["p50_value"] - ex["p50"]) <= 0.05 * abs(ex["p50"]) + 1e-9
        assert abs(ap["p90_value"] - ex["p90"]) <= 0.05 * abs(ex["p90"]) + 1e-9


def test_profile_table_approx_mode(spark, sf_dir):
    """The trillion-row path (approx_count_distinct) stays within HLL
    error of the exact profile."""
    from etl_workflows_spark.operators.profile import profile_table
    from etl_workflows_spark.queries.base import table

    docs = table(spark, sf_dir, "documents")
    exact = {r["column"]: r for r in profile_table(docs).collect()}
    approx = {
        r["column"]: r for r in profile_table(docs, exact_distinct=False).collect()
    }
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c]["n_distinct"], approx[c]["n_distinct"]
        assert abs(a - e) <= max(3, 0.1 * e)
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
