"""Recursive per-series operators: EWMA must equal pandas' own ewm on
every series (the reference semantics), Holt forecasting must follow a
linear trend exactly, and both must be order-robust (pre-shuffled input
gives identical results)."""

import pandas as pd
from pyspark.sql import functions as F

from etl_workflows_spark.operators.timeseries import ewma, holt_forecast
from etl_workflows_spark.queries.base import table


def test_ewma_matches_pandas_reference(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    got = (
        ewma(ev, ["event_type"], "ts", "value", alpha=0.3)
        .orderBy("event_type", "ts")
        .toPandas()
    )
    for et, g in got.groupby("event_type"):
        ref = (
            ev.filter(F.col("event_type") == et)
            .orderBy("ts")
            .toPandas()["value"]
            .ewm(alpha=0.3, adjust=False)
            .mean()
        )
        assert (g["ewma"].reset_index(drop=True) - ref.reset_index(drop=True)).abs().max() < 1e-9


def test_ewma_is_shuffle_invariant(spark):
    rows = [("a", i, float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    a = ewma(df, ["k"], "ts", "value").orderBy("ts").toPandas()["ewma"]
    b = (
        ewma(df.repartition(16), ["k"], "ts", "value")
        .orderBy("ts")
        .toPandas()["ewma"]
    )
    assert (a - b).abs().max() == 0.0


def test_holt_linear_trend_is_exact(spark):
    # on a perfectly linear series level/trend lock on: forecast is exact
    rows = [("s", t, 10.0 + 2.0 * t) for t in range(50)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = holt_forecast(df, ["k"], "ts", "value", horizon=3).collect()[0]
    assert out["n_obs"] == 50
    assert abs(out["trend"] - 2.0) < 1e-9
    assert abs(out["forecast"] - (10.0 + 2.0 * 49 + 3 * 2.0)) < 1e-6


def test_holt_single_point_series(spark):
    df = spark.createDataFrame([("s", 1, 5.0)], "k string, ts long, value double")
    out = holt_forecast(df, ["k"], "ts", "value").collect()[0]
    assert out["forecast"] == 5.0 and out["trend"] == 0.0


def test_ewma_rejects_bad_alpha(spark):
    import pytest

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts long, value double")
    with pytest.raises(ValueError):
        ewma(df, ["k"], "ts", "value", alpha=0.0)
