"""Unit tests for time-series gap fill and trailing-z-score anomaly
detection on crafted event streams (sf0.01 oracle parity runs in
tools/oracle_check.py)."""

from __future__ import annotations

import datetime as dt

from etl_workflows_spark.queries.analytics import gap_fill_hourly, hourly_anomaly


def _events(spark, rows):
    return spark.createDataFrame(
        [(t, et, v) for t, et, v in rows],
        "ts timestamp, event_type string, value double",
    )


def _h(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, i)


def test_gap_fill_inserts_missing_hours(spark):
    # click events at hours 0, 1, 3 — hour 2 is a gap.
    ev = _events(
        spark,
        [
            (_h(0), "click", 1.0),
            (_h(1), "click", 2.0),
            (_h(1), "click", 3.0),
            (_h(3), "click", 4.0),
        ],
    )
    rows = gap_fill_hourly(ev).orderBy("hour").collect()
    assert [r.hour for r in rows] == [_h(0), _h(1), _h(2), _h(3)]
    assert [r.n_events for r in rows] == [1, 2, 0, 1]
    assert [r.is_gap for r in rows] == [False, False, True, False]
    # carried_value forward-fills hour 1's sum (5.0) through the gap
    assert [r.carried_value for r in rows] == [1.0, 5.0, 5.0, 4.0]


def test_gap_fill_per_type_spines_are_independent(spark):
    ev = _events(
        spark,
        [
            (_h(0), "a", 1.0),
            (_h(5), "a", 1.0),
            (_h(2), "b", 1.0),
            (_h(3), "b", 1.0),
        ],
    )
    rows = gap_fill_hourly(ev).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.hour)
    assert sorted(by_type["a"]) == [_h(i) for i in range(6)]
    assert sorted(by_type["b"]) == [_h(2), _h(3)]


def test_anomaly_flags_spike_and_respects_min_history(spark):
    # 24 steady hours alternating 4/6 events, then a 50-event spike.
    rows = []
    for i in range(24):
        cnt = 4 if i % 2 == 0 else 6
        rows += [(_h(i), "click", 1.0)] * cnt
    rows += [(dt.datetime(2024, 1, 2, 0), "click", 1.0)] * 50
    out = {r.hour: r for r in hourly_anomaly(_events(spark, rows)).collect()}
    spike = out[dt.datetime(2024, 1, 2, 0)]
    assert spike.is_anomaly and spike.zscore > 3
    assert spike.trailing_mean == 5.0
    # early rows (insufficient trailing history) are never flagged
    early = out[_h(5)]
    assert early.zscore is None and not early.is_anomaly
    # steady rows with full history are not flagged
    steady = out[_h(23)]
    assert steady.zscore is not None and not steady.is_anomaly


def test_anomaly_zero_variance_history_yields_null_z(spark):
    # identical counts every hour -> variance 0 -> z undefined, not flagged
    rows = [(_h(i), "click", 1.0) for i in range(20)]
    out = hourly_anomaly(_events(spark, rows)).collect()
    assert all(r.zscore is None and not r.is_anomaly for r in out)


# --- interval_join ----------------------------------------------------------


def test_interval_join_matches_naive_and_no_nested_loop(spark):
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators.timeseries import interval_join

    base = "2024-01-01 00:00:00"
    left = spark.createDataFrame(
        [(1, 1, f"2024-01-01 00:0{i}:00.50000{i}") for i in range(6)],
        "l_id long, k long, l_ts string",
    ).select("l_id", "k", F.col("l_ts").cast("timestamp").alias("l_ts"))
    right = spark.createDataFrame(
        [(10 + i, 1, f"2024-01-01 00:0{i}:30") for i in range(6)]
        + [(99, 2, base)],  # other key: never matches
        "r_id long, k long, r_ts string",
    ).select("r_id", "k", F.col("r_ts").cast("timestamp").alias("r_ts"))

    got = {
        (r["l_id"], r["r_id"])
        for r in interval_join(left, right, "l_ts", "r_ts", 90, "k").collect()
    }
    naive = {
        (r["l_id"], r["r_id"])
        for r in left.join(right, "k")
        .filter(
            F.abs(
                F.col("l_ts").cast("double") - F.col("r_ts").cast("double")
            )
            <= 90
        )
        .collect()
    }
    assert got == naive and got  # non-trivial and identical
    # bucketed plan: equi-join (hash or sort-merge), NOT a nested loop
    plan = (
        interval_join(left, right, "l_ts", "r_ts", 90, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan


def test_interval_join_subsecond_exactness_and_validation(spark):
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators.timeseries import interval_join

    # 600.4 s apart: must NOT pass a 600 s window (second-truncation
    # arithmetic would wrongly admit it)
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00.000000")], "l_id long, l_ts string"
    ).select("l_id", F.col("l_ts").cast("timestamp").alias("l_ts"))
    right = spark.createDataFrame(
        [(2, "2024-01-01 00:10:00.400000"), (3, "2024-01-01 00:09:59.999999")],
        "r_id long, r_ts string",
    ).select("r_id", F.col("r_ts").cast("timestamp").alias("r_ts"))
    got = {
        r["r_id"]
        for r in interval_join(left, right, "l_ts", "r_ts", 600).collect()
    }
    assert got == {3}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_delta_s"):
        interval_join(left, right, "l_ts", "r_ts", 0)
    with _pytest.raises(ValueError, match="collision"):
        interval_join(
            left, left.withColumnRenamed("l_id", "x"), "l_ts", "l_ts", 10
        )


def test_seasonal_decompose_reconstructs_and_is_periodic(spark, sf_dir):
    """trend+seasonal+resid == n wherever defined; seasonal depends only
    on (event_type, hour-of-day); trend is NULL at the series edges
    (incomplete centered window)."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.queries.analytics import events_seasonal_decompose

    out = events_seasonal_decompose(spark, sf_dir)
    full = out.filter(F.col("resid").isNotNull())
    assert full.count() > 0
    bad = full.filter(
        F.abs(F.col("n_events") - (F.col("trend") + F.col("seasonal") + F.col("resid")))
        > 1e-9
    ).count()
    assert bad == 0
    # seasonal constant per (event_type, hod)
    per_hod = (
        out.withColumn("hod", F.hour("hour"))
        .filter(F.col("seasonal").isNotNull())
        .groupBy("event_type", "hod")
        .agg(F.countDistinct("seasonal").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert per_hod == 0
    # first hours of each series lack a complete centered window
    first = out.groupBy("event_type").agg(F.min("hour").alias("h"))
    edge = out.join(first, (out["event_type"] == first["event_type"]) & (out["hour"] == first["h"]))
    assert edge.filter(edge["trend"].isNotNull()).count() == 0


def test_forecast_backtest_metrics_semantics(spark, sf_dir):
    """Each type scores exactly 24 held-out hours; MAE values are
    non-negative; the MASE-style ratio equals mae_seasonal/mae_naive."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.queries.analytics import forecast_backtest_events

    out = forecast_backtest_events(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_test"] == 24
        assert r["mae_seasonal"] >= 0 and r["mae_naive"] >= 0
        if r["mase_ratio"] is not None:
            assert abs(r["mase_ratio"] - r["mae_seasonal"] / r["mae_naive"]) < 1e-12
