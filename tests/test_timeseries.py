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
