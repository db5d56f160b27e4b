"""SCD2 semantics: insert/close/no-op, history immutability, as-of views."""

import datetime

from pyspark.sql import functions as F

from etl_workflows_spark.operators.scd import as_of, scd2_apply

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)
T2 = datetime.datetime(2024, 3, 1)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey long, segment string, valid_from timestamp, valid_to timestamp"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "c_custkey long, segment string, ts timestamp")


def test_scd2_lifecycle(spark):
    dim0 = _dim(spark, [(1, "BUILDING", T0, None), (2, "MACHINERY", T0, None)])
    # cust 1 changes, cust 2 unchanged, cust 3 new
    upd = _upd(
        spark,
        [(1, "AUTOMOBILE", T1), (2, "MACHINERY", T1), (3, "HOUSEHOLD", T1)],
    )
    dim1 = scd2_apply(dim0, upd, "c_custkey", ["segment"])
    rows = {(r["c_custkey"], r["segment"]): r for r in dim1.collect()}
    assert len(rows) == 4
    closed = rows[(1, "BUILDING")]
    assert closed["valid_to"] == T1
    fresh = rows[(1, "AUTOMOBILE")]
    assert fresh["valid_from"] == T1 and fresh["valid_to"] is None
    assert rows[(2, "MACHINERY")]["valid_to"] is None  # untouched no-op
    assert rows[(3, "HOUSEHOLD")]["valid_from"] == T1

    # second batch: history stays immutable
    dim2 = scd2_apply(
        dim1, _upd(spark, [(1, "FURNITURE", T2)]), "c_custkey", ["segment"]
    )
    again = {(r["c_custkey"], r["segment"]): r for r in dim2.collect()}
    assert again[(1, "BUILDING")]["valid_to"] == T1  # unchanged history
    assert again[(1, "AUTOMOBILE")]["valid_to"] == T2
    assert again[(1, "FURNITURE")]["valid_to"] is None

    # point-in-time views
    assert {r["segment"] for r in as_of(dim2, T0).filter(F.col("c_custkey") == 1).collect()} == {"BUILDING"}
    assert {r["segment"] for r in as_of(dim2, T1).filter(F.col("c_custkey") == 1).collect()} == {"AUTOMOBILE"}
    assert {r["segment"] for r in as_of(dim2, T2).filter(F.col("c_custkey") == 1).collect()} == {"FURNITURE"}


def test_scd2_null_safe_change_detection(spark):
    dim0 = _dim(spark, [(1, None, T0, None)])
    # NULL -> NULL is no change; NULL -> value closes
    dim1 = scd2_apply(dim0, _upd(spark, [(1, None, T1)]), "c_custkey", ["segment"])
    assert dim1.count() == 1 and dim1.first()["valid_to"] is None
    dim2 = scd2_apply(dim1, _upd(spark, [(1, "BUILDING", T2)]), "c_custkey", ["segment"])
    assert dim2.count() == 2


def test_temporal_join_picks_version_at_fact_time(spark):
    from etl_workflows_spark.operators.scd import temporal_join

    dim = spark.createDataFrame(
        [
            (1, "A", "2021-01-01 00:00:00", "2021-02-01 00:00:00"),
            (1, "B", "2021-02-01 00:00:00", None),
            (2, "X", "2021-01-15 00:00:00", None),
        ],
        "k long, seg string, valid_from string, valid_to string",
    ).selectExpr(
        "k",
        "seg",
        "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "CAST(valid_to AS TIMESTAMP) AS valid_to",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2021-01-20 12:00:00"),  # inside A
            (101, 1, "2021-02-01 00:00:00"),  # boundary → B (half-open)
            (102, 2, "2021-01-01 00:00:00"),  # before any version
            (103, 3, "2021-06-01 00:00:00"),  # unknown key
        ],
        "fid long, k long, ts string",
    ).selectExpr("fid", "k", "CAST(ts AS TIMESTAMP) AS ts")
    got = {
        r["fid"]: r["seg"]
        for r in temporal_join(facts, dim, "k", "ts").collect()
    }
    assert got == {100: "A", 101: "B", 102: None, 103: None}
    inner = temporal_join(facts, dim, "k", "ts", how="inner")
    assert {r["fid"] for r in inner.collect()} == {100, 101}


def test_temporal_join_rejects_colliding_columns_and_outer(spark):
    import pytest as _pytest

    from etl_workflows_spark.operators.scd import temporal_join

    dim = spark.createDataFrame(
        [(1, "A", None, None)],
        "k long, seg string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [(1, 1, None, "x")], "fid long, k long, ts timestamp, seg string"
    )
    with _pytest.raises(ValueError, match="collide"):
        temporal_join(facts, dim, "k", "ts")
    with _pytest.raises(ValueError, match="inner/left"):
        temporal_join(facts.drop("seg"), dim, "k", "ts", how="full")


def test_state_intervals_collapses_runs(spark):
    from etl_workflows_spark.operators.scd import state_intervals

    ev = spark.createDataFrame(
        [
            (1, "A", T0, 10),
            (1, "A", T1, 11),
            (1, "B", T2, 12),
            (2, "X", T0, 20),
        ],
        "user_id long, state string, ts timestamp, event_id long",
    )
    out = state_intervals(ev, "user_id", "state", "ts", "event_id")
    rows = {(r["user_id"], r["version"]): r for r in out.collect()}
    assert len(rows) == 3
    a = rows[(1, 1)]
    assert (a["state"], a["valid_from"], a["valid_to"], a["n_events"]) == (
        "A", T0, T2, 2
    )
    b = rows[(1, 2)]
    assert (b["state"], b["valid_from"], b["valid_to"]) == ("B", T2, None)
    assert rows[(2, 1)]["valid_to"] is None


def test_state_intervals_null_states_and_reappearing_value(spark):
    """NULL states form their own runs; a value that REAPPEARS after an
    interruption opens a new version (islands, not groupBy-state)."""
    from etl_workflows_spark.operators.scd import state_intervals

    T3 = datetime.datetime(2024, 4, 1)
    ev = spark.createDataFrame(
        [(1, None, T0, 1), (1, "A", T1, 2), (1, None, T2, 3), (1, None, T3, 4)],
        "user_id long, state string, ts timestamp, event_id long",
    )
    out = state_intervals(ev, "user_id", "state", "ts", "event_id")
    got = [
        (r["version"], r["state"], r["n_events"])
        for r in out.orderBy("version").collect()
    ]
    assert got == [(1, None, 1), (2, "A", 1), (3, None, 2)]


def test_state_intervals_ties_break_deterministically(spark):
    """Two events at the SAME timestamp order by the tiebreak column, so
    the island assignment (and version numbering) is reproducible."""
    from etl_workflows_spark.operators.scd import state_intervals

    ev = spark.createDataFrame(
        [(1, "B", T0, 2), (1, "A", T0, 1), (1, "B", T1, 3)],
        "user_id long, state string, ts timestamp, event_id long",
    )
    out = state_intervals(ev, "user_id", "state", "ts", "event_id")
    got = [(r["version"], r["state"]) for r in out.orderBy("version").collect()]
    assert got == [(1, "A"), (2, "B")]
    # B at T0 and B at T1 are CONSECUTIVE after the tie-break → one run
    assert out.count() == 2


def test_state_intervals_feeds_as_of(spark):
    """Rebuilt history answers point-in-time queries via as_of unchanged."""
    from etl_workflows_spark.operators.scd import as_of, state_intervals

    ev = spark.createDataFrame(
        [(1, "A", T0, 1), (1, "B", T2, 2)],
        "user_id long, state string, ts timestamp, event_id long",
    )
    hist = state_intervals(ev, "user_id", "state", "ts", "event_id")
    at_t1 = as_of(hist, T1).collect()
    assert len(at_t1) == 1 and at_t1[0]["state"] == "A"


def test_state_intervals_rejects_colliding_columns(spark):
    import pytest as _pytest

    from etl_workflows_spark.operators.scd import state_intervals

    ev = spark.createDataFrame(
        [(1, "A", T0, 1, 9)],
        "user_id long, state string, ts timestamp, event_id long, version int",
    )
    with _pytest.raises(ValueError, match="version"):
        state_intervals(ev, "user_id", "state", "ts", "event_id")
    # state_col itself named 'state' is NOT a collision
    ok = state_intervals(
        ev.drop("version"), "user_id", "state", "ts", "event_id"
    )
    assert ok.count() == 1
