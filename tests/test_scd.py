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
