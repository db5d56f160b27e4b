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
