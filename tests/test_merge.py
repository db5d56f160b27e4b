"""MERGE INTO: upsert semantics, cardinality check, and the partition-
pruning contract (untouched partitions' files must not be rewritten)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.sinks.merge import merge_into


def _mk(spark, name, rows, partition_by=None):
    df = spark.createDataFrame(rows, "k long, v string, day string")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.saveAsTable(name)
    return df


def test_merge_unpartitioned(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    _mk(spark, "mdb.t1", [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")])
    src = spark.createDataFrame(
        [(2, "B", "d1"), (4, "D", "d3")], "k long, v string, day string"
    )
    stats = merge_into(spark, "mdb.t1", src, ["k"])
    assert stats == {"matched": 1, "inserted": 1, "partitions_rewritten": -1}
    got = {r["k"]: r["v"] for r in spark.table("mdb.t1").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_partitioned_prunes_untouched_partitions(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    spark.sql("DROP TABLE IF EXISTS mdb.t2")
    _mk(
        spark,
        "mdb.t2",
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (5, "e", "d2")],
        partition_by="day",
    )
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED mdb.t2")
        .filter("col_name = 'Location'")
        .collect()[-1]["data_type"]
    ).replace("file:", "")
    d2_files = set(os.listdir(os.path.join(loc, "day=d2")))
    d2_mtimes = {
        f: os.path.getmtime(os.path.join(loc, "day=d2", f)) for f in d2_files
    }

    src = spark.createDataFrame(
        [(2, "B", "d1"), (7, "G", "d3")], "k long, v string, day string"
    )
    stats = merge_into(spark, "mdb.t2", src, ["k"])
    assert stats["matched"] == 1 and stats["inserted"] == 1
    assert stats["partitions_rewritten"] == 2  # d1 and d3, NOT d2

    got = {r["k"]: (r["v"], r["day"]) for r in spark.table("mdb.t2").collect()}
    assert got == {
        1: ("a", "d1"),
        2: ("B", "d1"),
        3: ("c", "d2"),
        5: ("e", "d2"),
        7: ("G", "d3"),
    }
    # the untouched partition's physical files are bit-identical (not rewritten)
    assert set(os.listdir(os.path.join(loc, "day=d2"))) == d2_files
    for f, m in d2_mtimes.items():
        assert os.path.getmtime(os.path.join(loc, "day=d2", f)) == m


def test_merge_rejects_ambiguous_source(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    _mk(spark, "mdb.t3", [(1, "a", "d1")])
    src = spark.createDataFrame(
        [(1, "x", "d1"), (1, "y", "d1")], "k long, v string, day string"
    )
    with pytest.raises(ValueError, match="multiple rows per merge key"):
        merge_into(spark, "mdb.t3", src, ["k"])


def test_merge_rejects_schema_mismatch(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    _mk(spark, "mdb.t4", [(1, "a", "d1")])
    src = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError, match="must match target"):
        merge_into(spark, "mdb.t4", src, ["k"])


def test_merge_is_idempotent_on_rerun(spark):
    """Re-merging the same source must be a no-op on values (exactly-once
    effect for retry loops — the at-least-once hazard the reference's
    append path has, solved at the operator level)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    spark.sql("DROP TABLE IF EXISTS mdb.t5")
    _mk(spark, "mdb.t5", [(1, "a", "d1")], partition_by="day")
    src = spark.createDataFrame([(1, "A", "d1"), (2, "b", "d2")],
                                "k long, v string, day string")
    merge_into(spark, "mdb.t5", src, ["k"])
    first = sorted(tuple(r) for r in spark.table("mdb.t5").collect())
    stats = merge_into(spark, "mdb.t5", src, ["k"])
    assert stats["matched"] == 2 and stats["inserted"] == 0
    assert sorted(tuple(r) for r in spark.table("mdb.t5").collect()) == first


def test_delete_from_unpartitioned(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    _mk(spark, "mdb.d1", [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")])
    from etl_workflows_spark.sinks.merge import delete_from

    keys = spark.createDataFrame([(2,), (9,)], "k long")
    stats = delete_from(spark, "mdb.d1", keys, ["k"])
    assert stats == {"deleted": 1, "partitions_rewritten": -1}
    assert {r["k"] for r in spark.table("mdb.d1").collect()} == {1, 3}
    # idempotent rerun
    stats = delete_from(spark, "mdb.d1", keys, ["k"])
    assert stats["deleted"] == 0


def test_delete_from_partitioned_prunes_and_drops_emptied(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    spark.sql("DROP TABLE IF EXISTS mdb.d2")
    _mk(
        spark,
        "mdb.d2",
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3")],
        partition_by="day",
    )
    import os

    from etl_workflows_spark.sinks.merge import delete_from

    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED mdb.d2")
        .filter("col_name = 'Location'")
        .collect()[-1]["data_type"]
    ).replace("file:", "")
    d3_mtimes = {
        f: os.path.getmtime(os.path.join(loc, "day=d3", f))
        for f in os.listdir(os.path.join(loc, "day=d3"))
    }

    # delete one row of d1 and ALL of d2 (partition becomes empty)
    keys = spark.createDataFrame([(1,), (3,)], "k long")
    stats = delete_from(spark, "mdb.d2", keys, ["k"])
    assert stats["deleted"] == 2 and stats["partitions_rewritten"] == 2
    got = {(r["k"], r["day"]) for r in spark.table("mdb.d2").collect()}
    assert got == {(2, "d1"), (4, "d3")}
    # untouched partition d3: bit-identical files
    for f, m in d3_mtimes.items():
        assert os.path.getmtime(os.path.join(loc, "day=d3", f)) == m


def test_merge_rewrites_old_partition_when_key_moves(spark):
    """A matched key whose partition value CHANGED in the source must have
    its old-partition row removed — source partition values alone would
    strand it as a duplicate key (round-3 advice, merge.py partitioned
    path)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    spark.sql("DROP TABLE IF EXISTS mdb.t_move")
    _mk(
        spark,
        "mdb.t_move",
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")],
        partition_by="day",
    )
    # key 3 moves d2 -> d1; d2 then holds nothing and must disappear
    src = spark.createDataFrame([(3, "C", "d1")], "k long, v string, day string")
    stats = merge_into(spark, "mdb.t_move", src, ["k"])
    assert stats["matched"] == 1 and stats["inserted"] == 0
    assert stats["partitions_rewritten"] == 2  # d1 (new home) + d2 (old home)
    rows = spark.table("mdb.t_move").collect()
    got = {(r["k"], r["v"], r["day"]) for r in rows}
    assert got == {(1, "a", "d1"), (2, "b", "d1"), (3, "C", "d1")}
    assert len(rows) == 3  # no duplicate key 3


def test_merge_key_move_keeps_other_rows_in_old_partition(spark):
    """Partition the moved key vacates still holds its other rows."""
    spark.sql("CREATE DATABASE IF NOT EXISTS mdb")
    spark.sql("DROP TABLE IF EXISTS mdb.t_move2")
    _mk(
        spark,
        "mdb.t_move2",
        [(1, "a", "d1"), (3, "c", "d2"), (4, "d", "d2")],
        partition_by="day",
    )
    src = spark.createDataFrame([(3, "C", "d3")], "k long, v string, day string")
    stats = merge_into(spark, "mdb.t_move2", src, ["k"])
    assert stats["matched"] == 1 and stats["inserted"] == 0
    got = {(r["k"], r["v"], r["day"]) for r in spark.table("mdb.t_move2").collect()}
    assert got == {(1, "a", "d1"), (3, "C", "d3"), (4, "d", "d2")}
