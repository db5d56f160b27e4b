"""CDC apply (sinks/cdc.py): an unordered multi-change-per-key feed must
land as if applied one change at a time in version order, and replays
must be no-ops."""

from __future__ import annotations

import pytest

from etl_workflows_spark.sinks.cdc import apply_cdc, latest_changes
from etl_workflows_spark.sinks.writer import write_table

COLS = "k long, val string, op string, version long"


@pytest.fixture()
def target(spark):
    spark.sql("DROP TABLE IF EXISTS cdc_target")
    write_table(
        spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")], ["k", "val"]
        ),
        "cdc_target",
    )
    yield "cdc_target"
    spark.sql("DROP TABLE IF EXISTS cdc_target")


def _state(spark):
    return {r["k"]: r["val"] for r in spark.table("cdc_target").collect()}


def test_unordered_feed_applies_in_version_order(spark, target):
    feed = spark.createDataFrame(
        [
            (2, "two-v9", "U", 9),   # late high-version update wins...
            (2, "two-v5", "U", 5),   # ...over this earlier one
            (3, None, "D", 4),       # tombstone
            (4, "four", "I", 1),     # brand-new key
            (5, "five-v2", "U", 2),  # update for a key we never saw: upsert
            (5, None, "D", 1),       # obsolete delete, outversioned above
        ],
        COLS,
    )
    out = apply_cdc(spark, feed, target, ["k"])
    assert out == {"upserted": 3, "deleted": 1}
    assert _state(spark) == {
        1: "one", 2: "two-v9", 4: "four", 5: "five-v2"
    }


def test_replay_is_a_noop(spark, target):
    feed = spark.createDataFrame(
        [(2, "two-v9", "U", 9), (3, None, "D", 4), (4, "four", "I", 1)], COLS
    )
    apply_cdc(spark, feed, target, ["k"])
    first = _state(spark)
    out = apply_cdc(spark, feed, target, ["k"])  # full replay
    assert _state(spark) == first
    assert out["deleted"] == 0  # key 3 already gone


def test_same_version_delete_beats_insert(spark, target):
    feed = spark.createDataFrame(
        [(2, "ghost", "I", 7), (2, None, "D", 7)], COLS
    )
    collapsed = latest_changes(feed, ["k"], "version")
    assert collapsed.first()["op"] == "D"
    apply_cdc(spark, feed, target, ["k"])
    assert 2 not in _state(spark)


def test_unknown_op_fails_fast(spark, target):
    feed = spark.createDataFrame([(2, "x", "UPSERT", 1)], COLS)
    with pytest.raises(ValueError, match="unknown CDC op"):
        apply_cdc(spark, feed, target, ["k"])
    assert _state(spark) == {1: "one", 2: "two", 3: "three"}


def test_delete_only_and_insert_only_batches(spark, target):
    only_del = spark.createDataFrame([(1, None, "D", 1)], COLS)
    assert apply_cdc(spark, only_del, target, ["k"]) == {
        "upserted": 0,
        "deleted": 1,
    }
    only_ins = spark.createDataFrame([(9, "nine", "I", 1)], COLS)
    assert apply_cdc(spark, only_ins, target, ["k"]) == {
        "upserted": 1,
        "deleted": 0,
    }
    assert _state(spark) == {2: "two", 3: "three", 9: "nine"}
