"""Schema evolution (sinks/evolution.py): metadata-only adds, opt-in
lossless widenings, fail-fast on anything lossy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_workflows_spark.sinks.evolution import evolve_table, plan_evolution
from etl_workflows_spark.sinks.writer import write_table


def _schema(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


@pytest.fixture()
def tbl(spark):
    spark.sql("DROP TABLE IF EXISTS evo_t")
    write_table(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v int"), "evo_t"
    )
    yield "evo_t"
    spark.sql("DROP TABLE IF EXISTS evo_t")


def test_added_column_is_metadata_only_and_reads_null(spark, tbl):
    out = evolve_table(
        spark,
        tbl,
        _schema(("k", T.LongType()), ("v", T.IntegerType()),
                ("note", T.StringType())),
    )
    assert out == {"added": ["note"], "widened": []}
    rows = {r["k"]: r["note"] for r in spark.table(tbl).collect()}
    assert rows == {1: None, 2: None}  # old files read NULL
    # new writes carry the column
    spark.createDataFrame([(3, 30, "hi")], "k long, v int, note string").write.mode(
        "append"
    ).insertInto(tbl)
    assert spark.table(tbl).filter(F.col("note") == "hi").count() == 1


def test_widening_requires_authorization_then_rewrites(spark, tbl):
    target = _schema(("k", T.LongType()), ("v", T.LongType()))
    with pytest.raises(ValueError, match="allow_rewrite"):
        evolve_table(spark, tbl, target)
    out = evolve_table(spark, tbl, target, allow_rewrite=True)
    assert out == {"added": [], "widened": ["v"]}
    assert dict(spark.table(tbl).dtypes)["v"] == "bigint"
    assert {r["v"] for r in spark.table(tbl).collect()} == {10, 20}


def test_lossy_changes_fail_fast(spark, tbl):
    with pytest.raises(ValueError, match="unsupported evolution for column"):
        plan_evolution(
            spark.table(tbl).schema,
            _schema(("k", T.LongType()), ("v", T.StringType())),
        )
    with pytest.raises(ValueError, match="drops column"):
        plan_evolution(
            spark.table(tbl).schema, _schema(("k", T.LongType()))
        )
    # narrowing is not widening
    with pytest.raises(ValueError, match="unsupported evolution"):
        plan_evolution(
            _schema(("v", T.LongType())), _schema(("v", T.IntegerType()))
        )


def test_identity_is_a_noop(spark, tbl):
    out = evolve_table(spark, tbl, spark.table(tbl).schema)
    assert out == {"added": [], "widened": []}
