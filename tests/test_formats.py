"""Sink format coverage: ORC managed tables round-trip with the same
dispositions and pushdown behavior as parquet."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_workflows_spark.sinks.writer import write_table


def test_orc_table_roundtrip_and_pushdown(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )
    write_table(df, "fmtdb.orc_t", file_format="orc")
    back = spark.table("fmtdb.orc_t")
    assert back.count() == 100
    assert sorted(r.id for r in back.where("k = 3").collect()) == list(
        range(3, 100, 7)
    )
    # files on disk really are ORC
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED fmtdb.orc_t")
        .where("col_name = 'Location'")
        .collect()[0]
        .data_type
    )
    import os

    files = [f for f in os.listdir(loc.replace("file:", "")) if f.startswith("part-")]
    assert files and all(f.endswith(".orc") for f in files)
    # predicate pushdown reaches the ORC scan
    plan = back.where("k = 3")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" not in plan or "k" in plan
    # append disposition works across formats
    write_table(df.limit(5), "fmtdb.orc_t", append=True, file_format="orc")
    assert spark.table("fmtdb.orc_t").count() == 105
    spark.sql("DROP TABLE fmtdb.orc_t")


def test_unknown_format_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_table(df, "fmtdb.bad_t", file_format="avro")
