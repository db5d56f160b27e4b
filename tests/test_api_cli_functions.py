"""API layer (O9), CLI (O10), staged audit copy (W1), BQ-compat functions,
and the vectorized-UDF surface."""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.api import handle_request
from etl_workflows_spark.functions import (
    parse_timestamp,
    regexp_contains,
    safe_cast,
    safe_divide,
    timestamp_trunc,
)
from etl_workflows_spark.functions.udfs import (
    global_zscore,
    grouped_demean,
    zscore_in_batch,
)


# --- O9: request protocol --------------------------------------------------


def test_handle_request_success_and_errors(spark, fixtures_dir, tmp_path):
    import shutil

    bucket = tmp_path / "b"
    bucket.mkdir()
    src = fixtures_dir / "bucket" / "cars_202109.csv"
    if not src.exists():
        src = fixtures_dir / "bucket" / "ARCHIVED" / "cars_202109.csv"
    shutil.copy(src, bucket / "cars_202109.csv")

    body = {
        "bucket": str(bucket),
        "prefix": "cars_",
        "schema": str(fixtures_dir / "assets" / "cars_schema.yaml"),
        "destinationTable": "api.cars",
        "archiveFiles": False,
    }
    out, code = handle_request(spark, "load_csv", body)
    assert (out, code) == ({"description": "Success"}, 200)

    out, code = handle_request(spark, "load_csv", {**body, "prefix": "none_"})
    assert (out, code) == ({"description": "CSV file not found"}, 404)

    out, code = handle_request(
        spark, "load_csv", {**body, "schema": str(fixtures_dir / "assets" / "bad_schema.txt")}
    )
    assert (out, code) == ({"description": "Schema file invalid"}, 400)

    out, code = handle_request(spark, "load_csv", None)
    assert code == 500 and out == {"description": "Unknown error"}

    out, code = handle_request(spark, "nope", {})
    assert code == 404


# --- O10: CLI --------------------------------------------------------------


def test_cli_arity_contract(spark, fixtures_dir, tmp_path, capsys):
    """CLI takes exactly the reference's positional arities; session is
    reused via getOrCreate so this exercises main() in-process."""
    import shutil

    from etl_workflows_spark.__main__ import main

    bucket = tmp_path / "b"
    bucket.mkdir()
    src = fixtures_dir / "bucket" / "cars_202109.csv"
    if not src.exists():
        src = fixtures_dir / "bucket" / "ARCHIVED" / "cars_202109.csv"
    shutil.copy(src, bucket / "cars_202109.csv")

    rc = main(
        [
            "load_csv",
            str(bucket),
            "cars_",
            str(fixtures_dir / "assets" / "cars_schema.yaml"),
            "cli.cars",
        ]
    )
    assert rc == 0
    assert '"Success"' in capsys.readouterr().out
    assert spark.table("cli.cars").count() == 406

    assert main(["load_csv", "too", "few"]) == 2
    assert main([]) == 2

    spark.sql("USE cli")
    rc = main(
        ["load_query", str(fixtures_dir / "assets" / "big_US_cars.sql"), "cli.big"]
    )
    spark.sql("USE default")
    assert rc == 0
    assert spark.table("cli.big").count() == 17


# --- W1: staged audit copy -------------------------------------------------


def test_stage_fixed_copy_roundtrip(spark, fixtures_dir, tmp_path):
    """FIXED_ artifact re-parses under the same wire format to the same
    cleaned rows (the reference's staging round-trip, T6)."""
    import shutil

    from etl_workflows_spark.operators.coerce import coerce_columns
    from etl_workflows_spark.plans.load_csv import load_csv
    from etl_workflows_spark.schema.registry import load_schema_file
    from etl_workflows_spark.sources.csv_source import read_raw_csv

    bucket = tmp_path / "b"
    bucket.mkdir()
    src = fixtures_dir / "bucket" / "cars_202109.csv"
    if not src.exists():
        src = fixtures_dir / "bucket" / "ARCHIVED" / "cars_202109.csv"
    shutil.copy(src, bucket / "cars_202109.csv")
    schema_path = str(fixtures_dir / "assets" / "cars_schema.yaml")

    load_csv(
        spark,
        str(bucket),
        "cars_",
        schema_path,
        "stage.cars",
        archive_files_after=False,
        stage_fixed_copy=True,
    )
    fixed = bucket / "FIXED_cars_202109.csv"
    assert fixed.exists()

    doc = load_schema_file(schema_path)
    reparsed = coerce_columns(
        read_raw_csv(spark, str(fixed), 9, skip_header=False), doc
    )
    orig = spark.table("stage.cars")
    assert reparsed.count() == 406
    assert reparsed.exceptAll(orig).count() == 0
    assert orig.exceptAll(reparsed).count() == 0


# --- BQ-compat function surface -------------------------------------------


def test_bq_compat_functions(spark):
    df = spark.createDataFrame(
        [("12", 4.0, 2.0, "abc", "2021-06-12 08:30:00")],
        ["i", "num", "den", "s", "ts"],
    )
    row = df.select(
        safe_cast("i", "long").alias("ok"),
        safe_cast("s", "long").alias("bad"),
        safe_divide("num", "den").alias("div"),
        safe_divide("num", F.lit(0)).alias("div0"),
        regexp_contains("s", "b.").alias("re"),
        parse_timestamp("ts", ["yyyy-M-d H:m:s", "yyyy-M-d"]).alias("pts"),
        timestamp_trunc(parse_timestamp("ts", ["yyyy-M-d H:m:s"]), "HOUR").alias("tt"),
    ).first()
    assert row["ok"] == 12 and row["bad"] is None
    assert row["div"] == 2.0 and row["div0"] is None
    assert row["re"] is True
    assert row["pts"] == datetime.datetime(2021, 6, 12, 8, 30)
    assert row["tt"] == datetime.datetime(2021, 6, 12, 8, 0)


# --- UDF surface -----------------------------------------------------------


def test_vectorized_udf_and_builtin_twin(spark):
    df = spark.range(100).withColumn("v", (F.col("id") % 10).cast("double"))
    z = global_zscore(df, "v").select(F.min("v_z"), F.max("v_z")).first()
    assert z[0] < 0 < z[1]
    # pandas_udf runs and returns doubles
    out = df.repartition(1).select(zscore_in_batch("v").alias("z")).collect()
    assert len(out) == 100
    assert abs(sum(r["z"] for r in out)) < 1e-9


def test_grouped_demean(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], ["g", "v"]
    )
    out = {(r["g"], r["v"]): r["v_demeaned"] for r in grouped_demean(df, "g", "v").collect()}
    assert out[("a", 1.0)] == -1.0 and out[("a", 3.0)] == 1.0
    assert out[("b", 10.0)] == 0.0


def test_load_csv_observe_metrics(spark, fixtures_dir, tmp_path):
    """metrics_out rides the write job via Dataset.observe — no extra
    scan; counters match the known fixture (406 rows, HORSEPOWER has 6
    unparseable/empty cells in the reference asset)."""
    import shutil

    from etl_workflows_spark.plans.load_csv import load_csv

    bucket = tmp_path / "b"
    bucket.mkdir()
    src = fixtures_dir / "bucket" / "cars_202109.csv"
    if not src.exists():
        src = fixtures_dir / "bucket" / "ARCHIVED" / "cars_202109.csv"
    shutil.copy(src, bucket / "cars_202109.csv")

    metrics: dict = {}
    load_csv(
        spark,
        str(bucket),
        "cars_",
        str(fixtures_dir / "assets" / "cars_schema.yaml"),
        "obs.cars",
        archive_files_after=False,
        metrics_out=metrics,
    )
    assert metrics["rows_loaded"] == 406
    # every non-STRING schema column got a null counter
    assert {k for k in metrics if k.startswith("nulls_")} >= {
        "nulls_MPG",
        "nulls_CYLINDERS",
        "nulls_WEIGHT",
    }
    # cross-check one counter against the written table itself
    from pyspark.sql import functions as F

    expected_hp_nulls = (
        spark.table("obs.cars")
        .agg(F.sum(F.col("HORSEPOWER").isNull().cast("long")))
        .collect()[0][0]
    )
    assert metrics["nulls_HORSEPOWER"] == expected_hp_nulls
