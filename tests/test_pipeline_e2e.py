"""End-to-end golden test: the reference's full DAG semantics
(FIXTURES.md F1/F5) — load cars, run big_US_cars.sql, check 17 rows,
append semantics double to 34."""

import pytest

from etl_workflows_spark.exceptions import QueryInvalid, QueryNotFound
from etl_workflows_spark.plans.load_csv import load_csv
from etl_workflows_spark.plans.load_query import load_query


@pytest.fixture(scope="module")
def cars_loaded(spark, fixtures_dir):
    table = load_csv(
        spark,
        bucket=str(fixtures_dir / "bucket"),
        prefix="cars_",
        schema=str(fixtures_dir / "assets" / "cars_schema.yaml"),
        destination_table="proj.e2e.cars",
        archive_files_after=False,
    )
    return table


def test_cars_load(spark, cars_loaded):
    assert cars_loaded == "e2e.cars"
    df = spark.table("e2e.cars")
    assert df.count() == 406
    origins = {r["ORIGIN"]: r["n"] for r in df.groupBy("ORIGIN").count().withColumnRenamed("count", "n").collect()}
    assert origins == {"US": 254, "Europe": 73, "Japan": 79}


def test_golden_query_17_rows_then_append_34(spark, fixtures_dir, cars_loaded):
    spark.sql("USE e2e")
    q = str(fixtures_dir / "assets" / "big_US_cars.sql")
    load_query(spark, q, "proj.e2e.big_US_cars", append=True)
    assert spark.table("e2e.big_US_cars").count() == 17
    # append disposition: a second run doubles (F5)
    load_query(spark, q, "proj.e2e.big_US_cars", append=True)
    assert spark.table("e2e.big_US_cars").count() == 34
    # overwrite disposition resets
    load_query(spark, q, "proj.e2e.big_US_cars", append=False)
    assert spark.table("e2e.big_US_cars").count() == 17
    spark.sql("USE default")


def test_query_errors(spark, fixtures_dir):
    with pytest.raises(QueryInvalid):
        load_query(spark, str(fixtures_dir / "assets" / "bad_query.txt"), "t")
    with pytest.raises(QueryNotFound):
        load_query(spark, str(fixtures_dir / "assets" / "nope.sql"), "t")
    with pytest.raises(QueryInvalid):
        load_query(
            spark,
            str(fixtures_dir / "assets" / "big_US_cars.sql"),
            "t",
            use_legacy_sql=True,
        )


def test_templated_destination_e2e(spark, fixtures_dir):
    table = load_csv(
        spark,
        bucket=str(fixtures_dir / "bucket"),
        prefix="cars_",
        schema=str(fixtures_dir / "assets" / "cars_schema.yaml"),
        destination_table="proj.e2e.cars_{5:11}",
        archive_files_after=False,
    )
    assert table == "e2e.cars_202109"
    assert spark.table("e2e.cars_202109").count() == 406


def test_append_schema_mismatch_maps_to_load_job_error(spark):
    """A failing write surfaces as the reference's LoadJobError (500)."""
    from etl_workflows_spark.exceptions import LoadJobError
    from etl_workflows_spark.sinks.writer import write_table

    spark.sql("CREATE DATABASE IF NOT EXISTS errs")
    a = spark.createDataFrame([(1, "x")], ["id", "s"])
    write_table(a, "errs.t1", append=False)
    mismatched = spark.createDataFrame([(1.5, 2, 3)], ["a", "b", "c"])
    with pytest.raises(LoadJobError):
        write_table(mismatched, "errs.t1", append=True)


def test_query_write_failure_maps_to_creation_failed(spark, tmp_path):
    """load_query maps a failed materialization to CreationFailed — the
    reference's per-function taxonomy (load_query/main.py:58-65) differs
    from load_csv's LoadJobError, and the DAG can branch on the strings."""
    from etl_workflows_spark.exceptions import CreationFailed
    from etl_workflows_spark.plans.load_query import load_query
    from etl_workflows_spark.sinks.writer import write_table

    spark.sql("CREATE DATABASE IF NOT EXISTS errs")
    a = spark.createDataFrame([(1, "x")], ["id", "s"])
    write_table(a, "errs.q_dest", append=False)
    qf = tmp_path / "bad_append.sql"
    qf.write_text("SELECT 1.5 AS a, 2 AS b, 3 AS c")
    with pytest.raises(CreationFailed):
        load_query(spark, str(qf), "errs.q_dest", append=True)
