"""Workflow-DSL interpreter: the reference DAG's shape end-to-end
(SURVEY.md §2.5) — sequential steps, assign/exprs, subworkflow calls,
conditional early-exit, error discrimination, return plumbing."""

import pytest

from etl_workflows_spark.orchestrate.workflow import (
    WorkflowError,
    WorkflowRunner,
    build_engine_registry,
)

# Same dialect the reference's etl_cars.yaml uses, wired to our engine:
# ingest newest cars CSV, early-exit if none, then append the golden query.
PIPELINE_YAML = """
main:
  steps:
    - init:
        assign:
          - dataset: wf
    - loadExportCsv:
        call: loadCsvStep
        args:
          body:
            bucket: "{bucket}"
            prefix: cars_
            schema: cars_schema.yaml
            destinationTable: ${{dataset + ".cars"}}
        result: loadExportResult
    - conditionalSwitch:
        switch:
          - condition: ${{loadExportResult != "Success"}}
            next: end
        next: updateExport
    - updateExport:
        call: loadQueryStep
        args:
          body:
            query: big_US_cars.sql
            destinationTable: ${{dataset + ".big_US_cars"}}
            append: True
        result: queryResult
    - done:
        return: ${{queryResult}}

loadCsvStep:
  params: [body]
  steps:
    - init:
        assign:
          - notFoundMessage: "CSV file not found"
    - runJob:
        try:
          call: http.post
          args:
            url: https://functions.example/load_csv
            body: ${{body}}
          result: r
        except:
          as: e
          steps:
            - known:
                switch:
                  - condition: ${{e.body.description == notFoundMessage}}
                    return: "Not found"
            - unknown:
                raise: ${{e}}
    - out:
        return: ${{r.body.description}}

loadQueryStep:
  params: [body]
  steps:
    - runJob:
        call: http.post
        args:
          url: https://functions.example/load_query
          body: ${{body}}
        result: r
    - out:
        return: ${{r.body.description}}
"""


@pytest.fixture()
def wf_env(spark, fixtures_dir, tmp_path):
    import csv as csv_mod
    import shutil

    bucket = tmp_path / "bucket"
    bucket.mkdir()
    shutil.copy(fixtures_dir / "bucket" / "ARCHIVED" / "cars_202109.csv"
                if (fixtures_dir / "bucket" / "ARCHIVED" / "cars_202109.csv").exists()
                else fixtures_dir / "bucket" / "cars_202109.csv",
                bucket / "cars_202109.csv")
    yaml_doc = PIPELINE_YAML.format(bucket=str(bucket))
    registry = build_engine_registry(spark, assets_dir=str(fixtures_dir / "assets"))
    spark.sql("CREATE DATABASE IF NOT EXISTS wf")
    spark.sql("DROP TABLE IF EXISTS wf.cars")
    spark.sql("DROP TABLE IF EXISTS wf.big_US_cars")
    spark.sql("USE wf")
    yield yaml_doc, registry, bucket
    spark.sql("USE default")


def test_full_dag(spark, wf_env):
    yaml_doc, registry, bucket = wf_env
    result = WorkflowRunner(yaml_doc, registry).run()
    assert result == "Success"
    assert spark.table("wf.cars").count() == 406
    assert spark.table("wf.big_US_cars").count() == 17
    # the CSV was archived by load_csv (archiveFiles default True)
    assert (bucket / "ARCHIVED" / "cars_202109.csv").exists()


def test_early_exit_when_no_csv(spark, wf_env):
    yaml_doc, registry, bucket = wf_env
    runner = WorkflowRunner(yaml_doc, registry)
    runner.run()
    n = spark.table("wf.big_US_cars").count()
    # second run: bucket now empty -> CsvNotFound -> "Not found" -> early end
    result = runner.run()
    assert result is None  # `next: end` exits without a return value
    assert spark.table("wf.big_US_cars").count() == n  # no double-append


def test_unknown_error_reraised(spark, tmp_path):
    # registry whose csv step fails with an unknown error
    def boom(body):
        raise RuntimeError("disk on fire")

    doc = """
main:
  steps:
    - s:
        try:
          call: http.post
          args:
            url: x/load_csv
            body: {}
          result: r
        except:
          as: e
          steps:
            - known:
                switch:
                  - condition: ${e.body.description == "CSV file not found"}
                    return: "Not found"
            - reraise:
                raise: ${e}
"""
    with pytest.raises(WorkflowError) as ei:
        WorkflowRunner(doc, {"load_csv": boom}).run()
    assert ei.value.value.body.description == "Unknown error"


def test_expression_eval():
    doc = """
main:
  steps:
    - a:
        assign:
          - x: 2
          - y: ${x + 3}
          - s: ${"a" + "-" + "b"}
    - b:
        return: ${[y, s, x != 2]}
"""
    assert WorkflowRunner(doc, {}).run() == [5, "a-b", False]


def test_expression_sandbox_rejects_escapes():
    """The ${} evaluator is an AST whitelist, not eval: attribute-chain
    sandbox escapes, calls, and comprehensions are structurally rejected —
    and an expression bug propagates as ExpressionError, NOT WorkflowError,
    so try/except steps can't swallow it as a data error."""
    from etl_workflows_spark.orchestrate.workflow import ExpressionError
    hostile = [
        '${().__class__.__mro__[1].__subclasses__()}',
        '${open("/etc/passwd")}',
        '${[x for x in (1, 2)]}',
        '${__import__("os")}',
        '${x.__dict__}',
    ]
    for expr in hostile:
        doc = f"""
main:
  steps:
    - a:
        assign:
          - x: 1
    - b:
        return: {expr}
"""
        with pytest.raises(ExpressionError):
            WorkflowRunner(doc, {}).run()

    # even inside a try step: the except handler must NOT see it
    doc = """
main:
  steps:
    - a:
        try:
          assign:
            - x: ${undefined_name + 1}
        except:
          as: e
          steps:
            - swallow:
                return: "handled"
"""
    with pytest.raises(ExpressionError):
        WorkflowRunner(doc, {}).run()


def test_expression_eval_bool_and_subscript():
    doc = """
main:
  steps:
    - a:
        assign:
          - xs: ${[10, 20, 30]}
          - t: ${xs[1] == 20 and not (xs[0] > 15)}
          - u: ${xs[2] - xs[0]}
    - b:
        return: ${[t, u]}
"""
    assert WorkflowRunner(doc, {}).run() == [True, 20]


def test_reference_etl_cars_yaml_verbatim(spark, fixtures_dir, tmp_path):
    """Interpret the reference's LITERAL workflow document
    (/root/reference/workflows/etl_cars.yaml), with only the placeholder
    substitution a deployer performs (<project>/<dataset>/<export-bucket>;
    README.md tells users to replace these before deploying). Everything
    else — the ${} expressions, the OIDC-annotated http.post calls, the
    error discrimination on 'CSV file not found', the early-exit switch,
    and the cats_schema.yaml typo (etl_cars.yaml:14) — runs verbatim.

    Run 1: loads cars (406 rows), appends the golden query (17 rows).
    Run 2: source archived -> CsvNotFound -> 'Not found' -> early exit,
    table counts unchanged (the reference's daily-cron no-new-file path).
    """
    import shutil

    doc = open("/root/reference/workflows/etl_cars.yaml").read()
    bucket = tmp_path / "refbucket"
    bucket.mkdir()
    shutil.copy(fixtures_dir / "bucket" / "cars_202109.csv", bucket / "cars_202109.csv")
    assets = tmp_path / "refassets"
    assets.mkdir()
    # the deployer ships the schema under the name the workflow asks for
    # (the reference's file is cars_schema.yaml; the DAG says cats_)
    shutil.copy(fixtures_dir / "assets" / "cars_schema.yaml", assets / "cats_schema.yaml")
    shutil.copy(fixtures_dir / "assets" / "big_US_cars.sql", assets / "big_US_cars.sql")
    doc = (
        doc.replace("<project>", "proj")
        .replace("<dataset>", "refwf")
        .replace("<export-bucket>", str(bucket))
        .replace("<zone>", "eu")
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS refwf")
    spark.sql("DROP TABLE IF EXISTS refwf.cars")
    spark.sql("DROP TABLE IF EXISTS refwf.big_US_cars")
    # the engine-session equivalent of BigQuery's default dataset: the
    # shipped SQL says bare `FROM cars` (reference assets/big_US_cars.sql)
    spark.sql("USE refwf")
    registry = build_engine_registry(spark, assets_dir=str(assets))

    WorkflowRunner(doc, registry).run()
    assert spark.table("refwf.cars").count() == 406
    assert spark.table("refwf.big_US_cars").count() == 17

    # run 2: file archived; the DAG's no-new-file path exits before the query
    WorkflowRunner(doc, registry).run()
    assert spark.table("refwf.big_US_cars").count() == 17
    spark.sql("USE default")


def test_expression_sandbox_adversarial_battery():
    """Security-pinning battery for the ${} AST whitelist: every known
    escape/DoS family is STRUCTURALLY rejected (ExpressionError), never
    evaluated, never allowed to wedge the interpreter."""
    from etl_workflows_spark.orchestrate.workflow import (
        ExpressionError,
        _eval_expression,
    )

    scope = {"x": 1, "s": "abc", "xs": [1, 2, 3]}
    hostile = [
        # dunder chains, every spelling
        "().__class__.__mro__[1].__subclasses__()",
        "x.__class__",
        "s.__init__",
        "xs.__getitem__",
        # call nodes (even of whitelisted results)
        "abs(x)",
        "s.upper()",
        "(x + 1).bit_length()",
        # comprehensions / generators / lambdas / walrus / starred
        "[i for i in xs]",
        "{i: i for i in xs}",
        "(i for i in xs)",
        "lambda: 1",
        "(y := 5)",
        "[*xs]",
        # f-strings, await, conditional expression (not whitelisted)
        "f'{x}'",
        # power tower DoS (Pow is structurally absent)
        "9 ** 9 ** 9",
        # sequence-repetition DoS (Mult is size-capped)
        "'a' * 99999999",
        "xs * 99999999",
        "99999999 * 'a'",
        "('a' * 1000) * 99999",
    ]
    for expr in hostile:
        with pytest.raises(ExpressionError, match="."):
            _eval_expression(expr, dict(scope))
    # oversized / pathologically nested expressions fail fast, not with
    # a RecursionError that could kill the worker thread
    with pytest.raises(ExpressionError):
        _eval_expression("x" + " + x" * 2000, dict(scope))
    with pytest.raises(ExpressionError):
        _eval_expression("-" * 5000 + "x", dict(scope))
    # under the length cap, deep-but-parseable nesting evaluates safely
    assert _eval_expression("-" * 900 + "x", dict(scope)) == 1


def test_expression_sandbox_property(monkeypatch):
    """Property: random expression strings either evaluate to a plain
    value or raise ExpressionError — no other exception type escapes the
    evaluator (hostile YAML can't crash the runner loop)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_workflows_spark.orchestrate.workflow import (
        ExpressionError,
        _eval_expression,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def check(expr):
        try:
            _eval_expression(expr, {"x": 1, "s": "abc"})
        except ExpressionError:
            pass

    check()


def test_expression_benign_mult_still_works():
    from etl_workflows_spark.orchestrate.workflow import _eval_expression

    assert _eval_expression("'ab' * 3", {}) == "ababab"
    assert _eval_expression("[0] * 4", {}) == [0, 0, 0, 0]
    assert _eval_expression("6 * 7", {}) == 42
