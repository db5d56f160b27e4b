"""Table-services workflow: the reference's DAG dialect driving the
round-4 storage layer.

The reference's one shipped DAG (etl_cars.yaml: ingest → query →
materialize, with the except-branch keyed on error descriptions) is the
shape every warehouse load follows. This module provides the same shape
over snapshot tables with a Write-Audit-Publish gate:

    land files → stage batch → audit (expectations) → publish → refresh
    downstream view;   audit failure ⇒ except branch ⇒ drop the staged
    batch — consumers never see it.

Everything here is registry plumbing around sinks/snapshots.py +
operators/expectations.py + operators/incremental_view.py; the DSL
interpreter (workflow.py) and its error protocol are untouched — an
audit failure raises an ``EngineError`` whose description the YAML
switch discriminates, exactly like the reference's etl_cars.yaml:51-54
branches on "CSV file not found".
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

from etl_workflows_spark.exceptions import EngineError
from etl_workflows_spark.operators.expectations import (
    Expectation,
    check_expectations,
    violations,
)
from etl_workflows_spark.sinks import snapshots as S


class AuditFailed(EngineError):
    code = 422
    description = "Audit failed"


# The canonical WAP maintenance DAG, in the reference's YAML dialect.
WAP_WORKFLOW_YAML = """
main:
  params: [sourcePath, batch]
  steps:
    - guarded_load:
        try:
          steps:
            - stage:
                call: stage_batch
                args:
                  body:
                    sourcePath: ${sourcePath}
                    batch: ${batch}
                result: staged
            - audit:
                call: audit_staged
                args:
                  body:
                    batch: ${batch}
                result: audited
            - publish:
                call: publish_staged
                args:
                  body:
                    batch: ${batch}
                result: published
            - refresh:
                call: refresh_view
                args:
                  body: {}
                result: refreshed
            - done:
                return: ${"published " + batch}
        except:
          as: e
          steps:
            - is_audit_failure:
                switch:
                  - condition: ${e.body.description == "Audit failed"}
                    next: reject
            - unexpected:
                return: ${"error " + e.body.description}
            - reject:
                call: drop_staged
                args:
                  body:
                    batch: ${batch}
                result: dropped
            - rejected:
                return: ${"rejected " + batch}
"""


def build_table_services_registry(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    rules: list[Expectation],
    key_cols: list[str],
    measures: dict[str, str],
) -> dict[str, Callable[[dict], str]]:
    """Registry for the WAP maintenance DAG. Body keys are camelCase,
    matching the engine's existing API surface."""

    def stage_batch(body: dict) -> str:
        df = spark.read.parquet(body["sourcePath"])
        S.stage(df, table_dir, body["batch"], stat_cols=key_cols[:1])
        return "Success"

    def audit_staged(body: dict) -> str:
        staged = S.read_staged(spark, table_dir, body["batch"])
        bad = violations(check_expectations(staged, rules))
        if bad:
            raise AuditFailed()
        return "Success"

    def publish_staged(body: dict) -> str:
        S.publish_staged(table_dir, body["batch"])
        return "Success"

    def drop_staged(body: dict) -> str:
        S.drop_staged(table_dir, body["batch"])
        return "Success"

    def refresh_view(body: dict) -> str:
        from etl_workflows_spark.operators.incremental_view import (
            refresh_view as _refresh,
        )

        _refresh(spark, table_dir, view_dir, key_cols, measures)
        return "Success"

    return {
        "stage_batch": stage_batch,
        "audit_staged": audit_staged,
        "publish_staged": publish_staged,
        "drop_staged": drop_staged,
        "refresh_view": refresh_view,
    }
