"""The ``load_csv`` pipeline — the reference's first cloud function, in-engine.

End-to-end dataflow (reference functions/load_csv/main.py:40-63):

  1. discover newest CSV by prefix (lexicographic name-max) + validate ext
  2. fetch + parse the external schema document
  3. template the destination table name from the file name
  4. read raw ``;``-CSV positionally, drop wrong-arity rows
  5. coerce each cell by declared type (per-cell NULL-on-failure)
  6. overwrite the destination managed table (create-if-needed)
  7. archive source files under ``ARCHIVED/``

Differences from the reference, by design (SURVEY.md §4.2): no /tmp staging
round-trip and no ``FIXED_`` re-upload — coercion happens in-engine on the
scan, so the data moves object-store → executors → table exactly once. The
archive contract (step 7) is preserved because the DAG's incremental
semantics depend on it.

The config-key surface matches the reference's HTTP body (camelCase keys
``bucket, prefix, schema, destinationTable, archiveFiles, skipHeaders`` —
main.py:197-202; code wins over the README's snake_case).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from etl_workflows_spark.operators.coerce import coerce_columns
from etl_workflows_spark.schema.registry import load_schema_file
from etl_workflows_spark.sinks.writer import template_destination, write_table
from etl_workflows_spark.sources.csv_source import read_raw_csv
from etl_workflows_spark.sources.files import archive_processed, find_most_recent_csv


def load_csv(
    spark: SparkSession,
    bucket: str,
    prefix: str,
    schema: str,
    destination_table: str,
    archive_files_after: bool = True,
    skip_headers: bool = True,
    stage_fixed_copy: bool = False,
    metrics_out: dict | None = None,
) -> str:
    """Run the ingestion pipeline; returns the table name written.

    ``bucket`` is a directory URI on any Hadoop-compatible FS (the
    reference's GCS bucket); ``schema`` is a path to the YAML/JSON schema
    document (the reference's schemas bucket is just another directory).
    ``stage_fixed_copy`` opts into the reference's ``FIXED_<name>`` audit
    artifact (W1) — off by default since in-engine coercion makes the
    staging hop redundant for correctness.

    ``metrics_out``: pass a dict to receive pipeline observability
    counters — ``rows_loaded`` plus ``nulls_<column>`` (cells the safe
    casts nullified or that arrived empty) for every non-STRING column.
    Collected with ``Dataset.observe`` ON the write job itself: zero
    extra scans, zero extra actions — the accumulator rides the same
    tasks that load the table (the engine-grade replacement for the
    reference's log-line row counts).
    """
    csv_path = find_most_recent_csv(spark, bucket, prefix)
    csv_name = os.path.basename(csv_path)

    schema_doc = load_schema_file(schema)
    destination_table = template_destination(destination_table, csv_name)

    raw = read_raw_csv(spark, csv_path, len(schema_doc["fields"]), skip_header=skip_headers)
    cleaned = coerce_columns(raw, schema_doc)

    if stage_fixed_copy:
        from etl_workflows_spark.sinks.staging import write_fixed_copy

        write_fixed_copy(cleaned, bucket, csv_name)

    observation = None
    if metrics_out is not None:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        # coalesce: SUM over zero rows is NULL — an empty (or fully
        # arity-dropped) load must report 0, not None, so monitoring
        # arithmetic on the counters never hits a NoneType
        null_counters = [
            F.coalesce(
                F.sum(F.col(f["name"]).isNull().cast("long")), F.lit(0)
            ).alias(f"nulls_{f['name']}")
            for f in schema_doc["fields"]
            if f.get("type", "STRING").upper() != "STRING"
        ]
        observation = Observation("load_csv_metrics")
        cleaned = cleaned.observe(
            observation,
            F.count(F.lit(1)).alias("rows_loaded"),
            *null_counters,
        )

    table = write_table(cleaned, destination_table, append=False)
    if observation is not None:
        metrics_out.update(observation.get)

    if archive_files_after:
        archive_processed(spark, bucket, prefix)
    return table


def execute_job_from_config(spark: SparkSession, config: dict[str, Any]) -> str:
    """HTTP-body-shaped entry point (camelCase keys, reference main.py:195-202)."""
    return load_csv(
        spark,
        bucket=config.get("bucket"),
        prefix=config.get("prefix"),
        schema=config.get("schema"),
        destination_table=config.get("destinationTable"),
        archive_files_after=config.get("archiveFiles", True),
        skip_headers=config.get("skipHeaders", True),
    )
