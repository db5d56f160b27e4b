"""Streaming data-quality firewall: per-micro-batch expectations with
quarantine routing.

The batch side declares table invariants once (operators/expectations.py)
and checks them in one scan; a continuously-ingesting pipeline needs the
same rules applied to every micro-batch, with failing ROWS diverted to a
quarantine table (for triage/replay) instead of poisoning the destination
— a data firewall, not a post-hoc report.

``foreachBatch`` is the right Spark shape: one branch-free scan computes
every rule's violation flag, then the pass/fail split lands in two tables
inside the same batch function, so a retried batch re-routes identically
(both sinks are keyed idempotent appends — the same two-layer
exactly-once design as ``stream_to_table_idempotent``).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_workflows_spark.operators.expectations import (
    Expectation,
    _violation_expr,
)


ROW_KINDS = ("not_null", "between", "isin", "matches")


def _require_row_scoped(rules: List[Expectation]) -> None:
    """One validator for both entry points — aggregate kinds (unique,
    row_count_between) have no per-row quarantine meaning."""
    bad = [r for r in rules if r.kind not in ROW_KINDS]
    if bad:
        raise ValueError(
            "quarantine_stream handles row-scoped rules only; got "
            f"{sorted(r.kind for r in bad)} — check aggregate rules with "
            "check_expectations on the destination table instead"
        )


def _failure_flags(df: DataFrame, rules: List[Expectation]) -> DataFrame:
    """Row-level '__failed' list column: names of every rule the row
    violates (empty array = clean)."""
    _require_row_scoped(rules)
    flags = F.array_compact(
        F.array(
            *[
                F.when(_violation_expr(r) == 1, F.lit(r.name))
                for r in rules
            ]
        )
    )
    return df.withColumn("__failed", flags)


def quarantine_stream(
    stream_df: DataFrame,
    rules: List[Expectation],
    destination_table: str,
    quarantine_table: str,
    keys: List[str],
    checkpoint_dir: str,
) -> None:
    """Route each micro-batch's rows by the declared rules: clean rows
    append (idempotently, keyed) to ``destination_table``; violating rows
    land in ``quarantine_table`` with a ``failed_rules`` audit column.

    One AvailableNow run; returns when all available input is committed.
    Retried batches are no-ops on both sinks (checkpoint dedupes sources,
    keyed anti-join dedupes rows), and a row can never appear in both
    tables — the split is a single deterministic expression.
    """
    from etl_workflows_spark.sinks.writer import (
        append_if_absent,
        normalize_table_name,
    )

    # validate rule kinds BEFORE the stream starts — inside foreachBatch
    # the error would surface as an opaque StreamingQueryException
    _require_row_scoped(rules)

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        # DETERMINISTIC within-batch survivor per key: bare
        # dropDuplicates picks whichever row a task saw first, so a
        # checkpoint replay could keep the OTHER row of a mixed
        # clean/dirty pair and route the key to the other table — the
        # exact double-appearance the docstring rules out
        from pyspark.sql.window import Window

        flagged = _failure_flags(batch_df, rules)
        # order only by ORDERABLE columns — a map ANYWHERE in a column's
        # type (top-level map, array<map<...>>, struct with a map field)
        # fails AnalysisException under orderBy (dropDuplicates only
        # hashed the keys, so it tolerated maps). Non-orderable columns
        # still break survivor ties deterministically via an xxhash64
        # digest of their JSON rendering (to_json accepts any type).
        from etl_workflows_spark.schema.types import is_orderable

        field_types = {f.name: f.dataType for f in flagged.schema.fields}
        orderable = [
            c
            for c in field_types
            if c not in keys and is_orderable(field_types[c])
        ]
        unorderable = [
            c
            for c in field_types
            if c not in keys and not is_orderable(field_types[c])
        ]
        order = [F.asc_nulls_first(F.col(c)) for c in orderable]
        if unorderable:
            order.append(
                F.asc_nulls_first(
                    F.xxhash64(*[F.to_json(F.col(c)) for c in unorderable])
                )
            )
        w = Window.partitionBy(*keys).orderBy(*order)
        flagged = (
            flagged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        clean = flagged.filter(F.size("__failed") == 0).drop("__failed")
        dirty = flagged.filter(F.size("__failed") > 0).withColumn(
            "failed_rules", F.array_join(F.col("__failed"), ",")
        ).drop("__failed")
        append_if_absent(clean, destination_table, keys)
        append_if_absent(dirty, quarantine_table, keys)

    (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
        .start()
        .awaitTermination()
    )
    spark = stream_df.sparkSession
    for t in (destination_table, quarantine_table):
        name = normalize_table_name(t)
        if spark.catalog.tableExists(name):
            spark.catalog.refreshTable(name)
