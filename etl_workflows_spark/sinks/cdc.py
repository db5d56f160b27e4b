"""Change-data-capture apply: land an out-of-order insert/update/delete
feed onto a managed table with latest-version-wins semantics.

The shape every warehouse-sync pipeline needs (Debezium/DMS-style
feeds): a batch of change rows (op ∈ {I, U, D}, a monotone version —
LSN, commit timestamp, offset) arrives unordered and possibly with
several changes per key; the table must end up as if the changes had
been applied one at a time in version order.

Spark-first reduction: per key only the HIGHEST-version change matters
(apply-in-order collapses to last-writer-wins), so one window pass
picks each key's final change, then upserts go through ``merge_into``
and tombstones through ``delete_from`` — both partition-pruned,
idempotent primitives. Replaying the same feed (or any prefix of it)
is a no-op: upserting identical rows and re-deleting absent keys
change nothing, which is exactly the at-least-once-transport contract
(SURVEY.md §2.6) at the table level.

Scale: the feed is the small side everywhere; the only full shuffle is
the per-key window over the BATCH (not the table), and the table
rewrite is scoped by merge_into/delete_from's partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL

from etl_workflows_spark.sinks.merge import delete_from, merge_into

OPS = ("I", "U", "D")


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change feed to each key's final change (highest
    version; ties broken by op with D > U > I so a same-version
    delete+insert resolves to the delete — the conservative read of a
    malformed feed)."""
    op_rank = F.when(F.col(op_col) == "D", 2).when(
        F.col(op_col) == "U", 1
    ).otherwise(0)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), op_rank.desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc(
    spark: SparkSession,
    changes: DataFrame,
    target_table: str,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
) -> dict[str, int]:
    """Apply a change batch to ``target_table``. Returns
    ``{"upserted": n, "deleted": n}``. The feed may be unordered and
    carry multiple changes per key; the result equals in-order apply.

    Rows with an op outside {I, U, D} fail fast — a silent skip would
    desynchronize the replica.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    # isNull explicitly: ~isin(...) is NULL (filtered out) for a NULL op,
    # which would bypass the fail-fast AND could shadow a real change for
    # the same key at a higher version
    bad = changes.filter(
        F.col(op_col).isNull() | ~F.col(op_col).isin(*OPS)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"unknown CDC op {bad[0][op_col]!r}: expected one of {OPS}"
        )
    final = latest_changes(changes, key_cols, version_col, op_col).localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    upserts = final.filter(F.col(op_col) != "D").drop(op_col, version_col)
    tombstones = final.filter(F.col(op_col) == "D").select(*key_cols)
    out = {"upserted": 0, "deleted": 0}
    if upserts.limit(1).collect():
        m = merge_into(spark, target_table, upserts, key_cols)
        out["upserted"] = m.get("matched", 0) + m.get("inserted", 0)
    if tombstones.limit(1).collect():
        out["deleted"] = delete_from(
            spark, target_table, tombstones, key_cols
        )["deleted"]
    # the merge/delete have fully consumed the collapsed feed — free its
    # checkpoint blocks NOW instead of waiting out the ContextCleaner
    # (a cron driver applying batches would otherwise pile one up per run)
    from etl_workflows_spark.operators.cache import release_checkpoint

    release_checkpoint(final)
    return out
