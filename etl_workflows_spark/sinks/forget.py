"""Right-to-be-forgotten across the corpus AND its derived dedup state.

Deleting rows from the corpus table alone is not forgetting: the
document's md5 fingerprint (``build_fingerprint_index``) would keep
rejecting a future legitimate re-submission of the same text, and its
LSH band rows + shingle set (``build_near_dup_index``) would keep
flagging near-duplicates of content the owner asked to remove. A
compliance delete must reach every derived table or the data is still
observable through the index side-channels.

``forget_documents`` removes a doc_id set from: the corpus table
(partition-pruned ``delete_from``), the exact-dup fingerprint index
(fp-keyed, with a shared-text guard: an fp still referenced by a
SURVIVING document is kept, so forgetting one of two identical docs
does not unprotect the other), and the near-dup index pair (doc_id
keyed). Index rewrites preserve the tables' bucket specs
(``insertInto`` overwrite — the catalog entry is never dropped, unlike
``delete_from``'s staging-swap path, which loses bucketing).

Scale: the doomed set is the small side everywhere (broadcast
anti-joins); each index rewrite is one scan of a compact index, and the
corpus delete rewrites only partitions containing doomed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL

from etl_workflows_spark.sinks.merge import delete_from


def _rewrite_minus(
    spark: SparkSession, table: str, doomed: DataFrame, key_cols: list[str]
) -> int:
    """Overwrite ``table`` with its rows minus ``doomed`` (broadcast
    anti-join), preserving the table's bucket/layout spec. Returns the
    number of rows removed."""
    target = spark.table(table)
    d = doomed.select(*key_cols).distinct().localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    removed = target.join(F.broadcast(d), key_cols, "leftsemi").count()
    if removed == 0:
        return 0
    survivors = (
        target.join(F.broadcast(d), key_cols, "leftanti")
        .select(*target.columns)
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    survivors.write.mode("overwrite").insertInto(table, overwrite=True)
    spark.catalog.refreshTable(table)
    return removed


def forget_documents(
    spark: SparkSession,
    doc_ids: DataFrame,
    corpus_table: str,
    fingerprint_index: str | None = None,
    near_dup_index: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Forget ``doc_ids`` (a 1-column DataFrame) everywhere. Returns
    per-surface removal counts. Idempotent — re-forgetting is a no-op.

    Order matters: doomed texts are captured (checkpointed) BEFORE the
    corpus delete so fingerprints can still be computed, and the
    shared-text guard consults the corpus AFTER the delete so an fp
    kept alive by a surviving duplicate is preserved.
    """
    ids = doc_ids.selectExpr(f"{id_col} as {id_col}").distinct().localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    corpus = spark.table(corpus_table)
    doomed_docs = (
        corpus.join(F.broadcast(ids), id_col, "leftsemi")
        .select(id_col, text_col)
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    out = {"corpus": delete_from(spark, corpus_table, ids, [id_col])["deleted"]}

    if fingerprint_index is not None:
        doomed_fps = doomed_docs.select(
            F.md5(F.col(text_col)).alias("fp")
        ).distinct()
        # shared-text guard: one scan of the post-delete corpus,
        # restricted to the doomed fps (broadcast semi-join)
        still_live = (
            spark.table(corpus_table)
            .select(F.md5(F.col(text_col)).alias("fp"))
            .join(F.broadcast(doomed_fps), "fp", "leftsemi")
            .distinct()
        )
        removable = doomed_fps.join(still_live, "fp", "leftanti")
        out["fingerprints"] = _rewrite_minus(
            spark, fingerprint_index, removable, ["fp"]
        )

    if near_dup_index is not None:
        dd = doomed_docs.select(F.col(id_col).alias("doc_id"))
        out["near_dup_bands"] = _rewrite_minus(
            spark, f"{near_dup_index}_bands", dd, ["doc_id"]
        )
        out["near_dup_shingles"] = _rewrite_minus(
            spark, f"{near_dup_index}_sh", dd, ["doc_id"]
        )
    return out
