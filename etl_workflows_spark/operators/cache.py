"""Deterministic release of localCheckpoint storage.

``localCheckpoint`` materializes a DataFrame into cached RDD blocks and
truncates lineage. Spark frees those blocks via the ContextCleaner —
*eventually*, after the JVM garbage-collects the RDD object, which in a
long-lived driver can lag arbitrarily (it needs a Python GC, a py4j
detach, a JVM GC, and the async cleaner thread to all line up). Iterative
operators (duplicate clustering, BPE training) create one checkpoint per
iteration, so waiting on GC turns bounded scratch space into an
unbounded-looking pile of cached blocks.

``release_checkpoint`` frees the blocks NOW by unpersisting the RDD that
backs the checkpointed plan. After the call the DataFrame is UNUSABLE
(its lineage was truncated at the checkpoint — there is nothing to
recompute from); only release state that nothing will read again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

#: Storage level for SINGLE-SHOT eager localCheckpoints whose blocks the
#: RETURNED plan still references — they cannot be release_checkpoint'd
#: on the return path, so they linger until the GC-lagged ContextCleaner
#: runs. At the default MEMORY_AND_DISK a long-lived session (the bench:
#: ~97 headline queries × 2 passes × 4 actions each, plus the scaled
#: legs) piles GBs of deserialized UnsafeRows onto the heap — measured
#: 1.8 GB of live rows plus 1.6 GB of broadcast pages at the moment the
#: round-10 driver bench died in a BroadcastExchange build ("Not enough
#: memory to build and broadcast"). DISK_ONLY keeps the
#: materialize-once / lineage-cut contract and the LogicalRDD plan shape
#: (guide §5: caching competes with execution memory) while the
#: accumulation lands on executor-local disk, reclaimed on the same
#: ContextCleaner schedule without ever crowding the heap. Iterative
#: operators that release per-iteration checkpoints deterministically
#: (bpe, cluster_duplicates, pagerank) keep the memory-first default —
#: their scratch is bounded by construction.
SCRATCH_LEVEL = StorageLevel.DISK_ONLY


def _checkpoint_leaves(df: DataFrame):
    """(rdd_id, LogicalRDD leaf) pairs under df's analyzed plan."""
    plan = df._jdf.queryExecution().analyzed()
    leaves = plan.collectLeaves()
    out = []
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getSimpleName() == "LogicalRDD":
            out.append((leaf.rdd().id(), leaf))
    return out


def release_checkpoint(df: DataFrame) -> None:
    """Immediately unpersist the RDD blocks behind a localCheckpoint'd
    DataFrame. The DataFrame must never be used afterwards.

    No-op (with no error) if ``df`` is not checkpoint-backed.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return
        plan.rdd().unpersist(False)
    except Exception:
        # best-effort: a plan shape we don't recognize falls back to the
        # ContextCleaner path, never breaks the caller
        pass


def release_all_checkpoints(df: DataFrame, keep=()) -> None:
    """Release EVERY localCheckpoint under ``df``'s plan — for consumers
    that are completely done with a derived result (e.g. after writing a
    dedup output). ``keep`` lists DataFrames whose own checkpoints must
    survive (typically the caller's input); their blocks are skipped.

    ``df`` and anything sharing its released checkpoints must never be
    used afterwards.
    """
    try:
        keep_ids = {rid for k in keep for rid, _ in _checkpoint_leaves(k)}
        for rid, leaf in _checkpoint_leaves(df):
            if rid not in keep_ids:
                leaf.rdd().unpersist(False)
    except Exception:
        pass
