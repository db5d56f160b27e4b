"""Session-scope cache hygiene: long-lived pipelines that call the
dedup operators repeatedly must not accumulate orphaned cached RDDs —
every internal persist()/localCheckpoint() must be released (explicitly
or by the ContextCleaner once the last reference drops)."""

import gc
import time


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _settle(spark) -> int:
    """GC both runtimes a few times; return the settled persistent count."""
    for _ in range(3):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
    return _n_persistent(spark)


def _drain(spark, target: int, timeout_s: float = 120.0) -> int:
    """GC until the persistent-RDD count falls to ``target`` (the async
    ContextCleaner needs GC pressure + time) or the timeout expires."""
    deadline = time.time() + timeout_s
    n = _n_persistent(spark)
    while n > target and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        n = _n_persistent(spark)
    return n


def test_repeated_dedup_leaves_no_cached_rdds(spark, sf_dir):
    """Deterministic storage contract: each pass holds exactly ONE live
    checkpoint (the loser-id set its result depends on) — intermediates
    are released inside the operator — and release_all_checkpoints frees
    that one the moment the consumer is done. No GC races."""
    from etl_workflows_spark.operators.cache import release_all_checkpoints
    from etl_workflows_spark.operators.dedup import dedup_near_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    docs = docs.localCheckpoint(eager=True)  # freeze input lineage
    baseline = _settle(spark)

    for i in range(3):
        result = dedup_near_duplicates(docs, threshold=0.5)
        result.count()
        during = _n_persistent(spark)
        assert during <= baseline + 1, (
            f"pass {i}: {during - baseline} live checkpoints while the "
            "result is held — intermediates were not released"
        )
        release_all_checkpoints(result, keep=[docs])
        after = _n_persistent(spark)
        assert after <= baseline, (
            f"pass {i}: {after - baseline} cached RDDs survived "
            "release_all_checkpoints"
        )


def test_cluster_duplicates_releases_edge_cache(spark):
    """Intermediate iteration checkpoints are released inside the loop;
    the returned labels hold exactly one checkpoint, freed
    deterministically by release_checkpoint when the caller is done."""
    from etl_workflows_spark.operators.cache import release_all_checkpoints
    from etl_workflows_spark.operators.dedup import cluster_duplicates

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "doc_a long, doc_b long"
    ).localCheckpoint(eager=True)
    baseline = _settle(spark)
    out = cluster_duplicates(pairs)
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert _n_persistent(spark) <= baseline + 1  # only the result's labels
    release_all_checkpoints(out, keep=[pairs])
    assert _n_persistent(spark) <= baseline
