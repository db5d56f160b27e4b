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
    from etl_workflows_spark.operators.dedup import dedup_near_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    docs = docs.localCheckpoint(eager=True)  # freeze input lineage
    baseline = _settle(spark)

    counts = []
    for _ in range(3):
        dedup_near_duplicates(docs, threshold=0.5).count()
        counts.append(_n_persistent(spark))
    final = _drain(spark, baseline)
    assert final <= baseline, (
        f"{final - baseline} cached RDDs leaked after 3 dedup passes "
        f"(per-pass persistent counts: {counts})"
    )


def test_cluster_duplicates_releases_edge_cache(spark):
    from etl_workflows_spark.operators.dedup import cluster_duplicates

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "doc_a long, doc_b long"
    ).localCheckpoint(eager=True)
    baseline = _settle(spark)
    out = cluster_duplicates(pairs)
    got = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    del out
    final = _drain(spark, baseline)
    assert final <= baseline
