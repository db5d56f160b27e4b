"""Query catalog: every operator from SURVEY.md §2 as a (Spark, oracle-SQL)
pair, used by ``__spark_entry__.py`` for the driver's DuckDB correctness gate.

``QUERIES`` maps name → callable(spark, sf_dir) → DataFrame.
``ORACLE_SQL`` maps name → equivalent ANSI SQL for DuckDB (absent for
non-SQL-expressible ops, which get a weaker rows-only check).
"""

from etl_workflows_spark.queries import (
    analytics,
    llm,
    relational,
    relational_ext,
    tpch_shapes,
    tpch_shapes2,
)

QUERIES = {
    **relational.QUERIES,
    **relational_ext.QUERIES,
    **tpch_shapes.QUERIES,
    **tpch_shapes2.QUERIES,
    **analytics.QUERIES,
    **llm.QUERIES,
}
ORACLE_SQL = {
    **relational.ORACLE_SQL,
    **relational_ext.ORACLE_SQL,
    **tpch_shapes.ORACLE_SQL,
    **tpch_shapes2.ORACLE_SQL,
    **analytics.ORACLE_SQL,
    **llm.ORACLE_SQL,
}

# Every catalog entry WITHOUT a DuckDB oracle, with the one-line reason —
# the single source of truth for the rows-only class (CATALOG.md renders
# it; test_query_catalog asserts it equals QUERIES - ORACLE_SQL, so an
# entry can neither silently lose its oracle nor join this list without
# a stated reason).
ROWS_ONLY_WHY = {
    "near_dup_minhash_lsh": (
        "MinHash banding is probabilistic candidate generation — the "
        "pair set depends on the hash family; exact twin "
        "near_dup_jaccard is oracle-checked and LSH recall vs it is "
        "benched every round"
    ),
    "ann_cosine_topk_lsh": (
        "hyperplane-LSH result set depends on the sampled planes; exact "
        "twin ann_cosine_topk is the oracle, recall on the scaled-bench "
        "frontier"
    ),
    "ann_cosine_topk_multitable": (
        "multi-table LSH — same sampled-plane dependence as the "
        "single-table path; exact twin ann_cosine_topk"
    ),
    "ann_cosine_topk_ivf": (
        "IVF probe set depends on trained k-means centroids (iteration "
        "order); exact twin ann_cosine_topk, recall recorded per round"
    ),
    "ann_cosine_topk_pq": (
        "PQ codebooks are k-means-trained — ADC distances are lossy by "
        "contract; exact twin ann_cosine_topk, recall + reconstruction "
        "error pinned in test_pq"
    ),
    "ann_cosine_topk_ivfpq": (
        "composes the IVF centroid dependence with PQ lossiness; exact "
        "twin ann_cosine_topk"
    ),
    "dedup_near_end_to_end": (
        "consumes the probabilistic LSH candidate stage, so the cluster "
        "set inherits its hash dependence; the exact-verify step and "
        "component semantics are pytest-pinned"
    ),
    "approx_event_sketches": (
        "HyperLogLog register state is not SQL-expressible; estimate "
        "error bounds pinned at sf0.01 in tests"
    ),
    "events_distinct_hll_range": (
        "HLL range-mergeable distinct counts — same register-state "
        "boundary; error bounds pinned in tests"
    ),
    "audience_overlap_events": (
        "inclusion-exclusion over HLL sketches — estimates by design; "
        "bounds pinned in tests"
    ),
    "equidepth_histogram_approx": (
        "GK quantile sketch guarantees rank error, not exact bin edges; "
        "the error contract is pinned at sf0.01 in tests"
    ),
    "quality_classifier_docs": (
        "iterative L-BFGS training — the optimization trajectory has no "
        "SQL twin; calibration and separation pinned in test_classifier"
    ),
    "pipeline_curation_v2": (
        "embeds the L-BFGS-trained classifier stage above; every other "
        "stage is oracle-checked standalone"
    ),
    "multimodal_phash_pairs": (
        "pixel decode + 2-D DCT run in an Arrow kernel — no relational "
        "expression; pixel-stat goldens pinned in pytest"
    ),
    "embedding_near_dup_banded": (
        "random-hyperplane banding — candidate recall depends on the "
        "sampled planes; exact twin similar_pairs is oracle-checked"
    ),
    "semantic_dedup_embeddings": (
        "k-means cell assignment depends on centroid training order; "
        "within-cell cosine semantics pytest-pinned, growth exponent "
        "probed"
    ),
    "compression_ratio_docs": (
        "DEFLATE bit-stream state is not SQL-expressible; the kernel is "
        "deterministic and pytest-pinned"
    ),
}

__all__ = ["QUERIES", "ORACLE_SQL", "ROWS_ONLY_WHY"]
