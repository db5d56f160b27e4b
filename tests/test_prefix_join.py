"""Prefix-filtering set-similarity join: exact equality with the O(n²)
ground truth, theorem-recall on crafted corpora, and real pruning."""

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.dedup import (
    _prefix_candidates,
    _shingled,
    near_dup_pairs_exact,
    near_dup_pairs_prefix,
)


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_prefix_equals_exact_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.3, 0.5, 0.8):
        exact = _pairs(near_dup_pairs_exact(docs, threshold=t))
        pref = _pairs(near_dup_pairs_prefix(docs, threshold=t))
        assert pref == exact, f"threshold {t}"


def test_prefix_recall_on_boundary_jaccard(spark):
    # two docs engineered to sit exactly at the threshold: 6 shared
    # shingles of 9/9 → jaccard 6/12 = 0.5
    base = "a b c d e f g h i j k".split()
    d1 = " ".join(base)                      # 9 shingles
    d2 = " ".join(base[:8] + ["x", "y", "z"])  # shares 6 shingles
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, "totally unrelated words only here")],
        "doc_id long, text string",
    )
    got = near_dup_pairs_prefix(docs, threshold=0.5)
    exact = near_dup_pairs_exact(docs, threshold=0.5)
    assert _pairs(got) == _pairs(exact)
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in got.collect()}
    if (1, 2) in jac:
        assert jac[(1, 2)] >= 0.5


def test_prefix_actually_prunes(spark):
    # 40 docs share one COMMON phrase (high df → sorted last, outside
    # every prefix) and are otherwise unique → zero candidates, while
    # the naive self-join would inspect 780 pairs
    rows = [
        (i, f"common shared phrase here u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _shingled(docs, "text", 3, hashed=True)
    n_cands = _prefix_candidates(sh, 0.8).count()
    assert n_cands == 0
    assert _pairs(near_dup_pairs_prefix(docs, threshold=0.8)) == _pairs(
        near_dup_pairs_exact(docs, threshold=0.8)
    )


def test_prefix_threshold_validation(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        near_dup_pairs_prefix(docs, threshold=0.0)


def test_end_to_end_dedup_prefix_equals_lsh_ground_truth(spark, sf_dir):
    from etl_workflows_spark.operators.dedup import dedup_near_duplicates

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(300)
        .localCheckpoint(eager=True)
    )
    kept_prefix = {
        r["doc_id"]
        for r in dedup_near_duplicates(
            docs, threshold=0.5, method="prefix"
        ).collect()
    }
    kept_lsh = {
        r["doc_id"]
        for r in dedup_near_duplicates(docs, threshold=0.5).collect()
    }
    # prefix recall is exactly 1, LSH is approximate — so the prefix
    # survivor set is the ground truth and LSH can only keep MORE docs
    # (missed pairs leave extra survivors), never fewer
    assert kept_prefix <= kept_lsh

    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        dedup_near_duplicates(docs, method="bogus")
