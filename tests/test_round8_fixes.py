"""Regression battery pinning the round-8 fixes (ADVICE r6 lows carried
through VERDICT r7 'next round' #3):

1. ``near_dup_incremental`` gate overflow no longer re-shingles and
   re-runs the whole LSH pipeline: the overflow branch clusters the SAME
   verified pair graph (distributed min-label) and must pick identical
   survivors to the union-find fast path.
2. ``ann_topk_ivf_batch`` / ``pq_adc_topk_batch`` build their broadcast
   probe/LUT schemas from the corpus id column's type — a string-id
   corpus must work and match the per-query serving forms row-for-row
   (pre-fix: hardcoded ``query_vec_id long`` failed on string ids).
"""

from __future__ import annotations

import math
import random

import pytest

from etl_workflows_spark.operators import dedup
from etl_workflows_spark.operators import pq as PQ
from etl_workflows_spark.operators import similarity as SIM


def _dup_heavy_docs(spark):
    rng = random.Random(808)
    vocab = [f"tok{i}" for i in range(50)]
    rows, vid = [], 0
    for _ in range(10):
        base = " ".join(rng.choice(vocab) for _ in range(25))
        for _ in range(rng.randrange(2, 5)):
            rows.append((vid, base + " " + rng.choice(vocab)))
            vid += 1
    return spark.createDataFrame(rows, "doc_id long, text string"), len(rows)


def test_gate_overflow_branch_matches_union_find(spark, monkeypatch):
    docs, n_rows = _dup_heavy_docs(spark)
    for t in ("r8gate_idx_bands", "r8gate_idx_sh"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    empty = spark.createDataFrame([], "doc_id long, text string")
    dedup.build_near_dup_index(empty, "r8gate_idx", n_buckets=4)

    fast = {
        r["doc_id"]
        for r in dedup.near_dup_incremental(docs, "r8gate_idx", 0.5).collect()
    }
    # force the overflow branch: every batch's pair graph now exceeds the
    # gate, exercising the distributed-clustering fallback on the same
    # pair graph (pre-fix this re-ran shingling + LSH from raw text)
    monkeypatch.setattr(dedup, "_NEARDUP_PAIR_GATE", 1)
    slow = {
        r["doc_id"]
        for r in dedup.near_dup_incremental(docs, "r8gate_idx", 0.5).collect()
    }
    assert slow == fast
    assert len(fast) < n_rows  # the dup-heavy batch actually collapsed


@pytest.fixture(scope="module")
def string_id_corpus(spark):
    rng = random.Random(88)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(8)]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        rows.append((f"doc-{i:03d}", [x / nrm for x in v]))
    return spark.createDataFrame(
        rows, "vec_id string, embedding array<double>"
    )


def test_ivf_batch_handles_string_ids(string_id_corpus):
    index, cents = SIM.build_ivf_index(string_id_corpus, n_lists=4)
    index = index.cache()
    try:
        qids = [f"doc-{i:03d}" for i in (0, 7, 21)]
        qvecs = {
            r["vec_id"]: list(r["embedding"])
            for r in string_id_corpus.filter(
                string_id_corpus.vec_id.isin(qids)
            ).collect()
        }
        batch = SIM.ann_topk_ivf_batch(index, cents, qvecs, k=5, nprobe=2)
        got = {}
        for r in batch.collect():
            got.setdefault(r["query_vec_id"], []).append(
                (r["vec_id"], round(r["cos_sim"], 9))
            )
        assert set(got) == set(qids)
        for q in qids:
            single = [
                (r["vec_id"], round(r["cos_sim"], 9))
                for r in SIM.ann_topk_ivf(
                    index, cents, q, k=5, nprobe=2
                ).collect()
            ]
            assert got[q] == single
    finally:
        index.unpersist()


def test_pq_batch_handles_string_ids(spark, string_id_corpus):
    books = PQ.train_pq_codebooks(string_id_corpus, m=2, k=4)
    codes = PQ.pq_encode(string_id_corpus, books).cache()
    try:
        qids = [f"doc-{i:03d}" for i in (3, 11)]
        qvecs = {
            r["vec_id"]: list(r["embedding"])
            for r in string_id_corpus.filter(
                string_id_corpus.vec_id.isin(qids)
            ).collect()
        }
        batch = PQ.pq_adc_topk_batch(spark, codes, books, qvecs, k=5)
        got = {}
        for r in batch.collect():
            got.setdefault(r["query_vec_id"], []).append(
                (r["vec_id"], round(r["adc_score"], 9))
            )
        assert set(got) == set(qids)
        for q in qids:
            single = [
                (r["vec_id"], round(r["adc_score"], 9))
                for r in PQ.pq_adc_topk(
                    spark, codes, books, qvecs[q], k=5
                ).collect()
            ]
            assert got[q] == single
    finally:
        codes.unpersist()
