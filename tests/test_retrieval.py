"""BM25 / RRF retrieval: hand-computed scores, rank equivalences, fusion
semantics, and broadcast-only join plans."""

import math

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.retrieval import (
    bm25_topk,
    cosine_rank,
    rrf_fuse,
)
from etl_workflows_spark.operators.similarity import ann_topk_bruteforce


def _mk_docs(spark):
    rows = [
        (0, "cat dog cat"),
        (1, "cat fish"),
        (2, "dog dog dog fish"),
        (3, "bird"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_expected(corpus, terms, k1=1.2, b=0.75):
    """Straight-line reference implementation of the ratio-idf micro sum."""
    n = float(len(corpus))
    lens = {d: len(t.split(" ")) for d, t in corpus}
    avg = sum(lens.values()) / len(corpus)
    out = {}
    for term in terms:
        df = sum(1 for _, t in corpus if term in t.split(" "))
        if df == 0:
            continue
        idf = (n - df + 0.5) / (df + 0.5) + 1.0
        for d, t in corpus:
            tf = t.split(" ").count(term)
            if tf == 0:
                continue
            c = (
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * ((1.0 - b) + b * lens[d] / avg))
            )
            out[d] = out.get(d, 0) + round(c * 1e6)
    return out


def test_bm25_matches_hand_formula(spark):
    corpus = [
        (0, "cat dog cat"),
        (1, "cat fish"),
        (2, "dog dog dog fish"),
        (3, "bird"),
    ]
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(
            _mk_docs(spark), [("q", ["cat", "dog"])], k=10
        ).collect()
    }
    assert got == _bm25_expected(corpus, ["cat", "dog"])


def test_bm25_rank_order_and_k(spark):
    out = bm25_topk(_mk_docs(spark), [("q", ["dog"])], k=1).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 2  # tf=3 dominates
    assert out[0]["rank"] == 1


def test_bm25_log_idf_same_ranking_single_term(spark):
    # per-term rank equivalence of ratio vs log idf
    a = [
        (r["doc_id"], r["rank"])
        for r in bm25_topk(
            _mk_docs(spark), [("q", ["cat"])], k=10, idf="ratio"
        ).collect()
    ]
    borne = [
        (r["doc_id"], r["rank"])
        for r in bm25_topk(
            _mk_docs(spark), [("q", ["cat"])], k=10, idf="log"
        ).collect()
    ]
    assert sorted(a) == sorted(borne)


def test_bm25_validates_args(spark):
    with pytest.raises(ValueError, match="idf"):
        bm25_topk(_mk_docs(spark), [("q", ["cat"])], idf="bad")
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(_mk_docs(spark), [("q", ["cat"])], k=0)


def test_bm25_plan_has_no_sort_merge_join(spark):
    out = bm25_topk(_mk_docs(spark), [("q", ["cat", "dog"])], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_rrf_fusion_rewards_agreement(spark):
    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)],
        "query_id string, doc_id long, rank int",
    )
    fused = {r["doc_id"]: r for r in rrf_fuse([lex, sem]).collect()}
    # doc 2 is in both lists → highest fused score
    assert fused[2]["fused_rank"] == 1
    # contributions: round(1e9/62) + round(1e9/61)
    assert fused[2]["rrf_nano"] == round(1e9 / 62) + round(1e9 / 61)
    # doc absent from a ranker just lacks that contribution
    assert fused[3]["rrf_nano"] == round(1e9 / 63)
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


def test_cosine_rank_agrees_with_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    mine = cosine_rank(
        emb.filter(F.col("vec_id") != 0), qvec, "q", k=15
    ).collect()
    ref = ann_topk_bruteforce(emb, query_vec_id=0, k=15).collect()
    assert [r["doc_id"] for r in sorted(mine, key=lambda r: r["rank"])] == [
        r["vec_id"] for r in ref
    ]


def test_cosine_rank_zero_query_raises(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="zero norm"):
        cosine_rank(emb, [0.0, 0.0], "q")


def test_ranking_agreement_semantics(spark):
    from etl_workflows_spark.operators.retrieval import ranking_agreement

    def ranks(qid, ids):
        return spark.createDataFrame(
            [(qid, d, r + 1) for r, d in enumerate(ids)],
            "query_id string, doc_id long, rank int",
        )

    # identical lists: overlap 1.0, footrule 0
    a = ranks("q", [1, 2, 3, 4])
    got = ranking_agreement(a, ranks("q", [1, 2, 3, 4]), k=4).first()
    assert got["overlap_at_k"] == 1.0 and got["footrule_nano"] == 0

    # fully reversed: overlap 1.0, footrule = max displacement → 1e9
    rev = ranks("q", [4, 3, 2, 1])
    got = ranking_agreement(a, rev, k=4).first()
    assert got["overlap_at_k"] == 1.0
    assert got["footrule_nano"] == 1_000_000_000

    # disjoint: overlap 0, footrule NULL (not 0 — undefined, and the
    # query must still be reported)
    got = ranking_agreement(a, ranks("q", [9, 8, 7, 6]), k=4).first()
    assert got["overlap_at_k"] == 0.0 and got["footrule_nano"] is None

    # singleton intersection: footrule undefined
    got = ranking_agreement(a, ranks("q", [1, 8, 7, 6]), k=4).first()
    assert got["overlap_at_k"] == 0.25 and got["footrule_nano"] is None

    # shared docs deep in one list: ranks re-index within the
    # intersection, so the normalized footrule NEVER exceeds 1e9
    # (raw top-k ranks would give |1-10|+|2-1| = 10 over max_disp 2)
    k10_a = ranks("q", [1, 2, 101, 102, 103, 104, 105, 106, 107, 108])
    k10_b = ranks("q", [2, 201, 202, 203, 204, 205, 206, 207, 208, 1])
    got = ranking_agreement(k10_a, k10_b, k=10).first()
    assert got["overlap_at_k"] == 0.2
    assert got["footrule_nano"] == 1_000_000_000


def test_prf_expansion_recovers_cooccurring_vocabulary(spark):
    from etl_workflows_spark.operators.retrieval import (
        bm25_prf_topk,
        bm25_topk,
        prf_expansion_terms,
    )

    # topic docs pair 'kernel' with 'scheduler'; the probe doc mentions
    # only 'scheduler' — invisible to the literal query, reachable after
    # expansion
    rows = (
        [(i, "the kernel scheduler uses a scheduler queue for task rotation")
         for i in range(6)]
        + [(100, "a scheduler assigns slots to jobs with strict fairness")]
        + [(200 + i, "gardening tips for growing tomatoes in cold climates")
           for i in range(6)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = ("q", ["kernel"])

    exp = prf_expansion_terms(docs, q, k_docs=5, n_terms=5)
    terms = [r["token"] for r in exp.collect()]
    assert "scheduler" in terms
    assert all(t != "kernel" for t in terms)  # never re-suggests the query

    base_ids = {
        r["doc_id"] for r in bm25_topk(docs, [q], k=10).collect()
    }
    prf_ids = {
        r["doc_id"]
        for r in bm25_prf_topk(docs, q, k=10, k_docs=5, n_terms=5).collect()
    }
    assert 100 not in base_ids  # literal query cannot see the probe doc
    assert 100 in prf_ids       # expansion can
    assert not {i for i in prf_ids if i >= 200}  # off-topic stays out
