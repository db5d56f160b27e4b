"""Semantics tests for the LLM-pipeline operators: planted duplicates are
found, approximate variants track their exact twins."""

from pyspark.sql import functions as F

from etl_workflows_spark.operators import dedup, similarity


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "a completely different document about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "tiny"),  # < 3 tokens: no shingles
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_groups(spark):
    groups = {
        r["keeper_doc_id"]: r["n_copies"]
        for r in dedup.dedup_exact(_docs(spark)).collect()
    }
    assert groups[1] == 2  # docs 1 and 4 collapse, keeper is min id
    assert groups[2] == 1


def test_drop_exact_duplicates(spark):
    kept = {r["doc_id"] for r in dedup.drop_exact_duplicates(_docs(spark)).collect()}
    assert kept == {1, 2, 3, 5}


def test_soft_dedup_weights(spark):
    import math

    rows = {
        r["doc_id"]: r
        for r in dedup.soft_dedup_weights(_docs(spark)).collect()
    }
    assert rows[1]["n_copies"] == 2 and rows[4]["n_copies"] == 2
    assert rows[1]["weight"] == 0.5 and rows[4]["weight"] == 0.5
    assert rows[3]["n_copies"] == 1 and rows[3]["weight"] == 1.0
    # total mass == number of DISTINCT texts (the hard-dedup equilibrium)
    assert sum(r["weight"] for r in rows.values()) == 4.0
    sq = {
        r["doc_id"]: r["weight"]
        for r in dedup.soft_dedup_weights(_docs(spark), scheme="sqrt").collect()
    }
    assert sq[1] == 1.0 / math.sqrt(2.0) and sq[3] == 1.0


def test_near_dup_exact_finds_planted_pair(spark):
    pairs = dedup.near_dup_pairs_exact(_docs(spark), threshold=0.5).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert by_pair[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in by_pair and 0.5 <= by_pair[(1, 2)] < 1.0  # near-dup
    assert not any(3 in p for p in by_pair)


def test_lsh_matches_exact_on_corpus(spark, sf_dir):
    """LSH (k=8, 4 bands of width 2) must recover the exact scan's pairs on
    the real corpus: its near-dups sit at j>0.8 where the per-pair miss
    probability is (1-j^2)^4 <= 1.7%."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs_exact(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.near_dup_pairs_lsh(docs, threshold=0.5).collect()
    }
    assert lsh <= exact  # exact verification: no false positives ever
    assert len(lsh) >= 0.9 * len(exact)


def test_simhash_exact_dups_collide(spark):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(_docs(spark)).collect()}
    assert fp[1] == fp[4]
    assert 0 <= fp[1] < 2**16


def test_ann_bruteforce_self_similarity(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    top = similarity.ann_topk_bruteforce(emb, query_vec_id=0, k=5).collect()
    assert len(top) == 5
    assert all(-1.0001 <= r["cos_sim"] <= 1.0001 for r in top)
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)
    assert all(r["vec_id"] != 0 for r in top)


def test_ann_lsh_subset_of_bruteforce_ranking(spark, sf_dir):
    """LSH results are genuine cosines (exact on the candidates it finds)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    brute = {r["vec_id"]: r["cos_sim"] for r in
             similarity.ann_topk_bruteforce(emb, query_vec_id=0, k=2000).collect()}
    lsh = similarity.ann_topk_lsh(emb, query_vec_id=0, k=20).collect()
    for r in lsh:
        assert abs(brute[r["vec_id"]] - r["cos_sim"]) < 1e-12


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    out = df.select(dedup.shingles("text").alias("sh")).collect()
    assert out[0]["sh"] == []


def test_cluster_duplicates_transitive(spark):
    """A-B and B-C similar (A-C never compared) must still cluster
    together; D-E separate cluster."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup.cluster_duplicates(pairs).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10


def test_dedup_near_duplicates_end_to_end(spark, sf_dir):
    """Full near-dedup on the corpus: exactly one survivor per near-dup
    cluster, non-duplicated docs untouched."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    pairs = dedup.near_dup_pairs_lsh(docs, threshold=0.5)
    clusters = dedup.cluster_duplicates(pairs)
    n_clustered = clusters.count()
    n_clusters = clusters.select("cluster").distinct().count()
    kept = dedup.dedup_near_duplicates(docs, threshold=0.5)
    assert kept.count() == n_docs - (n_clustered - n_clusters)
    # survivors include every cluster's min doc_id
    from pyspark.sql import functions as F

    keepers = {r["m"] for r in clusters.groupBy("cluster").agg(F.min("doc_id").alias("m")).collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert keepers <= kept_ids


def test_lsh_survives_short_docs(spark):
    """Docs with < n tokens must be skipped, not crash the slice expr."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"), (2, "hi"), (3, ""),
         (4, "the quick brown fox jumps high")],
        ["doc_id", "text"],
    )
    pairs = dedup.near_dup_pairs_lsh(docs, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 4)}


def test_cluster_duplicates_raises_on_nonconvergence(spark):
    import pytest as _pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["doc_a", "doc_b"]
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.cluster_duplicates(chain, max_iterations=2)
    # enough iterations: one cluster
    got = {r["cluster"] for r in dedup.cluster_duplicates(chain, max_iterations=10).collect()}
    assert got == {1}


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    """nprobe = n_lists degrades to exact: identical top-k to brute force."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index, cents = similarity.build_ivf_index(emb, n_lists=8, iterations=1)
    exact = similarity.ann_topk_bruteforce(emb, query_vec_id=0, k=10).collect()
    ivf = similarity.ann_topk_ivf(
        index, cents, query_vec_id=0, k=10, nprobe=8
    ).collect()
    assert [(r["vec_id"], round(r["cos_sim"], 12)) for r in ivf] == [
        (r["vec_id"], round(r["cos_sim"], 12)) for r in exact
    ]


def test_ivf_pruned_probe_scans_fraction_with_recall(spark, sf_dir):
    """nprobe < n_lists scans a strict subset of the corpus and still finds
    a sizable share of the true neighbors (the IVF economics)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    index, cents = similarity.build_ivf_index(emb, n_lists=16, iterations=2)
    # lists materialized: every vector in exactly one list
    assert index.count() == n
    sizes = index.groupBy("list_id").count().collect()
    assert sum(r["count"] for r in sizes) == n
    assert len(sizes) >= 8  # training didn't collapse the space

    probed = index.filter(
        F.col("list_id").isin([r["list_id"] for r in sizes][:4])
    )
    exact_ids = {
        r["vec_id"]
        for r in similarity.ann_topk_bruteforce(emb, query_vec_id=0, k=20).collect()
    }
    ivf_ids = {
        r["vec_id"]
        for r in similarity.ann_topk_ivf(
            index, cents, query_vec_id=0, k=20, nprobe=4
        ).collect()
    }
    recall = len(exact_ids & ivf_ids) / 20
    assert recall >= 0.2, recall


def test_bpe_pretokenizer_segments(spark):
    """GPT-2-style segmentation: contractions split, space-prefixed words,
    digit runs and punctuation runs are separate tokens."""
    from etl_workflows_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "Hello world's 42 fine-tuning!")], ["doc_id", "text"]
    )
    row = df.select(t.bpe_tokens(F.col("text")).alias("tk")).first()
    assert row["tk"] == ["Hello", " world", "'s", " 42", " fine", "-", "tuning", "!"]
    counts = t.token_counts(df).first()
    assert counts["n_bpe_tokens"] == 8 and counts["n_ws_tokens"] == 4


def test_quantized_ann_recall(spark, sf_dir):
    """Top-20 cosine neighbors on int8-dequantized vectors recover >=90%
    of the full-precision neighbors (the storage-scale trade is measured,
    not assumed)."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators import similarity
    from etl_workflows_spark.queries.base import table

    emb = table(spark, sf_dir, "embeddings")
    full = {
        r["vec_id"]
        for r in similarity.ann_topk_bruteforce(emb, query_vec_id=0, k=20).collect()
    }
    q = similarity.quantize_embeddings(emb)
    deq = q.select(
        "vec_id",
        similarity.dequantize(F.col("codes"), F.col("scale")).alias("embedding"),
    )
    approx = {
        r["vec_id"]
        for r in similarity.ann_topk_bruteforce(deq, query_vec_id=0, k=20).collect()
    }
    assert len(full & approx) >= 18


def test_incremental_dedup_against_index(spark):
    """Daily-crawl flow: batch 2 dedups against batch 1's fingerprint
    index without rescanning batch 1; the index anti-join is bucketed
    (shuffle-free on the index side)."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators.dedup import (
        append_fingerprints,
        build_fingerprint_index,
        dedup_incremental,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS didx")
    spark.sql("DROP TABLE IF EXISTS didx.fps")
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    build_fingerprint_index(b1, "didx.fps", n_buckets=4)
    assert spark.table("didx.fps").count() == 2  # distinct texts only

    b2 = spark.createDataFrame(
        [
            (10, "delta epsilon"),        # dup of corpus -> dropped
            (11, "zeta eta theta"),       # new
            (12, "zeta eta theta"),       # within-batch dup -> dropped
            (13, "iota kappa"),           # new
        ],
        ["doc_id", "text"],
    )
    kept = dedup_incremental(b2, "didx.fps")
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 13]

    append_fingerprints(kept, "didx.fps")
    assert spark.table("didx.fps").count() == 4

    # batch 3: everything seen before -> nothing survives
    b3 = spark.createDataFrame(
        [(20, "zeta eta theta"), (21, "alpha beta gamma")], ["doc_id", "text"]
    )
    assert dedup_incremental(b3, "didx.fps").count() == 0


def test_quantize_zero_vector_survives(spark):
    """An all-zero embedding (failed upstream embed call) must quantize to
    zero codes, not kill the job with a divide-by-zero under ANSI mode."""
    from etl_workflows_spark.operators import similarity

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id bigint, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in similarity.quantize_embeddings(emb).collect()}
    assert rows[0]["scale"] == 0.0
    assert rows[0]["codes"] == [0, 0, 0]
    assert rows[1]["codes"] == [64, -127, 32]


def test_semantic_contamination_fast_matches_exact(spark, sf_dir):
    """The shuffle-free matmul path must agree with the relational exact
    twin on ids, flags, and max-cos values (to float tolerance)."""
    from etl_workflows_spark.operators.similarity import (
        semantic_contamination,
        semantic_contamination_fast,
    )
    from etl_workflows_spark.queries.base import table
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("label") != 0)
    bench = emb.filter(F.col("label") == 0)
    exact = {
        r["vec_id"]: r for r in semantic_contamination(corpus, bench, 0.8).collect()
    }
    fast = {
        r["vec_id"]: r
        for r in semantic_contamination_fast(corpus, bench, 0.8).collect()
    }
    assert set(exact) == set(fast) and exact
    for vid, e in exact.items():
        f = fast[vid]
        assert abs(e["max_cos_bench"] - f["max_cos_bench"]) < 1e-9
        assert e["contaminated"] == f["contaminated"]


def test_knn_join_matches_per_query_bruteforce(spark, sf_dir):
    """knn_join's per-query neighbor lists must equal independent
    single-query brute-force top-k for a sample of queries."""
    from etl_workflows_spark.operators.similarity import ann_topk_bruteforce, knn_join
    from etl_workflows_spark.queries.base import table
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("label") == 0)
    corpus = emb.filter(F.col("label") != 0)
    out = knn_join(queries, corpus, k=3)
    by_query = {}
    for r in out.collect():
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    assert by_query and all(len(v) == 3 for v in by_query.values())

    corpus_ids = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    for qid in sorted(by_query)[:3]:
        # single-query path: all-but-self scan, so restrict to corpus ids
        single = [
            r["vec_id"]
            for r in ann_topk_bruteforce(emb, query_vec_id=qid, k=3 + 60)
            .collect()
            if r["vec_id"] in corpus_ids
        ][:3]
        assert [nid for _, nid in sorted(by_query[qid])] == single


def test_mean_pool_embeddings(spark):
    from etl_workflows_spark.operators.similarity import mean_pool_embeddings

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (1, [3.0, 4.0, 5.0]),
            (2, [10.0, 0.0, -2.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    out = {r["doc_id"]: r for r in mean_pool_embeddings(df, "doc_id").collect()}
    assert out[1]["embedding"] == [2.0, 3.0, 4.0] and out[1]["n_chunks"] == 2
    assert out[2]["embedding"] == [10.0, 0.0, -2.0] and out[2]["n_chunks"] == 1


def test_knn_join_fast_matches_exact(spark, sf_dir):
    """The matmul scale path must return the same neighbors/ranks as the
    relational brute-force twin, with BIT-identical cosines (round 9:
    the fast path re-scores its candidates with the exact twin's
    Catalyst expression, so floats share the same fold order)."""
    from etl_workflows_spark.operators.similarity import knn_join, knn_join_fast
    from etl_workflows_spark.queries.base import table
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("label") == 0)
    c = emb.filter(F.col("label") != 0)
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in knn_join(q, c, k=3).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in knn_join_fast(q, c, k=3).collect()
    }
    assert set(exact) == set(fast)
    for key, (nid, cs) in exact.items():
        fnid, fcs = fast[key]
        assert fnid == nid and fcs == cs


def test_multiprobe_improves_recall_over_single_bucket(spark, sf_dir):
    """Hamming-1 probing must recover strictly more of the exact top-k
    than single-bucket LSH on the same index (the whole point of the
    knob), and candidates' cosines stay exact."""
    from etl_workflows_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_indexed,
        ann_topk_multiprobe,
        build_ann_index,
    )
    from etl_workflows_spark.queries.base import table

    emb = table(spark, sf_dir, "embeddings")
    index = build_ann_index(emb, dim=64, n_planes=8).localCheckpoint(eager=True)
    k = 20
    qids = [0, 7, 42]
    single_recall, multi_recall = 0, 0
    for qid in qids:
        exact = {r["vec_id"] for r in ann_topk_bruteforce(emb, qid, k).collect()}
        single = {r["vec_id"] for r in ann_topk_indexed(index, qid, k).collect()}
        multi = {r["vec_id"] for r in ann_topk_multiprobe(index, qid, k).collect()}
        assert single <= multi or len(multi) >= len(single)
        single_recall += len(exact & single)
        multi_recall += len(exact & multi)
    assert multi_recall > single_recall


def test_charlm_separates_text_from_gibberish(spark, sf_dir):
    """Corpus-trained char-bigram LM must score held-out corpus-like text
    above character-shuffled gibberish of the same length distribution."""
    import random

    from etl_workflows_spark.operators.text import charlm_score, charlm_train
    from etl_workflows_spark.queries.base import table

    docs = table(spark, sf_dir, "documents")
    model = charlm_train(docs).localCheckpoint(eager=True)

    sample = [r["text"] for r in docs.limit(20).collect()]
    rng = random.Random(7)
    rows = []
    for i, t in enumerate(sample):
        rows.append((i, t, "real"))
        shuffled = "".join(rng.sample(list(t), len(t)))
        rows.append((1000 + i, shuffled, "gibberish"))
    probe = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    scores = charlm_score(probe, model)
    joined = {r["doc_id"]: r["mean_logp"] for r in scores.collect()}
    real = sum(joined[i] for i in range(20)) / 20
    gib = sum(joined[1000 + i] for i in range(20)) / 20
    assert real > gib + 0.2, (real, gib)


def test_fast_paths_guard_zero_norm_and_empty_sides(spark):
    """Zero-norm vectors must yield cosine 0 (not NaN → silently dropped
    rows), and an empty collected side must raise a clear error instead of
    crashing in numpy (round-3 advice)."""
    import pytest
    from etl_workflows_spark.operators.similarity import (
        knn_join_fast,
        semantic_contamination_fast,
    )

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_contamination_fast(corpus, bench, 0.8).collect()
    }
    # zero vector: cosine 0 to everything, present and uncontaminated
    assert rows[1]["max_cos_bench"] == 0.0 and not rows[1]["contaminated"]
    assert rows[2]["contaminated"]

    empty = bench.limit(0)
    with pytest.raises(ValueError, match="empty"):
        semantic_contamination_fast(corpus, empty, 0.8)
    with pytest.raises(ValueError, match="empty"):
        knn_join_fast(empty, corpus, k=2)
    # zero-norm queries don't NaN-poison the top-k
    out = knn_join_fast(
        spark.createDataFrame(
            [(10, [0.0, 0.0, 0.0])], "vec_id bigint, embedding array<double>"
        ),
        corpus,
        k=2,
    ).collect()
    assert len(out) == 2 and all(r["cos_sim"] == 0.0 for r in out)


def test_ivf_persisted_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted IVF index must turn an nprobe query into a
    partition-PRUNED scan: PartitionFilters on list_id in the probe plan,
    and only the probed lists' files read. Round-trip must preserve the
    index contents and query results."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index, cents = similarity.build_ivf_index(emb, n_lists=8, iterations=1)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(index, cents, path)
    lists, cents2 = similarity.read_ivf_index(spark, path)

    # round-trip fidelity
    assert cents2 == [[float(x) for x in c] for c in cents]
    assert lists.count() == index.count()

    got = similarity.ann_topk_ivf(lists, cents2, query_vec_id=0, k=10, nprobe=2)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the probe filter must reach the file listing, not a post-scan Filter
    assert "PartitionFilters" in plan
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*list_id[^\]]*)\]", plan)
    assert m, plan
    # results equal the in-memory index's at the same nprobe
    mem = similarity.ann_topk_ivf(index, cents, query_vec_id=0, k=10, nprobe=2)
    assert [(r["vec_id"], round(r["cos_sim"], 10)) for r in got.collect()] == [
        (r["vec_id"], round(r["cos_sim"], 10)) for r in mem.collect()
    ]


def test_ivf_append_extends_persisted_index(spark, sf_dir, tmp_path):
    """Incremental IVF maintenance: new vectors assigned against the
    frozen centroids land in the right partitions; a re-read index serves
    them, and untouched partitions' files are not rewritten."""
    import os

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = emb.filter(F.col("vec_id") < 400)
    rest = emb.filter(F.col("vec_id") >= 400)
    index, cents = similarity.build_ivf_index(first, n_lists=8, iterations=1)
    path = str(tmp_path / "ivf_inc")
    similarity.write_ivf_index(index, cents, path)

    def files():
        out = {}
        for d in os.listdir(f"{path}/lists"):
            if d.startswith("list_id="):
                out[d] = sorted(os.listdir(f"{path}/lists/{d}"))
        return out

    before = files()
    similarity.ivf_append(rest, path)
    after = files()
    # every pre-existing file survives byte-for-byte-name-identical
    for d, fs in before.items():
        assert set(fs) <= set(after.get(d, [])), d

    lists, cents2 = similarity.read_ivf_index(spark, path)
    assert cents2 == [[float(x) for x in c] for c in cents]  # frozen
    assert lists.count() == emb.count()
    # appended vectors share their list with what frozen assignment says
    expect = similarity.ivf_assign(rest, cents)
    got = lists.filter(F.col("vec_id") >= 400).select("vec_id", "list_id")
    exp = expect.select("vec_id", "list_id")
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in exp.collect()
    }
    # and the index remains queryable end-to-end over the union
    res = similarity.ann_topk_ivf(lists, cents2, query_vec_id=450, k=5, nprobe=8)
    assert res.count() == 5


def test_word_bigram_lm_separates_typical_from_atypical(spark):
    """On a corpus with real bigram concentration (Markov-templated
    sentences), corpus-typical phrasing must out-score word salad under
    the corpus-trained conditional bigram LM. (A structureless random
    corpus has flat conditionals and CANNOT be separated this way —
    that's the charlm/novelty gates' job, documented in the operator.)
    """
    import random

    from etl_workflows_spark.operators.text import word_bigram_lm_scores

    rng = random.Random(3)
    templates = [
        "the cat sat on the mat",
        "the dog ran in the park",
        "a bird flew over the house",
        "the cat ran in the house",
        "a dog sat on the grass",
    ]
    rows = [
        (i, " ".join(rng.choice(templates) for _ in range(5)))
        for i in range(200)
    ]
    rows.append((900001, "the cat sat on the mat the dog ran in the park"))
    rows.append((900002, "zzq qqz xqx jjzz vvqk wkx zzq plor mnxx trz wkx"))
    probe = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {
        r["doc_id"]: r
        for r in word_bigram_lm_scores(probe).collect()
        if r["doc_id"] in (900001, 900002)
    }
    assert scores[900001]["perplexity"] < scores[900002]["perplexity"], scores
    assert scores[900001]["n_bigrams"] == 11
    short = spark.createDataFrame(
        [(1, "solo")], "doc_id long, text string"
    )
    assert word_bigram_lm_scores(short).count() == 0  # <2 tokens: absent


def test_multitable_improves_recall_over_one_table(spark, sf_dir):
    """L independent tables must recover strictly more of the exact
    top-k than a single table with the same per-table probe budget
    (recall 1-(1-r)^L), and a 1-table multitable query must equal the
    single-table multiprobe result exactly (same planes, same probes)."""
    from etl_workflows_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_multiprobe,
        ann_topk_multitable,
        build_ann_index,
        build_ann_index_multi,
    )
    from etl_workflows_spark.queries.base import table

    emb = table(spark, sf_dir, "embeddings")
    mt4 = build_ann_index_multi(emb, dim=64, n_planes=8, n_tables=4)
    mt4 = mt4.localCheckpoint(eager=True)
    mt1 = mt4.filter("table_id = 0")
    single = build_ann_index(emb, dim=64, n_planes=8).localCheckpoint(
        eager=True
    )
    k = 20
    one_recall, four_recall = 0, 0
    for qid in (0, 7, 42):
        exact = {
            r["vec_id"] for r in ann_topk_bruteforce(emb, qid, k).collect()
        }
        one = [
            (r["vec_id"], round(r["cos_sim"], 9))
            for r in ann_topk_multitable(mt1, qid, k).collect()
        ]
        four = {
            r["vec_id"] for r in ann_topk_multitable(mt4, qid, k).collect()
        }
        # table 0 uses planes 0..7 — identical to the single-table index,
        # so 1-table multitable == multiprobe row-for-row
        probe = [
            (r["vec_id"], round(r["cos_sim"], 9))
            for r in ann_topk_multiprobe(single, qid, k).collect()
        ]
        assert one == probe
        one_recall += len(exact & {v for v, _ in one})
        four_recall += len(exact & four)
    assert four_recall > one_recall


def test_multitable_batch_matches_per_query(spark, sf_dir):
    """One-pass batch form must return row-for-row the per-query
    multitable results (same parity contract as the bruteforce/IVF/PQ
    batch shapes)."""
    from etl_workflows_spark.operators.similarity import (
        ann_topk_multitable,
        ann_topk_multitable_batch,
        build_ann_index_multi,
    )
    from etl_workflows_spark.queries.base import table

    emb = table(spark, sf_dir, "embeddings")
    index = build_ann_index_multi(
        emb, dim=64, n_planes=8, n_tables=3
    ).localCheckpoint(eager=True)
    qids = [0, 7, 42]
    batch = {}
    for r in ann_topk_multitable_batch(index, qids, k=10).collect():
        batch.setdefault(r["query_vec_id"], []).append(
            (r["vec_id"], round(r["cos_sim"], 9))
        )
    assert set(batch) <= set(qids)
    for qid in qids:
        single = [
            (r["vec_id"], round(r["cos_sim"], 9))
            for r in ann_topk_multitable(index, qid, k=10).collect()
        ]
        assert batch.get(qid, []) == single


def test_knn_join_fast_query_side_contract_enforced(spark, monkeypatch):
    """The driver-collect contract is enforced, not just documented:
    oversized / NULL-id / duplicate-id query sides raise with a pointer
    at the distributed twin (round-10 ADVICE + verdict #5)."""
    import pytest
    import etl_workflows_spark.operators.similarity as sim

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    monkeypatch.setattr(sim, "_KNN_FAST_MAX_QUERIES", 3)
    big = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="knn_join"):
        sim.knn_join_fast(big, corpus, k=1)
    nullid = spark.createDataFrame(
        [(None, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="non-null"):
        sim.knn_join_fast(nullid, corpus, k=1)
    dupid = spark.createDataFrame(
        [(7, [1.0, 0.0]), (7, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="unique"):
        sim.knn_join_fast(dupid, corpus, k=1)


def test_knn_join_fast_null_neighbor_ids_no_typeerror(spark):
    """NULL neighbor ids must not TypeError inside the kernel sorts; the
    NaN-cap keeps NULL-first order (Spark ASC NULLS FIRST parity)."""
    from etl_workflows_spark.operators.similarity import knn_join_fast

    # NaN query → every sim NaN → the kk-cap sort runs over ALL corpus
    # ids, including the NULL one. The NULL row is deliberately NOT
    # first in batch order: a nullable int64 id column reaches pandas as
    # float64 with NaN, and a naive None-check key would let the NaN
    # poison the sort and silently drop this row from the cap.
    corpus = spark.createDataFrame(
        [(5, [1.0, 0.0]), (3, [0.0, 1.0]), (None, [1.0, 1.0]), (2, [0.5, 1.0])],
        "vec_id bigint, embedding array<double>",
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(10, [float("nan"), 1.0])], "vec_id bigint, embedding array<double>"
    )
    out = sorted(knn_join_fast(queries, corpus, k=2).collect(),
                 key=lambda r: r["rank"])
    assert len(out) == 2
    # all cosines are NaN (a true tie) → ranked purely by id, NULLS
    # FIRST: the NULL row wins rank 1 and id 2 takes rank 2, exactly
    # what knn_join's window (cos_sim DESC, neighbor_id ASC) produces
    assert out[0]["neighbor_id"] is None, out
    assert out[1]["neighbor_id"] == 2, out
