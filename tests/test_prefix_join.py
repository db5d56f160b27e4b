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


def test_cross_split_leakage_detects_planted_leak(spark):
    from etl_workflows_spark.operators.dedup import cross_split_leakage

    leak = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [(1, leak), (2, "totally different train words here okay")]
        + [(10 + i, f"noise{i} filler{i} words{i} only{i} here{i}") for i in range(20)],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(100, leak + " iota"),  # near-dup of train doc 1
         (101, "clean eval document nothing shared at all")],
        "doc_id long, text string",
    )
    got = cross_split_leakage(train, evald, threshold=0.5)
    rows = got.collect()
    assert {(r["eval_id"], r["train_id"]) for r in rows} == {(100, 1)}
    assert all(r["jaccard"] >= 0.5 for r in rows)
    # matches the exact bipartite ground truth computed naively
    from etl_workflows_spark.operators.dedup import _shingled, jaccard_from_sizes
    from pyspark.sql import functions as F

    ts = _shingled(train, "text", 3, hashed=True)
    es = _shingled(evald, "text", 3, hashed=True)
    naive = (
        es.alias("e").crossJoin(ts.alias("t"))
        .select(
            F.col("e.doc_id").alias("eval_id"),
            F.col("t.doc_id").alias("train_id"),
            jaccard_from_sizes(
                F.size(F.array_intersect("e.sh", "t.sh")),
                F.size("e.sh"),
                F.size("t.sh"),
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.5)
    )
    assert {(r["eval_id"], r["train_id"]) for r in naive.collect()} == {
        (r["eval_id"], r["train_id"]) for r in rows
    }


def test_cross_split_leakage_clean_split_is_empty(spark):
    from etl_workflows_spark.operators.dedup import cross_split_leakage

    train = spark.createDataFrame(
        [(i, f"tr{i}a tr{i}b tr{i}c tr{i}d tr{i}e") for i in range(15)],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(100 + i, f"ev{i}a ev{i}b ev{i}c ev{i}d ev{i}e") for i in range(5)],
        "doc_id long, text string",
    )
    assert cross_split_leakage(train, evald, threshold=0.5).count() == 0


def test_containment_prefix_equals_exact(spark, sf_dir):
    from etl_workflows_spark.operators.dedup import (
        containment_pairs_exact,
        containment_pairs_prefix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.5, 0.8):
        exact = {
            (r["doc_a"], r["doc_b"], round(r["containment"], 9))
            for r in containment_pairs_exact(docs, t).collect()
        }
        fast = {
            (r["doc_a"], r["doc_b"], round(r["containment"], 9))
            for r in containment_pairs_prefix(docs, t).collect()
        }
        assert fast == exact
        assert len(exact) > 0  # planted near-dups contain each other


def test_containment_prefix_finds_doc_inside_doc(spark):
    from etl_workflows_spark.operators.dedup import containment_pairs_prefix

    inner = "a quick brown fox jumped over the extremely lazy sleeping dog"
    outer = ("intro paragraph words here then " + inner
             + " and a long closing that dilutes jaccard far below half")
    rows = [(1, inner), (2, outer), (3, "entirely unrelated content words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in containment_pairs_prefix(df, 0.9).collect()
    }
    assert (1, 2) in got       # inner ⊂ outer
    assert (2, 1) not in got   # not symmetric


def test_bloom_preverify_bound_is_exact_safe(spark):
    """popcount(sig_a XOR sig_b) must NEVER exceed |A Δ B| — the bound
    the pre-verify rejects on. Checked exhaustively over random pairs."""
    import random

    from etl_workflows_spark.operators.dedup import _bloom_sig, _xor_popcount

    rng = random.Random(7)
    rows = []
    universe = [rng.getrandbits(63) - 2**62 for _ in range(400)]
    for i in range(60):
        a = rng.sample(universe, rng.randint(1, 120))
        b = rng.sample(universe, rng.randint(1, 120))
        rows.append((i, a, b, len(set(a) ^ set(b))))
    df = spark.createDataFrame(
        rows, "id int, a array<bigint>, b array<bigint>, d int"
    ).select(
        "id",
        "d",
        _bloom_sig("a").alias("sa"),
        _bloom_sig("b").alias("sb"),
    )
    bad = df.filter(_xor_popcount("sa", "sb") > F.col("d")).count()
    assert bad == 0


def test_bloom_preverify_actually_cuts_candidates(spark):
    """Docs engineered so the prefix filter CANNOT prune (every pair
    shares a rare shingle) but almost no pair passes t=0.8: the
    signature filter must reject most candidates before the full
    verify, and the survivors must still contain every true pair."""
    from etl_workflows_spark.operators.dedup import (
        _prefix_candidates,
        _shingled,
        _signature_preverify,
        near_dup_pairs_exact,
    )

    # 30 docs where every pair (i, j) shares one 3-token block (so the
    # shared shingles have global frequency exactly 2 — the rarest tier,
    # which the value tie-break scatters into prefixes) but any two docs
    # are ~2% Jaccard: the prefix filter keeps many spurious candidates
    # that the signature filter must reject. Plus one true pair 100/101.
    def text(i):
        parts = []
        for j in range(30):
            if j == i:
                continue
            lo, hi = min(i, j), max(i, j)
            parts.append(f"a{lo}x{hi} b{lo}x{hi} c{lo}x{hi} s s")
        return " ".join(parts)

    rows = [(i, text(i)) for i in range(30)]
    base = " ".join(f"shared{j}" for j in range(40))
    rows += [(100, base), (101, base + " tail")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _shingled(docs, "text", 3, hashed=True)
    cands = _prefix_candidates(sh, 0.8)
    survivors = _signature_preverify(sh, cands, 0.8)
    n_c, n_s = cands.count(), survivors.count()
    assert n_c >= 20, n_c  # the prefix filter alone can't prune these
    assert n_s <= n_c / 3, (n_c, n_s)  # the signature filter can
    true_pairs = _pairs(near_dup_pairs_exact(docs, threshold=0.8))
    assert true_pairs <= _pairs(survivors)  # and it never drops a real pair


def test_cms_and_exact_order_produce_identical_pairs(spark, sf_dir):
    """Round-6: the CMS-ordered scale path and the exact-frequency path
    are the SAME operator — any shared total order satisfies the prefix
    theorem, so verified output is byte-identical; only candidate counts
    may differ."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.5, 0.8):
        cms = _pairs(near_dup_pairs_prefix(docs, threshold=t, order="cms"))
        ex = _pairs(near_dup_pairs_prefix(docs, threshold=t, order="exact"))
        assert cms == ex, f"threshold {t}"


def test_inline_sig_filter_is_exact_safe(spark, sf_dir):
    """The with_sig candidate set must contain every verified pair (the
    popcount bound only ever removes non-pairs) and must not exceed the
    unfiltered candidate set."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = _shingled(docs, "text", 3, hashed=True)
    plain = _pairs(_prefix_candidates(sh, 0.8, order="cms"))
    sig = _pairs(_prefix_candidates(sh, 0.8, order="cms", with_sig=True))
    assert sig <= plain
    truth = _pairs(near_dup_pairs_exact(docs, threshold=0.8))
    assert truth <= sig


def test_with_sig_requires_cms_order(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = _shingled(docs, "text", 3, hashed=True)
    with pytest.raises(ValueError):
        _prefix_candidates(sh, 0.8, order="exact", with_sig=True)


def test_containment_hashed_cms_matches_unhashed_exact(spark, sf_dir):
    """Round-6: the hashed containment path (CMS-ordered full postings)
    must emit the same (doc_a, doc_b) pairs as the unhashed
    exact-frequency path — the total order changed, the theorem didn't;
    only 64-bit shingle-hash collisions could differ, absent on this
    corpus."""
    from etl_workflows_spark.operators.dedup import containment_pairs_prefix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(400)
    unhashed = _pairs(containment_pairs_prefix(docs, threshold=0.8))
    hashed = _pairs(
        containment_pairs_prefix(docs, threshold=0.8, hashed=True)
    )
    assert hashed == unhashed
