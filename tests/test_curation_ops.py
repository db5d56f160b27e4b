"""Per-group frequency cap + bigram collocations: determinism and
growth-stability contracts."""

from pyspark.sql import functions as F

from etl_workflows_spark.operators.sampling import cap_per_group
from etl_workflows_spark.operators.text import bigram_collocations
from etl_workflows_spark.queries.base import table


def test_cap_per_group_binds_and_is_stable(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "source", 5)
    per_src = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_src and all(n <= 5 for n in per_src.values())
    # deterministic: identical kept set on re-run
    a = {r["doc_id"] for r in capped.select("doc_id").collect()}
    b = {r["doc_id"] for r in cap_per_group(docs, "source", 5).select("doc_id").collect()}
    assert a == b


def test_cap_per_group_growth_stability(spark):
    """Adding new rows must never evict a previously kept row unless the
    new row hashes ahead of it — kept sets only shrink by displacement,
    and rows that remain in the top-n stay kept."""
    base = spark.createDataFrame(
        [(i, "g") for i in range(20)], "doc_id long, source string"
    )
    grown = spark.createDataFrame(
        [(i, "g") for i in range(40)], "doc_id long, source string"
    )
    keep_base = {r["doc_id"] for r in cap_per_group(base, "source", 5).collect()}
    keep_grown = {r["doc_id"] for r in cap_per_group(grown, "source", 5).collect()}
    # hash order is a pure function of doc_id: the grown corpus's top-5
    # restricted to old ids must be a subset of the old top-5
    assert keep_grown & set(range(20)) <= keep_base


def test_bigram_collocations_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y"), (3, "a b")],
        "doc_id long, text string",
    )
    out = {r["bigram"]: r for r in bigram_collocations(docs, min_count=2).collect()}
    # "a b" occurs 4x (2 in doc1, 1 each in docs 2,3); everything else < 2
    assert set(out) == {"a b"}
    r = out["a b"]
    assert r["c_xy"] == 4
    assert r["c_x"] == 4  # 'a': 2 in doc1, 1 each in docs 2 and 3
    assert r["c_y"] == 4
    # lift = c_xy * nu^2 / (c_x * c_y * nb): nu=11 tokens, nb=8 bigrams
    assert abs(r["lift"] - (4 * 11 * 11) / (4 * 4 * 8)) < 1e-12


# --- remove_boilerplate_lines ----------------------------------------------


def test_boilerplate_lines_removed_across_docs(spark):
    from etl_workflows_spark.operators.text import remove_boilerplate_lines

    cookie = "accept all cookies"
    rows = [
        (1, f"{cookie}\nunique alpha\nmore alpha"),
        (2, f"{cookie}\nunique beta"),
        (3, f"{cookie}\nunique gamma"),
        (4, "no boilerplate here"),
        (5, f"{cookie}"),  # whole doc is boilerplate → empty survivor
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert got == {
        1: "unique alpha\nmore alpha",
        2: "unique beta",
        3: "unique gamma",
        4: "no boilerplate here",
        5: "",
    }


def test_boilerplate_respects_min_docs_and_counts_docs_not_lines(spark):
    from etl_workflows_spark.operators.text import remove_boilerplate_lines

    # the repeated line appears 3 times but in only TWO distinct docs —
    # under min_docs=3 it must survive (C4 counts documents)
    rows = [(1, "dup\ndup\nown one"), (2, "dup\nown two"), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert got[1] == "dup\ndup\nown one"
    got2 = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(df, min_docs=2).collect()
    }
    assert got2 == {1: "own one", 2: "own two", 3: "solo"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(df, min_docs=1)


def test_boilerplate_custom_separator_and_order(spark):
    from etl_workflows_spark.operators.text import remove_boilerplate_lines

    rows = [(1, "keep.z common.a keep"), (2, "z common"), (3, "z common.tail")]
    # sep='.' exercises regex escaping; order of surviving lines preserved
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(df, min_docs=3, sep=".").collect()
    }
    assert got[1] == "keep.a keep"  # middle boilerplate line excised


# --- corpus_diff / quantile_normalize --------------------------------------


def test_corpus_diff_statuses(spark):
    from etl_workflows_spark.operators.snapshot import corpus_diff, diff_summary

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    summary = {
        r["status"]: r["n_docs"]
        for r in diff_summary(corpus_diff(old, new)).collect()
    }
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_quantile_normalize_per_group_and_ties(spark):
    from etl_workflows_spark.operators.text import quantile_normalize

    rows = [
        (1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "a", 30), (5, "a", 50),
        (6, "b", 1000),  # single-row group → rank 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        r["doc_id"]: r["q_norm"]
        for r in quantile_normalize(df, "n_chars", "source").collect()
    }
    assert got[1] == 0.0 and got[5] == 1.0
    assert got[3] == got[4] == 0.5  # ties share a rank
    assert got[6] == 0.0
    # different groups are ranked independently of each other's scale
    assert got[2] == 0.25


# --- containment / canary / drift ------------------------------------------


def test_containment_catches_doc_inside_doc(spark):
    from etl_workflows_spark.operators.dedup import (
        containment_pairs_exact,
        near_dup_pairs_exact,
    )

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally different words here now")],
        "doc_id long, text string",
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs_exact(df, threshold=0.8).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0  # short fully inside long
    assert (2, 1) not in cont  # not symmetric: long is NOT inside short
    # Jaccard at the same bar misses the pair entirely
    jac = near_dup_pairs_exact(df, threshold=0.8).collect()
    assert not any(
        {r["doc_a"], r["doc_b"]} == {1, 2} for r in jac
    )


def test_canary_scan_hits_and_validation(spark):
    from etl_workflows_spark.operators.decontam import canary_scan

    df = spark.createDataFrame(
        [
            (1, "the secret canary CANARY-123 lives here"),
            (2, "clean document"),
            (3, "two markers: CANARY-123 and EVAL-MARK-9"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["canary"])
        for r in canary_scan(df, ["CANARY-123", "EVAL-MARK-9"]).collect()
    }
    assert got == {(1, "CANARY-123"), (3, "CANARY-123"), (3, "EVAL-MARK-9")}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        canary_scan(df, [])


def test_distribution_drift_ranks_moved_tokens(spark):
    from etl_workflows_spark.operators.text import distribution_drift

    old = spark.createDataFrame(
        [(i, "stable stable drifted") for i in range(20)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, "stable stable newcomer") for i in range(20)],
        "doc_id long, text string",
    )
    rows = distribution_drift(old, new, top=3).collect()
    top_tokens = [r["token"] for r in rows]
    # the vanished and the new token both outrank the stable one
    assert set(top_tokens[:2]) == {"drifted", "newcomer"}
    assert rows[0]["drift"] == rows[1]["drift"]  # symmetric move
    stable = [r for r in rows if r["token"] == "stable"]
    assert not stable or stable[0]["drift"] == 0.0
