"""DSIR importance resampling (operators/dsir.py): the weights must
actually separate target-like from non-target-like text, handle
degenerate inputs, and stay deterministic."""

from __future__ import annotations

import pytest

from etl_workflows_spark.operators import dsir


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_weights_prefer_target_distribution(spark):
    # corpus: half "english-ish" token distribution, half disjoint tokens;
    # target drawn from the english-ish side only
    en = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    zz = [(100 + i, "zorp blick quux flarn grexx mibble wump zind") for i in range(10)]
    corpus = _docs(spark, en + zz)
    target = _docs(spark, [(1000 + i, "the quick brown fox and the lazy dog") for i in range(5)])
    w = {r["doc_id"]: r["weight_fp"] for r in dsir.dsir_weights(corpus, target).collect()}
    assert min(w[i] for i, _ in en) > max(w[i] for i, _ in zz)


def test_select_returns_budget_in_weight_order(spark):
    en = [(i, "alpha beta gamma delta") for i in range(5)]
    zz = [(10 + i, "xx yy zz ww") for i in range(5)]
    corpus = _docs(spark, en + zz)
    target = _docs(spark, [(100, "alpha beta gamma")])
    got = dsir.dsir_select(corpus, target, budget=5)
    ids = [r["doc_id"] for r in got.collect()]
    assert sorted(ids) == [0, 1, 2, 3, 4]
    assert len(got.columns) == 2
    with pytest.raises(ValueError):
        dsir.dsir_select(corpus, target, budget=-1)


def test_single_token_and_empty_target(spark):
    corpus = _docs(spark, [(1, "solo"), (2, "a b")])
    # single-token doc: 1 unigram, 0 bigrams
    w = {
        r["doc_id"]: r["n_grams"]
        for r in dsir.dsir_weights(corpus, _docs(spark, [(9, "a b")])).collect()
    }
    assert w == {1: 1, 2: 3}
    # empty target: model degrades to -log p_raw smoothing; must not crash
    empty = _docs(spark, [(9, "x")]).filter("doc_id < 0")
    out = dsir.dsir_weights(corpus, empty).collect()
    assert len(out) == 2


def test_weights_deterministic_across_runs(spark, sf_dir):
    from etl_workflows_spark.queries.llm import dsir_weights_docs

    a = sorted(map(tuple, dsir_weights_docs(spark, sf_dir).collect()))
    b = sorted(map(tuple, dsir_weights_docs(spark, sf_dir).collect()))
    assert a == b


def test_catalog_weights_separate_languages(spark, sf_dir):
    """The en-target catalog entry must rank English documents above
    Chinese ones on mean per-gram weight — the selection signal is real,
    not just deterministic noise."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.queries.base import table
    from etl_workflows_spark.queries.llm import dsir_weights_docs

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = dsir_weights_docs(spark, sf_dir).join(docs, "doc_id")
    means = {
        r["lang"]: r["m"]
        for r in w.groupBy("lang")
        .agg(F.avg(F.col("weight_fp") / F.greatest("n_grams", F.lit(1))).alias("m"))
        .collect()
    }
    assert means["en"] > means["zh"]
    assert means["en"] > means["de"]


def test_pipeline_curation_v3_stages_compose(spark, sf_dir):
    """End-to-end pipeline: output is exactly the DSIR top-150 of the
    deduped+gated survivors, all selected docs pass the gate, and no
    exact-duplicate text survives selection."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.queries.base import table
    from etl_workflows_spark.queries.llm import pipeline_curation_v3

    out = pipeline_curation_v3(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 150
    assert out.columns == ["doc_id", "weight_fp", "lang", "source"]
    ids = [r["doc_id"] for r in rows]
    docs = table(spark, sf_dir, "documents")
    sel_docs = docs.join(
        spark.createDataFrame([(i,) for i in ids], ["doc_id"]), "doc_id"
    )
    # no two selected docs share a text
    assert sel_docs.select("text").distinct().count() == 150
    # en-target selection must ENRICH English vs the corpus base rate
    # (the synthetic corpus shares vocabulary across langs, so the
    # signal is enrichment, not exclusivity)
    n_en = sel_docs.filter(F.col("lang") == "en").count()
    base_rate = docs.filter(F.col("lang") == "en").count() / docs.count()
    assert n_en / 150 > base_rate + 0.05


def test_weights_within_matches_two_corpus_form(spark):
    """The one-pass tagged model must reproduce dsir_weights(corpus,
    corpus.filter(pred)) bit-for-bit — target ⊆ corpus means no
    target-only buckets, so the full-join and tagged counts agree."""
    from pyspark.sql import functions as F

    rows = (
        [(i, "the quick brown fox jumps the dog", "en") for i in range(8)]
        + [(50 + i, "zorp blick quux flarn wump", "zz") for i in range(8)]
        + [(90, None, "en"), (91, "", "zz")]  # degenerate texts survive both paths
    )
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    two_corpus = {
        (r.doc_id, r.weight_fp, r.n_grams)
        for r in dsir.dsir_weights(
            corpus, corpus.filter(F.col("lang") == "en")
        ).collect()
    }
    tagged = {
        (r.doc_id, r.weight_fp, r.n_grams)
        for r in dsir.dsir_weights_within(
            corpus, F.col("lang") == "en"
        ).collect()
    }
    assert tagged == two_corpus
