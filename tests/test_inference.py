"""Inference batching plumbing (operators/inference.py): every doc scored
exactly once, token-budget batch shapes, measured padding-efficiency win
from length sorting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.inference import (
    padding_efficiency,
    score_documents,
    stub_model,
)


def _docs(spark):
    # lengths 1..40 words, deliberately interleaved (worst case unsorted)
    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 17) % 40 + 1)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(2)


def test_every_doc_scored_once_deterministically(spark):
    d = _docs(spark)
    out = score_documents(d, max_batch_tokens=64).cache()
    try:
        assert out.count() == 200
        assert out.select("doc_id").distinct().count() == 200
        # scores are the stub's pure function of text — pin one
        row = out.filter("doc_id = 0").collect()[0]
        assert row["score"] == pytest.approx(stub_model(["w0"])[0])
        assert row["n_tokens"] == 1
        # rerun is bit-identical
        again = {
            r["doc_id"]: r["score"]
            for r in score_documents(d, max_batch_tokens=64).collect()
        }
        assert all(
            again[r["doc_id"]] == r["score"] for r in out.collect()
        )
    finally:
        out.unpersist()


def test_batches_respect_token_budget(spark):
    out = score_documents(_docs(spark), max_batch_tokens=64).collect()
    for r in out:
        # a multi-row batch never exceeds the budget in REAL tokens;
        # only an oversized singleton may
        if r["batch_rows"] > 1:
            assert r["batch_real_tokens"] <= 64, r
        assert r["batch_padded_tokens"] >= r["batch_real_tokens"]


def test_oversized_doc_gets_singleton_batch(spark):
    d = spark.createDataFrame(
        [(1, " ".join(["x"] * 500)), (2, "short doc")], ["doc_id", "text"]
    ).coalesce(1)
    out = {r["doc_id"]: r for r in score_documents(d, max_batch_tokens=64).collect()}
    assert out[1]["batch_rows"] == 1
    assert out[1]["n_tokens"] == 500


def test_length_sorting_improves_padding_efficiency(spark):
    d = _docs(spark)
    eff_sorted = padding_efficiency(
        score_documents(d, max_batch_tokens=64, sort_by_length=True)
    )
    eff_unsorted = padding_efficiency(
        score_documents(d, max_batch_tokens=64, sort_by_length=False)
    )
    assert eff_sorted > eff_unsorted + 0.1, (eff_sorted, eff_unsorted)
    assert eff_sorted > 0.9


def test_strict_mode_requires_real_model(spark):
    d = _docs(spark)
    with pytest.raises(NotImplementedError, match="no ML runtime"):
        score_documents(d, strict=True)
    # a supplied model_fn satisfies strict mode
    out = score_documents(
        d.limit(5), strict=True, model_fn=lambda ts: [0.5] * len(ts)
    )
    assert {r["score"] for r in out.collect()} == {0.5}


def test_real_logistic_kernel_parity_with_inplan_scoring(spark, sf_dir):
    """The numpy model_fn (quality_logistic_model_fn) must reproduce the
    in-plan closed-form sigmoid (classifier.score_quality) from the SAME
    fitted parameters — the batched path is then a real-model scorer,
    not just batch shaping."""
    import os

    from etl_workflows_spark.operators.classifier import (
        quality_features,
        score_quality,
        train_quality_model,
        weak_labels,
    )
    from etl_workflows_spark.operators.inference import (
        fitted_quality_model_fn,
    )

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .limit(300)
    )
    labeled = weak_labels(quality_features(docs))
    model = train_quality_model(labeled)
    inplan = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(model, quality_features(docs)).collect()
    }
    batched = {
        r["doc_id"]: r["score"]
        for r in score_documents(
            docs, max_batch_tokens=512, model_fn=fitted_quality_model_fn(model)
        ).collect()
    }
    assert set(batched) == set(inplan)
    worst = max(abs(batched[k] - inplan[k]) for k in inplan)
    assert worst < 1e-9, worst


def test_padding_win_holds_under_real_kernel(spark):
    """Length-sorted batching's padding-efficiency win must survive a
    model_fn that actually computes (the win is a property of batch
    SHAPE, not of the stub)."""
    from etl_workflows_spark.operators.inference import (
        FIXED_QUALITY_PARAMS,
        quality_logistic_model_fn,
    )

    fn = quality_logistic_model_fn(**FIXED_QUALITY_PARAMS)
    d = _docs(spark)
    sorted_eff = padding_efficiency(
        score_documents(d, max_batch_tokens=64, model_fn=fn)
    )
    unsorted_eff = padding_efficiency(
        score_documents(
            d, max_batch_tokens=64, model_fn=fn, sort_by_length=False
        )
    )
    assert sorted_eff > unsorted_eff
    assert sorted_eff > 0.9


def test_quantized_kernel_bit_exact_with_inplan_scoring(spark, sf_dir):
    """The integer-quantized batched kernel (round 9) must reproduce the
    in-plan score_quality_quantized margins EXACTLY — no tolerance: both
    paths compute the same frozen-integer dot product, so any difference
    is a feature-semantics drift between the Python kernel and the
    Catalyst expressions."""
    from etl_workflows_spark.operators.classifier import score_quality_quantized
    from etl_workflows_spark.operators.inference import (
        quantized_margin_model_fn,
        score_documents,
    )
    from etl_workflows_spark.queries.base import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    inplan = {
        r["doc_id"]: r["q_margin"]
        for r in score_quality_quantized(docs).collect()
    }
    batched = {
        r["doc_id"]: int(r["score"])
        for r in score_documents(
            docs, max_batch_tokens=512, model_fn=quantized_margin_model_fn()
        ).collect()
    }
    assert batched == inplan
