"""Model-based document quality filtering (the CCNet / RefinedWeb /
Gopher-family pattern): heuristic rules bootstrap WEAK labels, a linear
classifier trained on those labels generalizes them into a calibrated
per-document quality probability, and the corpus is filtered by
probability threshold instead of hand-tuned rule cutoffs.

Spark-first shape: feature engineering is pure Catalyst expressions
(the same signal helpers the heuristic scores use — no Python per row),
training is ``pyspark.ml`` LogisticRegression (L-BFGS over
map-side-reduced gradient aggregates: O(iterations) corpus passes, each
one a treeAggregate — the distributed-ML cost model), and scoring is a
JVM ``model.transform`` — the whole pipeline ships zero row-at-a-time
Python.

The classifier is deliberately linear: at 100 TB the score must be
cheap (one dot product per doc), auditable (weights name their
features), and trainable on a sample then applied to the full corpus —
exactly how production quality filters are run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from etl_workflows_spark.operators.text import (
    distinct_token_count,
    stopword_count,
    token_count,
)

FEATURES = [
    "f_log_tokens",
    "f_uniq_ratio",
    "f_stop_ratio",
    "f_avg_token_len",
    "f_digit_ratio",
    "f_caps_ratio",
]


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the six quality feature columns — one codegen projection,
    NULL-free (guards for empty docs) so the assembler never drops rows."""
    t = F.col(text_col)
    n_tok = F.greatest(token_count(t), F.lit(1)).cast("double")
    n_chars = F.greatest(F.length(t), F.lit(1)).cast("double")
    return docs.select(
        "*",
        F.log1p(token_count(t).cast("double")).alias("f_log_tokens"),
        (distinct_token_count(t) / n_tok).alias("f_uniq_ratio"),
        (stopword_count(t) / n_tok).alias("f_stop_ratio"),
        (n_chars / n_tok).alias("f_avg_token_len"),
        (
            F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars
        ).alias("f_digit_ratio"),
        (
            F.length(F.regexp_replace(t, r"[^A-Z]", "")) / n_chars
        ).alias("f_caps_ratio"),
    )


def weak_labels(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 15,
    min_stop_ratio: float = 0.1,
    min_uniq_ratio: float = 0.4,
) -> DataFrame:
    """Bootstrap labels from the rule heuristics: 1 = plausibly clean
    (long enough, lexically diverse, stopword-bearing), 0 = junk-like.
    The classifier's job is to SMOOTH these rules — rows the rules get
    wrong pull probabilities toward the corpus consensus. Thresholds
    are per-corpus knobs: the defaults suit natural English; synthetic
    or code-heavy corpora sit at much lower stopword density."""
    t = F.col(text_col)
    n_tok = F.greatest(token_count(t), F.lit(1)).cast("double")
    good = (
        (token_count(t) >= min_tokens)
        & (stopword_count(t) / n_tok >= min_stop_ratio)
        & (distinct_token_count(t) / n_tok >= min_uniq_ratio)
    )
    return docs.select("*", good.cast("double").alias("label"))


def train_quality_model(labeled: DataFrame, max_iter: int = 50):
    """Fit the linear quality model on a labeled (weakly or otherwise)
    relation that already carries the ``FEATURES`` columns + ``label``.
    Returns the fitted PipelineModel (assembler + scaler + logistic)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURES, outputCol="__raw"),
            StandardScaler(
                inputCol="__raw", outputCol="__feat", withMean=True
            ),
            LogisticRegression(
                featuresCol="__feat",
                labelCol="label",
                maxIter=max_iter,
                regParam=1e-3,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(model, docs_with_features: DataFrame) -> DataFrame:
    """(input columns…, quality_prob): P(clean) per document.

    Scoring deliberately does NOT use ``model.transform``: the fitted
    parameters (6 weights + intercept + scaler mean/std — a few dozen
    doubles) are extracted onto the driver and compiled into ONE
    whole-stage-codegen sigmoid expression. Besides being the faster
    plan (no ML UDF lambda), this avoids a Spark 4.1 trap:
    ``LogisticRegressionModel.trainingSummary`` holds the SparkSession,
    ``ProbabilisticClassificationModel.transform``'s lambda captures
    the model, and once any ``Observation`` has registered on the
    session (``Dataset.observe`` metrics) the session stops being
    Java-serializable — every post-observe model-transform collect then
    dies with ``NotSerializableException: ObservationManager``. A
    closed-form column expression ships no closures at all.
    """
    scaler = model.stages[1]
    lr = model.stages[2]
    mean = scaler.mean.toArray().tolist()
    std = scaler.std.toArray().tolist()
    w = lr.coefficients.toArray().tolist()
    b = float(lr.intercept)
    margin = F.lit(b)
    for i, name in enumerate(FEATURES):
        if std[i] == 0.0:
            continue  # StandardScaler maps zero-variance features to 0
        margin = margin + F.lit(w[i]) * (
            (F.col(name) - F.lit(mean[i])) / F.lit(std[i])
        )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return docs_with_features.select("*", prob.alias("quality_prob"))


def quality_filter(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    sample_fraction: float | None = None,
    max_iter: int = 50,
    **label_kwargs,
):
    """End-to-end model-based filter: weak-label → (optionally sample)
    → train → score ALL docs → keep ``quality_prob >= threshold``.

    ``sample_fraction`` trains on a deterministic hash sample — the
    100 TB pattern (the model needs thousands of rows, not billions;
    scoring is the only full pass). ``label_kwargs`` pass through to
    ``weak_labels`` (per-corpus thresholds). Returns (kept_docs, model).
    """
    feats = quality_features(docs, text_col)
    labeled = weak_labels(feats, text_col, **label_kwargs)
    train = labeled
    if sample_fraction is not None:
        # The sample is small by design (the model needs thousands of
        # rows, not billions), but training makes ~max_iter passes over
        # it (scaler fit + one treeAggregate per L-BFGS iteration).
        # Cache it ONCE in a handful of partitions: repartition (not
        # coalesce — coalesce would propagate upstream and serialize the
        # full-corpus feature scan) so every fit pass runs a few tasks
        # over cached rows instead of one task per corpus partition.
        # Scoring below stays a full distributed pass.
        train = (
            labeled.filter(
                F.pmod(F.xxhash64("doc_id"), 1000) < int(sample_fraction * 1000)
            )
            .repartition(8)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    model = train_quality_model(train, max_iter=max_iter)
    if sample_fraction is not None:
        train.unpersist()
    scored = score_quality(model, feats)
    return scored.filter(F.col("quality_prob") >= threshold), model
