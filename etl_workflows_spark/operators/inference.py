"""Model-inference plumbing: score a corpus with a batched model without
wasting the accelerator on padding.

The Spark-side problem of LLM/classifier scoring at 100 TB is not the
model call — it's the BATCH SHAPE. Accelerators take fixed-shape padded
batches; padding cost is (max_len - len) summed over the batch, so random
row order wastes most of the FLOPs on pad tokens. The fix is classic:

1. bucket rows by length WITHIN each partition
   (``sortWithinPartitions`` — no shuffle, no global sort);
2. walk each Arrow batch in that order, cutting model micro-batches by a
   TOKEN budget (not a row count): short docs ride in huge batches, long
   docs in small ones, every batch ~equally full;
3. run the model once per micro-batch, emit (id, score, micro-batch
   telemetry) so padding efficiency is measurable, not assumed.

The model itself is pluggable (``model_fn`` scores a list of texts). The
default is an honest deterministic STUB — this container has no
torch/accelerator, so the default scores with a fixed hash-based
function that tests can pin bit-exactly; pass ``strict=True`` to refuse
to run without a real model. The Spark plumbing — schema, partition
flow, batch shaping, Arrow transfer — is the real, tested artifact
(same stance as operators/multimodal.py's stubbed decoders).

Scale: one narrow projection + an in-partition sort + ``mapInPandas``;
no shuffle at all unless the caller asks for global length clustering
(``cluster_globally=True`` adds one repartitionByRange on length, worth
it when partitions are length-skewed).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("n_tokens", T.IntegerType(), True),
        T.StructField("batch_rows", T.IntegerType(), True),
        T.StructField("batch_real_tokens", T.LongType(), True),
        T.StructField("batch_padded_tokens", T.LongType(), True),
    ]
)


def stub_model(texts: list[str]) -> list[float]:
    """Deterministic fake scorer (NOT a model): a fixed polynomial hash
    of the text mapped into [0, 1). Exists so the batching plumbing is
    testable bit-exactly in a container with no ML runtime."""
    out = []
    for t in texts:
        h = 0
        for ch in t[:256]:
            h = (h * 1000003 + ord(ch)) & 0xFFFFFFFF
        out.append(h / 2**32)
    return out


# Deterministic fitted-looking parameters for benches/demos that need a
# REAL compute kernel without an in-container training run: plausible
# signs (longer, stopword-bearing, lexically diverse text scores higher;
# digit/caps-heavy text lower) over the classifier's 6 features.
FIXED_QUALITY_PARAMS = {
    "weights": [0.8, 1.2, 1.5, -0.3, -2.0, -1.5],
    "intercept": -0.5,
    "mean": [3.5, 0.7, 0.12, 5.5, 0.02, 0.03],
    "std": [1.0, 0.2, 0.08, 1.5, 0.05, 0.06],
}


def quality_logistic_model_fn(
    weights: list[float],
    intercept: float,
    mean: list[float],
    std: list[float],
) -> Callable[[list[str]], list[float]]:
    """Compile the quality classifier's fitted parameters
    (operators/classifier.py FEATURES order) into a REAL numpy scoring
    kernel for the batched inference path: per-text feature extraction
    (token/char counts, stopword/digit/caps ratios — the exact
    semantics of ``classifier.quality_features``'s Catalyst
    expressions) + standardization + sigmoid. This is what
    ``score_documents`` measures when the bench wants model compute,
    not just batch shaping; parity with the in-plan
    ``classifier.score_quality`` is test-pinned."""
    import math

    import numpy as np

    from etl_workflows_spark.operators.text import STOPWORDS

    stop = frozenset(STOPWORDS)

    def model_fn(texts: list[str]) -> list[float]:
        n = len(texts)
        feats = np.empty((n, 6), dtype=np.float64)
        for i, t in enumerate(texts):
            t = t or ""
            toks = t.split(" ")  # split(' ', -1) semantics, like Spark
            n_tok = len(toks)
            ntf = float(max(n_tok, 1))
            ncf = float(max(len(t), 1))
            feats[i, 0] = math.log1p(float(n_tok))
            feats[i, 1] = len(set(toks)) / ntf
            feats[i, 2] = sum(1 for x in toks if x in stop) / ntf
            feats[i, 3] = ncf / ntf
            feats[i, 4] = sum(1 for c in t if "0" <= c <= "9") / ncf
            feats[i, 5] = sum(1 for c in t if "A" <= c <= "Z") / ncf
        margin = np.full(n, float(intercept))
        for j in range(6):
            if std[j] == 0.0:  # StandardScaler maps zero-variance to 0
                continue
            margin += weights[j] * (feats[:, j] - mean[j]) / std[j]
        return (1.0 / (1.0 + np.exp(-margin))).tolist()

    return model_fn


def quantized_margin_model_fn(
    weights: dict[str, int] | None = None,
    bias: int | None = None,
) -> Callable[[list[str]], list[float]]:
    """Batched-inference kernel for the INTEGER-quantized quality
    classifier (operators/classifier.py QUANT_WEIGHTS): per-text integer
    features with the exact semantics of ``classifier.quantized_features``
    (literal-space token split, integer ``div``), dotted with the frozen
    fixed-point weights. Every margin is an integer with magnitude well
    under 2^53, returned as an exact double — so the batched path's
    scores are bit-identical to in-plan ``score_quality_quantized`` and
    SQL-oracle-checkable end-to-end: the hash-exact proof that batch
    shaping never alters a score."""
    from etl_workflows_spark.operators.classifier import (
        QUANT_BIAS,
        QUANT_FEATURES,
        QUANT_WEIGHTS,
    )
    from etl_workflows_spark.operators.text import STOPWORDS

    w = QUANT_WEIGHTS if weights is None else weights
    b = QUANT_BIAS if bias is None else bias
    order = list(QUANT_FEATURES)
    stop = frozenset(STOPWORDS)

    def model_fn(texts: list[str]) -> list[float]:
        out = []
        for t in texts:
            t = t or ""
            toks = t.split(" ")  # split(' ', -1) semantics, like Spark
            ntok = max(len(toks), 1)
            nch = max(len(t), 1)
            feats = {
                "q_tok": min(len(toks), 1000),
                "q_uniq": (len(set(toks)) * 1000) // ntok,
                "q_stop": (sum(1 for x in toks if x in stop) * 1000) // ntok,
                "q_avglen": (nch * 100) // ntok,
                "q_digit": (sum(1 for c in t if "0" <= c <= "9") * 1000) // nch,
                "q_caps": (sum(1 for c in t if "A" <= c <= "Z") * 1000) // nch,
            }
            out.append(float(b + sum(w[k] * feats[k] for k in order)))
        return out

    return model_fn


def fitted_quality_model_fn(model) -> Callable[[list[str]], list[float]]:
    """``quality_logistic_model_fn`` with parameters extracted from a
    fitted ``classifier.train_quality_model`` PipelineModel (same
    extraction as ``classifier.score_quality``)."""
    scaler, lr = model.stages[1], model.stages[2]
    return quality_logistic_model_fn(
        lr.coefficients.toArray().tolist(),
        float(lr.intercept),
        scaler.mean.toArray().tolist(),
        scaler.std.toArray().tolist(),
    )


def score_documents(
    docs: DataFrame,
    max_batch_tokens: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_fn: Callable[[list[str]], list[float]] | None = None,
    strict: bool = False,
    cluster_globally: bool = False,
    sort_by_length: bool = True,
) -> DataFrame:
    """Score every document, batching by token budget in length order.

    Returns (doc_id, score, n_tokens, batch_rows, batch_real_tokens,
    batch_padded_tokens) — the three batch_* columns are the padding
    telemetry: ``batch_padded_tokens = batch_rows × max_len_in_batch``
    is what an accelerator would actually compute over, so
    ``sum(real) / sum(padded)`` is the measured padding efficiency
    (asserted > unsorted in tests).

    A document longer than ``max_batch_tokens`` gets a singleton batch
    (never dropped, never split).
    """
    if max_batch_tokens < 1:
        raise ValueError(f"max_batch_tokens must be >= 1, got {max_batch_tokens}")
    if strict and model_fn is None:
        raise NotImplementedError(
            "no ML runtime in this environment — pass model_fn to score "
            "with a real model, or strict=False for the deterministic stub"
        )
    fn = model_fn or stub_model

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = list(zip(pdf["__id"], pdf["__text"], pdf["__n_tok"]))
            out: list[tuple] = []
            cur: list[tuple] = []
            cur_tokens = 0

            def flush():
                if not cur:
                    return
                scores = fn([t for _, t, _ in cur])
                if len(scores) != len(cur):
                    raise ValueError(
                        f"model_fn returned {len(scores)} scores for "
                        f"{len(cur)} texts — a bare zip would silently "
                        "drop documents from the output"
                    )
                max_len = max(n for _, _, n in cur)
                real = sum(n for _, _, n in cur)
                padded = max_len * len(cur)
                for (i, _, n), s in zip(cur, scores):
                    out.append(
                        (
                            # NULL ids arrive as NaN — int() would crash
                            # the task; keep the row with a NULL id
                            None if pd.isna(i) else int(i),
                            float(s),
                            int(n),
                            len(cur),
                            real,
                            padded,
                        )
                    )
                cur.clear()

            for i, t, n in rows:
                n = int(n)
                if cur and cur_tokens + n > max_batch_tokens:
                    flush()
                    cur_tokens = 0
                cur.append((i, t, n))
                cur_tokens += n
                if cur_tokens >= max_batch_tokens:
                    flush()
                    cur_tokens = 0
            flush()
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "score",
                    "n_tokens",
                    "batch_rows",
                    "batch_real_tokens",
                    "batch_padded_tokens",
                ],
            )

    # null-safe projection: a NULL text scores as the empty string (one
    # deterministic model call) instead of poisoning the Arrow batch
    # with NaN token counts and failing the whole task
    safe_text = F.coalesce(F.col(text_col), F.lit(""))
    flat = docs.select(
        F.col(id_col).alias("__id"),
        safe_text.alias("__text"),
        F.size(F.split(safe_text, " ")).alias("__n_tok"),
    )
    if cluster_globally:
        flat = flat.repartitionByRange(
            docs.sparkSession.sparkContext.defaultParallelism, "__n_tok"
        )
    if sort_by_length:
        flat = flat.sortWithinPartitions("__n_tok")
    # sort_by_length=False exists to MEASURE what sorting buys (the
    # padding-efficiency comparison in tests) — production always sorts
    return flat.mapInPandas(kernel, schema=_SCORE_SCHEMA)


def padding_efficiency(scored: DataFrame) -> float:
    """sum(real tokens) / sum(padded tokens) over all micro-batches —
    1.0 means the accelerator computes zero pad positions. Batch totals
    repeat per member row, so aggregate one row per micro-batch first
    (distinct on the batch fingerprint, exact for telemetry purposes)."""
    per_batch = scored.select(
        "batch_rows", "batch_real_tokens", "batch_padded_tokens"
    ).withColumn("__w", F.lit(1.0) / F.col("batch_rows"))
    row = per_batch.agg(
        F.sum(F.col("batch_real_tokens") * F.col("__w")).alias("real"),
        F.sum(F.col("batch_padded_tokens") * F.col("__w")).alias("padded"),
    ).collect()[0]
    if row["real"] is None or not row["padded"]:
        raise ValueError(
            "padding_efficiency needs at least one scored micro-batch "
            "(got an empty scored relation)"
        )
    return float(row["real"]) / float(row["padded"])
