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
