"""Deterministic sequence packing for training-batch construction.

A training pipeline concatenates documents into fixed-token-budget
sequences ("packing"). This operator assigns every document a
(pack_id, pack_offset) deterministically: documents are ordered by a
content hash (reproducible anywhere, stable under reruns — same rationale
as operators/sampling.py), token counts are cumulatively summed per
partition, and a document belongs to the pack where its first token
lands. Documents may straddle a pack boundary — exactly how real packed
pretraining batches behave with concatenation + chunking.

Scale: the running sum is a window per ``partition_col`` (e.g. source/
shard) — each partition's window is independent, so 1000 executors pack
1000 shards concurrently with one shuffle on the partition key. For a
single gigantic stratum, pre-split it into hash bands (deterministic_band
below) so no single window serializes the corpus.

Net-new vs the reference (SURVEY.md §2.7 north-star scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_workflows_spark.operators.sampling import salted_hash
from etl_workflows_spark.operators.text import token_count


def deterministic_band(key: Column, n_bands: int, salt: str = "band") -> Column:
    """Stable band 0..n_bands-1 from a content hash — pre-split a huge
    stratum so packing windows stay bounded."""
    return (
        F.conv(F.substring(salted_hash(key, salt), 1, 4), 16, 10).cast("long")
        % n_bands
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    partition_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Assign (pack_id, pack_offset) per document under a token budget.

    Order within a partition is by md5 hash of the key — a deterministic
    shuffle, so the same corpus always packs identically (and adding a
    document only perturbs packs after its hash position, not globally).
    ``pack_id`` = floor(first-token index / budget); ``pack_offset`` =
    first-token index within its pack.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = token_count(F.col(text_col))
    w = (
        Window.partitionBy(partition_col)
        .orderBy(salted_hash(F.col(key_col), salt), key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    start = cum - n_tok  # index of the doc's first token in the stream
    return docs.select(
        key_col,
        partition_col,
        n_tok.alias("n_tokens"),
        F.floor(start / budget).alias("pack_id"),
        (start % budget).alias("pack_offset"),
    )


def token_balanced_shards(
    docs: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every document a ``shard_id`` so each output shard carries
    ~``budget`` tokens — the dataloader contract ("1024 shards of ~100M
    tokens each"), documents kept whole: shard k covers the cumulative
    token interval [k·budget, (k+1)·budget) in global ``key_col`` order,
    and a document belongs to the shard where its FIRST token lands, so
    per-shard totals deviate from ``budget`` by less than one document.

    Scale shape: the global running total comes from
    ``ordering.global_cumsum`` (per-bucket sums + driver offsets + a
    bucket-partitioned window — no single-partition ORDER BY); the
    output is (key, n_tokens, shard_id), ready for a
    ``partitionBy('shard_id')`` write. Deterministic and exact, so the
    assignment is SQL-oracle-checkable against the one-reducer
    ``SUM() OVER (ORDER BY key)`` form.
    """
    from etl_workflows_spark.operators.ordering import (
        global_cumsum,
        numeric_cut_buckets,
    )

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # NULL text must count as 0 tokens, not size(NULL) = -1 (which would
    # corrupt the global cumulative sum and every downstream shard_id).
    d = docs.select(
        key_col,
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(token_count(F.col(text_col)))
        .cast("long")
        .alias("n_tokens"),
    )
    cum = global_cumsum(
        d,
        [key_col],
        "n_tokens",
        numeric_cut_buckets(d, key_col, n_buckets),
        out_col="__cum",
    )
    return cum.select(
        key_col,
        "n_tokens",
        F.floor((F.col("__cum") - F.col("n_tokens")) / budget)
        .cast("int")
        .alias("shard_id"),
    )


def write_token_balanced_shards(
    docs: DataFrame,
    path: str,
    budget: int,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize token-balanced shards: join the shard assignment back
    (one shuffle on ``key_col``) and write parquet partitioned by
    ``shard_id`` — each shard directory is one ~``budget``-token unit a
    dataloader worker claims whole. Returns the shard manifest
    (shard_id, n_docs, n_tokens) computed from the written relation.
    """
    assigned = token_balanced_shards(
        docs, budget, key_col=key_col, text_col=text_col
    )
    full = docs.join(assigned, key_col)
    full.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    spark = docs.sparkSession
    return (
        spark.read.parquet(path)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
