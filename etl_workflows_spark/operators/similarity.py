"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(n) per query, the thing every
ANN variant is measured against. Scale path: LSH bucketing (random
hyperplane signs) so candidate generation is an equi-join on bucket id
instead of a full scan per query.

All vector math is built-in higher-order functions (``zip_with`` +
``aggregate`` left-fold over doubles) — JVM-side, deterministic, and
bitwise-reproducible in any engine that folds in array order (verified
against DuckDB's list_sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_topk_bruteforce(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector.

    The 1-row query side is broadcast — the scan of the corpus is the only
    distributed work, no shuffle. For q simultaneous queries broadcast all
    q rows and let the corpus scan serve them in one pass.
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("q_vec")
    )
    return (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def similar_pairs_bruteforce(
    embeddings: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs above a cosine threshold (exact, O(n²) — ground truth for
    the LSH variant; embedding-cosine near-dup dedup uses this on candidate
    buckets)."""
    t = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") > threshold)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a hash of
    (plane, component) — reproducible anywhere, no RNG state."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        comps.append(int(h[:8], 16) / float(0xFFFFFFFF) * 2.0 - 1.0)
    return comps


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of <v, h_p> packed into a
    long. Vectors with high cosine land in the same bucket with prob
    (1 - theta/pi)^n_planes."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bucket = bucket + F.when(dot(vec, plane) > 0, F.lit(2**p)).otherwise(0)
    return bucket


def build_ann_index(
    embeddings: DataFrame,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materializable ANN index: each vector with its hyperplane-sign
    bucket.

    The bucket assignment costs ``n_planes`` dot products per vector —
    this is the *index build*, done once and persisted (write it
    ``bucket_by=(N, ['bucket'])`` so query-time candidate fetches are
    pruned scans). Measured: computing buckets per query makes LSH slower
    than brute force below ~10⁵ vectors; amortized via a stored index,
    each query touches only its bucket (~corpus/2^n_planes candidates).
    """
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )


def ann_topk_indexed(
    index: DataFrame,
    query_vec_id: int,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a prebuilt ANN index: rank only the query's bucket."""
    q = index.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("q_vec"), F.col("bucket").alias("q_bucket")
    )
    return (
        index.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select(
            F.col(id_col),
            cosine(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 20,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN, one-shot form (index built inline).

    Approximate (recall < 1). For repeated queries, build the index once
    with ``build_ann_index`` and call ``ann_topk_indexed`` — bucket
    computation dominates one-shot runs. Multi-probe (flipping low-margin
    bits) is the standard recall knob to add here.
    """
    index = build_ann_index(embeddings, dim, n_planes, id_col, vec_col)
    return ann_topk_indexed(index, query_vec_id, k, id_col, vec_col)


def embedding_label_stats(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label corpus stats over vector norms (min/max are exact per-row
    reductions — deterministic; floating *sums* across rows are not, so no
    avg here)."""
    return (
        embeddings.select(
            "label", F.col(id_col), norm(F.col(vec_col)).alias("nrm")
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )
