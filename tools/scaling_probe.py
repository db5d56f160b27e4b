"""Measured scaling evidence for the LSH near-dup path (ARCHITECTURE.md).

Builds dup-heavy synthetic scale-ups of the sf0.1 documents corpus —
each doc gains R rotated near-copies (token rotation keeps shingle
Jaccard ≈ (m-n·r)/m, i.e. high), so every replica group is a clique: the
worst case for candidate generation. Measures near_dup_pairs_lsh wall
clock at 1×, 4×, 16×.

Usage: python tools/scaling_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_workflows_spark.operators.dedup import near_dup_pairs_lsh
from etl_workflows_spark.queries.base import table
from etl_workflows_spark.session import get_spark


def replicate(docs, copies: int):
    """Each doc joined with its `copies`-1 rotated near-copies."""
    if copies == 1:
        return docs
    reps = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("r")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    # rotate by r mod n so short docs never produce a negative slice
    eff = F.col("r") % n
    rotated = F.concat(
        F.slice(toks, eff + 1, n - eff),
        F.slice(toks, 1, eff),
    )
    return (
        docs.select("doc_id", "text", reps)
        .select(
            (F.col("doc_id") * copies + F.col("r")).alias("doc_id"),
            F.concat_ws(" ", rotated).alias("text"),
        )
    )


def synth_embeddings(spark, n: int, dim: int = 32):
    """n deterministic pseudo-random unit-cube vectors — one Arrow pass,
    partition-independent (each component is a pure hash of
    (vec_id, j)), no RNG state anywhere."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            keys = ids[:, None] * np.uint64(dim) + np.arange(
                dim, dtype=np.uint64
            )
            x = keys * np.uint64(0x9E3779B97F4A7C15)
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
            vals = (x / float(2**64)) * 2.0 - 1.0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["id"],
                    "embedding": [row.tolist() for row in vals],
                }
            )

    return spark.range(n).repartition(16).mapInPandas(
        kern, "vec_id long, embedding array<double>"
    )


def banded_candidate_count(emb, n_planes: int, bands: int) -> int:
    """Candidate-PAIR volume of the banded hyperplane-LSH join — the
    cost driver — counted from bucket occupancies (Σ c·(c−1)/2 over
    (band, bucket) groups) without materializing a single pair."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.operators.similarity import _band_buckets_fast

    rows = _band_buckets_fast(emb, None, n_planes, bands, "vec_id", "embedding")
    agg = (
        rows.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    return int(agg or 0)


def embedding_candidate_probe(
    spark, sizes=(2_000, 20_000, 200_000), dim: int = 32, threshold=0.9
) -> dict:
    """THE banded_lsh_params scale claim, measured: candidate counts
    (not wall time) at ×1/×10/×100 synthetic vectors under (a)
    self-sized params — planes ≈ log2(n/bucket), candidates should grow
    ~linearly (exponent ≈ 1) — vs (b) params FROZEN at the smallest
    size, where occupancy grows with n and candidates grow ~n²
    (exponent ≈ 2). Returns per-size counts and fitted exponents
    (log-log slope between consecutive sizes)."""
    import math

    from etl_workflows_spark.operators.similarity import banded_lsh_params

    fixed = banded_lsh_params(sizes[0], threshold)
    out = {"sizes": list(sizes), "self_sized": [], "fixed": [],
           "params_self": [], "params_fixed": list(fixed)}
    for n in sizes:
        emb = synth_embeddings(spark, n, dim).persist()
        emb.count()
        p, b = banded_lsh_params(n, threshold)
        out["params_self"].append([p, b])
        out["self_sized"].append(banded_candidate_count(emb, p, b))
        out["fixed"].append(banded_candidate_count(emb, *fixed))
        emb.unpersist()

    def exponents(counts):
        return [
            round(
                math.log(max(counts[i + 1], 1) / max(counts[i], 1))
                / math.log(sizes[i + 1] / sizes[i]),
                3,
            )
            for i in range(len(sizes) - 1)
        ]

    out["exponent_self_sized"] = exponents(out["self_sized"])
    out["exponent_fixed"] = exponents(out["fixed"])
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling_probe")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm up
    base = table(spark, sf_dir, "documents").select("doc_id", "text")
    print("| docs | true pairs found | wall | per-1k docs |")
    print("|------|-----------------|------|-------------|")
    for copies in (1, 4, 16):
        docs = replicate(base, copies)
        n = docs.count()
        t0 = time.perf_counter()
        pairs = near_dup_pairs_lsh(docs, threshold=0.5).count()
        wall = time.perf_counter() - t0
        print(
            f"| {n:,} | {pairs:,} | {wall:.1f} s | {1000 * wall / n:.2f} s |"
        )
    # Substring-span dedup on the same dup-heavy replicas: rotations
    # preserve long verbatim runs, so duplicated-window density GROWS
    # with the replica count — the op's worst case, like the cliques
    # are for LSH.
    print()
    print("| docs | dup spans | wall | per-1k docs |")
    print("|------|-----------|------|-------------|")
    from etl_workflows_spark.operators.spans import duplicated_spans

    for copies in (1, 4, 16):
        docs = replicate(base, copies)
        n = docs.count()
        t0 = time.perf_counter()
        spans = duplicated_spans(docs, min_len=8).count()
        wall = time.perf_counter() - t0
        print(
            f"| {n:,} | {spans:,} | {wall:.1f} s | {1000 * wall / n:.2f} s |"
        )
    # Banded hyperplane-LSH candidate growth: ×1/×10/×100 synthetic
    # vectors, self-sized params vs frozen-at-×1 params (counts, not
    # wall time — the plan's cost driver directly).
    print()
    import json

    print(json.dumps(embedding_candidate_probe(spark), indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
