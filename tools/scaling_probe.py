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
    spark.stop()


if __name__ == "__main__":
    main()
