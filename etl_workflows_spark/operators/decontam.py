"""Benchmark decontamination: flag training documents whose n-grams overlap
a held-out evaluation set.

The standard LLM-pipeline contamination check (n-gram collision against
benchmark text, as popularized by the GPT-3/PaLM data cards): build the
distinct n-gram set of the benchmark, then for every training document
measure what fraction of its distinct n-grams appear in that set.

Scale design (100 TB corpus, small benchmark):

* n-grams are compared as ``xxhash64`` values, never as strings — the
  shuffle/broadcast payload is 8 bytes per gram regardless of n.
* The benchmark gram set is **broadcast** (it is the small side by
  construction — benchmarks are MBs, corpora are TBs), so the check is a
  map-side hash-join over the corpus: one scan, zero shuffle of the
  training side; only the per-doc aggregation shuffles, keyed by doc id.
* Everything is Catalyst expressions (split / transform / slice /
  explode) — no Python UDFs.

Net-new vs the reference (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_hash_set(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """(id, gram_h) — one row per distinct n-gram per document, hashed.

    n-gram windows come from n shifted slices zipped positionally (the
    non-lambda construction — same measured codegen win as
    text.repetition_signals' shingling); documents with fewer than ``n``
    tokens are dropped (no well-defined overlap). Distinctness is
    array-local (``array_distinct`` before the explode) — no shuffle.
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.size("__t") >= n
    )
    m = F.size("__t") - (n - 1)
    z = F.arrays_zip(*[F.slice(F.col("__t"), j + 1, m) for j in range(n)])
    grams = F.array_distinct(
        F.transform(
            z,
            lambda s: F.concat_ws(
                " ", *[s.getField(str(j)) for j in range(n)]
            ),
        )
    )
    return base.select(
        F.col(id_col), F.explode(grams).alias("gram")
    ).select(id_col, F.xxhash64("gram").alias("gram_h"))


def contamination_report(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-training-document n-gram overlap against the benchmark set.

    Returns (id_col, n_grams, n_matched, overlap_ratio, contaminated) for
    every training doc with at least one n-gram. ``overlap_ratio`` is
    matched/total over the document's *distinct* grams; ``contaminated``
    is ``overlap_ratio >= threshold``.
    """
    train_g = ngram_hash_set(train, id_col, text_col, n)
    bench_g = F.broadcast(
        ngram_hash_set(benchmark, id_col, text_col, n)
        .select("gram_h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = train_g.join(bench_g, "gram_h", "left")
    report = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("hit").alias("n_matched"),
    )
    ratio = F.col("n_matched") / F.col("n_grams")
    return report.select(
        id_col,
        "n_grams",
        "n_matched",
        ratio.alias("overlap_ratio"),
        (ratio >= F.lit(threshold)).alias("contaminated"),
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Drop contaminated training docs (the apply-side of the report).

    Anti-joins the training set against the flagged ids — docs too short
    to form an n-gram are KEPT (they cannot be meaningfully matched).
    """
    flagged = contamination_report(
        train, benchmark, id_col, text_col, n, threshold
    ).where("contaminated")
    return train.join(flagged.select(id_col), id_col, "left_anti")


def canary_scan(
    docs: DataFrame,
    canaries: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring canary detection: which documents contain any of
    the known canary strings (eval-set markers, deliberately planted
    leak detectors, secrets patterns rendered literal).

    One codegen scan — each row evaluates a chain of ``contains`` against
    literal canaries (no join, no regex engine); output is one row per
    (doc, canary) hit, so a doc holding two canaries reports both.
    Canary lists are small by construction (they're curated markers);
    for thousands of patterns switch to the n-gram machinery in
    ``contamination_report``.
    """
    if not canaries:
        raise ValueError("canaries must be a non-empty list of strings")
    # ONE scan: per row, build the array of matched canaries and explode
    # the non-null entries — a union of per-canary filters would plan one
    # FileScan of the corpus PER canary (file scans are not deduplicated
    # by exchange reuse), N× the promised I/O
    matches = F.array_compact(
        F.array(
            *[
                F.when(F.col(text_col).contains(c), F.lit(c))
                for c in canaries
            ]
        )
    )
    return docs.select(
        F.col(id_col), F.explode(matches).alias("canary")
    )
