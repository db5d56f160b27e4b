"""Corpus snapshot management: content-hash diffs between versions.

Training corpora are versioned artifacts; the first question about v(N+1)
is "what changed vs vN" — which documents were added, removed, or edited
— both for changelogs and for incremental downstream work (re-embed only
changed docs, re-run dedup only against the delta).

One full outer join on the document key with md5 content fingerprints on
each side: the diff costs two scans and one shuffle regardless of how
small the delta is; the output is delta-sized after filtering.

Net-new operator (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(key, status) for every document in either snapshot: 'added'
    (only in new), 'removed' (only in old), 'changed' (same key,
    different content hash), 'unchanged'. Filter as needed — returning
    all rows keeps the operator composable (e.g. join 'changed' ∪
    'added' back to new for incremental re-processing)."""
    o = old.select(
        F.col(key_col), F.md5(F.col(text_col)).alias("__old_fp")
    )
    n = new.select(
        F.col(key_col), F.md5(F.col(text_col)).alias("__new_fp")
    )
    j = o.join(n, key_col, "full")
    status = (
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(key_col, status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """status → count rollup of a ``corpus_diff`` result."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
