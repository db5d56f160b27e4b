"""Distributed BPE vocabulary induction (Sennrich/Haddow/Birch, ACL 2016).

The scale insight is the classic one: BPE training never needs the
corpus after the first scan — it operates on the WORD-FREQUENCY table
(distinct word → count), which is vocabulary-sized, not corpus-sized.
One 100 TB scan builds that table; every merge iteration is then a pair
count + a symbol rewrite over the word table only:

1. explode each word's adjacent symbol pairs, weighted by word count —
   map-side combinable groupBy((left, right)) sum;
2. the best pair (max count, lexicographic tiebreak) is ONE collected
   row;
3. rewrite the symbol arrays with a greedy left-to-right fold
   (``F.aggregate``) — pure Catalyst higher-order functions, no Python
   in the loop; lineage truncated per iteration with localCheckpoint
   (same discipline as dedup.cluster_duplicates).

Iterative and order-dependent, but the FIXED merge count makes it
SQL-expressible after all: queries/llm.py unrolls the loop into chained
DuckDB CTEs (one block per merge, greedy rewrite done relationally), so
both catalog entries are hash-exact oracle-checked since round 10;
correctness is additionally pinned by a reference Python implementation
on the classic low/lower/newest/widest corpus in tests.

Net-new operator (no reference counterpart).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_workflows_spark.operators.text import tokens as _corpus_tokens


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over corpus-contract words (text.TOKEN_SPLIT_RE —
    the repo's single tokenization knob) — the only corpus-sized pass in
    BPE training."""
    return (
        docs.select(F.explode(_corpus_tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(word: Column) -> Column:
    # a word as its character sequence: 'low' → ['l','o','w'].
    # Spark's split keeps the trailing empty string the end-of-string
    # lookahead match produces — drop it.
    return F.filter(F.split(word, "(?!^)"), lambda x: x != "")


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) occurrences:
    a fold whose accumulator is the rewritten prefix. Overlaps resolve
    leftmost-first ('aaa' + (a,a) → ['aa','a']), matching reference BPE.
    """
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> List[Tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, pair_count)]
    in merge order. Deterministic: ties break lexicographically on
    (left, right), independent of partitioning.

    Driver traffic per iteration is exactly one row (the winning pair);
    the word table stays distributed throughout. Stops early if no
    adjacent pair remains.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    # localCheckpoint per iteration truncates the fold-chain lineage;
    # every checkpoint is released deterministically (the result is a
    # plain Python list — nothing distributed escapes), pinned in
    # test_bpe's cache-hygiene test.
    from etl_workflows_spark.operators.cache import release_checkpoint

    words = word_frequencies(docs, text_col).select(
        _initial_symbols(F.col("word")).alias("syms"), "count"
    )
    words = words.localCheckpoint()
    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                F.posexplode(
                    F.slice("syms", 1, F.size("syms") - 1)
                ).alias("i", "left"),
                F.col("syms"),
                F.col("count"),
            )
            .select(
                "left",
                F.element_at("syms", F.col("i") + 2).alias("right"),
                "count",
            )
            .groupBy("left", "right")
            .agg(F.sum("count").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.col("pair_count").desc(), F.col("left"), F.col("right")
        ).first()
        if best is None:
            break
        left, right = best["left"], best["right"]
        merges.append((left, right, best["pair_count"]))
        prev = words
        words = words.select(
            _merge_pair(F.col("syms"), left, right).alias("syms"),
            "count",
        ).localCheckpoint(eager=True)
        release_checkpoint(prev)
    release_checkpoint(words)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: List[Tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    id_col: str | None = None,
) -> DataFrame:
    """Apply learned merges (in rank order) to every word of ``text_col``;
    adds ``out_col`` as the flat token sequence. Expression depth grows
    with len(merges); intended for the modest merge counts this in-plan
    encoder targets (tests cover 10-50).

    ``id_col`` (MUST be a unique row key — duplicate ids would multiply
    rows through the per-doc join) switches to the vocabulary-join form:
    the greedy merge fold is interpreted higher-order work that costs
    O(|word|² · merges) PER TOKEN OCCURRENCE in the direct projection —
    with an id to reassemble by, the fold instead runs once per DISTINCT
    word (vocabulary-sized, the same insight train_bpe rests on), and
    occurrences get their encoding from an equi-join + ordered rebuild
    (guide §1.2: don't recompute what a join can attach). Outputs match
    the direct projection for non-NULL text — same fold, same words,
    same order; NULL ``text_col`` yields ``[]`` here (the coalesce after
    a no-rows join) where the direct projection propagates NULL.
    Without ``id_col`` the direct in-plan projection is kept (no key to
    rebuild rows by).
    """
    clean = lambda c: F.filter(  # noqa: E731
        _corpus_tokens(c), lambda w: w != ""
    )
    if id_col is None:
        return docs.withColumn(
            out_col,
            F.flatten(
                F.transform(
                    clean(F.col(text_col)),
                    lambda w: _apply_merges_expr(w, merges),
                )
            ),
        )
    enc = (
        docs.select(F.explode(clean(F.col(text_col))).alias("word"))
        .distinct()
        .select("word", _apply_merges_expr(F.col("word"), merges).alias("__syms"))
    )
    toks = docs.select(
        F.col(id_col).alias("__bpe_id"),
        F.posexplode(clean(F.col(text_col))).alias("__pos", "word"),
    )
    per_doc = (
        toks.join(enc, "word")
        .groupBy("__bpe_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("__pos", "__syms"))),
                    lambda s: s["__syms"],
                )
            ).alias(out_col)
        )
    )
    # reserved temp key: renaming id_col directly would collide when the
    # input carries another column of the join name (the excise trick)
    return (
        docs.withColumn("__bpe_id", F.col(id_col))
        .join(per_doc, "__bpe_id", "left")
        .withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.array().cast("array<string>")),
        )
        .drop("__bpe_id")
    )


def _apply_merges_expr(word: Column, merges) -> Column:
    syms = _initial_symbols(word)
    for left, right, _ in merges:
        syms = _merge_pair(syms, left, right)
    return syms
