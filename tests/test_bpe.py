"""Distributed BPE training vs a straight-line reference implementation,
encode round-trip properties, and cache hygiene of the iterative loop."""

import pytest
from pyspark.sql import functions as F

from etl_workflows_spark.operators.bpe import (
    bpe_encode,
    train_bpe,
    word_frequencies,
)


def _ref_bpe(freqs, n):
    """Reference BPE (Sennrich et al.): max-count pair, lexicographic
    tiebreak, greedy leftmost merge."""
    vocab = {tuple(w): c for w, c in freqs.items()}
    merges = []
    for _ in range(n):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        m = max(pairs.values())
        best = sorted(p for p, c in pairs.items() if c == m)[0]
        merges.append((best[0], best[1], m))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _corpus_df(spark, freqs):
    words = [w for w, c in freqs.items() for _ in range(c)]
    return spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )


def test_train_bpe_matches_reference(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = train_bpe(_corpus_df(spark, freqs), 8)
    assert got == _ref_bpe(freqs, 8)


def test_train_bpe_overlap_is_leftmost_greedy(spark):
    # 'aaaa' x4, 'ab' x1: first merge (a,a) must count overlaps like the
    # reference (3 per 'aaaa') and rewrite greedily to ['aa','aa']
    freqs = {"aaaa": 4, "ab": 1}
    got = train_bpe(_corpus_df(spark, freqs), 2)
    assert got == _ref_bpe(freqs, 2)
    assert got[0][:2] == ("a", "a")


def test_train_bpe_early_stop_and_validation(spark):
    df = _corpus_df(spark, {"a": 3, "b": 2})  # single-char words: no pairs
    assert train_bpe(df, 5) == []
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(df, 0)


def test_bpe_encode_applies_merges_in_rank_order(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(_corpus_df(spark, freqs), 8)
    enc = bpe_encode(
        spark.createDataFrame(
            [(1, "lowest low unknown")], "doc_id long, text string"
        ),
        merges,
    )
    toks = enc.first()["bpe_tokens"]
    # 'lowest' segments with the learned subwords; unseen word falls back
    # to characters except where merges apply
    assert toks[: toks.index("low") + 1].count("low") >= 1
    assert "est" in toks
    flat = "".join(toks)
    assert flat == "lowestlowunknown"  # lossless segmentation


def test_bpe_encode_plan_is_jvm_only(spark):
    merges = [("a", "b", 1), ("ab", "c", 1)]
    df = spark.createDataFrame([(1, "abc xyz")], "doc_id long, text string")
    plan = (
        bpe_encode(df, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan  # no Python UDF in the encoder


def test_word_frequencies_drops_empties(spark):
    df = spark.createDataFrame(
        [(1, "a  b a")], "doc_id long, text string"
    )  # double space → empty token
    got = {r["word"]: r["count"] for r in word_frequencies(df).collect()}
    assert got == {"a": 2, "b": 1}


def test_train_bpe_leaves_no_cached_rdds(spark):
    import gc
    import time

    def settle(target=None, timeout_s=60.0):
        deadline = time.time() + timeout_s
        n = spark.sparkContext._jsc.getPersistentRDDs().size()
        while (target is None or n > target) and time.time() < deadline:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            m = spark.sparkContext._jsc.getPersistentRDDs().size()
            if target is None and m == n:
                return m
            n = m
        return n

    baseline = settle()
    train_bpe(_corpus_df(spark, {"low": 3, "lower": 2}), 3)
    final = settle(target=baseline)
    assert final <= baseline, f"leaked {final - baseline} cached RDDs"


def test_bpe_oracle_early_stop_parity(spark):
    """Round-10 review fix: a corpus that exhausts pairs before n_merges
    must leave the encode oracle counting REAL symbols (the sentinel-
    winner no-op), not cascade-empty to all-zero counts; the merges
    oracle must stop exactly where train_bpe's break does."""
    import duckdb
    import pandas as pd

    from etl_workflows_spark.operators import bpe
    from etl_workflows_spark.queries.llm import (
        _build_bpe_encode_oracle,
        _build_bpe_merges_oracle,
    )

    for rows in (
        [(1, "a b c"), (2, "x y")],       # zero merges possible
        [(1, "ab ab"), (2, "ab")],        # one merge, then exhausted
    ):
        con = duckdb.connect()
        con.register(
            "documents_df", pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_df")
        # sort by merge_rank: the oracle is a bare UNION ALL with no
        # ORDER BY, so row order is not guaranteed (the production
        # harness sorts before comparing too)
        m = sorted(con.execute(_build_bpe_merges_oracle(3)).fetchall())
        e = sorted(con.execute(_build_bpe_encode_oracle(3)).fetchall())
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        merges = bpe.train_bpe(docs, 3)
        sm = [(i + 1, l, r, int(c)) for i, (l, r, c) in enumerate(merges)]
        enc = sorted(
            tuple(r)
            for r in bpe.bpe_encode(docs, merges)
            .selectExpr(
                "doc_id", "CAST(size(bpe_tokens) AS INT) AS n_bpe_tokens"
            )
            .collect()
        )
        assert m == sm, (rows, m, sm)
        assert e == enc, (rows, e, enc)
        con.close()
