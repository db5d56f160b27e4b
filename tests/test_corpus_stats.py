"""Semantic tests for the corpus-statistics operators added in round 4:
cross-source duplicate overlap, lexical diversity, vocabulary coverage,
per-label embedding drift, and the CUSUM change-point detector. Each is
checked on a hand-computable toy input (the sf0.01 value check runs in
tools/oracle_check.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_workflows_spark.operators.dedup import cross_source_overlap
from etl_workflows_spark.operators.similarity import label_centroid_drift
from etl_workflows_spark.operators.text import lexical_diversity, vocab_coverage


def test_cross_source_overlap_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha", "a"),
            (2, "beta", "a"),
            (3, "alpha", "b"),   # shared with a
            (4, "beta", "b"),    # shared with a
            (5, "alpha", "c"),   # shared with a and b
            (6, "gamma", "c"),
            (7, "alpha", "a"),   # duplicate within a — must not double-count
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r.source_a, r.source_b): r.shared_texts
        for r in cross_source_overlap(docs).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cross_source_overlap_disjoint_sources_empty(spark):
    docs = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")],
        "doc_id long, text string, source string",
    )
    assert cross_source_overlap(docs).count() == 0


def test_lexical_diversity_hand_computed(spark):
    # source a: tokens [x x y z] → total 4, distinct 3, hapax {y, z} = 2
    # source b: tokens [w w w w] → total 4, distinct 1, hapax 0
    docs = spark.createDataFrame(
        [(1, "x x y", "a"), (2, "z x", "a"), (3, "w w", "b"), (4, "w w", "b")],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in lexical_diversity(docs).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.total_tokens, a.distinct_tokens, a.hapax_tokens) == (5, 3, 2)
    assert a.type_token_ratio == 0.6
    assert a.hapax_fraction == round(2 / 3, 6)
    assert (b.total_tokens, b.distinct_tokens, b.hapax_tokens) == (4, 1, 0)
    assert b.hapax_fraction == 0.0


def test_vocab_coverage_curve(spark):
    # counts: a×6, b×3, c×1 → total 10; cum: a=6, +b=9, +c=10
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a b b c")],
        "doc_id long, text string",
    )
    got = {
        r.threshold: (r.vocab_size, r.coverage)
        for r in vocab_coverage(docs, thresholds=(0.5, 0.9, 1.0)).collect()
    }
    assert got[0.5] == (1, 0.6)   # "a" alone covers 60%
    assert got[0.9] == (2, 0.9)   # a+b cover exactly 90%
    assert got[1.0] == (3, 1.0)
    # ranks are dense and deterministic: full curve is monotone
    sizes = [got[t][0] for t in sorted(got)]
    assert sizes == sorted(sizes)


def test_label_centroid_drift_two_labels(spark):
    # label 0 vectors average to (1, 0); label 1 averages to (0, 1);
    # corpus centroid is (0.5, 0.5) → cosine of each to corpus = 1/√2.
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.0, 1.0], 1),
            (4, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.label: r for r in label_centroid_drift(emb).collect()}
    assert rows[0].n_vecs == 2 and rows[1].n_vecs == 2
    for lbl in (0, 1):
        assert rows[lbl].centroid_norm == 1.0
        assert abs(rows[lbl].cos_to_corpus - round(1 / math.sqrt(2), 6)) < 1e-9


def test_cusum_changepoint_detects_level_shift(spark, tmp_path):
    # 48 hours of events: rate 1/hour for the first 24, 5/hour after.
    # CUSUM of (n − mean) is V-shaped with the minimum |max| at the shift
    # boundary — the peak |cusum| lands on hour 23 (0-indexed).
    rows = []
    eid = 0
    for h in range(48):
        for _ in range(1 if h < 24 else 5):
            rows.append((eid, f"2024-01-01 {h % 24:02d}:00:07", "click", h))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, t string, event_type string, h int")
    df = df.withColumn(
        "ts",
        F.expr(
            "timestampadd(HOUR, h, TIMESTAMP '2024-01-01 00:00:07')"
        ),
    )
    out_dir = str(tmp_path / "events.parquet")
    df.select("event_id", "ts", "event_type").write.parquet(out_dir)

    from etl_workflows_spark.queries.analytics import events_cusum_changepoint

    got = events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    # mean = 3 → cusum decreases by 2/hour for 24h (to −48), then rises;
    # peak |cusum| = 48 at the last pre-shift hour (23:00).
    assert r.max_abs_cusum == 48.0
    assert r.changepoint_hour.hour == 23


def test_lang_id_confusion_shares_sum_to_one(spark, sf_dir):
    from etl_workflows_spark.queries.llm import lang_id_confusion

    rows = lang_id_confusion(spark, sf_dir).collect()
    assert rows
    by_label = {}
    for r in rows:
        by_label.setdefault(r.labeled_lang, 0.0)
        by_label[r.labeled_lang] += r.label_share
        assert r.n_docs > 0
    for lbl, s in by_label.items():
        assert abs(s - 1.0) < 1e-5, (lbl, s)


def test_ngram_novelty_bounds_and_planted_duplicate(spark, tmp_path):
    # two identical 10-token docs → every window duplicated → novelty 0;
    # one disjoint doc → novelty 1.
    common = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(1, common, "en", "s"), (2, common, "en", "s"),
         (3, "q r s t u v w x y z", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from etl_workflows_spark.queries.llm import ngram_novelty_docs

    got = {r.doc_id: r for r in ngram_novelty_docs(spark, str(tmp_path)).collect()}
    assert got[1].novelty_ratio == 0.0 and got[2].novelty_ratio == 0.0
    assert got[3].novelty_ratio == 1.0
    assert got[1].n_windows == 3  # 10 tokens, 8-token windows → 3 starts


def test_token_entropy_uniform_vs_degenerate(spark, tmp_path):
    # source u: 4 equally frequent tokens → H = 2 bits;
    # source d: one token only → H = 0.
    docs = spark.createDataFrame(
        [(1, "a b c d", "en", "u"), (2, "x x x x", "en", "d")],
        "doc_id long, text string, lang string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from etl_workflows_spark.queries.llm import token_entropy_sources

    got = {r.source: r for r in token_entropy_sources(spark, str(tmp_path)).collect()}
    assert got["u"].entropy_bits == 2.0
    assert got["d"].entropy_bits == 0.0
    assert got["u"].distinct_tokens == 4 and got["d"].total_tokens == 4
