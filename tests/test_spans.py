"""Substring-level duplicate-span detection / excision (operators/spans.py).

Ground truth for parity tests is a naive single-machine reimplementation
of the same contract: duplicated L-window starts → merged islands;
excision = drop tokens covered only by non-canonical duplicated windows.
"""

from __future__ import annotations

import pytest

from etl_workflows_spark.operators.spans import (
    duplicated_spans,
    excise_duplicate_spans,
    token_windows,
)

CORPUS = [
    (1, "a b c d e f g h i j"),
    (2, "x y c d e f g z w q"),
    (3, "totally unique words here now"),
    (4, "a b c d e f g h i j"),
    (5, "pad c d e f g pad2 c d e f g tail"),
    (6, "short doc"),
]


def _naive(corpus, L):
    toks = {d: t.split(" ") for d, t in corpus}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, ts in toks.items():
        for p in range(len(ts) - L + 1):
            occ.setdefault(" ".join(ts[p : p + L]), []).append((d, p + 1))
    dup = {w: ps for w, ps in occ.items() if len(ps) >= 2}
    spans = {}
    for w, ps in dup.items():
        for d, p in ps:
            spans.setdefault(d, set()).add(p)
    out = []
    for d, starts in spans.items():
        ss = sorted(starts)
        lo = hi = ss[0]
        for p in ss[1:]:
            if p == hi + 1:
                hi = p
            else:
                out.append((d, lo, hi + L - 1, hi + L - lo))
                lo = hi = p
        out.append((d, lo, hi + L - 1, hi + L - lo))
    excised = {}
    canon = {w: min(ps) for w, ps in dup.items()}
    for d, ts in toks.items():
        drop = set()
        keep_cover = set()
        for w, ps in dup.items():
            for dd, p in ps:
                if dd != d:
                    continue
                cover = range(p, p + L)
                if (dd, p) == canon[w]:
                    keep_cover.update(cover)
                else:
                    drop.update(cover)
        excised[d] = " ".join(
            t
            for i, t in enumerate(ts, start=1)
            if i not in (drop - keep_cover)
        )
    return sorted(out), excised


@pytest.mark.parametrize("L", [2, 3, 5])
def test_spans_match_naive(spark, L):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = sorted(
        tuple(r) for r in duplicated_spans(df, min_len=L).collect()
    )
    want, _ = _naive(CORPUS, L)
    assert got == want


@pytest.mark.parametrize("L", [2, 3, 5])
def test_excision_matches_naive(spark, L):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["text"]
        for r in excise_duplicate_spans(df, min_len=L).collect()
    }
    _, want = _naive(CORPUS, L)
    assert got == want


def test_hashed_and_text_windows_agree(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    h = sorted(
        tuple(r)
        for r in duplicated_spans(df, min_len=3, hashed=True).collect()
    )
    t = sorted(
        tuple(r)
        for r in duplicated_spans(df, min_len=3, hashed=False).collect()
    )
    assert h == t


def test_no_duplicates_no_spans_and_identity_excision(spark):
    rows = [(1, "alpha beta gamma"), (2, "delta epsilon zeta eta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert duplicated_spans(df, min_len=2).count() == 0
    got = {
        r["doc_id"]: r["text"]
        for r in excise_duplicate_spans(df, min_len=2).collect()
    }
    assert got == dict(rows)


def test_short_docs_are_safe(spark):
    rows = [(1, "a"), (2, "a"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # a 1-token doc holds no 2-token window — no spans, text untouched
    assert duplicated_spans(df, min_len=2).count() == 0
    got = {
        r["doc_id"]: r["text"]
        for r in excise_duplicate_spans(df, min_len=2).collect()
    }
    assert got == dict(rows)


def test_row_count_preserved_even_when_doc_fully_excised(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    out = excise_duplicate_spans(df, min_len=3)
    assert out.count() == len(CORPUS)
    by_id = {r["doc_id"]: r["text"] for r in out.collect()}
    assert by_id[4] == ""  # exact dup of doc 1, fully excised
    assert by_id[1] == dict(CORPUS)[1]  # canonical copy survives whole


def test_window_length_validation(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        token_windows(df, length=1)


def test_spans_on_real_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = duplicated_spans(docs, min_len=8)
    n = spans.count()
    # the synthetic corpus plants exact + near duplicates — long shared
    # runs must exist, and every span must be at least one window long
    assert n > 0
    bad = spans.filter("n_tokens < 8 or start_pos < 1 or end_pos < start_pos")
    assert bad.count() == 0
