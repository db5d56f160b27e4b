"""Lexical (BM25) retrieval and reciprocal-rank-fusion hybrid search.

The retrieval layer a training-data/RAG pipeline needs over a document
corpus: score documents against term queries with BM25, and fuse multiple
rankers (lexical + embedding-cosine) with RRF (Cormack/Clarke/Buettcher,
SIGIR 2009: score(d) = Σ_r 1/(k0 + rank_r(d))).

Engine-portability: per-term BM25 contributions are integerized to
micro-units BEFORE the cross-term sum, so a document's score is an exact
64-bit integer sum — order-independent, bit-identical on any engine —
and ranking ties break on doc_id. The default idf is the ratio form
(N - df + ½)/(df + ½) + 1 (the argument of Lucene's log idf): it keeps
every expression in +,-,*,/ (correctly-rounded IEEE, portable) and is
per-term rank-equivalent to the log form; ``idf='log'`` gives classic
Lucene/Robertson idf for in-Spark use.

Scale shape: tf and df are one groupBy each (map-side combined); the
query-terms join is a broadcast (queries are tiny by definition); doc
length and the global avg ride the same scan. Nothing shuffles more than
(doc_id, token) pairs; top-k per query is a bucket-partitioned window.

Net-new operators (no reference counterpart — the reference's query
surface is SQL pass-through; cf. reference functions/load_query/main.py).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

MICRO = 1_000_000.0


def bm25_topk(
    docs: DataFrame,
    queries: Sequence[Tuple[str, Sequence[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "ratio",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 documents per query.

    ``queries``: [(query_id, [term, ...]), ...] — literal term lists, as a
    retrieval API takes them; they become a broadcast relation.

    Returns (query_id, doc_id, rank, score_micro): score_micro is the sum
    of per-term contributions each rounded to 1e-6 — an exact integer, so
    ranking (score_micro desc, doc_id) is deterministic on any engine.
    """
    if idf not in ("ratio", "log"):
        raise ValueError(f"idf must be 'ratio' or 'log', got {idf}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id string, token string",
    )

    arr = docs.select(
        # NULL text → empty doc, not a corrupted corpus: size(split(NULL))
        # is -1 under Spark's legacy sizeOfNull, which would subtract from
        # len_sum while still counting the row in N
        F.col(id_col),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("__arr"),
    )
    # restrict to query-term tokens BEFORE the explode, not merely before
    # the aggregation: the term list is a literal the caller passed, so
    # an in-plan array filter keeps non-matching tokens from ever
    # becoming rows — the explode emits only query-term postings
    # (guide §2.3 "project before the exchange" taken one step earlier:
    # don't generate the rows at all). tf and df computed on the
    # restricted postings equal their global values for those terms.
    # Fallback for huge programmatic term lists: a broadcast semi-join
    # after a full explode (the pre-round-10 shape).
    distinct_terms = sorted({t for _, ts in queries for t in ts})
    # empty term set must take the join path: Column.isin() with zero
    # args raises at plan build, while the join form returns the same
    # (empty) result an all-empty query list always produced
    if distinct_terms and len(distinct_terms) <= 256:
        toks = arr.select(
            id_col,
            F.size("__arr").alias("len"),
            F.explode(
                F.filter("__arr", lambda t: t.isin(*distinct_terms))
            ).alias("token"),
        )
        tf_q = toks.groupBy(id_col, "token").agg(
            F.count(F.lit(1)).alias("tf"), F.first("len").alias("len")
        )
    else:
        toks = arr.select(
            id_col,
            F.size("__arr").alias("len"),
            F.explode("__arr").alias("token"),
        )
        qtok = qterms.select("token").distinct()
        tf_q = (
            toks.join(F.broadcast(qtok), "token")
            .groupBy(id_col, "token")
            .agg(F.count(F.lit(1)).alias("tf"), F.first("len").alias("len"))
        )
    df_q = tf_q.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    # corpus stats (N, avg doclen) in ONE aggregate riding the same scan
    # — no separate count() job; exact integer sums → portable divisions
    totals = arr.select(F.size("__arr").alias("len")).agg(
        F.sum("len").cast("double").alias("len_sum"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    ).select(
        (F.col("len_sum") / F.col("__n")).alias("avg_len"), "__n"
    )

    idf_ratio = (
        (F.col("__n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    ) + F.lit(1.0)
    idf_col = F.log(idf_ratio) if idf == "log" else idf_ratio

    contrib = (
        idf_col
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("len") / F.col("avg_len")
            )
        )
    )
    scored = (
        tf_q.join(F.broadcast(qterms), "token")
        .join(F.broadcast(df_q), "token")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            id_col,
            F.round(contrib * F.lit(MICRO)).cast("bigint").alias("c_micro"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("c_micro").alias("score_micro"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "score_micro")
    )


def rrf_fuse(
    rankings: List[DataFrame],
    k0: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N rankers: each input is
    (query_id, doc_id, rank); output (query_id, doc_id, rrf_nano,
    fused_rank) where rrf_nano = Σ round(1e9/(k0+rank)) — per-ranker
    contributions integerized before the sum, so fusion is an exact
    integer sum and the fused order is engine-portable.

    A doc absent from a ranker simply contributes nothing (the standard
    RRF treatment of truncated lists). Inputs are typically top-k lists —
    tiny relative to the corpus — so the union/groupBy is cheap.
    """
    if not rankings:
        raise ValueError("rankings must be a non-empty list")
    contribs = [
        r.select(
            "query_id",
            id_col,
            F.round(F.lit(1e9) / (F.lit(float(k0)) + F.col("rank")))
            .cast("bigint")
            .alias("c"),
        )
        for r in rankings
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy("query_id", id_col).agg(
        F.sum("c").alias("rrf_nano")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("rrf_nano").desc(), F.col(id_col)
    )
    return fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))


def prf_expansion_terms(
    docs: DataFrame,
    query: Tuple[str, Sequence[str]],
    k_docs: int = 10,
    n_terms: int = 5,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback expansion (RM1 family, Lavrenko &
    Croft 2001 shape): run the query, take the top ``k_docs`` results
    as pseudo-relevant, and score candidate terms by how concentrated
    they are in that feedback set versus the corpus —
    ``(tf in feedback) · ln(N / df)``. Returns the top ``n_terms``
    (term, weight_micro) NOT already in the query.

    ``min_df`` drops hapax noise; weights are micro-integerized so the
    term ranking is deterministic. Scale: the feedback set is k rows
    (semi-join restricts the tokenize pass to it), and the df lookup
    touches only the feedback set's vocabulary.
    """
    qid, terms = query
    spark = docs.sparkSession
    top = bm25_topk(docs, [query], k=k_docs, id_col=id_col, text_col=text_col)
    fb_ids = top.select(F.col(id_col))
    fb_toks = (
        docs.join(fb_ids, id_col, "leftsemi")
        .select(
            id_col,
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("token"),
        )
    )
    fb_tf = fb_toks.groupBy("token").agg(F.count(F.lit(1)).alias("fb_tf"))
    # corpus df restricted to the feedback vocabulary (broadcast semi)
    vocab = fb_tf.select("token")
    corpus_df = (
        docs.select(
            id_col,
            F.explode(
                F.array_distinct(
                    F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                )
            ).alias("token"),
        )
        .join(F.broadcast(vocab), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # deliberate count(): N is one count-star job over a zero-column scan
    # (cheapest possible pass); folding it into the corpus_df aggregation
    # would need a global rollup riding a per-token groupBy — a worse plan
    n_docs = docs.count()
    qset = spark.createDataFrame([(t,) for t in terms], "token string")
    scored = (
        fb_tf.join(corpus_df, "token")
        .join(F.broadcast(qset), "token", "leftanti")
        .filter(F.col("df") >= min_df)
        .select(
            "token",
            F.round(
                F.col("fb_tf")
                * F.log(F.lit(float(n_docs)) / F.col("df"))
                * 1e6
            )
            .cast("bigint")
            .alias("weight_micro"),
        )
        .orderBy(F.col("weight_micro").desc(), "token")
        .limit(n_terms)
    )
    return scored.select(F.lit(qid).alias("query_id"), "token", "weight_micro")


def bm25_prf_topk(
    docs: DataFrame,
    query: Tuple[str, Sequence[str]],
    k: int = 10,
    k_docs: int = 10,
    n_terms: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Two-pass BM25 with pseudo-relevance feedback: pass 1 ranks, the
    feedback set nominates expansion terms, pass 2 re-ranks with the
    expanded query. The expansion term list (<= n_terms rows — bounded
    by construction, the benign-collect class) travels to the driver to
    re-enter bm25_topk's literal-terms API."""
    qid, terms = query
    exp = [
        r["token"]
        for r in prf_expansion_terms(
            docs, query, k_docs, n_terms, id_col=id_col, text_col=text_col
        ).collect()
    ]
    expanded = list(terms) + exp
    return bm25_topk(
        docs, [(qid, expanded)], k=k, id_col=id_col, text_col=text_col
    )


def ranking_agreement(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-query agreement between two rankers' top-k lists — the eval
    that tells you whether a cheaper ranker can replace an expensive
    one, or how much a fusion moved the ordering. Inputs are
    (query_id, doc_id, rank) relations (``bm25_topk``/``cosine_rank``
    shapes; for ``rrf_fuse`` output, alias ``fused_rank`` to ``rank``
    and truncate to k first — fused lists are emitted un-truncated).
    Output per query_id:

    * ``overlap_at_k``   — |A∩B| / k (set agreement, order-blind);
    * ``footrule_nano``  — Spearman's footrule on the intersection:
      both rankings are RE-INDEXED within I (positions 1..|I| in each
      list's original order — raw top-k ranks would blow past the
      normalizer when the shared docs sit far down one list), then
      Σ|ia - ib| is normalized by the max displacement ⌊|I|²/2⌋ and
      integerized ×1e9 (exact integer arithmetic end-to-end, so the
      DuckDB twin matches hash-for-hash); NULL when |I| < 2 (footrule
      of an empty/singleton intersection is undefined, not 0 — a
      disjoint pair must not read as "perfectly ordered").

    One inner join on (query_id, doc_id) + one agg; both inputs are
    top-k relations (tiny) — eval cost never touches the corpus. A
    query whose lists are fully disjoint still reports (overlap 0,
    footrule NULL) — queries are taken from ranker ``a``.
    """
    ra = a.select(
        "query_id", F.col(id_col).alias("doc_id"), F.col("rank").alias("rank_a")
    )
    rb = b.select(
        "query_id", F.col(id_col).alias("doc_id"), F.col("rank").alias("rank_b")
    )
    joined = ra.join(rb, ["query_id", "doc_id"])
    # re-index within the intersection: the windows run over top-k-sized
    # groups (bounded by k), never the corpus
    wa = W.partitionBy("query_id").orderBy("rank_a", "doc_id")
    wb = W.partitionBy("query_id").orderBy("rank_b", "doc_id")
    joined = joined.select(
        "query_id",
        F.row_number().over(wa).alias("ia"),
        F.row_number().over(wb).alias("ib"),
    )
    inter = F.count(F.lit(1))
    fr_raw = F.sum(F.abs(F.col("ia") - F.col("ib")))
    max_disp = F.floor(inter * inter / 2)
    stats = joined.groupBy("query_id").agg(
        (inter.cast("double") / F.lit(float(k))).alias("overlap_at_k"),
        F.when(
            inter >= 2,
            F.floor(fr_raw * F.lit(1_000_000_000) / max_disp).cast("bigint"),
        ).alias("footrule_nano"),
    )
    all_queries = ra.select("query_id").distinct()
    return all_queries.join(stats, "query_id", "left").select(
        "query_id",
        F.coalesce("overlap_at_k", F.lit(0.0)).alias("overlap_at_k"),
        "footrule_nano",
    )


def cosine_rank(
    embeddings: DataFrame,
    query_vec: List[float],
    query_id: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rank corpus vectors by cosine to one literal query vector — the
    semantic side of hybrid retrieval, shaped for ``rrf_fuse``.

    The dot product folds the array in index order (F.aggregate with
    zip_with), matching an ordered-UNNEST SQL twin exactly; ranking is by
    (cosine desc, id) with the cosine only ever compared, never summed
    across rows. One corpus scan, TakeOrderedAndProject top-k.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    norm_c = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + (x * x).cast("double"),
        )
    )
    norm_q = float(sum(x * x for x in query_vec)) ** 0.5
    if norm_q == 0.0:
        raise ValueError("query_vec has zero norm")
    cos = dot / (norm_c * F.lit(norm_q))
    ranked = (
        embeddings.select(
            F.lit(query_id).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            cos.alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("doc_id"))
        .limit(k)
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id")
    )
    return ranked.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "query_id", "doc_id", "rank"
    )


def rerank_lexical(
    docs: DataFrame,
    candidates: DataFrame,
    queries: Sequence[Tuple[str, Sequence[str]]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stage-2 reranker for two-stage retrieval: exact query↔document
    token-set overlap, computed on CANDIDATES ONLY.

    The canonical retrieval shape at corpus scale: a cheap index-backed
    stage 1 (BM25 / ANN) pulls k₁ candidates per query, then a precise
    (here: exact set-overlap Jaccard; in production: a cross-encoder —
    swap the scoring expression, the plan shape is identical) scores
    only |queries|·k₁ pairs instead of |queries|·|corpus|. The join
    back to document text is candidate-driven: the corpus is touched
    once, filtered by a broadcast semi of candidate doc ids.

    Ranking is deterministic: overlap ratio desc (exact small-int
    division — bit-identical across engines), stage-1 score desc,
    doc_id. Returns (query_id, doc_id, rerank, overlap_terms,
    union_terms, score_micro).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(qid, sorted(set(terms))) for qid, terms in queries],
        "query_id string, terms array<string>",
    )
    cand = candidates.select("query_id", F.col(id_col), "score_micro")
    # candidate-driven corpus touch: one broadcast semi-join prune, then
    # the tokenization runs on |candidates| docs only
    cand_docs = docs.select(id_col, text_col).join(
        F.broadcast(cand.select(id_col).distinct()), id_col, "leftsemi"
    )
    scored = (
        cand.join(cand_docs, id_col)
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            id_col,
            "score_micro",
            F.size(
                F.array_intersect(
                    F.array_distinct(F.split(text_col, " ")), F.col("terms")
                )
            ).alias("overlap_terms"),
            F.size(
                F.array_union(
                    F.array_distinct(F.split(text_col, " ")), F.col("terms")
                )
            ).alias("union_terms"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        (
            F.col("overlap_terms").cast("double") / F.col("union_terms")
        ).desc(),
        F.col("score_micro").desc(),
        F.col(id_col),
    )
    return (
        scored.withColumn("rerank", F.row_number().over(w).cast("int"))
        .filter(F.col("rerank") <= k)
        .select(
            "query_id", id_col, "rerank", "overlap_terms", "union_terms",
            "score_micro",
        )
    )
