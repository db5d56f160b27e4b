"""DSIR-style data selection: hashed n-gram importance resampling.

Public method (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): fit bag-of-hashed-ngrams unigram
models over a small TARGET corpus (the distribution you want more of —
e.g. curated English prose) and over the RAW corpus, then weight every
raw document by its log-likelihood ratio

    w(doc) = Σ_grams  [ log p_target(bucket(gram)) - log p_raw(bucket(gram)) ]

and keep the highest-weight documents up to a token budget. Hashing
grams into a small bucket space makes the model a fixed-size table
instead of an unbounded vocabulary.

Determinism contract (same discipline as operators/graph.py): the
per-BUCKET log-ratio is computed once from exact integer counts —
``ln((cnt_p+1)·(Nq+V) / ((cnt_q+1)·(Np+V)))`` with add-one smoothing,
one IEEE double division of two exactly-representable integer products,
one ``ln`` — then FLOORED to a fixed-point BIGINT (``scale`` units per
nat). Per-document weights are integer SUMS of those fixed-point
entries, so Spark's shuffle order and DuckDB's sequential order agree
bit-for-bit. (The only cross-engine float op is ``ln`` on an identical
double; at the default 1e6 scale a last-ulp ``ln`` discrepancy lands on
a floor boundary with probability ~1e-10 per bucket.) Integer products
stay exact below 2^53 — fine until corpus gram counts approach 10^15
per bucket; shrink ``scale`` or pre-divide counts beyond that.

Scale posture (100 TB): the model is ≤ 16^hex_chars buckets (4096 at
the default), built with two map-side-combined groupBys and broadcast
everywhere after; the per-doc weighting is explode → broadcast-join →
one groupBy on doc_id. No driver-side loops; the only collects are the
two scalar gram totals and the ≤4096-row model table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL

DEFAULT_SCALE = 10**6


def _gram_expr(text_col: str) -> str:
    """SQL expression: array of whitespace unigrams + space-joined
    bigrams (interleaved; downstream only counts, so order is free).

    Construction is each token zipped with its successor (slice +
    arrays_zip), NOT ``transform(sequence(...), i -> element_at(toks, i))``
    — element_at is an O(tokens) walk per index, making the naive form
    O(tokens²) per document (measured 3.6× slower at sf0.1). The last
    token zips against NULL and contributes its unigram only."""
    toks = f"split({text_col}, ' ')"
    succ = f"concat(slice({toks}, 2, size({toks}) - 1), array(NULL))"
    return (
        f"flatten(transform(arrays_zip({toks}, {succ}), "
        f"z -> if(z['1'] is null, array(z['0']), "
        f"array(z['0'], concat(z['0'], ' ', z['1'])))))"
    )


def _bucket_counts(docs: DataFrame, text_col: str, hex_chars: int) -> DataFrame:
    """(bucket, cnt): hashed-gram frequencies; bucket = first hex_chars
    of md5(gram) — engine-portable (identical lowercase hex in Spark and
    DuckDB), uniform enough for a smoothed unigram model."""
    return (
        docs.select(
            F.explode(F.expr(_gram_expr(f"coalesce({text_col}, '')"))).alias("gram")
        )
        .select(F.substring(F.md5("gram"), 1, hex_chars).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_model(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    hex_chars: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """The importance model: (bucket, llr_fp) with llr_fp the fixed-point
    smoothed log-ratio log(p_target/p_raw) in units of 1/scale nats.
    ≤ 16^hex_chars rows — broadcast it."""
    v = 16**hex_chars
    # One pass over each corpus, materialized eagerly: the ≤16^hex_chars-row
    # count tables feed THREE consumers (the scalar totals and the model
    # join) — without the checkpoint each consumer would re-run the full
    # explode+aggregate scan (measured 3× the corpus reads at sf0.1).
    p = (
        _bucket_counts(target, text_col, hex_chars)
        .withColumnRenamed("cnt", "cnt_p")
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    q = (
        _bucket_counts(corpus, text_col, hex_chars)
        .withColumnRenamed("cnt", "cnt_q")
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    np_ = p.agg(F.sum("cnt_p")).collect()[0][0] or 0
    nq = q.agg(F.sum("cnt_q")).collect()[0][0] or 0
    return (
        p.join(q, "bucket", "full")
        .select(
            "bucket",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("cnt_p"), F.lit(0)) + 1) * F.lit(nq + v)
                    ).cast("double")
                    / (
                        (F.coalesce(F.col("cnt_q"), F.lit(0)) + 1) * F.lit(np_ + v)
                    ).cast("double")
                )
                * F.lit(scale)
            )
            .cast("long")
            .alias("llr_fp"),
        )
    )


def dsir_model_tagged(
    corpus: DataFrame,
    is_target,
    text_col: str = "text",
    hex_chars: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """:func:`dsir_model` for the common case where the TARGET is a
    predicate-subset of the corpus (``is_target`` a boolean Column over
    corpus rows): both count tables come from a SINGLE explode +
    aggregate — count every gram, conditionally count target grams —
    one fewer full corpus scan than ``dsir_model(corpus,
    corpus.filter(pred))``. Produces bit-identical models (target ⊆
    corpus means no target-only buckets, so the full-join and the
    tagged one-pass agree row-for-row)."""
    v = 16**hex_chars
    pred = F.expr(is_target) if isinstance(is_target, str) else is_target
    counts = (
        corpus.select(
            pred.alias("_t"),
            F.explode(
                F.expr(_gram_expr(f"coalesce({text_col}, '')"))
            ).alias("gram"),
        )
        .select("_t", F.substring(F.md5("gram"), 1, hex_chars).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt_q"),
            F.sum(F.when(F.col("_t"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_p"),
        )
        .localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    )
    tot = counts.agg(F.sum("cnt_p"), F.sum("cnt_q")).collect()[0]
    np_, nq = tot[0] or 0, tot[1] or 0
    return counts.select(
        "bucket",
        F.floor(
            F.log(
                ((F.col("cnt_p") + 1) * F.lit(nq + v)).cast("double")
                / ((F.col("cnt_q") + 1) * F.lit(np_ + v)).cast("double")
            )
            * F.lit(scale)
        )
        .cast("long")
        .alias("llr_fp"),
    )


def _weights_from_model(
    corpus: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    hex_chars: int,
) -> DataFrame:
    """The per-document weighting pass: explode → broadcast model join →
    one doc_id groupBy. NULL text is treated as '' — split('') still
    yields one (empty) gram, so EVERY document reaches the aggregate and
    no restore join is needed afterward (plan-audited: zero sort-merge
    joins on the corpus side)."""
    safe_text = f"coalesce({text_col}, '')"
    grams = corpus.select(
        F.col(id_col), F.explode(F.expr(_gram_expr(safe_text))).alias("gram")
    ).select(id_col, F.substring(F.md5("gram"), 1, hex_chars).alias("bucket"))
    return (
        grams.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("llr_fp").cast("long").alias("weight_fp"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """(id, weight_fp, n_grams) for every corpus document: weight_fp is
    the integer-summed fixed-point log-likelihood ratio (higher ⇒ more
    target-like), n_grams the gram count (for per-gram normalization
    downstream)."""
    model = dsir_model(corpus, target, text_col, hex_chars, scale)
    return _weights_from_model(corpus, model, id_col, text_col, hex_chars)


def dsir_weights_within(
    corpus: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """:func:`dsir_weights` when the target is ``corpus.filter(pred)``:
    the model comes from the one-pass tagged aggregation, so the whole
    weighting costs TWO corpus gram scans instead of three (measured
    ~20% faster at sf0.1; the saving is a full scan at any scale).

    ROUND-10 NOTE (measured, kept deliberately): materializing the
    (id, is_target, bucket) gram relation once (the charlm_grams trade)
    and feeding both the model agg and the weighting join was tried —
    it regressed the ×10 leg 7× (1.97 → 13.9 s): DSIR grams are a flat
    split/zip + one md5 (cheap codegen to recompute), so writing and
    re-reading the corpus-×2-sized gram stream costs far more than the
    second explode. Contrast charlm, where the per-element bigram
    construction is the expensive part and the shared materialization
    wins. Recompute-vs-materialize is a per-operator measurement, not a
    doctrine."""
    model = dsir_model_tagged(corpus, target_pred, text_col, hex_chars, scale)
    return _weights_from_model(corpus, model, id_col, text_col, hex_chars)


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """The ``budget`` most-target-like documents: (id, weight_fp),
    ordered deterministically by (weight desc, id). Plans as
    TakeOrderedAndProject — no global sort materializes."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    w = dsir_weights(corpus, target, id_col, text_col, hex_chars, scale)
    return (
        w.orderBy(F.col("weight_fp").desc(), F.col(id_col))
        .limit(budget)
        .select(id_col, "weight_fp")
    )


def dsir_select_within(
    corpus: DataFrame,
    target_pred,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """:func:`dsir_select` with the one-pass tagged model (target is
    ``corpus.filter(pred)``)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    w = dsir_weights_within(corpus, target_pred, id_col, text_col, hex_chars, scale)
    return (
        w.orderBy(F.col("weight_fp").desc(), F.col(id_col))
        .limit(budget)
        .select(id_col, "weight_fp")
    )


def dsir_oracle_sql(
    corpus_sql: str,
    target_sql: str,
    hex_chars: int = 3,
    scale: int = DEFAULT_SCALE,
    select_budget: int | None = None,
) -> str:
    """DuckDB twin of :func:`dsir_weights` (or :func:`dsir_select` when
    ``select_budget`` is given). ``corpus_sql``/``target_sql`` must
    select (doc_id, text)."""
    v = 16**hex_chars
    # RANGE is end-exclusive in DuckDB, so single-token docs get an empty
    # bigram list for free (the Spark side needs an explicit guard because
    # sequence() is end-inclusive and descends when stop < start)
    grams = (
        "SELECT doc_id, UNNEST(toks || "
        "LIST_TRANSFORM(RANGE(1, LEN(toks)), i -> toks[i] || ' ' || toks[i+1])"
        ") AS gram FROM (SELECT doc_id, "
        "STRING_SPLIT(COALESCE(text, ''), ' ') AS toks FROM {src})"
    )
    body = f"""
WITH corpus AS ({corpus_sql}),
target AS ({target_sql}),
cg AS (SELECT doc_id, SUBSTR(MD5(gram), 1, {hex_chars}) AS bucket
       FROM ({grams.format(src='corpus')})),
tg AS (SELECT SUBSTR(MD5(gram), 1, {hex_chars}) AS bucket
       FROM ({grams.format(src='target')})),
p AS (SELECT bucket, COUNT(*) AS cnt_p FROM tg GROUP BY bucket),
q AS (SELECT bucket, COUNT(*) AS cnt_q FROM cg GROUP BY bucket),
np AS (SELECT COALESCE(SUM(cnt_p), 0) AS n FROM p),
nq AS (SELECT COALESCE(SUM(cnt_q), 0) AS n FROM q),
model AS (
  SELECT COALESCE(p.bucket, q.bucket) AS bucket,
         CAST(FLOOR(LN(
           CAST((COALESCE(cnt_p, 0) + 1) * ((SELECT n FROM nq) + {v}) AS DOUBLE)
           / CAST((COALESCE(cnt_q, 0) + 1) * ((SELECT n FROM np) + {v}) AS DOUBLE)
         ) * {scale}) AS BIGINT) AS llr_fp
  FROM p FULL JOIN q ON p.bucket = q.bucket),
weights AS (
  SELECT cg.doc_id,
         CAST(SUM(llr_fp) AS BIGINT) AS weight_fp,
         CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM cg JOIN model USING (bucket) GROUP BY cg.doc_id)
"""
    if select_budget is None:
        return body + "SELECT doc_id, weight_fp, n_grams FROM weights"
    return body + (
        "SELECT doc_id, weight_fp FROM weights "
        f"ORDER BY weight_fp DESC, doc_id LIMIT {select_budget}"
    )
