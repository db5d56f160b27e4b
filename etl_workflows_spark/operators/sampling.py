"""Deterministic sampling for training-data mixtures.

RNG sampling (``df.sample``/``sampleBy``) is irreproducible across runs,
partitionings, and engines — useless for a corpus contract ("the v3 mix
is THESE documents"). These operators sample by content hash instead: a
row is in the sample iff the first 8 hex chars of ``md5(salt || key)``
fall below the fraction's threshold. Properties that matter at 100 TB:

- **Reproducible anywhere**: any engine with md5 picks the identical
  rows (the DuckDB oracles verify this bit-for-bit).
- **Stable under growth**: adding documents never flips membership of
  existing ones (hash depends only on the row's own key) — re-running a
  mix after a corpus append only adds rows.
- **Embarrassingly parallel**: a codegen'd filter on the scan, no
  shuffle, no RNG state to coordinate across 1000 executors.
- **Independent draws**: distinct ``salt`` values give independent
  samples (train/val splits don't correlate with mixture sampling).

Net-new vs the reference (SURVEY.md §2.7 north-star scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_workflows_spark.operators.cache import SCRATCH_LEVEL


def _hex_threshold(fraction: float) -> str:
    """First-8-hex-chars threshold for a fraction: md5 hex compares
    lexicographically as a uniform 32-bit value (fixed width, 0-9 < a-f)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


def salted_hash(key: Column, salt: str) -> Column:
    """THE corpus-contract content hash: md5 over ``salt || ':' || key``.
    Single definition shared by sampling, splits, and packing — the
    reproducibility claims of all three rest on this one expression."""
    return F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))


def _hash8(key: Column, salt: str) -> Column:
    return F.substring(salted_hash(key, salt), 1, 8)


def _keep(h: Column, fraction: float) -> Column:
    """Membership predicate for one fraction. 1.0 short-circuits to
    always-true (a strict ``<`` against 'ffffffff' would drop a row whose
    hash prefix is exactly ffffffff, p≈2^-32 — 1.0 must mean keep-ALL);
    0.0 likewise short-circuits to always-false."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    return h < F.lit(_hex_threshold(fraction))


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of ``key_col``."""
    return df.filter(_keep(_hash8(F.col(key_col), salt), fraction))


def aqp_sum_estimate(
    df: DataFrame,
    value_col: Column,
    key: Column,
    fraction: float,
    group_cols: list[str] | None = None,
    salt: str = "aqp",
    z: float = 1.96,
) -> DataFrame:
    """Approximate-query-processing SUM with error bars: scan only the
    deterministic ~``fraction`` Bernoulli sample and return the
    Horvitz-Thompson estimate of the full-table sum per group, with a
    normal-approximation ±z·σ half-width.

    The 100 TB reason this exists: an exact daily revenue total scans
    every byte; a 1-5% deterministic sample answers dashboards and data
    validation in 1/20 the IO with a quantified error — and because
    membership is the corpus-contract content hash (``salted_hash``),
    the estimate is bit-reproducible on ANY engine, not a new random
    draw per run.

    Exactness contract (what the DuckDB twin mirrors): the inclusion
    probability is the EXACT rational threshold/2³² the hash compare
    implements — not the requested ``fraction`` — so the estimator is
    genuinely unbiased for the hash design AND both engines compute
    from the identical double ``p``. Sample sums are EXACT decimals
    (Σv, Σv² via decimal arithmetic); the estimate
    ``Σv/p`` and Bernoulli-HT variance ``(1-p)/p²·Σv²`` are then fixed-
    association double expressions of those exact sums. ``value_col``
    must already be a decimal expression (use ``queries.base.dec``).

    Plan: ONE scan with the hash filter fused into it (codegen predicate,
    no shuffle of unsampled rows), one map-side-combined agg on the
    group key. n_sampled < 2 in a group → NULL ci (no variance basis).
    """
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    from pyspark.sql.types import DecimalType

    vtype = df.select(value_col.alias("__v")).schema["__v"].dataType
    if not isinstance(vtype, DecimalType):
        raise ValueError(
            f"value_col must be a decimal expression (got {vtype}): the "
            "bit-reproducibility contract rests on exact decimal sample "
            "sums — cast with queries.base.dec or .cast('decimal(18,4)')"
        )
    thr = min(int(fraction * 16**8), 16**8 - 1)
    p = thr / 4294967296.0  # the EXACT inclusion probability of the compare
    g = group_cols or []
    s = df.filter(_keep(_hash8(key, salt), p))
    v = value_col
    agg = s.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__s2"),
    )
    sd = F.col("__s").cast("double")
    s2d = F.col("__s2").cast("double")
    est = sd / F.lit(p)
    # ONE pre-folded literal for the variance factor: z²·(1−p)/p² is
    # computed HERE (plain python doubles) and enters both engines as a
    # single constant, leaving only literal×column and sqrt at runtime.
    # Leaving the chain to the engines invites constant reassociation —
    # DuckDB's optimizer rewrote ((1−p)/p²)·Σv² and landed one ulp off
    # the sequential evaluation (seen at sf0.01, group R).
    cf = z * z * (1.0 - p) / (p * p)
    ci = F.sqrt(F.lit(cf) * s2d)
    # COUNT is the same HT estimator with v ≡ 1: Σ1/p and Σ1² = n_s, so
    # its band needs no extra aggregation state
    nd = F.col("n_sampled").cast("double")
    est_n = nd / F.lit(p)
    ci_n = F.sqrt(F.lit(cf) * nd)
    return agg.select(
        *g,
        "n_sampled",
        est.alias("est_total"),
        F.when(F.col("n_sampled") >= 2, ci).alias("ci_half"),
        est_n.alias("est_count"),
        F.when(F.col("n_sampled") >= 2, ci_n).alias("count_ci_half"),
    )


def aqp_oracle_math_sql(fraction: float, z: float = 1.96) -> tuple[str, str, str]:
    """The (hex threshold, p literal, variance-factor literal) triple for
    an AQP oracle: one generated source for the constants both engines
    must share, so a fraction change cannot drift the SQL twin. The
    variance factor z²·(1−p)/p² is pre-folded here (see
    ``aqp_sum_estimate``'s reassociation note); ``repr`` of a double
    round-trips exactly through DuckDB's literal parser."""
    thr = min(int(fraction * 16**8), 16**8 - 1)
    p = thr / 4294967296.0
    cf = z * z * (1.0 - p) / (p * p)
    return format(thr, "08x"), repr(p), repr(cf)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weights operator
    (e.g. {'web': 0.1, 'books': 1.0}). Strata absent from ``fractions``
    get ``default_fraction``. A fraction of 1.0 keeps every row of its
    stratum exactly; 0.0 keeps none."""
    h = _hash8(F.col(key_col), salt)
    pred = _keep(h, default_fraction)
    for stratum, frac in sorted(fractions.items()):
        pred = F.when(F.col(strata_col) == stratum, _keep(h, frac)).otherwise(pred)
    return df.filter(pred)


def assign_split(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Stable train/val/test assignment: cumulative hash-threshold bands.

    ``splits`` maps name → share and must sum to 1. Bands are laid out in
    sorted split-name order, so the assignment is a pure function of
    (key, salt, splits) — growing the corpus never reassigns a row.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split shares must sum to 1, got {total}")
    h = _hash8(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = sorted(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = _keep(h, cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group frequency cap: keep at most ``n`` rows per
    group (e.g. ≤ N documents per domain/source — the anti-domination
    rule of web-corpus curation).

    Selection is by the corpus-contract content hash (``salted_hash``),
    key-tie-broken — a pure function of (key, salt), so re-runs and
    corpus growth never swap previously kept rows for unrelated ones,
    and which rows survive is independent of physical row order.

    Scale: one shuffle on ``group_col``; rank-within-group is the same
    window machinery as any top-k — no driver-side state.
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    from pyspark.sql.window import Window

    h = _hash8(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of exactly k rows,
    deterministic: the Efraimidis-Spirakis exponential-sort-key scheme
    with the corpus-contract hash as the uniform source.

    Each row gets priority ``u^(1/w)`` (equivalently rank by
    ``-ln(u)/w``) where u is its hash-uniform in (0,1); the global top-k
    by priority is a weighted sample without replacement. Fully parallel
    — per-row scoring plus one TakeOrderedAndProject-shaped top-k, no
    rejection loops, no sequential pass; reruns pick the identical set
    (pure function of key, salt, weights).

    Rows with non-positive or NULL weight are excluded (never sampled).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # hash8 hex → uniform in (0,1): (int(h,16) + 0.5) / 16^8 avoids u=0
    u = (
        F.conv(_hash8(F.col(key_col), salt), 16, 10).cast("double") + 0.5
    ) / F.lit(float(16**8))
    w = F.col(weight_col).cast("double")
    priority = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w > 0)
        .withColumn("__pri", priority)
        .orderBy(F.col("__pri").desc(), F.col(key_col))
        .limit(k)
        .drop("__pri")
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """``blend_sources`` with the weights COMPUTED from observed sizes:
    target proportion w_s ∝ n_s^alpha — temperature sampling (the
    multilingual-corpus convention: alpha=1 keeps natural proportions,
    alpha→0 flattens toward uniform, 0.3–0.7 is the usual range). Large
    sources downsample toward the tempered mixture; the binding source
    keeps everything (same max-total logic as blend_sources).

    Cross-engine determinism: n^alpha is integerized as
    floor(n^alpha·1e9) BEFORE normalization, so the weight sum is an
    exact integer (order-independent) and every later expression is a
    fixed-association double chain an oracle can mirror. With the
    default alpha=0.5 the power is sqrt — correctly rounded per IEEE on
    every engine, making the whole blend bit-reproducible; other alphas
    keep determinism within one engine (pow's last ulp may differ
    across engines).

    Same scale posture as blend_sources: one #sources-row agg, two
    1-row reductions, a broadcast threshold join, a codegen hash filter.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    p = F.sqrt("__n") if alpha == 0.5 else F.pow("__n", F.lit(float(alpha)))
    sized = counts.withColumn(
        "__p", F.floor(p * F.lit(1_000_000_000.0)).cast("bigint")
    )
    tot = sized.agg(F.sum("__p").alias("__tot"))
    weighted = sized.crossJoin(F.broadcast(tot)).select(
        source_col,
        "__n",
        (F.col("__p").cast("double") / F.col("__tot").cast("double")).alias(
            "__w"
        ),
    )
    tmin = weighted.agg(F.min(F.col("__n") / F.col("__w")).alias("__T"))
    thresholds = weighted.crossJoin(F.broadcast(tmin)).select(
        source_col,
        F.floor(
            F.col("__w") * F.col("__T") / F.col("__n") * F.lit(4294967296.0)
        ).alias("__thr"),
    )
    h32 = F.conv(_hash8(F.col(key_col), salt), 16, 10).cast("bigint")
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(h32 < F.col("__thr"))
        .drop("__thr")
    )


def blend_sources(
    df: DataFrame,
    weights: dict,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "blend",
) -> DataFrame:
    """Downsample per source so the surviving corpus matches target mixture
    ``weights`` (source → proportion), keeping as much data as possible.

    The max total T with w_s·T ≤ n_s for every source is T = min_s(n_s/w_s);
    each source then keeps fraction w_s·T/n_s — the binding (scarcest
    relative to its target) source keeps everything, the rest downsample
    to proportion. Membership is the corpus-contract content hash compared
    as a 32-bit integer against floor(frac·2³²), so the blend is a pure
    function of (row key, salt, weights, per-source counts): reproducible
    on any engine, and when a source's keep-fraction grows the kept set
    only ever GROWS (thresholds are nested) — no churn of already-kept
    rows as the corpus evolves.

    Fully in-plan: one groupBy(source) count (tiny — #sources rows), a
    1-row global min, a broadcast join of per-source thresholds back onto
    the corpus, and a codegen hash filter. No driver-side thresholds, no
    second scan. Sources absent from ``weights`` are dropped (target
    proportion zero).

    At 100 TB: the count agg is map-side-combined to #sources rows, the
    threshold join is a broadcast of #sources rows, and the filter is
    embarrassingly parallel — nothing scales with corpus size except the
    one scan every sampler needs.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {source: proportion} map")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("all weights must be > 0 (omit a source to drop it)")
    w_map = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], float(kv[1]))]
    )
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
        .withColumn("__w", F.element_at(w_map, F.col(source_col)))
        .filter(F.col("__w").isNotNull())
    )
    total = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__T"))
    thresholds = counts.crossJoin(F.broadcast(total)).select(
        source_col,
        F.floor(
            F.col("__w") * F.col("__T") / F.col("__n") * F.lit(4294967296.0)
        ).alias("__thr"),
    )
    h32 = F.conv(_hash8(F.col(key_col), salt), 16, 10).cast("bigint")
    return (
        df.join(F.broadcast(thresholds), source_col)
        .filter(h32 < F.col("__thr"))
        .drop("__thr")
    )


def split_by_group(
    df: DataFrame,
    splits: dict,
    group_col: str,
    salt: str = "gsplit",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-free train/val/test assignment: the split is a hash of a
    GROUP key, so every member of a group lands in the same split.

    The classic contamination bug in training-data splits is per-document
    assignment — near-identical documents straddle train and eval and the
    eval set silently leaks. Pass the group that defines "the same
    content": an exact-dup fingerprint (md5 of text), a near-dup cluster
    id from ``dedup.cluster_duplicates``, or a domain/source. Same
    cumulative hash-band layout as ``assign_split`` (pure function of
    group key + salt: corpus growth never reassigns a group); zero extra
    shuffles — the hash is computed per-row from the group column.
    """
    return assign_split(
        df, splits, key_col=group_col, salt=salt, out_col=out_col
    )


def budget_select(
    df: DataFrame,
    budget: int,
    quality_col: str,
    cost_col: str,
    key_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Select the highest-``quality_col`` rows whose cumulative
    ``cost_col`` (e.g. token count) stays within ``budget`` — "give me the
    best N-token corpus", the canonical data-selection step before
    training.

    Semantics: rows ordered by (quality desc, key asc); a row is kept iff
    the running cost total up to and including it is ≤ budget. Exact —
    equivalent to ``SUM(cost) OVER (ORDER BY quality DESC, key) <=
    budget`` — but computed with the bucketed ``global_cumsum`` plan
    (operators/ordering.py), so there is no single-partition window: the
    running total is a per-bucket window plus a literal offset, with
    bucket boundaries from one approx-percentile sketch.

    Returns the kept rows with ``cum_cost`` attached.
    """
    from etl_workflows_spark.operators import ordering

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    d = df.withColumn("__negq", -F.col(quality_col))
    bucket = ordering.numeric_cut_buckets(d, "__negq", n_buckets)
    out = ordering.global_cumsum(
        d,
        sort_cols=["__negq", key_col],
        val_col=cost_col,
        bucket=bucket,
        out_col="cum_cost",
    )
    return out.filter(F.col("cum_cost") <= budget).drop("__negq")


def negative_samples(
    pairs: DataFrame,
    n_corpus: int,
    k: int,
    query_col: str = "query_id",
    pos_col: str = "pos_id",
    salt: str = "neg",
) -> DataFrame:
    """k deterministic negatives per (query, positive) pair for
    contrastive training: negative i of query q is
    ``md5(salt:q:i) mod n_corpus`` over a dense [0, n_corpus) id space,
    bumped by one (mod n) if it collides with the positive.

    Same portability contract as every sampler here: a pure function of
    (query key, salt, i), so any engine regenerates the identical
    negatives and re-runs never reshuffle them. Embarrassingly parallel —
    an explode(k) plus codegen arithmetic, no joins, no RNG state.
    (Dense ids are what ``ordering.global_ordinals`` exists to mint.)
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_corpus < 2:
        raise ValueError(f"n_corpus must be >= 2, got {n_corpus}")
    exploded = pairs.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("neg_rank")
    )
    # the corpus-contract hash (salted_hash), keyed on query:rank —
    # byte-identical to hand-building the md5, but there is ONE shared
    # definition for every sampler's reproducibility claim
    h = F.conv(
        F.substring(
            salted_hash(
                F.concat(
                    F.col(query_col).cast("string"),
                    F.lit(":"),
                    F.col("neg_rank").cast("string"),
                ),
                salt,
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    raw = h % F.lit(n_corpus)
    neg = F.when(
        raw == F.col(pos_col), (raw + 1) % F.lit(n_corpus)
    ).otherwise(raw)
    return exploded.withColumn("neg_id", neg)


def token_budget_plan(
    docs: DataFrame,
    budget: int,
    weights: dict | None = None,
    default_weight: float = 1.0,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source epoch/sampling plan for a target token budget — the
    mixture-planning step before a training run ("2T tokens at these
    source weights: how many epochs of each source is that, and which
    sources must be subsampled?").

    For each source s with available whitespace tokens A_s and weight
    w_s (``weights`` dict, ``default_weight`` for unlisted sources), the
    target share is ``budget * w_s / sum(w)`` and the epoch count is
    ``target / A_s``; ``sample_fraction`` caps at 1.0 (feed it to
    ``deterministic_sample``) and ``repeat_epochs`` is the integer
    repeat factor an epoch-based loader needs (``ceil(epochs)``).

    Scale shape: one groupBy(source) aggregation over the corpus (the
    only shuffle, map-side combined); the weight table is a literal map
    in the plan (sources are a handful of names, never data-sized), and
    the total-weight window runs over the post-agg frame, which has one
    row per source.
    """
    frame = _token_budget_frame(
        docs, budget, weights, default_weight, source_col, text_col
    )
    return frame.select(
        F.col(source_col),
        "available_tokens",
        "weight",
        F.round(F.col("__target_exact"), 4).alias("target_tokens"),
        F.round(F.col("__epochs_exact"), 6).alias("epochs"),
        F.round(F.least(F.lit(1.0), F.col("__epochs_exact")), 6).alias(
            "sample_fraction"
        ),
        "repeat_epochs",
    )


def _token_budget_frame(
    docs: DataFrame,
    budget: int,
    weights: dict | None,
    default_weight: float,
    source_col: str,
    text_col: str,
) -> DataFrame:
    """Shared per-source plan frame with the UNROUNDED target
    (``__target_exact``): ``token_budget_plan`` rounds it for display;
    ``materialize_token_budget`` filters on it, so the keep/drop decision
    for a boundary document never depends on display rounding (a target
    within 5e-5 of an integer must not flip membership)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql.window import Window

    if weights:
        kv = []
        for k, v in weights.items():
            kv += [F.lit(k), F.lit(float(v))]
        wcol = F.coalesce(
            F.element_at(F.create_map(*kv), F.col(source_col)),
            F.lit(float(default_weight)),
        )
    else:
        wcol = F.lit(float(default_weight))
    avail = docs.groupBy(source_col).agg(
        F.sum(F.size(F.split(F.col(text_col), " ")))
        .cast("bigint")
        .alias("available_tokens")
    )
    # post-agg cardinality = number of sources; the empty-frame window
    # is a tiny single-exchange step, not a corpus-wide sort
    total_w = F.sum(wcol).over(Window.partitionBy())
    target = F.lit(float(budget)) * wcol / total_w
    epochs = target / F.col("available_tokens").cast("double")
    return avail.select(
        F.col(source_col),
        "available_tokens",
        wcol.alias("weight"),
        target.alias("__target_exact"),
        epochs.alias("__epochs_exact"),
        F.ceil(epochs).cast("int").alias("repeat_epochs"),
    )


def materialize_token_budget(
    docs: DataFrame,
    budget: int,
    weights: dict | None = None,
    default_weight: float = 1.0,
    source_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Materialize a ``token_budget_plan``: the actual training mix.

    Each source's documents are epoch-replicated ``repeat_epochs``
    times, ordered by the corpus-contract hash of (key, epoch), and the
    hash-ordered PREFIX whose running token total stays within the
    source's target share is kept. Output rows are (key, source, epoch,
    n_tokens, cum_tokens) — the dataloader manifest: deterministic
    (pure function of content + salt, reproducible on any engine),
    growth-stable per the module contract, and epoch-diverse (each
    epoch's copy hashes independently, so repeats interleave instead of
    replaying one order).

    Scale shape: the plan is a per-source aggregate broadcast back onto
    the corpus; the only data-sized work is one explode (≤ repeat
    epochs) and the per-source running total, computed with the bucketed
    ``ordering.global_cumsum`` two-pass form (``partition_cols=[source]``,
    bucket = md5-prefix) — the window is partitioned by (source, hash
    bucket), so a source holding most of a 100 TB corpus becomes ~256
    parallel sort tasks, never one. ``n_tokens`` is a long, so the
    bucketed summation is bit-exact vs the naive window. The prefix
    filter compares against the UNROUNDED target share (the rounded
    ``target_tokens`` column of ``token_budget_plan`` is display-only).
    Prefix semantics: a document whose tokens would cross the target
    ends its source's intake (no fractional docs).
    """
    from etl_workflows_spark.operators import ordering

    plan = _token_budget_frame(
        docs, budget, weights, default_weight, source_col, text_col
    ).select(source_col, "__target_exact", "repeat_epochs")
    d = (
        docs.join(F.broadcast(plan), source_col)
        .filter(F.col("repeat_epochs") > 0)
        .select(
            key_col,
            source_col,
            F.size(F.split(F.col(text_col), " "))
            .cast("long")
            .alias("n_tokens"),
            "__target_exact",
            F.explode(
                F.sequence(F.lit(0), F.col("repeat_epochs") - 1)
            ).alias("epoch"),
        )
    )
    d = d.withColumn(
        "__h",
        salted_hash(
            F.concat(
                F.col(key_col).cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            ),
            salt,
        ),
    )
    # materialize the exploded frame ONCE: the bucketed cumsum's offsets
    # pass and window pass both read it, and without this the
    # scan → broadcast-join → explode → md5 upstream runs twice (same
    # contract as spans._duplicated_hits' checkpoint; at cluster scale
    # persist to storage instead)
    d = d.localCheckpoint(eager=True, storageLevel=SCRATCH_LEVEL)
    out = ordering.global_cumsum(
        d,
        sort_cols=["__h", key_col, "epoch"],
        val_col="n_tokens",
        bucket=ordering.hash_prefix_bucket(F.col("__h")),
        out_col="cum_tokens",
        partition_cols=[source_col],
    )
    return (
        out.filter(F.col("cum_tokens") <= F.col("__target_exact"))
        .select(key_col, source_col, "epoch", "n_tokens", "cum_tokens")
    )
