"""Global row ordinals and deterministic corpus shuffling at scale.

``row_number() OVER (ORDER BY k)`` is the classic single-reducer trap:
Spark plans an ``Exchange SinglePartition`` feeding one Window task, so
every row of a 100 TB table funnels through one executor. These operators
produce the SAME exact ordinals with a bucketed two-pass plan:

1. a *bucket key* that is a monotone coarsening of the sort order (range
   cut points for numerics, the leading byte of a hash for uniform keys);
2. per-bucket counts collected to the driver — a bounded constant
   (``n_buckets`` rows, independent of data size);
3. cumulative offsets re-injected as a literal ``map`` lookup, plus a
   ``row_number`` window PARTITIONED by bucket — parallel across buckets,
   no single-partition exchange anywhere in the plan.

Training pipelines need this twice: stable example ids over a corpus
snapshot, and the per-epoch deterministic shuffle (position = rank of
``md5(epoch_salt || id)``) that lets any worker recompute "which examples
are in my shard for epoch E" without a stored permutation.

Net-new operators (no reference counterpart — the reference delegates all
query processing to its warehouse engine; cf. reference
functions/load_query/main.py which only submits SQL text).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_workflows_spark.operators.sampling import salted_hash


def numeric_cut_buckets(df: DataFrame, col: str, n_buckets: int = 64) -> Column:
    """Bucket expression for a numeric sort column: 1 + #cut-points-below.

    Cut points come from one tree-aggregated ``percentile_approx`` (GK
    sketch) — a driver-side constant of ``n_buckets - 1`` doubles, bounded
    regardless of data size. Sketch error only skews bucket *balance*,
    never ordinal *correctness*: equal values always land in the same
    bucket (strict ``>`` against each cut), and within-bucket ranking
    restores the exact order.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    cuts = df.select(
        F.percentile_approx(
            col, [i / n_buckets for i in range(1, n_buckets)], 100_000
        ).alias("cuts")
    ).collect()[0]["cuts"]
    bucket = F.lit(1)
    seen = set()
    for c in cuts or []:
        c = float(c)
        if c in seen:  # duplicate cut points add nothing but expression depth
            continue
        seen.add(c)
        bucket = bucket + F.when(F.col(col) > F.lit(c), 1).otherwise(0)
    # NULL sort values must surface as NULL buckets (not silently bucket 1):
    # global_ordinals rejects them — Spark sorts NULLs first, other engines
    # last, so a NULL key has no portable ordinal.
    return F.when(F.col(col).isNotNull(), bucket)


def hash_prefix_bucket(hash_col: Column, n_hex_chars: int = 2) -> Column:
    """Bucket expression for an md5-hex sort key: its leading hex chars as
    an integer (256 uniform buckets at the default 2 chars). Monotone by
    construction — lexicographic hex order == numeric order of the prefix.
    """
    return F.conv(F.substring(hash_col, 1, n_hex_chars), 16, 10).cast("int")


def global_ordinals(
    df: DataFrame,
    sort_cols: Sequence[str],
    bucket: Column,
    ordinal_col: str = "ordinal",
    start: int = 1,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact dense global row numbers by ``sort_cols``, no global sort.

    ``bucket`` must be a deterministic pure function of the row that
    coarsens the sort order (all rows of bucket b sort before all rows of
    bucket b+1). ``sort_cols`` should be a total order (include a unique
    tiebreaker) for reproducible output.

    Plan shape: one shuffle for the tiny per-bucket count agg (collected:
    <= n_buckets rows), one hash-partitioned shuffle for the per-bucket
    ``row_number`` window. The count pass and the rank pass each scan the
    input once; bucket being value-determined makes the two passes agree
    without caching.

    ``partition_cols`` makes the numbering RESET per group — the
    scale-safe ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY k)`` for
    when one group can overwhelm a single executor's sort (per-source
    dataloader positions over a source holding most of the corpus).
    Same bounded-offsets contract as ``global_rank_and_cumsum``.

    Ordinals are int32 BY CONTRACT: each numbering domain (the whole
    frame, or one group under ``partition_cols``) must stay under 2^31
    rows — beyond that use ``global_rank_and_cumsum``, whose rank stays
    64-bit precisely for corpora that cross it (Spark's non-ANSI int
    cast would wrap silently; the DuckDB oracles' INTEGER cast raises).
    """
    out = global_rank_and_cumsum(
        df.withColumn("__ones", F.lit(0)),
        sort_cols,
        "__ones",
        bucket,
        ordinal_col="__rank64",
        cum_col="__cum0",
        start=start,
        partition_cols=partition_cols,
    )
    return out.withColumn(
        ordinal_col, F.col("__rank64").cast("int")
    ).drop("__ones", "__rank64", "__cum0")


def global_rank_and_cumsum(
    df: DataFrame,
    sort_cols: Sequence[str],
    val_col: str,
    bucket: Column,
    ordinal_col: str = "ordinal",
    cum_col: str = "cumsum",
    start: int = 1,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """``global_ordinals`` and ``global_cumsum`` fused: exact dense rank
    AND exact running total of ``val_col`` in global ``sort_cols`` order,
    from ONE per-bucket offsets pass (count + sum collected together,
    bounded by n_buckets rows) and one bucket-partitioned window — the
    shape for "rank by frequency and accumulate mass" computations
    (vocabulary coverage curves, Lorenz/Gini audits) that would
    otherwise pay two offset scans or a single-partition window.

    Same bucket contract as the two parents: a deterministic pure
    function of the row that coarsens the sort order.

    ``partition_cols`` (optional) makes the rank/cumsum RESET per group —
    the scale-safe form of ``SUM(v) OVER (PARTITION BY g ORDER BY k)``
    when a single group can overwhelm one executor's sort (e.g. one
    mixture source holding most of a 100 TB corpus). The offsets pass
    groups by (partition, bucket) — still a bounded driver constant of
    at most ``n_groups × n_buckets`` rows, so partition columns must be
    LOW-cardinality (sources, splits, shards — never a data-sized key;
    a high-cardinality group needs no bucketing in the first place).
    Partition values must be non-null.
    """
    pcols = list(partition_cols)
    d = df.withColumn("__bucket", bucket)
    stats_df = d.groupBy(*pcols, "__bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col(val_col)).alias("s")
    )
    rows = stats_df.collect()
    if any(r["__bucket"] is None for r in rows):
        raise ValueError(
            "global_rank_and_cumsum: bucket expression produced NULL — "
            "sort keys must be non-null (filter or coalesce them first)"
        )
    if pcols and any(
        any(r[c] is None for c in pcols) for r in rows
    ):
        raise ValueError(
            "global_rank_and_cumsum: partition_cols values must be "
            "non-null (a NULL group has no portable offset key)"
        )
    if pcols:
        return _partitioned_rank_and_cumsum(
            d,
            rows,
            pcols,
            sort_cols,
            val_col,
            ordinal_col,
            cum_col,
            start,
            sum_type=stats_df.schema["s"].dataType,
        )
    stats = sorted((r["__bucket"], r["n"], r["s"]) for r in rows)
    n_off: dict[int, int] = {}
    s_off: dict[int, int] = {}
    acc_n, acc_s = start - 1, 0
    for b, n, s in stats:
        n_off[b] = acc_n
        s_off[b] = acc_s
        acc_n += n
        acc_s += s or 0
    if not n_off:
        # cum_col must carry F.sum's result type (double for floats,
        # widened decimal for decimals) even on the empty path, or the
        # empty-frame schema diverges from the non-empty one and breaks
        # downstream unions / schema assertions. Same rule as the
        # partitioned sibling's empty branch — keep them in sync.
        return df.withColumn(
            ordinal_col, F.lit(None).cast("bigint")
        ).withColumn(
            cum_col, F.lit(None).cast(stats_df.schema["s"].dataType)
        )
    # bounded literal: one map entry per bucket, and every bucket
    # expression shipped with this module caps out at 256 entries
    # (hash_prefix_bucket's 2 hex chars / numeric_cut_buckets' default
    # 64) — far below the ~1k-entry create_map codegen cliff measured
    # on the mixture manifest (25× at ~5000 entries). Many-group keyed
    # offsets must use the partitioned sibling's broadcast join instead.
    n_expr = F.element_at(
        F.create_map(*[F.lit(x) for bn in n_off.items() for x in bn]),
        F.col("__bucket"),
    )
    s_expr = F.element_at(
        F.create_map(*[F.lit(x) for bs in s_off.items() for x in bs]),
        F.col("__bucket"),
    )
    w = W.partitionBy("__bucket").orderBy(*[F.col(c) for c in sort_cols])
    rn = F.row_number().over(w)
    cum = F.sum(F.col(val_col)).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # rank stays 64-bit: the fused form exists for corpora where even the
    # RANKED relation (vocabulary, file list, …) can pass 2^31 rows
    return (
        d.withColumn(ordinal_col, rn.cast("bigint") + n_expr.cast("bigint"))
        .withColumn(cum_col, cum + s_expr)
        .drop("__bucket")
    )


def _partitioned_rank_and_cumsum(
    d: DataFrame,
    rows: list,
    pcols: list[str],
    sort_cols: Sequence[str],
    val_col: str,
    ordinal_col: str,
    cum_col: str,
    start: int,
    sum_type=None,
) -> DataFrame:
    """Grouped variant of the offsets re-injection: cumulate per-bucket
    stats WITHIN each partition group on the driver, then BROADCAST-JOIN
    the (group, bucket) → offsets relation back and run the window
    partitioned by (partition cols, bucket) — no group ever becomes one
    sort task.

    The offsets travel as a broadcast join, not the unpartitioned path's
    literal map: the product n_groups × n_buckets reaches thousands of
    entries, and a create_map literal that size is a codegen bomb
    (measured 25× on the mixture manifest at 20 sources × 256 buckets)
    — while joining on the native column values also sidesteps every
    driver-str()-vs-Spark-cast representation mismatch, so partition
    columns may be any equatable type.

    Deliberately a SIBLING of ``global_rank_and_cumsum``'s unpartitioned
    tail rather than its generalization: unifying them would switch
    every existing caller's small int-keyed offset maps to a join and
    churn their pinned plans for zero behavior gain. A fix to the
    offsets-reinjection algorithm must be applied to both.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    if not rows:
        # empty-path cum_col takes the passed sum_type (F.sum's result
        # type), not a hardcoded bigint — a double/decimal val_col must
        # yield the same schema whether the frame is empty or not (the
        # unpartitioned tail applies the same rule; keep them in sync).
        return (
            d.drop("__bucket")
            .withColumn(ordinal_col, F.lit(None).cast("bigint"))
            .withColumn(
                cum_col,
                F.lit(None).cast(
                    sum_type if sum_type is not None else LongType()
                ),
            )
        )
    def _hashable(v):
        # collect() yields lists for array columns, bytearray for binary,
        # Rows for structs, dicts for maps — make the driver-side group
        # key hashable WITHOUT changing the values shipped back in the
        # offsets relation. Float NaN needs a sentinel: Python dicts
        # split NaN keys (NaN != NaN) while Spark's groupBy/join treat
        # NaN as one equal group — unsentineled, every (NaN-group,
        # bucket) would restart its offsets at zero, silently.
        if isinstance(v, float) and v != v:
            return ("__nan__",)
        if isinstance(v, list):
            return tuple(_hashable(x) for x in v)
        if isinstance(v, bytearray):
            return bytes(v)
        if isinstance(v, dict):
            return tuple(
                sorted((k, _hashable(x)) for k, x in v.items())
            )
        if hasattr(v, "__fields__"):  # pyspark Row (struct column)
            return tuple(_hashable(x) for x in v)
        return v

    groups: dict[tuple, list] = {}
    originals: dict[tuple, tuple] = {}
    for r in rows:
        gvals = tuple(r[c] for c in pcols)
        gkey = tuple(_hashable(v) for v in gvals)
        originals.setdefault(gkey, gvals)
        groups.setdefault(gkey, []).append((r["__bucket"], r["n"], r["s"]))
    # __soff carries SUMS of val_col, so it takes F.sum's result type
    # (long for ints, double for floats, widened decimal for decimals) —
    # a hardcoded long rejects double/decimal value columns, which the
    # public docstring supports. Python-side accumulation is coerced to
    # the matching Python type so createDataFrame's verifier accepts it.
    stype = sum_type if sum_type is not None else LongType()
    tname = stype.typeName()

    def _coerce_sum(x):
        if tname == "double" or tname == "float":
            return float(x)
        if tname.startswith("decimal"):
            from decimal import Decimal

            return x if isinstance(x, Decimal) else Decimal(x)
        return int(x)

    off_rows = []
    for gkey, stats in groups.items():
        acc_n, acc_s = start - 1, 0
        for b, n, s in sorted(stats):
            off_rows.append(
                (*originals[gkey], b, acc_n, _coerce_sum(acc_s))
            )
            acc_n += n
            acc_s += s or 0
    schema = StructType(
        [
            *[d.schema[c] for c in pcols],
            d.schema["__bucket"],
            StructField("__noff", LongType(), False),
            StructField("__soff", stype, False),
        ]
    )
    offs = d.sparkSession.createDataFrame(off_rows, schema)
    joined = d.join(F.broadcast(offs), [*pcols, "__bucket"])
    w = W.partitionBy(*pcols, "__bucket").orderBy(
        *[F.col(c) for c in sort_cols]
    )
    rn = F.row_number().over(w)
    cum = F.sum(F.col(val_col)).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # the join moved the key columns to the front — restore the caller's
    # column order (input columns, then ordinal, then cumsum: the same
    # shape the unpartitioned sibling's withColumn appends produce)
    orig_cols = [c for c in d.columns if c != "__bucket"]
    return (
        joined.withColumn(ordinal_col, rn.cast("bigint") + F.col("__noff"))
        .withColumn(cum_col, cum + F.col("__soff"))
        .select(*orig_cols, ordinal_col, cum_col)
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    key_col: str = "doc_id",
    pos_col: str = "pos",
    salt: str = "epoch",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Deterministic training-epoch shuffle: every row gets a dense 1..N
    position, permuted by ``md5(salt:epoch: || key)``.

    Any engine (and any epoch-E worker) recomputes the identical
    permutation from the corpus alone — no stored shuffle files, no
    driver-held permutation array. Buckets are the hash's leading byte
    (uniform by construction), so the ranking window is hash-partitioned
    256 ways; shard extraction for worker w of W is then just
    ``pos % W == w`` on top of this.

    ``partition_cols`` shuffles WITHIN each group (positions reset per
    group — per-source dataloader order); int32 positions per
    ``global_ordinals``' contract.
    """
    h = salted_hash(F.col(key_col), f"{salt}:{epoch}")
    d = df.withColumn("__h", h)
    out = global_ordinals(
        d,
        sort_cols=["__h", key_col],
        bucket=hash_prefix_bucket(F.col("__h")),
        ordinal_col=pos_col,
        partition_cols=partition_cols,
    )
    return out.drop("__h")


def shard_for_epoch(
    df: DataFrame,
    epoch: int,
    shard: int,
    n_shards: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Worker ``shard`` of ``n_shards``'s slice of the epoch permutation:
    rows whose epoch position ≡ shard (mod n_shards), in position order
    within the shard. Cheap way for W workers to partition an epoch with
    zero coordination beyond (epoch, shard id)."""
    if not 0 <= shard < n_shards:
        raise ValueError(f"shard must be in [0, {n_shards}), got {shard}")
    d = epoch_shuffle(df, epoch, key_col=key_col)
    return d.filter((F.col("pos") - 1) % n_shards == shard)


def competence_curriculum(
    df: DataFrame,
    difficulty_col: str,
    n_stages: int = 4,
    total_steps: int = 10_000,
    key_col: str = "doc_id",
    salt: str = "curr",
) -> DataFrame:
    """Competence-based curriculum schedule (Platanios et al. 2019,
    "Competence-based Curriculum Learning for NMT"): examples are bucketed
    into ``n_stages`` difficulty quantile stages; stage ``s`` unlocks when
    the model's competence ``c(t) = sqrt(t / total_steps)`` reaches
    ``(s+1) / n_stages`` — i.e. at step ``total_steps·((s+1)/n_stages)²``,
    so easy data trains first and the hardest quartile arrives last.

    Output adds three columns: ``stage`` (0-based), ``pos`` (dense 1..N
    per-stage dataloader position, the deterministic md5 epoch-0 shuffle —
    same recipe as ``epoch_shuffle``), and ``unlock_step``.

    Stage cuts are EXACT VALUE quantiles computed from the difficulty
    value histogram, not row-NTILE: ``q_p`` = smallest difficulty value
    whose cumulative row count reaches ``p`` of the corpus (integer
    arithmetic: ``n_stages·cum ≥ k·n``), and ALL rows sharing a value land
    in one stage — tie-safe (no arbitrary split of equal-difficulty rows
    across stages) and reproducible on any engine. NULL difficulties sort
    above every value (SQL CASE falls through) → hardest stage.

    Scale: the histogram is one groupBy on the difficulty value; its
    cumsum window is unpartitioned but runs over DISTINCT VALUES (bounded
    by signal cardinality — lengths, scores in fixed ranges — not rows;
    for an unbounded-cardinality signal, quantize it first). Cuts rejoin
    as a broadcast single row; positions ride the bucketed
    ``global_ordinals`` machinery — one hash-partitioned window per
    (stage, bucket), no single-reducer sort anywhere.
    """
    if n_stages < 2:
        raise ValueError(f"n_stages must be ≥ 2, got {n_stages}")
    clash = sorted({"stage", "pos", "unlock_step"} & set(df.columns))
    if clash:
        raise ValueError(
            f"competence_curriculum owns output columns {clash}; rename "
            "them on the input first"
        )
    # NULL difficulties are EXCLUDED from the quantile distribution (they
    # fall through every cut to the hardest stage regardless) — and they
    # must be: Spark sorts NULL first, DuckDB last, so a NULL row in the
    # histogram would shift every cumulative count on one engine only.
    n = F.sum("c").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    hist = (
        df.filter(F.col(difficulty_col).isNotNull())
        .groupBy(F.col(difficulty_col).alias("__dv"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "__dv",
            F.sum("c")
            .over(W.orderBy("__dv").rowsBetween(W.unboundedPreceding, 0))
            .alias("cum"),
            n.alias("n"),
        )
    )
    cuts = hist.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * n_stages >= F.col("n") * k, F.col("__dv")
                )
            ).alias(f"__q{k}")
            for k in range(1, n_stages)
        ]
    )
    stage = F.lit(None)
    for s in range(n_stages - 1):
        stage = F.coalesce(
            stage,
            F.when(F.col(difficulty_col) <= F.col(f"__q{s + 1}"), F.lit(s)),
        )
    stage = F.coalesce(stage, F.lit(n_stages - 1)).cast("int")
    staged = (
        df.crossJoin(F.broadcast(cuts))  # 1-row build side → BNLJ, no shuffle
        .withColumn("stage", stage)
        .drop(*[f"__q{k}" for k in range(1, n_stages)])
    )
    unlock = (
        (F.col("stage") + 1) * (F.col("stage") + 1) * total_steps
        + F.lit(n_stages * n_stages - 1)
    ) / (n_stages * n_stages)
    out = epoch_shuffle(
        staged, epoch=0, key_col=key_col, salt=salt, partition_cols=["stage"]
    )
    return out.withColumn(
        "unlock_step", F.floor(unlock).cast("int")
    )


def global_cumsum(
    df: DataFrame,
    sort_cols: Sequence[str],
    val_col: str,
    bucket: Column,
    out_col: str = "cumsum",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact running total of ``val_col`` in global ``sort_cols`` order —
    the scale-safe form of ``SUM(v) OVER (ORDER BY k ROWS UNBOUNDED
    PRECEDING)``, which Spark plans as a single-partition window.

    Same two-pass shape as ``global_ordinals``: ``bucket`` must coarsen
    the sort order monotonically (non-decreasing along it); per-bucket
    SUMS are collected (bounded: one row per bucket), cumulated on the
    driver, and re-injected as a literal-map offset under a
    bucket-partitioned running-sum window. Exact for integer/decimal
    values (long addition is associative); for doubles the bucket split
    changes summation order — use decimal values if bit-exactness across
    plans matters.
    """
    out = global_rank_and_cumsum(
        df,
        sort_cols,
        val_col,
        bucket,
        ordinal_col="__ord0",
        cum_col=out_col,
        partition_cols=partition_cols,
    )
    return out.drop("__ord0")


# Above this many sources, interleave_sources abandons the closed-form
# chained-literal expression (2 nodes per source — the same codegen-bomb
# class as a big create_map, measured 25× at ~5000 entries on the mixture
# manifest) and re-derives positions as a bucketed global rank over
# (round, source). Module constant so tests can pin both paths.
_INTERLEAVE_LITERAL_MAX = 64


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    pos_col: str = "pos",
    salt: str = "interleave",
) -> DataFrame:
    """Fair round-robin interleaving of sources: position k·R + s-th spot
    goes to round-k of source s — so any contiguous training slice sees
    every source at its fair share instead of a run of one source (the
    shard-level mixing property batch samplers assume).

    Each row ranks WITHIN its source by the corpus-contract hash (a
    per-source window — parallel across sources); the global position is
    then CLOSED-FORM from the per-source counts, no global ordering pass
    at all: rows before round r = Σ_s min(n_s, r-1), plus the sources
    earlier in this round that are still active. The counts are one
    #sources-row collect (bounded constant) folded into a literal
    expression — the same bounded-driver discipline as the bucketed
    ordinal rewrites, with zero second data pass.

    The literal fold is 2 expression nodes per source — fine for tens of
    sources, a codegen bomb at thousands (the create_map class, measured
    25× at ~5000 entries). Past ``_INTERLEAVE_LITERAL_MAX`` sources the
    positions are instead computed as the bucketed global rank over
    ``(round, source)`` — the IDENTICAL permutation (one row per
    (source, round), and interleave order IS lexicographic (round,
    source) order), paying one extra bounded offsets pass instead of an
    O(#sources)-deep expression tree.
    """
    h = salted_hash(F.col(key_col), salt)
    w = W.partitionBy(source_col).orderBy(h, F.col(key_col))
    d = df.withColumn("__round", F.row_number().over(w))
    counts = sorted(
        (r[source_col], r["n"])
        for r in df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if len(counts) > _INTERLEAVE_LITERAL_MAX:
        return _interleave_sources_bucketed(
            d, counts, source_col, pos_col
        )
    rnd = F.col("__round")
    before_rounds = F.lit(0)
    same_round = F.lit(0)
    for src, n in counts:
        before_rounds = before_rounds + F.least(F.lit(n), rnd - 1)
        same_round = same_round + F.when(
            (F.lit(src) < F.col(source_col)) & (F.lit(n) >= rnd), 1
        ).otherwise(0)
    return d.withColumn(
        pos_col, (before_rounds + same_round + 1).cast("int")
    ).drop("__round")


def _interleave_round_source_cuts(
    counts: list, n_buckets: int = 256
) -> list:
    """Bucket cut points for the many-source interleave: row-mass
    quantiles of the (round, source) key space, returned as (round,
    source) PAIRS so a single round spread across many sources still
    splits into many buckets (round-only cuts collapse to one bucket in
    the many-tiny-sources regime — every row is round 1 — recreating
    the single-reducer trap; caught by the round-10 review).

    Driver cost: the round containing each cut comes from a segment
    walk over the ≤ #sources distinct count values (never rounds, which
    are unbounded); the source at the cut's within-round offset is the
    offset-th name among sources with n_s ≥ round. O(#cuts × #sources)
    worst case, vectorized.
    """
    import bisect
    import math

    import numpy as np

    if not counts:
        return []
    # the offset→source lookup requires name order; sort defensively so
    # a caller passing raw groupBy().collect() order can't silently get
    # out-of-order cuts and skewed buckets
    counts = sorted(counts)
    names = np.array([s for s, _ in counts], dtype=object)
    ns_by_name = np.array([n for _, n in counts])
    sorted_ns = sorted(int(n) for n in ns_by_name)
    total = int(sum(sorted_ns))
    n_cuts = min(n_buckets, max(1, total)) - 1
    if n_cuts <= 0:
        return []
    # segments of constant slope: rounds r in [r_lo, r_hi] each hold
    # `active` rows (one per source with n_s >= r)
    segs = []  # (r_lo, r_hi, active, rows_before_r_lo)
    r_prev, cum, idx = 0, 0, 0
    for nv in sorted(set(sorted_ns)):
        active = len(sorted_ns) - idx
        segs.append((r_prev + 1, nv, active, cum))
        cum += (nv - r_prev) * active
        r_prev = nv
        idx = bisect.bisect_right(sorted_ns, nv)
    cuts = []
    target = total / (n_cuts + 1)
    for j in range(1, n_cuts + 1):
        p = min(total, int(math.ceil(j * target)))  # 1-indexed position
        for r_lo, r_hi, active, rows_before in segs:
            seg_rows = (r_hi - r_lo + 1) * active
            if p <= rows_before + seg_rows:
                k = p - rows_before  # 1-indexed inside the segment
                r = r_lo + (k - 1) // active
                o = (k - 1) % active  # 0-indexed inside round r
                src = names[ns_by_name >= r][o]
                cut = (int(r), src)
                if not cuts or cut != cuts[-1]:
                    cuts.append(cut)
                break
    return cuts


def _interleave_sources_bucketed(
    d: DataFrame,
    counts: list,
    source_col: str,
    pos_col: str,
) -> DataFrame:
    """Many-source tail of ``interleave_sources``: the interleave
    position is exactly the dense rank of ``(round, source)`` (one row
    per pair), so reuse ``global_ordinals``' bucketed two-pass instead
    of folding thousands of per-source terms into one expression tree.

    Buckets come from ``_interleave_round_source_cuts`` — row-mass
    quantile cuts expressed as (round, source) pairs, so both regimes
    parallelize: few big sources (cuts spread across rounds) AND many
    tiny sources (cuts spread across sources inside round 1). The cut
    indicator is monotone in the (round, source) lexicographic sort
    order by construction, and the whole lookup is ONE array-of-structs
    literal + filter/size — constant expression depth regardless of
    cut count, never a per-source chain.
    """
    cuts = _interleave_round_source_cuts(counts, 256)
    if cuts:
        rnd = F.col("__round")
        src = F.col(source_col)
        pair_arr = F.array(
            *[
                F.struct(F.lit(int(r)).alias("r"), F.lit(s).alias("s"))
                for r, s in cuts
            ]
        )
        bucket = F.size(
            F.filter(
                pair_arr,
                lambda x: (rnd > x["r"])
                | ((rnd == x["r"]) & (src >= x["s"])),
            )
        )
    else:
        bucket = F.lit(0)
    out = global_ordinals(
        d,
        sort_cols=["__round", source_col],
        bucket=bucket,
        ordinal_col=pos_col,
    )
    return out.drop("__round")
