"""Mergeable distinct-count sketch rollups (HLL, Apache DataSketches).

The 100 TB problem: "distinct users in any date range" recomputed from
raw events is a full scan per question. The warehouse pattern is to
maintain per-(grain, dims) HLL sketches — a few KB each, **mergeable**:
the union of daily sketches estimates the distinct count of the union of
days, so any range query touches only sketch rows, never raw events, and
grains/dimensions can be re-aggregated after the fact (the property
COUNT DISTINCT itself lacks).

Built on Spark's native DataSketches expressions (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — JVM-side, no UDFs); the
sketch column is a plain BINARY, so it survives a parquet round-trip and
incremental maintenance is just appending new days' rows
(``sinks/merge.py`` or plain append — sketches for distinct days never
collide).

Reference parity: none (net-new; cf. the mergeable-summaries literature,
Agarwal et al. PODS 2012, and the sketch aggs in queries/analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    dims: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``key_col`` per (day, *dims): the incremental
    rollup unit. ``lg_k=12`` ⇒ ~1.6% rse, 4 KB per sketch."""
    dims = dims or []
    return (
        events.select(
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            *[F.col(d) for d in dims],
            F.col(key_col),
        )
        .groupBy("day", *dims)
        .agg(
            F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def estimate_range(
    sketches: DataFrame,
    start_day: str,
    end_day: str,
    dims: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate per ``dims`` over day ∈ [start, end] —
    touches only sketch rows (merge = ``hll_union_agg``), no raw data.
    With ``dims=[]`` returns a single global row."""
    dims = dims or []
    in_range = sketches.filter(
        (F.col("day") >= F.lit(start_day).cast("timestamp_ntz"))
        & (F.col("day") <= F.lit(end_day).cast("timestamp_ntz"))
    )
    grouped = in_range.groupBy(*dims) if dims else in_range.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    )


def audience_overlap(
    sketches: DataFrame,
    dim_col: str,
    seg_a,
    seg_b,
) -> DataFrame:
    """Estimated distinct-key OVERLAP between two segments from their
    HLL sketches alone — inclusion-exclusion over mergeable unions:
    |A∩B| ≈ est(A) + est(B) − est(A∪B). HLL cannot intersect directly
    (only union is lossless), so the estimate's error grows as the true
    overlap shrinks relative to the union — the returned ``overlap_est``
    is clamped at 0 and ships with both side estimates so callers can
    judge the ratio. One pass over sketch rows; raw data never re-read —
    the audience-overlap question (users in BOTH segments) answered at
    rollup cost."""
    # ONE conditional aggregation over one filtered scan — three
    # separate agg jobs + two crossJoins would read the sketch relation
    # three times for a module whose point is answering at rollup cost
    return (
        sketches.filter(F.col(dim_col).isin(seg_a, seg_b))
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(
                    F.when(F.col(dim_col) == seg_a, F.col("sketch"))
                )
            ).alias("est_a"),
            F.hll_sketch_estimate(
                F.hll_union_agg(
                    F.when(F.col(dim_col) == seg_b, F.col("sketch"))
                )
            ).alias("est_b"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "est_union"
            ),
        )
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
            ).alias("overlap_est"),
        )
    )
