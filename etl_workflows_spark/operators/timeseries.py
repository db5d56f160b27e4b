"""Stateful per-series time-series operators (the non-SQL-expressible set).

EWMA and Holt double smoothing are RECURSIVE — value t depends on value
t-1 — which no window frame can express. The Spark shape for "per-key
sequential scan" is ``applyInPandas``: one shuffle on the series key,
then each series is processed in event-time order inside an Arrow batch.
State is per-series O(1); parallelism is across series — exactly how a
1000-executor cluster wants per-entity recursions laid out (millions of
independent series, each tiny).

Complements the window-expressible time-series ops in
queries/analytics.py (gap fill, trailing z-score): those stay in pure
Catalyst; these pay the Arrow hop only because the recursion demands it.

Reference parity: none (net-new north-star surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially weighted moving average per series, in event-time
    order: ``s_0 = x_0; s_t = alpha·x_t + (1-alpha)·s_{t-1}`` (pandas
    ``ewm(alpha, adjust=False)`` semantics; agrees with pandas to float
    rounding — the recursion is a contraction, so step-order ulp
    differences decay instead of accumulating). Output is the series
    projection ``(*key_cols, ts_col, value_col, ewma)`` — extra input
    columns are dropped (the Arrow-batch schema is fixed up front; join
    back on the keys if you need them), same contract as
    ``holt_forecast``.

    The state update is the LITERAL IEEE-double expression
    ``(1 - alpha)·s + alpha·x`` in that operand order, which makes the
    output bit-exactly reproducible by any engine running the same
    expression (the DuckDB recursive-CTE oracle of ``events_ewma`` does
    — the reason this is hash-checkable rather than rows-only). Ties on
    ``ts_col`` break by value, so the order (and therefore the state
    path) is a pure function of the data, not the partitioning.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    schema = T.StructType(
        list(df.select(*key_cols, ts_col, value_col).schema)
        + [T.StructField("ewma", T.DoubleType(), True)]
    )
    cols = [*key_cols, ts_col, value_col]
    om = 1.0 - alpha

    def fn(pdf):
        import numpy as np

        pdf = pdf[cols].sort_values([ts_col, value_col], kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64")
        out = np.empty(len(vals), dtype="float64")
        s = 0.0
        for i in range(len(vals)):
            x = float(vals[i])
            s = x if i == 0 else om * s + alpha * x
            out[i] = s
        pdf["ewma"] = out
        return pdf

    return df.select(*cols).groupBy(*key_cols).applyInPandas(fn, schema=schema)


def holt_forecast(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 1,
) -> DataFrame:
    """Holt double exponential smoothing per series: level + trend state,
    one forecast row per series ``horizon`` steps ahead.

    ``l_t = α·x_t + (1-α)(l_{t-1} + b_{t-1});
    b_t = β(l_t - l_{t-1}) + (1-β)b_{t-1};
    forecast = l_n + horizon·b_n`` (initialized l_0 = x_0, b_0 = x_1-x_0;
    single-point series forecast flat).

    Output: key cols + n_obs, level, trend, forecast.
    """
    if not 0 < alpha <= 1 or not 0 <= beta <= 1:
        raise ValueError("alpha in (0,1], beta in [0,1] required")
    key_fields = [df.schema[k] for k in key_cols]
    schema = T.StructType(
        key_fields
        + [
            T.StructField("n_obs", T.LongType(), False),
            T.StructField("level", T.DoubleType(), True),
            T.StructField("trend", T.DoubleType(), True),
            T.StructField("forecast", T.DoubleType(), True),
        ]
    )
    cols = [*key_cols, ts_col, value_col]

    def fn(pdf):
        import pandas as pd

        pdf = pdf[cols].sort_values(ts_col, kind="mergesort")
        xs = pdf[value_col].astype(float).tolist()
        keys = [pdf[k].iloc[0] for k in key_cols]
        if len(xs) == 1:
            lvl, tr = xs[0], 0.0
        else:
            lvl, tr = xs[0], xs[1] - xs[0]
            for x in xs[1:]:
                prev = lvl
                lvl = alpha * x + (1 - alpha) * (lvl + tr)
                tr = beta * (lvl - prev) + (1 - beta) * tr
        return pd.DataFrame(
            [[*keys, len(xs), lvl, tr, lvl + horizon * tr]],
            columns=[*key_cols, "n_obs", "level", "trend", "forecast"],
        )

    return df.select(*cols).groupBy(*key_cols).applyInPandas(fn, schema=schema)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_delta_s: int,
    key: str | None = None,
) -> DataFrame:
    """All (left, right) row pairs whose event times lie within
    ``max_delta_s`` seconds of each other (optionally also equi-matched
    on ``key``) — the time-proximity join open-source Spark has no
    native operator for.

    Naive formulations die at scale: a |Δt| ≤ w predicate alone plans a
    BroadcastNestedLoopJoin (O(n·m) comparisons). Here the window is
    discretized: each LEFT row explodes into the w-sized buckets its
    ±w window can overlap (at most 3), the RIGHT side computes its one
    home bucket, and the join is an ordinary EQUI-join on (key, bucket)
    followed by the exact |Δt| filter. Every qualifying pair is found
    exactly once (via the right row's unique home bucket), hash/SMJ/AQE
    strategies all apply, and shuffle volume is 3×|left| + |right| —
    never n·m.

    Column names must not collide between the two sides (epoch-second
    helper columns are internal). Returns left columns + right columns.
    """
    from pyspark.sql import functions as F

    if max_delta_s <= 0:
        raise ValueError(f"max_delta_s must be > 0, got {max_delta_s}")
    overlap = [
        c for c in right.columns if c in left.columns and c != key
    ]
    if overlap:
        raise ValueError(
            f"column collision between sides: {overlap}; rename first"
        )

    # exact MICROSECOND arithmetic (unix_timestamp truncates sub-second
    # components — a pair 600.4s apart must not pass a 600s window);
    # timestamp_diff is NTZ-safe, matching DuckDB's EPOCH_US semantics
    def _us(c: str):
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(c).cast("timestamp_ntz"),
        )

    w_us = int(max_delta_s) * 1_000_000
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((_us(left_ts) - w_us) / F.lit(w_us)),
                F.floor((_us(left_ts) + w_us) / F.lit(w_us)),
            )
        ),
    )
    r = right.withColumn("__bucket", F.floor(_us(right_ts) / F.lit(w_us)))
    on = ["__bucket"] if key is None else [key, "__bucket"]
    joined = l.join(r, on)
    close = F.abs(_us(left_ts) - _us(right_ts)) <= F.lit(w_us)
    return joined.filter(close).drop("__bucket")
