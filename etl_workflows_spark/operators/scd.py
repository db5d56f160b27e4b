"""Slowly-changing-dimension (Type 2) maintenance.

The warehouse-side twin of the ingestion pipeline: dimension updates
arrive as snapshots; history is preserved as validity intervals
(``valid_from``/``valid_to``, open rows have NULL ``valid_to``).

Pure DataFrame composition — one join of updates against open rows plus
unions; no MERGE statement needed (and on a transactional format the same
logic compiles to one). Scale: the only shuffle is on the dimension key;
history rows pass through untouched (predicate on valid_to IS NOT NULL
keeps them out of the join entirely).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _differs(tracked: list[str]) -> Column:
    """NULL-safe 'any tracked attribute changed' predicate."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
    return cond


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; returns the new state.

    ``dim``: (key, *tracked, valid_from, valid_to) — valid_to NULL = open.
    ``updates``: (key, *tracked, ts_col) — at most one row per key (apply
    batches in event order; within-batch dedup is the caller's contract).

    Semantics:
      * new key        → insert open row [ts, NULL)
      * changed attrs  → close the open row at ts, insert new open row
      * unchanged      → no-op
      * closed history → untouched, always
    """
    history = dim.filter(F.col("valid_to").isNotNull())
    open_rows = dim.filter(F.col("valid_to").isNull())

    cur = open_rows.alias("cur")
    upd = updates.alias("upd")
    joined = cur.join(upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full_outer")

    changed = _differs(tracked)
    has_cur = F.col(f"cur.{key}").isNotNull()
    has_upd = F.col(f"upd.{key}").isNotNull()

    # open rows that survive unchanged (no update, or update equal)
    unchanged = joined.filter(has_cur & (~has_upd | ~changed)).select("cur.*")

    # open rows closed by a differing update
    closed = (
        joined.filter(has_cur & has_upd & changed)
        .select("cur.*", F.col(f"upd.{ts_col}").alias("__close_ts"))
        .withColumn("valid_to", F.col("__close_ts"))
        .drop("__close_ts")
    )

    # fresh versions: brand-new keys, or the new version of a changed key
    fresh = (
        joined.filter(has_upd & (~has_cur | changed))
        .select("upd.*")
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .drop(ts_col)
    )

    return history.unionByName(unchanged).unionByName(closed).unionByName(fresh)


def as_of(dim: DataFrame, ts, key: str | None = None) -> DataFrame:
    """Temporal point-in-time view: rows valid at ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
