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
from pyspark.sql.window import Window


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
    # fail fast on NULL keys: the full_outer equi-join never matches
    # NULL = NULL and every output branch requires a non-null side, so a
    # NULL-key row would be SILENTLY DROPPED from the returned dimension
    for side, name in ((updates, "updates"), (dim, "dim")):
        nul = side.filter(F.col(key).isNull()).limit(1).collect()
        if nul:
            raise ValueError(
                f"scd2_apply: NULL {key} in {name} — NULL keys cannot be "
                "matched and would be silently lost; filter or repair first"
            )
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


def as_of(dim: DataFrame, ts) -> DataFrame:
    """Temporal point-in-time view: rows valid at ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """Per-row point-in-time join: each fact row picks the dimension
    version valid at ITS OWN event time (``valid_from <= ts < valid_to``,
    open rows match everything from valid_from on).

    Plan shape: an equi-join on ``key`` with the validity window as a
    residual predicate — NOT a range join. SCD2 dims hold a handful of
    versions per key, so the equi-join fans out version-count× and the
    residual filters, keeping hash/broadcast join strategies (and their
    100 TB behavior) available; a pure interval join would forfeit the
    equi key and degenerate to a nested loop.

    Dim attribute columns must not collide with fact columns
    (``valid_from``/``valid_to`` are dropped from the output).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"temporal_join supports inner/left joins only, got {how!r}"
        )
    overlap = [
        c
        for c in dim.columns
        if c in facts.columns and c not in (key, "valid_from", "valid_to")
    ]
    if overlap:
        raise ValueError(
            f"dim attribute columns collide with fact columns: {overlap}; "
            "rename before joining"
        )
    f, d = facts.alias("f"), dim.alias("d")
    ts = F.col(f"f.{ts_col}")
    cond = (
        (F.col(f"f.{key}") == F.col(f"d.{key}"))
        & (F.col("d.valid_from") <= ts)
        & (F.col("d.valid_to").isNull() | (F.col("d.valid_to") > ts))
    )
    out_cols = [F.col(f"f.{c}") for c in facts.columns] + [
        F.col(f"d.{c}")
        for c in dim.columns
        if c not in (key, "valid_from", "valid_to")
    ]
    return f.join(d, cond, how).select(*out_cols)


def state_intervals(
    df: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse an append-only event stream into SCD2 validity intervals:
    consecutive runs of an equal ``state_col`` value per ``key`` become one
    row ``(key, version, state, valid_from, valid_to, n_events)``.

    The inverse of ``scd2_apply``'s batch merge — instead of maintaining a
    dimension against update batches, it REBUILDS the full Type-2 history
    from raw events in one pass (the backfill / bootstrap path every SCD2
    pipeline needs). Classic gaps-and-islands: a LAG change flag, a running
    sum assigning island ids, one agg per island, LEAD to close intervals.
    ``valid_to`` is the next run's ``valid_from`` (half-open intervals,
    NULL = still open), matching ``scd2_apply``'s row layout so ``as_of`` /
    ``temporal_join`` work on the output unchanged.

    Order within a key is ``(ts_col, tiebreak)`` — the tiebreak column must
    make the order total, or runs at equal timestamps are nondeterministic.
    NULL states are legal and form their own runs (NULL-safe comparison).
    The output owns the ``version/state/valid_from/valid_to/n_events``
    names; inputs already carrying one of them (other than ``state_col``
    itself) are rejected loudly rather than silently shadowed.

    Scale: every window and the agg are partitioned by ``key`` (plus the
    island id, a prefix extension) — one shuffle on the key, no global
    sort; per-key data must fit a task, which holds whenever per-entity
    event history does (the same contract as sessionize).
    """
    owned = {"version", "state", "valid_from", "valid_to", "n_events"}
    clash = sorted(owned & {c for c in df.columns if c != state_col})
    if clash:
        raise ValueError(
            f"state_intervals owns output columns {clash}; rename them on "
            "the input first"
        )
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    prev = F.lag(state_col).over(w)
    # row_number guard: eqNullSafe can't distinguish "first row" from "a
    # NULL state following a NULL state" — the first row always opens a run
    chg = (
        F.when(F.row_number().over(w) == 1, F.lit(1))
        .when(prev.eqNullSafe(F.col(state_col)), F.lit(0))
        .otherwise(F.lit(1))
    )
    islands = df.select(
        key,
        state_col,
        ts_col,
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("version"),
    )
    runs = islands.groupBy(key, "version").agg(
        # state is constant within an island; MIN is engine-portable
        # (first()/any_value() are order-dependent) and all-NULL-safe
        F.min(state_col).alias("state"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    nxt = Window.partitionBy(key).orderBy("version")
    return runs.select(
        key,
        "version",
        "state",
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        "n_events",
    )
