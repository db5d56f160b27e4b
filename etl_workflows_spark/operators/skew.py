"""Skew-aware join utilities.

At 100 TB a handful of heavy-hitter keys (the empty document, the default
user id, a viral item) can pin one reducer while 999 executors idle. Two
standard remedies, both here:

* **AQE skew-join** (on by default in session.py): Spark splits oversized
  partitions at runtime — the first line of defense, zero code.
* **Salting** (this module): for aggregations and joins where AQE can't
  help (e.g. the skew is in a broadcast-ineligible key of a shuffle join),
  explode the hot side's key space by a salt factor and replicate the
  other side.

cf. the standard two-phase aggregation / replicated-join literature
(Beame et al., skew join handling in parallel DBs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to left-side key skew.

    The (large, skewed) ``left`` gets a random salt in [0, salt); the
    (smaller) ``right`` is replicated ``salt`` times so every salted key
    finds its match. One hot key now lands on ``salt`` reducers instead of
    one. Cost: right side shuffles ``salt``× its size — use only when a
    skewed shuffle join is otherwise unavoidable.

    Only inner/left joins are sound under this construction: an outer
    right side would surface each unmatched right row once per replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "right replication would duplicate unmatched right rows in "
            "right/full outer joins"
        )
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt: int = 16,
) -> DataFrame:
    """Skew-resilient sum: salt → partial sum per (key, salt) → final sum.

    Spark's hash aggregation already does map-side partials, so this only
    wins when a single key's *post-combine* partials still overwhelm one
    reducer — rare, but this is the shape when it happens.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(agg_col).alias("__partial")
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(f"sum_{agg_col}"))


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: heaviest keys and their share of rows — run this before
    reaching for salting; most 'skew' is better fixed by filtering the
    junk key (NULL, '', 0) than by salting it."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.col("n_rows").desc())
        .limit(top)
    )
