"""Partition-width guard for explode-heavy operators.

A per-row-expanding stage (rolling windows, deletion variants, shingle
explode) inherits its parallelism from the SCAN: a compact input — one
small parquet file, a heavily compressed shard — plans as one or two
partitions, and the expansion then runs serially no matter how many
cores exist. At production scale inputs arrive as many splits and this
is a no-op; the guard exists so the same operator is not accidentally
serial on small inputs.

``widen`` round-robin-repartitions the NARROW pre-expansion relation
(ids + text — cheap to move) up to the session's default parallelism,
and never repartitions downward (a wide input keeps its layout; we do
not add a shuffle to already-parallel plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` iff it currently
    plans fewer partitions; otherwise return it untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # getNumPartitions plans the scan (computes splits) but runs no job
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
