"""Multi-dimensional data-layout clustering (Z-order) for scan pruning.

Why this exists at 100 TB: parquet readers skip row groups / files whose
column min-max statistics exclude the predicate. A table sorted on ONE
column prunes perfectly on that column and not at all on any other; a
**Z-order (Morton) curve** interleaves the bits of several columns so that
a range predicate on ANY clustered dimension maps to a bounded set of
curve ranges — every clustered column gets useful min-max locality in
every file. (cf. the space-filling-curve layout literature — Morton
order / Z-curves as used by modern lakehouse table formats.)

This is a LAYOUT operator, not a query operator: run it before a large
``write_table`` to make all downstream selective scans cheaper. The curve
key is computed with built-in bit expressions (shiftleft / shiftright /
bitwise or-and) — whole-stage codegen, no UDFs — and the reshuffle is a
single ``repartitionByRange`` on the key (range partitioner = curve-
contiguous files) followed by an in-partition sort (row-group locality
inside each file).

Reference parity: none (net-new; the reference delegates physical layout
to BigQuery — SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` low bits of each already-scaled column.

    ``scaled[i]`` must be a BIGINT in [0, 2**bits); bit b of column i
    lands at position b*len(scaled)+i of the key. Pure shift/or algebra —
    stays inside codegen, no shuffle, no Python.
    """
    ndim = len(scaled)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ndim + i)
            )
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Attach a Morton key over ``cols`` as column ``__zkey``.

    Each column is min-max scaled to ``bits`` bits (one tiny agg job for
    the stats — at cluster scale, sample instead via
    ``df.sample(0.001)``-derived stats; exact bounds are not required for
    locality, only monotonicity). NULLs scale to 0 so they cluster
    together at the curve origin.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 clustering columns")
    if bits * len(cols) > 60:
        raise ValueError(f"bits*ndim must fit a long, got {bits}*{len(cols)}")
    # fail loudly on non-numeric clustering columns: cast('double') on a
    # string column yields all-NULL min/max and every row would silently
    # scale to a constant 0 — a "successful" layout job with zero pruning
    numeric = ("int", "bigint", "smallint", "tinyint", "float", "double",
               "date", "timestamp", "timestamp_ntz")
    for c in cols:
        t = dict(df.dtypes)[c]
        if t not in numeric and not t.startswith("decimal"):
            raise ValueError(
                f"zorder_key needs numeric/date columns, got {c}: {t} — "
                "derive a numeric key first (hash, epoch, length, …)"
            )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
        s = F.floor(
            (F.coalesce(F.col(c).cast("double"), F.lit(mn or 0.0)) - F.lit(mn or 0.0))
            / F.lit(span)
            * F.lit(float(top + 1))
        ).cast("long")
        scaled.append(F.least(F.lit(top).cast("long"), F.greatest(F.lit(0).cast("long"), s)))
    return df.withColumn("__zkey", interleave_bits(scaled, bits)), "__zkey"


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 12,
) -> DataFrame:
    """Re-layout ``df`` along the Z-curve of ``cols`` into
    ``num_partitions`` output partitions (→ files, when written).

    ``repartitionByRange`` gives each output file a contiguous curve
    segment, so each file covers a small hyper-rectangle of the clustered
    dimensions — that's what makes min-max skipping effective on all of
    them. The in-partition sort additionally tightens per-row-group stats
    inside each file.
    """
    keyed, key = zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(num_partitions, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
    )
