"""Declarative data-quality expectations: one scan, one report.

The ingestion-side counterpart of the row-level quality gate
(operators/text.py:quality_gate): table-level invariants — null rates,
uniqueness, value ranges, set membership, row count — declared as data,
compiled into a SINGLE conditional-aggregation pass (every check is a
``sum(case when …)`` over the same scan; no per-rule jobs), evaluated to
a (rule, ok, observed, threshold) report.

At 100 TB this shape matters: N expectations cost one table scan total,
and the aggregation is map-side-combinable like any other. Gate a
pipeline by failing on ``violations(report)`` before a write disposition
(the reference's workflow would branch on it like any description —
SURVEY.md §2.5 O3/O5).

Reference parity: none (net-new; the reference validates only CSV arity
and extensions).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One table invariant. ``kind`` ∈ {not_null, unique, between, isin,
    row_count_between, matches}; ``threshold`` is the max allowed
    violation fraction (0.0 = strict) for row-level kinds."""

    name: str
    kind: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    threshold: float = 0.0


def _violation_expr(e: Expectation) -> Column:
    c = F.col(e.column) if e.column else None
    if e.kind == "not_null":
        return c.isNull().cast("long")
    if e.kind == "between":
        bad = F.lit(False)
        if e.lo is not None:
            bad = bad | (c < F.lit(e.lo))
        if e.hi is not None:
            bad = bad | (c > F.lit(e.hi))
        # NULLs are not range violations — declare not_null separately
        return F.coalesce(bad.cast("long"), F.lit(0))
    if e.kind == "isin":
        return F.coalesce((~c.isin(list(e.values))).cast("long"), F.lit(0))
    if e.kind == "matches":
        return F.coalesce((~c.rlike(e.pattern)).cast("long"), F.lit(0))
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in ONE aggregation pass over ``df``.

    Returns (rule, kind, column, observed, allowed, ok) — ``observed``
    is the violation fraction for row-level rules, the distinct-excess
    for ``unique``, and the row count for ``row_count_between``.
    """
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError("expectation names must be unique")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for e in expectations:
        if e.kind == "row_count_between":
            continue
        if e.kind == "unique":
            aggs.append(F.count(e.column).alias(f"nn_{e.name}"))
            aggs.append(F.countDistinct(e.column).alias(f"nd_{e.name}"))
        else:
            aggs.append(F.sum(_violation_expr(e)).alias(f"v_{e.name}"))
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out = []
    for e in expectations:
        if e.kind == "row_count_between":
            ok = (e.lo is None or n >= e.lo) and (e.hi is None or n <= e.hi)
            out.append((e.name, e.kind, e.column, float(n), float(e.threshold), ok))
        elif e.kind == "unique":
            excess = row[f"nn_{e.name}"] - row[f"nd_{e.name}"]
            frac = excess / n if n else 0.0
            out.append(
                (e.name, e.kind, e.column, frac, e.threshold, frac <= e.threshold)
            )
        else:
            frac = (row[f"v_{e.name}"] or 0) / n if n else 0.0
            out.append(
                (e.name, e.kind, e.column, frac, e.threshold, frac <= e.threshold)
            )
    return df.sparkSession.createDataFrame(
        out, "rule string, kind string, column string, observed double, allowed double, ok boolean"
    )


def violations(report: DataFrame) -> list[str]:
    """Names of failed rules — the pipeline-gate condition."""
    return [r["rule"] for r in report.filter(~F.col("ok")).collect()]
