"""BigQuery-dialect compatibility helpers.

The reference's users write BigQuery Standard SQL; most of it runs on
Spark SQL unchanged, but a handful of BQ idioms need a different spelling.
These helpers provide the BQ semantics as composable Column expressions —
all built-ins underneath, nothing leaves codegen.

| BigQuery                | here                | Spark underneath        |
|-------------------------|---------------------|-------------------------|
| SAFE_CAST(x AS T)       | safe_cast(c, "T")   | try_cast                |
| SAFE_DIVIDE(a, b)       | safe_divide(a, b)   | NULL-on-zero division   |
| REGEXP_CONTAINS(s, re)  | regexp_contains     | rlike                   |
| PARSE_TIMESTAMP(fmts,s) | parse_timestamp     | coalesce(try_to_timestamp) |
| TIMESTAMP_TRUNC(ts, p)  | timestamp_trunc     | date_trunc (arg order)  |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_cast(c: Column | str, to_type: str) -> Column:
    """BQ SAFE_CAST: NULL instead of error on failed conversion."""
    col = F.col(c) if isinstance(c, str) else c
    return col.try_cast(to_type)


def safe_divide(a: Column | str, b: Column | str) -> Column:
    """BQ SAFE_DIVIDE: NULL on division by zero (Spark div-by-zero of
    doubles yields inf/NaN under ANSI-off, error under ANSI-on)."""
    num = F.col(a) if isinstance(a, str) else a
    den = F.col(b) if isinstance(b, str) else b
    return F.when(den != 0, num / den)


def regexp_contains(c: Column | str, pattern: str) -> Column:
    """BQ REGEXP_CONTAINS: unanchored match (rlike is already unanchored)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.rlike(pattern)


def parse_timestamp(c: Column | str, formats: list[str]) -> Column:
    """Multi-format first-match-wins timestamp parse, NULL when none match
    (generalizes the ingestion cleaner's T4 and BQ PARSE_TIMESTAMP with
    SAFE. prefix)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in formats])


def timestamp_trunc(c: Column | str, part: str) -> Column:
    """BQ TIMESTAMP_TRUNC(ts, PART) — Spark's date_trunc with BQ's argument
    order and part names."""
    col = F.col(c) if isinstance(c, str) else c
    return F.date_trunc(part.lower(), col)
