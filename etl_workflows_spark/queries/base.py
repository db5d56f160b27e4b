"""Shared helpers for the query catalog.

Cross-engine determinism rules (these make the DuckDB oracle hash-match
possible — see SURVEY.md §5):

* **Sums of monetary doubles go through DECIMAL(18,2).** Floating sums are
  order-dependent, and Spark's partial aggregation order differs from
  DuckDB's; the synthetic data is exactly 2-decimal, so decimal sums are
  exact in both engines and the final cast back to double is bitwise equal.
* **Averages are exact-sum / count**, never the engine's AVG (same reason).
* **Per-row IEEE arithmetic (+,-,*,/, sqrt) needs no rounding** — it is
  bitwise deterministic across engines. Transcendentals (ln, exp, pow with
  non-integer exponents) are NOT and are avoided.
* **Every computed column is aliased identically in both dialects** — the
  driver sorts columns by name before hashing.
* Ties in top-k / window ranks are always broken by a unique key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table, normalizing physical-type quirks.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark 4
    refuses to read as a timestamp; read it as a long (legacy conf) and
    truncate to microseconds — exactly what DuckDB's reader does, so the
    oracle sees identical values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register parquet tables as temp views for SQL-API queries."""
    for n in names or TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


def dec(c: str | Column) -> Column:
    """Exact-arithmetic view of a 2-decimal monetary column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def dsum(c: str | Column) -> Column:
    """Order-independent exact sum of a monetary column, as double."""
    return F.sum(dec(c)).cast("double")


def davg(c: str | Column) -> Column:
    """Deterministic average: exact decimal sum / count, double division."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col)).cast("double") / F.count(col)
