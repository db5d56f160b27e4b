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

    Timezone defense: the caller's session may not be UTC (the driver
    builds its own session); every timestamp in the testdata is NTZ in
    parquet, but functions like ``unix_micros`` interpret through the
    session zone — pin it to UTC so results match the (zoneless) DuckDB
    oracle regardless of host configuration.

    ``events.ts`` has been written two ways across testdata generations:
    parquet TIMESTAMP(NANOS) (which Spark 4 refuses to read as a timestamp
    — read as long via legacy conf and truncate to micros) and plain
    TIMESTAMP(MICROS) (reads directly as TIMESTAMP_NTZ). Detect which one
    we got and normalize to TIMESTAMP_NTZ micros either way — exactly the
    value DuckDB's reader produces, independent of any zone setting.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif ts_type == "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register parquet tables as temp views for SQL-API queries."""
    for n in names or TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


def ntz_micros(c: str | Column) -> Column:
    """Microseconds since epoch of an NTZ timestamp, timezone-free.

    ``unix_micros`` only accepts LTZ (and reads it through the session
    zone); this is the zone-independent equivalent for the testdata's NTZ
    timestamps — matches DuckDB's EPOCH_US on its zoneless timestamps by
    construction.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), col
    )


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
