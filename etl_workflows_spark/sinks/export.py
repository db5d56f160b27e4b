"""Training-data export: fixed-size shards with a deterministic,
checksummed manifest.

The delivery contract a training job needs from a curation pipeline:
(1) shards of a PREDICTABLE size so the data loader can balance
workers, (2) a manifest proving which rows went where, and (3)
content checksums so a re-export (or a copy across storage systems)
can be verified without re-reading the corpus on the training side.

Spark-first shape: shard assignment is a pure function of a content
hash (``xxhash64(key) mod n_shards`` — no global sort, no
coordination, stable under re-export of the same corpus), the write is
one ``partitionBy("shard")`` pass, and the manifest is one aggregate
over the same relation computing per-shard row counts and an
ORDER-INDEPENDENT checksum (sum of per-row 64-bit hashes mod 2^63 —
commutative, so it is reproducible no matter how Spark orders rows
inside a shard). Verification re-computes the same aggregate from the
written files and compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MOD = 2**63 - 1


def _row_digest(cols: list[str]) -> "F.Column":
    # hash the concatenated canonical row text; NULLs become a sentinel
    # so (NULL, 'x') and ('x', NULL) digest differently via position
    return F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
    )


def _shard_summary(df: DataFrame, cols: list[str]) -> DataFrame:
    # pmod avoids the (x % m + m) overflow trap under ANSI arithmetic;
    # the sum runs in decimal(38,0) because a long sum of ~2^63 digests
    # overflows immediately
    digest = F.pmod(_row_digest(cols), F.lit(_MOD))
    return df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum(digest.cast("decimal(38,0)")), F.lit(_MOD))
        .cast("bigint")
        .alias("checksum"),
    )


def export_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Write ``df`` as ``n_shards`` hash-assigned parquet shards under
    ``path`` (partition directories ``shard=N``) and a ``_manifest``
    parquet beside them. Returns the manifest DataFrame
    (shard, n_rows, checksum).

    The assignment is content-keyed, so exporting the same corpus twice
    (any partitioning, any row order) produces identical shard
    membership and identical checksums.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    data_cols = [c for c in df.columns]
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/data"
    )
    written = spark.read.parquet(f"{path}/data")
    manifest = _shard_summary(written, data_cols).orderBy("shard")
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def verify_export(spark: SparkSession, path: str) -> DataFrame:
    """Re-derive the manifest from the shard files and diff it against
    the stored one. Returns the discrepancy relation — EMPTY means the
    export is intact; rows name the shard and which side disagrees."""
    written = spark.read.parquet(f"{path}/data")
    data_cols = [c for c in written.columns if c != "shard"]
    actual = _shard_summary(written, data_cols)
    stored = spark.read.parquet(f"{path}/_manifest")
    a = actual.select(
        "shard",
        F.col("n_rows").alias("actual_rows"),
        F.col("checksum").alias("actual_checksum"),
    )
    s = stored.select(
        "shard",
        F.col("n_rows").alias("manifest_rows"),
        F.col("checksum").alias("manifest_checksum"),
    )
    return (
        a.join(s, "shard", "full_outer")
        .filter(
            (F.col("actual_rows") != F.col("manifest_rows"))
            | (F.col("actual_checksum") != F.col("manifest_checksum"))
            | F.col("actual_rows").isNull()
            | F.col("manifest_rows").isNull()
        )
    )
