"""Scale the driver-generated testdata by integer replication, preserving
join integrity — so bench.py can measure data-dominated runtimes (sf1-ish)
instead of the ~0.15 s plan-launch floor that dominates at sf0.1
(BASELINE.md round-3 caveat).

Every key column k becomes ``k * factor + copy`` (copy ∈ [0, factor)),
applied consistently to each primary/foreign key pair, so copy i of an
order joins copy i of its lineitems and its customer. Dimension tables
nation/region keep their natural size (as TPC-H itself does). Document
text gets a per-copy prefix (copies are near- but not exact duplicates:
the duplication-heavy corpus is the realistic LLM-dedup workload);
embeddings get a per-copy 1e-6 nudge so replicated vectors aren't
bit-identical ties.

The scaled directory is content-addressed by (source dir, factor) and
reused across runs — generation is a one-time ~seconds cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# table -> columns that participate in PK/FK join identity
_KEY_COLS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replicate(df: DataFrame, factor: int, key_cols: list[str]) -> DataFrame:
    copies = df.sparkSession.range(factor).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copies))
    for k in key_cols:
        out = out.withColumn(k, F.col(k) * factor + F.col("__copy"))
    return out


def ensure_scaled(spark: SparkSession, src_dir: str, factor: int, dest_root: str) -> str:
    """Materialize (or reuse) ``src_dir`` replicated ``factor``×; returns
    the scaled directory path."""
    tag = os.path.basename(src_dir.rstrip("/")) or "sf"
    dest = os.path.join(dest_root, f"{tag}_x{factor}")
    marker = os.path.join(dest, "_SCALED_OK")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)
    for tbl, keys in _KEY_COLS.items():
        src = os.path.join(src_dir, f"{tbl}.parquet")
        if not os.path.exists(src):
            continue
        from etl_workflows_spark.queries.base import table

        df = table(spark, src_dir, tbl)  # normalizes events.ts nanos→ntz
        if not keys:  # dimensions keep natural size
            df.write.mode("overwrite").parquet(os.path.join(dest, f"{tbl}.parquet"))
            continue
        out = _replicate(df, factor, keys)
        if tbl == "documents":
            out = out.withColumn(
                "text", F.concat(F.lit("c"), F.col("__copy"), F.lit(" "), F.col("text"))
            ).withColumn("n_chars", F.length("text"))
        if tbl == "embeddings":
            nudge = F.col("__copy").cast("float") * F.lit(1e-6)
            out = out.withColumn(
                "embedding", F.transform("embedding", lambda x: x + nudge)
            )
        (
            out.drop("__copy")
            .repartition(max(spark.sparkContext.defaultParallelism, factor))
            .write.mode("overwrite")
            .parquet(os.path.join(dest, f"{tbl}.parquet"))
        )
    open(marker, "w").write(f"{src_dir} x{factor}\n")
    return dest
