"""Scale the driver-generated testdata by integer replication, preserving
join integrity — so bench.py can measure data-dominated runtimes (sf1-ish)
instead of the ~0.15 s plan-launch floor that dominates at sf0.1
(BASELINE.md round-3 caveat).

Every key column k becomes ``k * factor + copy`` (copy ∈ [0, factor)),
applied consistently to each primary/foreign key pair, so copy i of an
order joins copy i of its lineitems and its customer. Dimension tables
nation/region keep their natural size (as TPC-H itself does). Document
text gets a per-copy prefix (copies are near- but not exact duplicates:
the duplication-heavy corpus is the realistic LLM-dedup workload).

Replicated embeddings (copy > 0) get REAL deterministic jitter, then L2
re-normalization: uniform noise in (-0.26, 0.26) per component (σ≈0.15),
derived from ``xxhash64(vec_id, copy, element_index)`` so the scaled
corpus is bit-reproducible. At dim=64 unit vectors this lands a copy at
cos≈0.64 from its source and cos≈0.41 from sibling copies — the same
similarity band as the corpus's GENUINE nearest neighbors (measured
NN sim ≈0.41 mean / 0.60 max at sf0.1) — so scaled-ANN recall@k measures
real approximate search over non-degenerate neighborhoods, not
replica-finding. (Pre-v2, copies sat at sim≈1.0 − 1e-6 and every
approximate path scored the identical artifact recall of 0.9.) Copy 0
keeps the source vector bit-for-bit, so the unscaled rows embed
unchanged in the scaled corpus.

The scaled directory is content-addressed by (source dir, factor,
_SCALE_VERSION) and reused across runs — generation is a one-time
~seconds cost; bumping _SCALE_VERSION invalidates stale caches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# bump to invalidate previously-materialized scaled dirs when the
# replication recipe changes (v2: jittered embeddings for real ANN recall)
_SCALE_VERSION = 2

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
    stamp = f"{src_dir} x{factor} v{_SCALE_VERSION}\n"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
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
            # jitter copies >0 into the genuine-NN similarity band, then
            # re-normalize (see module docstring for the calibration)
            jit = F.transform(
                "embedding",
                lambda x, i: x.cast("double")
                + F.lit(0.26)
                * (
                    F.xxhash64(F.col("vec_id"), F.col("__copy"), i).cast(
                        "double"
                    )
                    / F.lit(float(2**63))
                ),
            )
            norm = F.sqrt(
                F.aggregate(jit, F.lit(0.0), lambda a, x: a + x * x)
            )
            out = out.withColumn(
                "embedding",
                F.when(F.col("__copy") == 0, F.col("embedding")).otherwise(
                    F.transform(jit, lambda x: (x / norm).cast("float"))
                ),
            )
        (
            out.drop("__copy")
            .repartition(max(spark.sparkContext.defaultParallelism, factor))
            .write.mode("overwrite")
            .parquet(os.path.join(dest, f"{tbl}.parquet"))
        )
    open(marker, "w").write(stamp)
    return dest
