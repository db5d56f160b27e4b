"""File-level min-max manifests: footer-only scan planning.

Spark's parquet reader prunes row groups *after* a task has opened the
file; at 100 TB with millions of files, the win is to never schedule
tasks for irrelevant files at all. Lakehouse formats keep file-level
column stats in a transaction log for exactly this reason; for plain
parquet directories this module builds the same thing as a queryable
DataFrame:

* **build_manifest** reads ONLY parquet footers (metadata pages, ~KB per
  file, no data IO), distributed: the file list is parallelized across
  executors and each reads its shard's footers with pyarrow. Cost scales
  with file *count*, not data volume.
* **pruned_paths / read_pruned** intersect range predicates with the
  manifest and hand Spark only the overlapping files — combined with a
  Z-order layout (sinks/layout.py) this turns selective multi-dimensional
  scans into a handful of file opens.

The manifest is advisory: `read_pruned` re-applies the predicate, so a
stale manifest can only over-read (list extra files), never produce
wrong results — missing files are the caller's compaction discipline
(rebuild after rewrites; `sinks/compact.py` and `sinks/merge.py` change
file sets).

Reference parity: none (net-new; the reference's storage layer is
BigQuery-internal, SURVEY.md §4.1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("min_val", T.DoubleType(), True),
        T.StructField("max_val", T.DoubleType(), True),
        T.StructField("null_count", T.LongType(), True),
    ]
)


def _list_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> list[str]:
    """Recursive file listing via the Hadoop FS API (works on any
    Hadoop-compatible store: file://, hdfs://, s3a://, gs://)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next().getPath().toString()
        if f.endswith(suffix):
            out.append(f)
    return out


def build_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-(file, column) stats table from parquet footers only.

    Numeric/temporal stats are normalized to doubles (micros for
    timestamps) — a manifest is for pruning, not for exact values.
    """
    files = _list_files(spark, path)
    if not files:
        return spark.createDataFrame([], _MANIFEST_SCHEMA)
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), 64))
    want = list(cols)

    def footer_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = p[len("file:"):] if p.startswith("file:") else p
                md = pq.read_metadata(local)
                names = {md.schema.column(i).name: i for i in range(len(md.schema))}
                for c in want:
                    if c not in names:
                        continue
                    ci = names[c]
                    mn = mx = None
                    nulls = 0
                    n = 0
                    for g in range(md.num_row_groups):
                        col = md.row_group(g).column(ci)
                        n += md.row_group(g).num_rows
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            mn = mx = None
                            break
                        lo, hi = _as_double(st.min), _as_double(st.max)
                        mn = lo if mn is None else min(mn, lo)
                        mx = hi if mx is None else max(mx, hi)
                        nulls += st.null_count or 0
                    rows.append((p, c, n, mn, mx, nulls))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "column", "n_rows", "min_val", "max_val", "null_count",
                ],
            )

    return paths_df.mapInPandas(footer_stats, schema=_MANIFEST_SCHEMA)


def _as_double(v):
    """Footer stat → comparable double (timestamps → epoch micros)."""
    import datetime

    if v is None:
        return None
    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return (v - epoch).total_seconds() * 1e6
    if isinstance(v, (int, float)):
        return float(v)
    return None  # string/binary stats: not range-prunable here


def pruned_paths(
    manifest: DataFrame, predicates: dict[str, tuple[float, float]]
) -> list[str]:
    """Files whose [min,max] intersects EVERY predicate range.

    A file missing stats for a predicate column conservatively survives
    (NULL min/max ⇒ cannot exclude)."""
    df = manifest
    keep = None
    for c, (lo, hi) in predicates.items():
        hit = (
            (F.col("column") == c)
            & (F.col("min_val").isNull() | (F.col("min_val") <= F.lit(hi)))
            & (F.col("max_val").isNull() | (F.col("max_val") >= F.lit(lo)))
        )
        miss = (F.col("column") == c) & ~hit
        excluded = df.filter(miss).select("path")
        keep = excluded if keep is None else keep.unionByName(excluded)
    all_paths = df.select("path").distinct()
    survivors = all_paths.join(keep.distinct(), "path", "leftanti") if keep is not None else all_paths
    return [r["path"] for r in survivors.collect()]


def read_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    predicates: dict[str, tuple[float, float]],
) -> DataFrame:
    """Scan only manifest-surviving files, re-applying the predicate
    exactly (the manifest is advisory — correctness never depends on it).
    Returns an empty-but-typed DataFrame if nothing survives."""
    paths = pruned_paths(manifest, predicates)
    if not paths:
        all_paths = [r["path"] for r in manifest.select("path").distinct().collect()]
        if not all_paths:
            raise ValueError("manifest is empty — no files to derive a schema from")
        # schema-only read of one manifest file (footer metadata, no data IO)
        schema = spark.read.parquet(all_paths[0]).schema
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(*paths)
    for c, (lo, hi) in predicates.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df
