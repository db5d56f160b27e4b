"""Bucketed-table storage layout: shuffle-free sort-merge joins.

The one storage-level technique the rest of the repo's join work doesn't
exercise: pre-hash-partition ("bucket") both sides of a recurring join on
the join key AT WRITE TIME, so every subsequent join between them is a
SortMergeJoin with **zero Exchange** — the shuffle is paid once, at load,
not once per query. At 100 TB this converts the nightly fact⋈fact join
from "re-shuffle 100 TB" into "stream co-located bucket files".

Reference parity note: the reference delegates storage layout to BigQuery
(clustered tables, load_csv/main.py:158-169 LoadJobConfig); Spark's
equivalent contract is ``bucketBy`` + ``saveAsTable``, which this module
wraps. sinks/writer.py:118 already exposes ``bucket_by`` on the generic
sink; this module adds the *pair* contract (same bucket count, same key
hash → co-located scan) plus the idempotent ensure/reuse path the bench
and catalog entries need.

Mechanics that make the plan exchange-free (all asserted in
tests/test_bucketed_join.py):

* both tables bucketed into the SAME number of buckets on the join key —
  mismatched counts make Spark re-shuffle the smaller side;
* ``repartition(n_buckets, key)`` before the write: task hash partitioning
  and bucket-id hashing are both Murmur3(key) mod n, so each write task
  holds exactly one bucket's rows → ONE file per bucket (many files per
  bucket would force a per-bucket merge-sort at read);
* ``sortBy(key)``: bucket files are key-sorted on disk, so with one file
  per bucket the SortMergeJoin needs no Sort either — scan, zip, done.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> str:
    """Write ``df`` as a bucketed (external, if ``path`` given) table.

    One file per bucket (see module docstring), zstd parquet. Returns the
    table name. Overwrites any existing table of that name.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .option("compression", "zstd")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", f"{path.rstrip('/')}/{table}")
    writer.saveAsTable(table)
    return table


def _tag(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", s.strip("/"))


def ensure_bucketed(
    spark: SparkSession,
    df: DataFrame,
    base_name: str,
    key: str,
    n_buckets: int,
    scope: str = "",
    path: str | None = None,
) -> str:
    """Idempotent per-session ensure: create the bucketed table once,
    reuse it on every later call in the same session.

    Bucketing metadata lives in the session catalog (the default
    in-memory catalog forgets it on restart), so a fresh session pays the
    one-time bucketed write again — that is the honest cost model of
    "shuffle once at load": per catalog lifetime, not per query.

    The default storage path is salted with the PID: the catalog entry
    cannot outlive the process anyway, so a shared fixed path buys no
    reuse — it only lets a concurrent session's overwrite delete files
    this session is mid-read on (FAILED_READ_FILE.FILE_NOT_EXIST).
    """
    if path is None:
        path = f"/tmp/etlws_bucketed/{os.getpid()}"
    name = f"bkt_{base_name}_{_tag(scope)}_{n_buckets}" if scope else (
        f"bkt_{base_name}_{n_buckets}"
    )
    if not spark.catalog.tableExists(name):
        write_bucketed(df, name, key, n_buckets, path=path)
    return name


def bucketed_pair_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    names: tuple[str, str],
    n_buckets: int = 8,
    scope: str = "",
) -> DataFrame:
    """Join two relations through a bucketed-storage round-trip.

    Both sides are (idempotently) persisted bucketed on their join key
    with the same bucket count, then joined ``left_key == right_key``.
    The resulting physical plan is a SortMergeJoin with no Exchange and
    (one file per bucket) no Sort — asserted in tests.

    The keys may have different names (o_orderkey vs l_orderkey): bucket
    placement depends on the hashed *values*, not the column name, so the
    scans still line up bucket-for-bucket.
    """
    ln = ensure_bucketed(spark, left, names[0], left_key, n_buckets, scope)
    rn = ensure_bucketed(spark, right, names[1], right_key, n_buckets, scope)
    lt, rt = spark.table(ln), spark.table(rn)
    return lt.join(rt, lt[left_key] == rt[right_key])
