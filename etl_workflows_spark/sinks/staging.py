"""Optional staged audit copy — the reference's ``FIXED_<name>`` artifact.

The reference re-serializes the cleaned rows to ``FIXED_<name>.csv`` in the
source bucket before loading (functions/load_csv/main.py:90,134-137), and
archives it alongside the original (main.py:188-190). In-engine coercion
makes the staging hop unnecessary for correctness (SURVEY.md W1), but the
artifact itself is useful for audit/debugging, so it's available opt-in.

Wire format matches the reference's writer: ``;`` delimiter, no quoting
with backslash escape, ISO-8859-1, NULL cells as empty fields (main.py:98-105
+ T6), timestamps canonicalized to ``yyyy-MM-dd HH:mm:ss`` (main.py:126).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_fixed_copy(
    df: DataFrame, bucket_dir: str, source_csv_name: str
) -> str:
    """Write the cleaned DataFrame as a single ``FIXED_<name>`` CSV in
    ``bucket_dir``; returns the file name written.

    Single-file output is a deliberate audit-artifact choice (the reference
    produces one file): ``coalesce(1)`` serializes the write — do NOT use
    this on the bulk path at scale, where the table sink already holds the
    cleaned data partitioned.
    """
    fixed_name = "FIXED_" + source_csv_name.removesuffix(".gz")
    spark = df.sparkSession
    tmp_dir = bucket_dir.rstrip("/") + f"/.__staging_{fixed_name}"
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("sep", ";")
        .option("quote", "")
        .option("escape", "\\")
        .option("encoding", "ISO-8859-1")
        .option("header", "false")
        .option("nullValue", "")
        .option("emptyValue", "")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(tmp_dir)
    )
    _promote_single_part(spark, tmp_dir, bucket_dir, fixed_name)
    return fixed_name


def _promote_single_part(
    spark: SparkSession, tmp_dir: str, bucket_dir: str, final_name: str
) -> None:
    """Rename the single part file out of the staging dir and drop the dir."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp_dir)
    fs = tmp_path.getFileSystem(conf)
    part = None
    for status in fs.listStatus(tmp_path):
        name = status.getPath().getName()
        if name.startswith("part-"):
            part = status.getPath()
            break
    dest = jvm.org.apache.hadoop.fs.Path(
        jvm.org.apache.hadoop.fs.Path(bucket_dir), final_name
    )
    if part is None:
        fs.delete(tmp_path, True)
        raise ValueError(
            "no part file produced — the staged DataFrame wrote zero "
            "partitions (empty input scan?)"
        )
    if fs.exists(dest):
        fs.delete(dest, False)
    # Hadoop rename reports failure by returning FALSE, not raising —
    # ignoring it and deleting tmp would destroy the only copy
    if not fs.rename(part, dest):
        raise IOError(f"rename {part} -> {dest} failed (FileSystem returned false)")
    fs.delete(tmp_path, True)
