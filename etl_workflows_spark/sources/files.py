"""File discovery + archival over any Hadoop-compatible filesystem.

Replicates the reference's "process the newest file by prefix, then archive
it" contract:

* newest = lexicographic max of the object *name* (string ``>``), NOT mtime —
  reference functions/load_csv/main.py:69-77; README documents date-suffixed
  names so newest sorts last.
* extension must be ``.csv`` or ``.csv.gz`` — main.py:79-81.
* after a successful load, every object under the prefix (and its ``FIXED_``
  staging twin, when present) is renamed under ``ARCHIVED/`` — main.py:182-190.

Implementation note: these are driver-side metadata operations (list/rename),
deliberately NOT Spark jobs — at 100 TB the data files never move, only their
directory entries. We go through the JVM Hadoop FileSystem API so the same
code works on file://, hdfs://, s3a://, gs:// etc.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_workflows_spark.exceptions import CsvInvalid, CsvNotFound, LoadJobError

ARCHIVED_SUBFOLDER = "ARCHIVED/"


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def list_by_prefix(spark: SparkSession, base_dir: str, prefix: str) -> list[str]:
    """All file names directly under ``base_dir`` whose name starts with prefix."""
    fs, jpath = _fs_and_path(spark, base_dir)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isFile() and name.startswith(prefix):
            out.append(name)
    return out


def find_most_recent_csv(spark: SparkSession, base_dir: str, prefix: str) -> str:
    """Pick the newest CSV by lexicographic name-max; validate its extension.

    Returns the full path. Raises CsvNotFound when nothing matches the
    prefix, CsvInvalid when the winner isn't ``.csv``/``.csv.gz`` — exactly
    the reference's order of checks (main.py:69-81: the max is taken first,
    the extension of the *winner* is what is validated).
    """
    names = list_by_prefix(spark, base_dir, prefix)
    if not names:
        raise CsvNotFound()
    winner = max(names)  # lexicographic, same as the reference's string `>`
    if not (winner.endswith(".csv") or winner.endswith(".csv.gz")):
        raise CsvInvalid()
    return base_dir.rstrip("/") + "/" + winner


def archive_processed(spark: SparkSession, base_dir: str, prefix: str) -> list[str]:
    """Rename every object matching ``prefix`` (and ``FIXED_<prefix>``) under
    ``ARCHIVED/`` — the reference's clean_bucket (main.py:182-190). Returns
    the archived names. Idempotent: already-archived files are not listed
    again because they no longer match the prefix at the top level.
    """
    fs, base = _fs_and_path(spark, base_dir)
    jvm = spark._jvm
    archived = []
    archive_dir = jvm.org.apache.hadoop.fs.Path(base, ARCHIVED_SUBFOLDER.rstrip("/"))
    if not fs.exists(archive_dir):
        fs.mkdirs(archive_dir)
    for p in (prefix, "FIXED_" + prefix):
        for name in list_by_prefix(spark, base_dir, p):
            src = jvm.org.apache.hadoop.fs.Path(base, name)
            dst = jvm.org.apache.hadoop.fs.Path(archive_dir, name)
            # re-delivered name: GCS rename overwrites, HDFS rename refuses
            # when the destination exists — replicate the overwrite so a
            # repeated filename can't wedge the incremental loop
            if fs.exists(dst):
                fs.delete(dst, False)
            if not fs.rename(src, dst):
                raise LoadJobError(f"failed to archive {name}")
            archived.append(name)
    return archived
