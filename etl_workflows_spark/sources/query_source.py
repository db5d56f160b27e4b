"""Query-file source: fetch ``.sql`` text to feed ``spark.sql``.

Mirrors the reference's download_query (functions/load_query/main.py:25-39):
missing file → QueryNotFound(404); extension other than ``.sql`` →
QueryInvalid(400) — the fetch happens FIRST, so a missing ``daily.txt``
is a 404, not a 400 (check order is part of the public error contract
the workflow DAG branches on). The raw text is returned untouched (the
reference passes the raw string straight to the SQL engine,
load_query/main.py:47-57).

Scheme-qualified paths (``s3a://`` / ``gs://`` / ``hdfs://``) go through
the Hadoop FileSystem API like every other source (files.py) — query
files live in the same object-store buckets as the data.
"""

from __future__ import annotations

import os

from etl_workflows_spark.exceptions import QueryInvalid, QueryNotFound


def read_query_file(path: str, spark=None) -> str:
    if "://" in path and spark is not None:
        from etl_workflows_spark.sources.files import _fs_and_path

        fs, jpath = _fs_and_path(spark, path)
        if not fs.exists(jpath):
            raise QueryNotFound()
        if not path.endswith(".sql"):
            raise QueryInvalid()
        stream = fs.open(jpath)
        try:
            jvm = spark._jvm
            return jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
    if not os.path.exists(path):
        raise QueryNotFound()
    if not path.endswith(".sql"):
        raise QueryInvalid()
    with open(path, "r") as f:
        return f.read()
