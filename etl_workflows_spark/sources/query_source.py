"""Query-file source: fetch ``.sql`` text to feed ``spark.sql``.

Mirrors the reference's download_query (functions/load_query/main.py:25-39):
missing file → QueryNotFound(404); extension other than ``.sql`` →
QueryInvalid(400); otherwise the raw text is returned untouched (the
reference passes the raw string straight to the SQL engine,
load_query/main.py:47-57).
"""

from __future__ import annotations

import os

from etl_workflows_spark.exceptions import QueryInvalid, QueryNotFound


def read_query_file(path: str) -> str:
    if not path.endswith(".sql"):
        raise QueryInvalid()
    if not os.path.exists(path):
        raise QueryNotFound()
    with open(path, "r") as f:
        return f.read()
