"""Optimizer statistics: feed the cost-based optimizer real numbers.

Without table/column statistics Catalyst sizes relations from FILE
BYTES alone — fine for "is this under the broadcast threshold", blind
for everything else (join reordering, cardinality of filtered
branches, distinct counts for aggregation planning). ``ANALYZE TABLE``
is the missing pass: one scan computes row counts and per-column
NDV/null/min/max sketches into the catalog, and every later plan over
the table gets them for free.

The operational contract at scale: run ``analyze`` after bulk loads
and compactions (the moments cardinality actually changes), not per
query — statistics are catalog metadata, a one-time cost amortized
over every subsequent plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def analyze(
    spark: SparkSession,
    table: str,
    columns: list[str] | None = None,
) -> dict[str, object]:
    """ANALYZE TABLE (+ FOR COLUMNS when given) and return the stats
    the catalog now carries: {'rows': n, 'bytes': n, 'columns':
    {name: {'distinct_count': n, 'num_nulls': n, ...}}}."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(f"`{c}`" for c in columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")

    out: dict[str, object] = {"rows": None, "bytes": None, "columns": {}}
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if r["col_name"] == "Statistics":
            # e.g. "12345 bytes, 678 rows"
            parts = r["data_type"].split(",")
            for p in parts:
                p = p.strip()
                if p.endswith("bytes"):
                    out["bytes"] = int(p.split()[0])
                elif p.endswith("rows"):
                    out["rows"] = int(p.split()[0])
    for c in columns or []:
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {table} `{c}`"
            ).collect()
        }
        col_stats = {}
        for k_src, k_dst in (
            ("distinct_count", "distinct_count"),
            ("num_nulls", "num_nulls"),
            ("min", "min"),
            ("max", "max"),
        ):
            v = desc.get(k_src)
            if v is not None and v != "NULL":
                col_stats[k_dst] = v
        out["columns"][c] = col_stats
    return out
