"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalog itself lives in ``etl_workflows_spark/queries/`` — this module
is just the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-table snowflake join
    with exact-decimal revenue aggregation (TPC-H Q5 shape, all regions)."""
    from etl_workflows_spark.queries.relational import q5_all_regions

    return q5_all_regions(spark, "/root/testdata/sf0.001")


def _driver_sample_history() -> tuple[dict[str, int], int]:
    """How many driver rounds have sampled each catalog entry, derived
    from the committed ``CORRECTNESS_r*.json`` artifacts (the driver's
    own output — no hand-maintained list to drift). Returns
    ``(counts, round_number)`` where ``round_number`` is the number of
    artifacts found (i.e. the upcoming round's index)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    counts: dict[str, int] = {}
    files = glob.glob(os.path.join(here, "CORRECTNESS_r[0-9]*.json"))
    for path in files:
        try:
            with open(path) as fh:
                for name in json.load(fh):
                    counts[name] = counts.get(name, 0) + 1
        except (OSError, ValueError):
            continue
    return counts, len(files)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-pipeline operators). Each callable takes (spark, sf_dir) and
    returns a DataFrame with columns aliased to match ``oracle_sql``.

    Ordering (the driver samples ~50 entries from the front): entries
    that the driver has verified in FEWER past rounds come first, ties
    broken by a deterministic per-round shuffle (sha256 of
    ``name:round``). Until full coverage this rotates the sample over
    the never-verified tail; once every entry has been sampled the
    counts tie and the order degenerates into a fair per-round shuffle,
    so every entry — including previously-passed ones — keeps getting
    independently re-verified (ADVICE r5: no entry is ever steered away
    from the verifier). The full catalog is additionally checked locally
    every round (tools/oracle_check.py → CORRECTNESS_full_r*.json)."""
    import hashlib

    from etl_workflows_spark.queries import QUERIES

    counts, round_no = _driver_sample_history()

    def key(name: str) -> tuple[int, str]:
        salt = hashlib.sha256(f"{name}:{round_no}".encode()).hexdigest()
        return (counts.get(name, 0), salt)

    return {name: QUERIES[name] for name in sorted(QUERIES, key=key)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every exactly-reproducible query.
    Approximate operators (MinHash-LSH, hyperplane-LSH ANN) are omitted →
    rows-only check; their exact twins are oracle-checked."""
    from etl_workflows_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
