"""Catalog sanity: every query runs at sf0.001 and returns a stable schema;
oracle coverage is complete for exact queries.

(The full DuckDB value comparison runs in tools/oracle_check.py at sf0.01 —
kept out of the default pytest run for speed; the driver runs it per-round.)
"""

import pytest

from etl_workflows_spark.queries import ORACLE_SQL, QUERIES, ROWS_ONLY_WHY


def test_oracle_coverage():
    # ROWS_ONLY_WHY is the single documented source for the no-oracle
    # class: an entry can neither lose its oracle silently nor go
    # rows-only without a stated reason (rendered into CATALOG.md).
    assert set(ORACLE_SQL) == set(QUERIES) - set(ROWS_ONLY_WHY)
    assert all(why.strip() for why in ROWS_ONLY_WHY.values())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_entry_contract(spark):
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())


def test_catalog_md_in_sync():
    """CATALOG.md is generated from the QUERIES dict — docs cannot drift
    from code. Regenerate with: python tools/gen_catalog.py"""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    import gen_catalog

    on_disk = open(os.path.join(root, "CATALOG.md")).read()
    assert on_disk == gen_catalog.render(), (
        "CATALOG.md is stale — run: python tools/gen_catalog.py"
    )


def test_recursive_hierarchy_depths(spark, sf_dir):
    """WITH RECURSIVE walks the synthetic binary-tree hierarchy: depth of
    part k is floor(log2(k)) + 1 extra hop for the 0-node edge cases —
    verify a few known chains explicitly."""
    from etl_workflows_spark.queries.relational_ext import recursive_hierarchy

    got = {
        r["part"]: (r["depth_to_root"], r["n_ancestors"])
        for r in recursive_hierarchy(spark, sf_dir).collect()
    }
    assert got[1] == (0, 1)          # root: no hops
    assert got[2] == (1, 2)          # 2 → 1
    assert got[5] == (2, 3)          # 5 → 2 → 1
    assert got[100] == (6, 7)        # 100 → 50 → 25 → 12 → 6 → 3 → 1
    assert got[127] == (6, 7)        # 127 → 63 → 31 → 15 → 7 → 3 → 1
    assert got[128] == (7, 8)        # exact power of two: one level deeper


def test_agg_unpivot_excludes_null_cells(spark, sf_dir):
    """SQL-standard UNPIVOT contract pinned at the SF that exposes it:
    sf0.001 has nations with customers but no suppliers, so the wide
    frame carries NULL cells — Spark's unpivot would keep them (50 rows);
    the entry's contract excludes them, matching DuckDB/BigQuery (35)."""
    from etl_workflows_spark.queries.relational_ext import agg_unpivot

    rows = agg_unpivot(spark, sf_dir).collect()
    assert all(r["bal"] is not None for r in rows)
    sides = {}
    for r in rows:
        sides.setdefault(r["side"], 0)
        sides[r["side"]] += 1
    # every nation has customers; only some have suppliers at this SF
    assert sides["cust_bal"] == 25
    assert sides["supp_bal"] < 25


def test_link_components_multi_component_structure(spark):
    """The frequent-transition component entry is a real partition at
    sf0.01: multiple components, each labeled by its min page id, labels
    closed under the edge set (every frequent edge's endpoints share a
    component)."""
    from pyspark.sql import functions as F

    from etl_workflows_spark.queries.analytics import link_components_events

    sf = "/root/testdata/sf0.01"
    comp = {
        r["page"]: r["component"]
        for r in link_components_events(spark, sf).collect()
    }
    assert len(comp) > 10
    comps = set(comp.values())
    assert len(comps) >= 2
    # every component label is the min member id
    for c in comps:
        members = [p for p, cc in comp.items() if cc == c]
        assert min(members) == c
