"""PageRank (operators/graph.py): fixed-point determinism, dangling-node
handling, and agreement with an independent pure-Python reference that
uses the SAME integer-arithmetic semantics."""

from __future__ import annotations

import random

import pytest

from etl_workflows_spark.operators import graph


def _py_pagerank(edges, iterations=5, damp_num=85, scale=graph.DEFAULT_SCALE):
    """Sequential reference with the operator's exact integer semantics."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    tele_num = 100 - damp_num
    r = {u: scale // n for u in nodes}
    base = (tele_num * scale) // (100 * n)
    for _ in range(iterations):
        dang = sum(r[u] for u in nodes if u not in deg) // n
        inflow = {u: 0 for u in nodes}
        for u, v in edges:
            inflow[v] += r[u] // deg[u]
        r = {u: base + (damp_num * (inflow[u] + dang)) // 100 for u in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {row["node"]: row["rank"] for row in graph.pagerank(df, **kw).collect()}


def test_pagerank_matches_python_reference_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    assert _run(spark, edges) == _py_pagerank(edges)


def test_pagerank_dangling_nodes_share_mass(spark):
    # 3 -> nothing (dangling); its mass must flow back uniformly, so the
    # graph keeps ~total mass and node 3 still holds rank (it has in-links)
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _run(spark, edges)
    assert got == _py_pagerank(edges)
    assert got[3] > 0
    total = sum(got.values())
    # floor-division quantization may bleed a few units per iteration
    assert abs(total - graph.DEFAULT_SCALE) < 10_000


def test_pagerank_authority_ordering(spark):
    # hub-and-spoke: everyone links to 0; 0 links to 1 only
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    got = _run(spark, edges)
    assert got[0] == max(got.values())
    assert got[1] > got[2]  # 1 receives the hub's full outflow


def test_pagerank_deterministic_across_runs(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(80)]
    assert _run(spark, edges) == _run(spark, edges)


def test_pagerank_empty_and_zero_iterations(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(df).count() == 0
    got = _run(spark, [(1, 2)], iterations=0)
    assert got == {1: graph.DEFAULT_SCALE // 2, 2: graph.DEFAULT_SCALE // 2}
    with pytest.raises(ValueError):
        _run(spark, [(1, 2)], iterations=-1)
    with pytest.raises(ValueError):
        _run(spark, [(1, 2)], damping=1.5)


def test_browse_graph_edges_follow_user_timelines(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10, '{"k": 5}'),
        (1, "2024-01-01 00:00:01", 11, '{"k": 7}'),
        (1, "2024-01-01 00:00:02", 12, '{"k": 5}'),
        (2, "2024-01-01 00:00:00", 13, '{"k": 9}'),  # lone event: no edge
        (3, "2024-01-01 00:00:00", 14, None),  # null props filtered
        (3, "2024-01-01 00:00:01", 15, '{"k": 2}'),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "props"])
    got = {(r["src"], r["dst"]) for r in graph.browse_graph(ev).collect()}
    assert got == {(5, 7), (7, 5)}


def _py_pagerank_weighted(edges, iterations=5, damp_num=85, scale=graph.DEFAULT_SCALE):
    """Sequential reference with pagerank_weighted's integer semantics."""
    agg = {}
    for u, v, w in edges:
        if w > 0:
            agg[(u, v)] = agg.get((u, v), 0) + w
    nodes = sorted({u for u, _ in agg} | {v for _, v in agg})
    n = len(nodes)
    wtot = {}
    for (u, _), w in agg.items():
        wtot[u] = wtot.get(u, 0) + w
    tele_num = 100 - damp_num
    r = {u: scale // n for u in nodes}
    base = (tele_num * scale) // (100 * n)
    for _ in range(iterations):
        dang = sum(r[u] for u in nodes if u not in wtot) // n
        inflow = {u: 0 for u in nodes}
        for (u, v), w in agg.items():
            inflow[v] += (r[u] * w) // wtot[u]
        r = {u: base + (damp_num * (inflow[u] + dang)) // 100 for u in nodes}
    return r


def test_pagerank_weighted_matches_python_reference(spark):
    import random

    rng = random.Random(13)
    edges = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(1, 9))
        for _ in range(90)
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    got = {r["node"]: r["rank"] for r in graph.pagerank_weighted(df).collect()}
    assert got == _py_pagerank_weighted(edges)


def test_pagerank_weighted_heavy_edge_dominates(spark):
    # 0 sends 9/10 of its outflow to 1, 1/10 to 2
    df = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)], ["src", "dst", "weight"]
    )
    got = {r["node"]: r["rank"] for r in graph.pagerank_weighted(df).collect()}
    assert got[1] > got[2]
    # uniform weights reduce to the unweighted operator exactly
    uni_w = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 0, 1)], ["src", "dst", "weight"]
    )
    uni = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], ["src", "dst"])
    a = {r["node"]: r["rank"] for r in graph.pagerank_weighted(uni_w).collect()}
    b = {r["node"]: r["rank"] for r in graph.pagerank(uni).collect()}
    assert a == b


def _py_ppr(edges, seed_set, iterations=5, damp_num=85, scale=graph.DEFAULT_SCALE):
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seeds = sorted(set(seed_set) & set(nodes))
    ns = len(seeds)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    tele_num = 100 - damp_num
    r = {u: (scale // ns if u in seeds else 0) for u in nodes}
    base = (tele_num * scale) // (100 * ns)
    for _ in range(iterations):
        dang = sum(r[u] for u in nodes if u not in deg) // ns
        inflow = {u: 0 for u in nodes}
        for u, v in edges:
            inflow[v] += r[u] // deg[u]
        r = {
            u: (base if u in seeds else 0)
            + (damp_num * (inflow[u] + (dang if u in seeds else 0))) // 100
            for u in nodes
        }
    return r


def test_ppr_matches_python_reference_and_localizes(spark):
    import random

    rng = random.Random(5)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(100)]
    seeds = [0, 1, 2]
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank_personalized(df, sdf).collect()
    }
    assert got == _py_ppr(edges, seeds)
    # locality: two chains from disjoint seeds — mass stays near its seed
    chain = [(0, 1), (1, 2), (10, 11), (11, 12)]
    cdf = spark.createDataFrame(chain, ["src", "dst"])
    near = {
        r["node"]: r["rank"]
        for r in graph.pagerank_personalized(
            cdf, spark.createDataFrame([(0,)], ["node"])
        ).collect()
    }
    assert near[1] > near[11]
    assert near[2] > near[12]
    import pytest

    with pytest.raises(ValueError):
        graph.pagerank_personalized(
            cdf, spark.createDataFrame([(999,)], ["node"])
        )
